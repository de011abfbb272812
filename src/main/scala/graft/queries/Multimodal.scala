package graft.queries

import graft.{QueryPack, Tables}
import graft.multimodal.MediaOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked entry points for the multimodal plumbing: documents'
  * text reinterpreted as an opaque BINARY payload (the corpus has no real
  * media; ASCII bytes make every derived value mirrorable in DuckDB),
  * then run through the real mapPartitions operators of MediaOps.
  */
object Multimodal extends QueryPack {

  private def mediaDF(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(col("doc_id").as("id"), col("text").cast("binary").as("media"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // decode-stub + payload features via mapPartitions
    "q_media_features" -> ((s, dir) =>
      MediaOps.features(mediaDF(s, dir)).toDF()
        .select(col("id"), col("n_bytes"), col("digest"), col("byte_sum"),
          col("fake_width"), col("fake_height"))),

    // frame sampling: 4 contiguous chunks per payload
    "q_media_frames" -> ((s, dir) =>
      MediaOps.frameSample(mediaDF(s, dir), 4).toDF()),

    // integer byte-histogram embedding; serialized to a CSV string so the
    // driver harness (pandas sort) can hash-compare it — arrays are
    // unhashable on its side.
    "q_media_hist" -> ((s, dir) =>
      MediaOps.histogram(mediaDF(s, dir)).toDF()
        .select(col("id"),
          array_join(col("hist").cast("array<string>"), ",").as("hist"))))

  private val oCodes =
    "[ascii(text[i]) for i in generate_series(1, length(text))]"

  def oracleSql: Map[String, String] = Map(
    // NOTE: DuckDB list_sum returns HUGEINT (int128); the driver hashes the
    // physical type, so every sum is CAST to BIGINT to match Spark's LongType.
    "q_media_features" ->
      s"""SELECT doc_id AS id, length(text) AS n_bytes, md5(text) AS digest,
         |  CAST(list_sum($oCodes) AS BIGINT) AS byte_sum,
         |  CAST(list_sum($oCodes) % 640 AS INT) AS fake_width,
         |  CAST(length(text) % 480 AS INT) AS fake_height
         |FROM documents""".stripMargin,

    "q_media_frames" ->
      s"""SELECT doc_id AS id, f.i AS frame_idx,
         |  CAST(coalesce(list_sum([ascii(text[j]) for j in
         |    generate_series((f.i * length(text)) // 4 + 1,
         |                    ((f.i + 1) * length(text)) // 4)]), 0)
         |    AS BIGINT) AS chunk_sum
         |FROM documents CROSS JOIN generate_series(0, 3) f(i)""".stripMargin,

    "q_media_hist" ->
      s"""SELECT doc_id AS id,
         |  array_to_string([CAST(len(list_filter($oCodes, c -> c // 32 = b))
         |      AS BIGINT) for b in generate_series(0, 7)], ',') AS hist
         |FROM documents""".stripMargin)
}
