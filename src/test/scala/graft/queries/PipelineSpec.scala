package graft.queries

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.sql.functions._

/** Invariants of the training-data release pack that the row-hash oracle
  * can't express: packing offsets are globally contiguous (the 2-phase
  * prefix sum equals a sequential scan), redaction actually scrubs every
  * match, and the k-means step partitions the corpus exactly.
  */
class PipelineSpec extends SparkSpec {

  test("q_pack_sequences: offsets are contiguous in doc_id order") {
    val rows = SparkEntry.queries("q_pack_sequences")(spark, sf)
      .orderBy("doc_id")
      .select("doc_id", "n_tok", "start_off")
      .collect()
    assert(rows.nonEmpty)
    assert(rows.head.getLong(2) == 0L, "first doc must start at offset 0")
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(2) == a.getLong(2) + a.getLong(1),
        s"doc ${b.getLong(0)} offset ${b.getLong(2)} != " +
          s"${a.getLong(2)} + ${a.getLong(1)} (doc ${a.getLong(0)})")
      case _ => ()
    }
  }

  test("q_text_pii: redacted text carries no residual matches; counts hit") {
    val df = SparkEntry.queries("q_text_pii")(spark, sf)
    val residual = df.filter(
      col("redacted").rlike("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}") ||
      col("redacted").rlike("([0-9]{1,3}\\.){3}[0-9]{1,3}") ||
      col("redacted").rlike("\\+[0-9]{8,15}")).count()
    assert(residual == 0, s"$residual docs still carry PII after redaction")
    // every doc_id % 3 == 0 got exactly one injected email, and so on
    val bad = df.filter(
      (col("doc_id") % 3 === 0 && col("n_emails") =!= 1) ||
      (col("doc_id") % 3 =!= 0 && col("n_emails") =!= 0) ||
      (col("doc_id") % 5 === 0 && col("n_ips") =!= 1) ||
      (col("doc_id") % 5 =!= 0 && col("n_ips") =!= 0) ||
      (col("doc_id") % 7 === 0 && col("n_phones") =!= 1) ||
      (col("doc_id") % 7 =!= 0 && col("n_phones") =!= 0)).count()
    assert(bad == 0, s"$bad docs with unexpected PII counts")
  }

  test("q_embed_kmeans: cells partition the corpus; every cell has 64 dims") {
    val df = SparkEntry.queries("q_embed_kmeans")(spark, sf).cache()
    try {
      val corpus = graft.Tables.load(spark, sf, "embeddings").count()
      // each vector contributes n_members to every one of its 64 dims
      val perDim = df.groupBy("dim").agg(sum("n_members").as("total"))
        .select(countDistinct("total")).head.getLong(0)
      assert(perDim == 1, "dims disagree on corpus size")
      val total = df.filter(col("dim") === 1)
        .agg(sum("n_members")).head.getLong(0)
      assert(total == corpus, s"cells cover $total of $corpus vectors")
      val dimsPerCell = df.groupBy("cell").count()
        .select(countDistinct("count")).head.getLong(0)
      assert(dimsPerCell == 1, "ragged dim counts across cells")
    } finally df.unpersist()
  }

  test("q_dedup_semantic: both ends of every pair live in the named cell") {
    val pairs = SparkEntry.queries("q_dedup_semantic")(spark, sf)
    import spark.implicits._
    val base = graft.Tables.load(spark, sf, "embeddings")
      .select($"vec_id", Vec.quant($"embedding").as("qe"))
      .withColumn("nrm", Vec.dotQ($"qe", $"qe"))
    val cells = Vec.argminCellAssign(base, 200L, 16L)
      .select($"vec_id", $"cell".as("true_cell"))
    val aSide = pairs
      .join(cells, pairs("ida") === cells("vec_id"))
      .filter($"cell" =!= $"true_cell").count()
    assert(aSide == 0, s"$aSide pairs whose ida is outside the named cell")
    val bSide = pairs
      .join(cells, pairs("idb") === cells("vec_id"))
      .filter($"cell" =!= $"true_cell").count()
    assert(bSide == 0, s"$bSide pairs whose idb is outside the named cell")
  }
}
