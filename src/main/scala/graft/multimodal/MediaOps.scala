package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling for a training-data pipeline: media payloads
  * as opaque `BINARY` columns + typed metadata, with decode / feature /
  * frame-sample operators running as `mapPartitions` over the binary
  * payloads (the Spark-side plumbing — schema, partitioning, batch shape —
  * is real; only the codec itself is stubbed, see [[StubCodec]]).
  *
  * Scale notes: media processing is per-row CPU-bound work with large
  * payloads — exactly what `mapPartitions` + high partition counts are
  * for. No shuffle is introduced: every operator is a narrow map, so a
  * 100 TB corpus streams through executors at scan speed. Feature outputs
  * are small (drop the payload column as early as possible — done here by
  * selecting only derived columns).
  */
object MediaOps {

  /** STUB: the container ships no image/audio codecs, so decode derives
    * deterministic fake dimensions from the payload bytes. In production
    * this is the only function to replace (e.g. javax.imageio /
    * ffmpeg-cli per partition); every caller is codec-agnostic.
    */
  object StubCodec {
    def decodeDims(bytes: Array[Byte]): (Int, Int) = {
      val s = byteSum(bytes)
      ((s % 640).toInt, (bytes.length % 480))
    }
  }

  private[multimodal] def byteSum(bytes: Array[Byte]): Long = {
    var s = 0L
    var i = 0
    while (i < bytes.length) { s += (bytes(i) & 0xff); i += 1 }
    s
  }

  private def md5hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map("%02x".format(_)).mkString

  /** Rows with NULL payloads (failed fetches are normal in a crawled
    * corpus) are dropped by every operator — an executor-side NPE hours
    * into a 100 TB job is the alternative.
    */
  private def nonNullMedia(df: DataFrame): DataFrame =
    df.select(col("id"), col("media")).filter(col("media").isNotNull)

  /** Decode + per-payload features. Input df needs (id BIGINT,
    * media BINARY); output drops the payload immediately.
    */
  def features(df: DataFrame): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    nonNullMedia(df).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (w, h) = StubCodec.decodeDims(bytes)
          MediaFeatures(id, bytes.length, md5hex(bytes), byteSum(bytes), w, h)
        }
      }
  }

  /** Frame sampling: split the payload into k contiguous chunks (the
    * video-frame stand-in) and emit per-chunk summaries.
    */
  def frameSample(df: DataFrame, k: Int): Dataset[FrameFeature] = {
    val spark = df.sparkSession
    import spark.implicits._
    nonNullMedia(df).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          (0 until k).map { i =>
            // long arithmetic: i * length overflows Int for ~100MB+ media
            val from = (i.toLong * bytes.length / k).toInt
            val until = ((i + 1).toLong * bytes.length / k).toInt
            FrameFeature(id, i, byteSum(bytes.slice(from, until)))
          }
        }
      }
  }

  /** Integer byte-histogram "embedding" (8 buckets of 32 code points) —
    * the feature-extraction shape; exact ints so it is oracle-checkable.
    */
  def histogram(df: DataFrame): Dataset[MediaHistogram] = {
    val spark = df.sparkSession
    import spark.implicits._
    nonNullMedia(df).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val h = new Array[Long](8)
          bytes.foreach { b => h((b & 0xff) / 32) += 1 }
          MediaHistogram(id, h.toSeq)
        }
      }
  }
}

final case class MediaFeatures(id: Long, n_bytes: Int, digest: String,
    byte_sum: Long, fake_width: Int, fake_height: Int)
final case class FrameFeature(id: Long, frame_idx: Int, chunk_sum: Long)
final case class MediaHistogram(id: Long, hist: Seq[Long])
