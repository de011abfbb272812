package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The driver has shipped events.ts in two physical parquet layouts:
  * INT64 micro-valued-nanos (reads as LONG under nanosAsLong) and
  * timestamp[us] (reads as TIMESTAMP_NTZ). Round 9 broke on the switch:
  * the batch loader's unconditional DIV-1000 workaround failed analysis
  * on a timestamp column, and the streaming gate's pinned `ts LONG`
  * schema silently read micros as longs and collapsed every window
  * 1000×. This spec pins the fix by materializing the SAME rows in both
  * layouts and asserting the batch loader, the streaming gate and the
  * gate-script DDL produce identical results on each.
  */
class TsFormatSpec extends SparkSpec {
  import spark.implicits._

  // 40 rows across 3 hours / 2 users / 2 types — enough for windows to
  // differ if ts shrinks 1000×.
  private lazy val rows = (0 until 40).map { i =>
    (i.toLong, 1700000000000000L + i * 271000000L, (i % 2).toLong,
      if (i % 3 == 0) "click" else "view", i * 1.5, s"""{"i":$i}""")
  }

  /** dir containing events.parquet with ts as a plain BIGINT of micros —
    * reads as LongType, the same arrival type as the legacy
    * micro-valued-nanos files once nanosAsLong applies. The loader's
    * LONG path divides by 1000, so pre-multiply to keep values equal.
    */
  private lazy val longDir: String = {
    val d = java.nio.file.Files.createTempDirectory("ts_long").toString
    rows.map { case (id, us, uid, et, v, p) => (id, us * 1000L, uid, et, v, p) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  /** dir with ts as timestamp[us] (TIMESTAMP_NTZ), the Aug-2026 layout. */
  private lazy val ntzDir: String = {
    val d = java.nio.file.Files.createTempDirectory("ts_ntz").toString
    rows.toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("ts_us")).cast(TimestampNTZType))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  private def collectSorted(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("batch loader normalizes both layouts to identical TimestampType values") {
    val a = Tables.load(spark, longDir, "events")
    val b = Tables.load(spark, ntzDir, "events")
    assert(a.schema("ts").dataType === TimestampType)
    assert(b.schema("ts").dataType === TimestampType)
    assert(collectSorted(a) === collectSorted(b))
  }

  test("hourly tumble windows agree across layouts (the r9 failure shape)") {
    def tumble(dir: String): Seq[String] = collectSorted(
      Tables.load(spark, dir, "events")
        .groupBy(window($"ts", "1 hour"), $"event_type")
        .agg(count(lit(1)).as("n"))
        .select(date_format($"window.start", "yyyy-MM-dd HH:mm:ss"),
          $"event_type", $"n"))
    val t = tumble(ntzDir)
    assert(tumble(longDir) === t)
    // 3+ distinct hours must survive — a 1000× ts collapse leaves 1
    assert(t.map(_.split(",")(0)).distinct.size >= 3)
  }

  test("streaming gate reads both layouts to the batch answer") {
    def stream(dir: String): Seq[String] = collectSorted(
      StreamingGate.queries("q_stream_tumble")(spark, dir))
    val a = stream(longDir)
    val b = stream(ntzDir)
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("gate DDL probe picks the matching computed-column expression") {
    assert(Tables.eventsTsDdl(spark, longDir) ===
      ("BIGINT", "timestamp_micros(ts DIV 1000)"))
    assert(Tables.eventsTsDdl(spark, ntzDir) ===
      ("TIMESTAMP", "CAST(ts AS TIMESTAMP)"))
  }
}
