package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated TPC-H-ish parquet tables
  * (see /root/repo/TESTDATA.md). All queries take the sf dir as input and
  * read through these helpers so filters/column pruning push into the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Older testdata drops stored events.ts as INT64 TIMESTAMP(NANOS),
    // which Spark's parquet schema inference rejects outright
    // ([PARQUET_TYPE_ILLEGAL]) even when ts is pruned away — so the
    // nanos-as-LONG escape hatch stays on; it is a no-op for files that
    // store ts as a plain timestamp[us].
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeTs(df) else df
  }

  /** Normalize events.ts to a session-TZ TimestampType with microsecond
    * values, whatever the file's physical type. The generator has shipped
    * ts as INT64 TIMESTAMP(NANOS) (reads as LONG under nanosAsLong; values
    * are micro-precision so DIV 1000 is lossless) and as timestamp[us]
    * (reads as TIMESTAMP_NTZ; a cast under the UTC session TZ is
    * value-identical). DuckDB oracles see CAST(ts AS TIMESTAMP) — the same
    * wall-clock micros on every path.
    */
  def normalizeTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType => df.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
    case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
    case _ => df
  }

  /** The raw type events.ts reads as from `dir` (footer-only probe, cached
    * per dir) — lets SQL-gate scripts declare a source schema that matches
    * the file generation they are actually pointed at.
    */
  def eventsTsRawType(spark: SparkSession, dir: String): DataType =
    tsTypes.getOrElseUpdate(dir, {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
    })

  /** (DDL type for the raw ts column, SQL expr deriving the micro-precision
    * TIMESTAMP from it) — the computed-column pair for gate scripts.
    */
  def eventsTsDdl(spark: SparkSession, dir: String): (String, String) =
    eventsTsRawType(spark, dir) match {
      case LongType => ("BIGINT", "timestamp_micros(ts DIV 1000)")
      case _ => ("TIMESTAMP", "CAST(ts AS TIMESTAMP)")
    }

  private val tsTypes = scala.collection.concurrent.TrieMap[String, DataType]()

  /** Register every table as a temp view named after itself — mirrors how the
    * DuckDB oracle sees them, so `spark.sql` text and oracle SQL line up.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
