package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated TPC-H-ish parquet tables
  * (see /root/repo/TESTDATA.md). All queries take the sf dir as input and
  * read through these helpers so filters/column pruning push into the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet stores ts as INT64 TIMESTAMP(NANOS), which Spark's
    // parquet schema inference rejects outright ([PARQUET_TYPE_ILLEGAL])
    // even when ts is pruned away. Read nanos as LONG, then derive a real
    // TimestampType column (the generator's values are micro-precision, so
    // DIV 1000 is lossless). DuckDB oracles use CAST(ts AS TIMESTAMP).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
    else df
  }

  /** Register every table as a temp view named after itself — mirrors how the
    * DuckDB oracle sees them, so `spark.sql` text and oracle SQL line up.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
