package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import scala.collection.concurrent.TrieMap

/** Changelog (CDC) processing — the reference's demo_6 pipeline (MySQL
  * binlog → debezium-json → retraction-aware aggregation → upsert sinks).
  * Spark has no first-class changelog rows (SURVEY §7.4), so the
  * idiomatic restatement models op/before/after as data columns and
  * applies them with keyed MERGE semantics in foreachBatch:
  *
  *   decodeDebezium  — value bytes/string → (op, before.*, after.*)
  *                     (`demo_6.md:216-219` debezium-json format)
  *   applyChangelog  — foreachBatch MERGE into a keyed store: c/u/r
  *                     upsert the after-image, d deletes by key; within a
  *                     batch the last event per key wins (binlog order)
  *   aggregateState  — retraction-aware aggregate = aggregate over the
  *                     materialized state (correct under update+delete by
  *                     construction, the `demo_6.md:222-226` SUM shape)
  *
  * Scale notes: the per-batch MERGE groups by key inside Spark before
  * touching the store, so the store sees one write per key per batch.
  * With a real transactional sink (JDBC/Delta) the same contract maps to
  * MERGE INTO; state size is the keyed table, not the changelog history.
  */
object CdcOps {

  /** Debezium envelope decode: JSON string column → flattened changelog
    * columns (op, key from after-or-before image). `carryCols` names
    * transport columns to keep alongside the envelope (e.g. the Kafka
    * `offset` for true binlog ordering in [[lastPerKey]]).
    */
  def decodeDebezium(df: DataFrame, rowSchema: StructType,
      carryCols: Seq[String] = Nil): DataFrame = {
    val envelope = StructType(Seq(
      org.apache.spark.sql.types.StructField("op", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("ts_ms", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("before", rowSchema),
      org.apache.spark.sql.types.StructField("after", rowSchema)))
    df.select(from_json(col("value").cast("string"), envelope).as("e") +:
        carryCols.map(col): _*)
      .select(Seq(col("e.op").as("op"), col("e.ts_ms").as("ts_ms"),
        col("e.before").as("before"), col("e.after").as("after")) ++
        carryCols.map(col): _*)
  }

  /** Keyed in-memory materialization target (the local stand-in for a
    * JDBC/ES/Delta keyed table; same last-write-wins + delete contract).
    */
  object StateStore {
    private val tables = TrieMap[String, TrieMap[String, Row]]()
    def table(name: String): TrieMap[String, Row] =
      tables.getOrElseUpdate(name, TrieMap())
    def clear(name: String): Unit = tables.remove(name)
  }

  /** In-batch reduce-to-last-per-key: drops tombstones/garbage, then
    * keeps the newest event per key ordered by ts_ms then `seqCol` when
    * given (pass the Kafka offset column for true binlog order — the
    * fallback monotonic id only breaks same-millisecond ties within a
    * partition, not across partitions). One shuffle keyed by the PK;
    * output is one (op, before, after) row per key — bounded by in-batch
    * key cardinality, never by changelog length.
    */
  def lastPerKey(batch: Dataset[Row], keyCols: Seq[String],
      seqCol: Option[String] = None): DataFrame = {
    val spark = batch.sparkSession
    import spark.implicits._
    batch
      .filter($"op".isNotNull &&
        ($"op" === "d" || col("after").isNotNull)) // drop tombstone/garbage
      .withColumn("__key", struct(keyCols.map(k =>
        coalesce(col(s"after.$k"), col(s"before.$k")).cast("string")
          .as(k)): _*))
      .withColumn("__seq",
        seqCol.map(col).getOrElse(monotonically_increasing_id()))
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"__key").orderBy($"ts_ms".desc, $"__seq".desc)))
      .filter($"__rn" === 1)
      .select($"__key", $"op", $"before", $"after")
  }

  /** foreachBatch function MERGE-ing a decoded changelog batch into
    * StateStore(table) — the TEST-ONLY stand-in for a keyed JDBC/Delta
    * table (the production path is [[applyChangelogJdbc]]). Batch rows
    * must carry (op, ts_ms, before, after). A Debezium tombstone follows
    * the 'd' event it shadows, so dropping it is safe.
    */
  def applyChangelog(table: String, keyCols: Seq[String],
      seqCol: Option[String] = None)(
      batch: Dataset[Row], batchId: Long): Unit = {
    val last = lastPerKey(batch, keyCols, seqCol)
      .select(col("__key"), col("op"), col("after"))
      .collect() // test-only store: one row per key per batch
    val t = StateStore.table(table)
    last.foreach { r =>
      // unambiguous key: struct values escaped + delimited (null-safe)
      val key = StreamOps.encodeKey(r.getStruct(0).toSeq)
      r.getString(1) match {
        case "d" => t.remove(key)
        case _   => t(key) = r.getStruct(2) // c / u / r upsert after-image
      }
    }
  }

  /** PRODUCTION changelog materialization: foreachBatch function MERGE-ing
    * a decoded changelog batch into a real keyed JDBC table through
    * [[graft.sqlgate.JdbcUpsert]] — demo_6's MySQL-CDC → keyed-upsert
    * pipeline (`demo_6.md:87-226`) with a transactional store instead of
    * the in-memory test stand-in. Upserts (c/u/r) flatten the after-image
    * and go through the spec's upsert dialect; deletes route the key
    * columns (before-image, original types) to a null-safe keyed DELETE.
    * All data movement is executor-side (foreachPartition inside
    * JdbcUpsert); nothing is collected to the driver. After the in-batch
    * reduce each key appears exactly once, so upsert-then-delete order
    * across *different* keys cannot conflict.
    */
  def applyChangelogJdbc(spec: graft.sqlgate.TableSpec, keyCols: Seq[String],
      seqCol: Option[String] = None)(
      batch: Dataset[Row], batchId: Long): Unit = {
    val last = lastPerKey(batch, keyCols, seqCol)
      // one row per key: safe to cache the tiny reduced frame for two scans
      .persist()
    try {
      val ups = last.filter(col("op") =!= "d").select(col("after.*"))
      if (!ups.isEmpty) graft.sqlgate.JdbcUpsert.upsert(ups, spec)
      val dels = last.filter(col("op") === "d").select(keyCols.map(k =>
        coalesce(col(s"before.$k"), col(s"after.$k")).as(k)): _*)
      if (!dels.isEmpty) graft.sqlgate.JdbcUpsert.delete(dels, spec)
    } finally { last.unpersist(); () }
  }

  /** Debezium envelope ENCODE — the changelog-out side (`upsert-kafka` /
    * `debezium-json` sink of demo_6.md:206-220): rows with an `op` column
    * become envelope JSON strings ready for a kafka value column.
    * Round-trips with [[decodeDebezium]].
    */
  def encodeDebezium(df: DataFrame, rowCols: Seq[String]): DataFrame = {
    val rowStruct = struct(rowCols.map(col): _*)
    df.select(to_json(struct(
      col("op"),
      col("ts_ms"),
      when(col("op") === "d", rowStruct).otherwise(lit(null)).as("before"),
      when(col("op") =!= "d", rowStruct).otherwise(lit(null)).as("after")
    )).as("value"))
  }

  /** Retraction-aware aggregate over the materialized state: register the
    * current state as a local DataFrame and aggregate it. Correct under
    * inserts, updates, and deletes because it aggregates state, not the
    * event stream.
    */
  def aggregateState(spark: org.apache.spark.sql.SparkSession, table: String,
      rowSchema: StructType): DataFrame = {
    val rows = StateStore.table(table).values.toSeq
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), rowSchema)
  }
}
