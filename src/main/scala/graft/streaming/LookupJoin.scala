package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions.broadcast

/** Processing-time temporal lookup join — the reference's
  * `FOR SYSTEM_TIME AS OF a.proctime` against a JDBC dim table with
  * `lookup.cache.max-rows` / cache TTL (`demo_3.md:66-109`). Spark
  * restatement per SURVEY §2.3: each micro-batch joins against a
  * periodically refreshed broadcast snapshot of the dimension — the
  * micro-batch boundary IS the processing-time semantics (rows in one
  * batch see one consistent dim version, refreshed per TTL).
  *
  * Scale notes: the snapshot is broadcast, so the stream side never
  * shuffles; `maxRows` guards against broadcasting an unexpectedly large
  * dim (fail fast rather than OOM executors) — the analog of the
  * reference's bounded lookup cache.
  */
final class DimSnapshot(spark: SparkSession, loader: SparkSession => DataFrame,
    ttlMs: Long, maxRows: Long = 1000000L) {

  @volatile private var cache: Option[(DataFrame, Long)] = None

  /** Current dim version: reloads (and re-caches) when the TTL lapsed. */
  def current(): DataFrame = synchronized {
    val now = System.currentTimeMillis()
    cache match {
      case Some((df, at)) if now - at < ttlMs => df
      case _ =>
        // Break lineage to the source: Spark recaches path-based caches
        // when the path is overwritten, which would silently roll the dim
        // forward mid-TTL. The dim is broadcast-bounded anyway, so a
        // driver-side materialization IS the snapshot (and what the
        // broadcast would ship regardless).
        val fresh = loader(spark)
        val probe = math.min(maxRows + 1, Int.MaxValue.toLong).toInt
        val rows = fresh.limit(probe).collect()
        if (rows.length > maxRows)
          throw new IllegalArgumentException(
            s"dim snapshot exceeds lookup cache bound $maxRows rows")
        val snapshot = spark.createDataFrame(
          java.util.Arrays.asList(rows: _*), fresh.schema)
        cache = Some((snapshot, now))
        snapshot
    }
  }

  def invalidate(): Unit = synchronized { cache = None }
}

object LookupJoin {

  /** foreachBatch wrapper: join each micro-batch against the snapshot's
    * current version (broadcast), then hand the enriched batch to the
    * sink function. Usage:
    *   stream.writeStream.foreachBatch(
    *     LookupJoin.enrich(snapshot, Seq("k"), "left")(batch => ...)).start()
    */
  def enrich(snapshot: DimSnapshot, usingCols: Seq[String], how: String)(
      sink: DataFrame => Unit): (Dataset[Row], Long) => Unit =
    (batch: Dataset[Row], _: Long) => {
      val dim = snapshot.current()
      sink(batch.join(broadcast(dim), usingCols, how))
    }
}
