package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import scala.collection.mutable

final case class Click(k: Int, page: String)

/** Temporal lookup join: per-micro-batch dim resolution, TTL-driven
  * refresh, bounded cache (demo_3 lookup semantics).
  */
class LookupJoinSpec extends SparkSpec {

  test("micro-batches see the dim version current at processing time") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dimDir = java.nio.file.Files.createTempDirectory("dim").toString
    Seq((1, "alpha"), (2, "beta")).toDF("k", "name")
      .coalesce(1).write.mode("overwrite").parquet(dimDir)

    // ttl=0 → every batch reloads (lookup.cache disabled, demo_3 default)
    val snap = new DimSnapshot(spark, _.read.parquet(dimDir), ttlMs = 0L)
    val out = mutable.Buffer[(Int, String, String)]()
    val in = MemoryStream[Click]
    val q = in.toDF().writeStream
      .foreachBatch(LookupJoin.enrich(snap, Seq("k"), "left") { b =>
        out.synchronized {
          out ++= b.select("k", "page", "name")
            .as[(Int, String, String)].collect()
        }
      })
      .start()
    try {
      in.addData(Click(1, "/home"))
      q.processAllAvailable()
      assert(out.toSet == Set((1, "/home", "alpha")))

      // dim updated between batches → next batch sees the new version
      Seq((1, "ALPHA2"), (2, "beta")).toDF("k", "name")
        .coalesce(1).write.mode("overwrite").parquet(dimDir)
      in.addData(Click(1, "/again"), Click(3, "/miss"))
      q.processAllAvailable()
      assert(out.toSet == Set(
        (1, "/home", "alpha"), (1, "/again", "ALPHA2"), (3, "/miss", null)))
    } finally q.stop()
  }

  test("TTL caches the snapshot; invalidate forces refresh") {
    import spark.implicits._
    val dimDir = java.nio.file.Files.createTempDirectory("dim2").toString
    Seq((1, "v1")).toDF("k", "name").coalesce(1)
      .write.mode("overwrite").parquet(dimDir)
    val snap = new DimSnapshot(spark, _.read.parquet(dimDir), ttlMs = 3600000L)
    assert(snap.current().as[(Int, String)].collect().head == ((1, "v1")))
    Seq((1, "v2")).toDF("k", "name").coalesce(1)
      .write.mode("overwrite").parquet(dimDir)
    // within TTL: still v1
    assert(snap.current().as[(Int, String)].collect().head == ((1, "v1")))
    snap.invalidate()
    assert(snap.current().as[(Int, String)].collect().head == ((1, "v2")))
  }

  test("cache bound: oversized dim fails fast instead of broadcasting") {
    import spark.implicits._
    val dimDir = java.nio.file.Files.createTempDirectory("dim3").toString
    spark.range(100).toDF("k").write.mode("overwrite").parquet(dimDir)
    val snap = new DimSnapshot(spark, _.read.parquet(dimDir),
      ttlMs = 0L, maxRows = 10L)
    val e = intercept[IllegalArgumentException] { snap.current() }
    assert(e.getMessage.contains("lookup cache bound"))
  }
}
