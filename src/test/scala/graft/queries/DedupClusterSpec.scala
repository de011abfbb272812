package graft.queries

import graft.{SparkSpec, SparkEntry}

/** Connected-components clustering: both lineage-truncation modes
  * (executor-local blocks for local runs, reliable checkpoint for
  * cluster jobs) must converge to identical labels, and the gate query's
  * observed LSH plan must survive the self-union the edge expansion does.
  */
class DedupClusterSpec extends SparkSpec {

  private def labelsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet

  test("local and reliable checkpoint modes converge to the same labels") {
    import spark.implicits._
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("graft_ckpt").toString)
    // chain of diameter 3 forces several propagation rounds; the second
    // component pins that labels don't bleed across components
    val pairs = Seq((4L, 3L), (3L, 2L), (2L, 1L), (10L, 11L))
      .toDF("ida", "idb")
    val expected = Set(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false), (4L, 1L, false),
      (10L, 10L, true), (11L, 10L, false))
    assert(labelsOf(Dedup.connectedComponents(pairs, reliable = false))
      == expected)
    assert(labelsOf(Dedup.connectedComponents(pairs, reliable = true))
      == expected)
  }

  test("reliable mode without a checkpoint dir fails fast") {
    import spark.implicits._
    val saved = spark.sparkContext.getCheckpointDir
    // SparkContext has no unset API; only run the guard check when no
    // other test has set a dir yet
    if (saved.isEmpty) {
      val pairs = Seq((1L, 2L)).toDF("ida", "idb")
      intercept[IllegalArgumentException] {
        Dedup.connectedComponents(pairs, reliable = true)
      }
    }
  }

  test("q_dedup_cluster analyzes and runs (observed LSH plan self-union)") {
    // the edges expansion unions the observe()'d candidate plan with its
    // flip — duplicate CollectMetrics names are only legal for identical
    // subtrees, so this pins that the cap accounting survives reuse
    val out = SparkEntry.queries("q_dedup_cluster")(spark, sf)
    assert(out.columns.toSeq == Seq("doc_id", "cluster", "is_keeper"))
    out.collect() // must not throw; sf0.001 may legitimately be empty
  }
}
