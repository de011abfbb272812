package graft.queries

import graft.SparkSpec
import org.apache.spark.storage.StorageLevel

/** [[StaticIndexCache]] semantics: at-most-once builds, superseded-
  * version eviction with unpersist, and build-outside-map-locks
  * (nested builds must not deadlock or throw recursive-update).
  */
class StaticIndexCacheSpec extends SparkSpec {
  import spark.implicits._

  private def freshCorpusDir(label: String): String = {
    val dir = java.nio.file.Files.createTempDirectory("sic_spec").toString
    Seq((1L, label), (2L, label)).toDF("id", "text")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("same-prefix version bump replaces the superseded entry and " +
    "unpersists its frames") {
    StaticIndexCache.clear()
    val dir = freshCorpusDir("v1")
    def key() = StaticIndexCache.corpusKey(spark,
      spark.read.parquet(dir), "spec_fam", 42)
    val first = StaticIndexCache.getOrBuild[
        org.apache.spark.sql.DataFrame](key()) {
      val f = spark.range(5).toDF("n").persist(StorageLevel.MEMORY_AND_DISK)
      f.count()
      f
    }
    assert(StaticIndexCache.size == 1)
    assert(first.storageLevel != StorageLevel.NONE)
    // same prefix, same version → cache hit, no rebuild
    var rebuilt = false
    val again = StaticIndexCache.getOrBuild[
        org.apache.spark.sql.DataFrame](key()) { rebuilt = true; first }
    assert(!rebuilt && (again eq first))
    // overwrite the corpus AT THE SAME PATH → version bump: the entry
    // is REPLACED (size stays flat — no per-version accumulation) and
    // the superseded frame's block-manager pin is released
    Seq((9L, "v2")).toDF("id", "text").write.mode("overwrite").parquet(dir)
    val second = StaticIndexCache.getOrBuild[
        org.apache.spark.sql.DataFrame](key()) {
      val f = spark.range(7).toDF("n").persist(StorageLevel.MEMORY_AND_DISK)
      f.count()
      f
    }
    assert(StaticIndexCache.size == 1,
      "superseded corpus version must be evicted, not accumulated")
    assert(second ne first)
    assert(first.storageLevel == StorageLevel.NONE,
      "superseded entry's persisted frame must be unpersisted")
    assert(second.storageLevel != StorageLevel.NONE)
  }

  test("superseded entries' tmp dirs are reclaimed after the grace " +
    "window while an in-flight scan over the old index completes") {
    StaticIndexCache.clear()
    val prevGrace = sys.props.get("graft.index.tmpGraceMs")
    // The in-flight assert below runs AFTER the live rebuild (a full
    // parquet write + read) completes, so the grace must cover that
    // build even on a host saturated by parallel suites — 700 ms flaked
    // exactly once under a full `sbt test` load (r18); 4 s keeps the
    // assertion meaningful (reap still verified within the 20 s poll)
    // without racing the scheduler.
    sys.props("graft.index.tmpGraceMs") = "4000"
    try {
      val dir = freshCorpusDir("g1")
      def key() = StaticIndexCache.corpusKey(spark,
        spark.read.parquet(dir), "grace_fam", 7)
      def buildIndexed(rows: Int): (org.apache.spark.sql.DataFrame,
          java.nio.file.Path) =
        StaticIndexCache.getOrBuild[(org.apache.spark.sql.DataFrame,
            java.nio.file.Path)](key()) {
          val d = StaticIndexCache.newTmpDir("sic_grace_idx")
          spark.range(rows).toDF("n").write.parquet(s"$d/idx")
          (spark.read.parquet(s"$d/idx"), d)
        }
      // refresh the corpus N times at the same path: each bump
      // supersedes the previous entry and schedules its dir
      val dirs = (1 to 3).map { i =>
        val (_, d) = buildIndexed(5 + i)
        Seq((i.toLong, s"g${i + 1}")).toDF("id", "text")
          .write.mode("overwrite").parquet(dir)
        d
      }
      // force the build against the last refresh too
      val (liveIdx, liveDir) = buildIndexed(99)
      assert(StaticIndexCache.size == 1)
      // IN-FLIGHT window: immediately after ITS eviction, a superseded
      // dir still exists — a query planned against the old index can
      // finish its scan. (Only the most recent eviction is guaranteed
      // inside the window here; earlier ones may already have aged out
      // while later builds ran.)
      assert(java.nio.file.Files.exists(dirs.last),
        "a just-superseded dir must survive the grace window")
      // after the grace elapses, every superseded dir is gone while
      // the LIVE entry's dir (and its scannable data) remain
      val deadline = System.currentTimeMillis() + 20000
      while (dirs.exists(d => java.nio.file.Files.exists(d)) &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(dirs.forall(d => !java.nio.file.Files.exists(d)),
        "superseded dirs must be reclaimed after the grace window")
      assert(java.nio.file.Files.exists(liveDir))
      assert(liveIdx.count() == 99)
    } finally {
      prevGrace match {
        case Some(v) => sys.props("graft.index.tmpGraceMs") = v
        case None => sys.props.remove("graft.index.tmpGraceMs")
      }
      StaticIndexCache.clear()
    }
  }

  test("builds run outside the map's locks: a nested getOrBuild inside " +
    "a build closure works, and racing same-key builders build once") {
    StaticIndexCache.clear()
    val built = new java.util.concurrent.atomic.AtomicInteger()
    // nested build of a DIFFERENT key inside a build closure — under
    // computeIfAbsent this was a recursive-update IllegalStateException
    val outer = StaticIndexCache.getOrBuild[String]("outer_key") {
      StaticIndexCache.getOrBuild[String]("inner_key") {
        built.incrementAndGet(); "inner"
      } + "+outer"
    }
    assert(outer == "inner+outer" && built.get() == 1)
    assert(StaticIndexCache.size == 2)
    // racing builders of the SAME key: at most one build runs
    built.set(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val results = (1 to 8).map { _ =>
        pool.submit(new java.util.concurrent.Callable[String] {
          def call(): String =
            StaticIndexCache.getOrBuild[String]("race_key") {
              Thread.sleep(50); built.incrementAndGet(); "built"
            }
        })
      }
      assert(results.map(_.get()).forall(_ == "built"))
      assert(built.get() == 1, s"same-key race built ${built.get()} times")
    } finally pool.shutdown()
  }
}
