package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deletion-neighborhood fuzzy join ([[Joins.fuzzySelfJoin]]): the blocked
  * join must reproduce the naive all-pairs levenshtein filter exactly —
  * the blocking is a lossless candidate generator, the verify is the
  * exact predicate.
  */
class FuzzyJoinSpec extends SparkSpec {

  private def naive(df: DataFrame, k: Int): Set[(Long, Long, Long)] = {
    val a = df.select(col("id").as("ida"), col("name").as("na"))
    val b = df.select(col("id").as("idb"), col("name").as("nb"))
    a.crossJoin(b)
      .filter(col("ida") < col("idb"))
      .withColumn("dist", levenshtein(col("na"), col("nb")).cast("long"))
      .filter(col("dist") <= k)
      .collect()
      .map(r => (r.getAs[Long]("ida"), r.getAs[Long]("idb"),
        r.getAs[Long]("dist"))).toSet
  }

  private def blocked(df: DataFrame, k: Int): Set[(Long, Long, Long)] =
    Joins.fuzzySelfJoin(df, k).collect()
      .map(r => (r.getAs[Long]("ida"), r.getAs[Long]("idb"),
        r.getAs[Long]("dist"))).toSet

  private def frame(names: Seq[String]): DataFrame = {
    import spark.implicits._
    names.zipWithIndex.map { case (n, i) => (i.toLong, n) }.toDF("id", "name")
  }

  // every edit type at every position class: substitution (head, middle,
  // tail), insertion, deletion, transposition (= distance 2 in plain
  // levenshtein), short strings, the empty string, repeated-char runs
  // (several distinct edit scripts produce the same pair), and exact
  // duplicates (distance 0 — still a pair the naive spec emits)
  private val corpus = Seq(
    "kitten", "sitten", "sittin", "sitting", "itten", "kittens",
    "a", "b", "", "ab", "ba", "abc",
    "aaaa", "aaab", "aaa",
    "same", "same",
    "Customer#000000001", "Customer#000000002", "Customer#000000011",
    "Customer#00000001")

  test("k=1: blocked join equals the naive all-pairs filter") {
    val df = frame(corpus)
    assert(blocked(df, 1) == naive(df, 1))
  }

  test("k=2: two-deletion neighborhood still lossless") {
    val df = frame(corpus)
    val n = naive(df, 2)
    assert(n.exists(_._3 == 2L), "fixture must exercise distance-2 pairs")
    assert(blocked(df, 2) == n)
  }

  test("randomized corpora: lossless under arbitrary near-duplicate soup") {
    val rnd = new scala.util.Random(1387)
    val alpha = "abcd" // tiny alphabet → dense near-pairs
    def word() = (0 until (1 + rnd.nextInt(7)))
      .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    for (round <- 1 to 5) {
      val df = frame(Seq.fill(40)(word()))
      for (k <- 1 to 2) {
        val (b, n) = (blocked(df, k), naive(df, k))
        assert(b == n, s"round $round k=$k: blocked $b != naive $n")
      }
    }
  }

  test("shared-prefix skew: candidate volume stays near the match count") {
    // all rows share a 9-char prefix — the shape that collapses
    // prefix/segment blocking into one O(n²) bucket. Deletion variants
    // key on the WHOLE string, so candidate pairs stay ~matches.
    import spark.implicits._
    val df = (1 to 300).map(i => (i.toLong, f"Customer#$i%09d"))
      .toDF("id", "name")
    val res = Joins.fuzzySelfJoin(df, 1)
    val matches = res.count()
    assert(matches > 0)
    assert(blocked(df, 1) == naive(df, 1))
    // and the plan is the hash join on the variant key, never a
    // cartesian product
    val plan = res.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"fuzzy join fell back to a cartesian product:\n$plan")
  }

  test("cross kernel: blocked slice-vs-corpus equals naive, batch AND " +
    "streaming micro-batch splits, each pair exactly once") {
    import spark.implicits._
    val corpusDf = frame(corpus ++ Seq("extra", "extrb"))
    val incomingRows = Seq((100L, "kitten"), (101L, "sittin"),
      (102L, "zzz"), (103L, "same"), (104L, ""), (105L, "aaab"))
    val incoming = incomingRows.toDF("id", "name")
    val naiveCross = incoming.select(col("id").as("ida"), col("name").as("na"))
      .crossJoin(corpusDf.select(col("id").as("idb"), col("name").as("nb")))
      .withColumn("dist", levenshtein(col("na"), col("nb")).cast("long"))
      .filter(col("dist") <= 1)
      .select("ida", "idb", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(naiveCross.nonEmpty)
    val batch = Joins.fuzzyCrossJoin(incoming, corpusDf, 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(batch.length == batch.toSet.size, "pair emitted twice (batch)")
    assert(batch.toSet == naiveCross)

    // streaming incoming, split across micro-batches — stateless plan:
    // nothing about batch 1 can suppress batch 2's rows
    implicit val sqlCtx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = Joins.fuzzyCrossJoin(in.toDS().toDF("id", "name"), corpusDf, 1)
      .writeStream.format("memory").queryName("fuzzy_cross_eq")
      .outputMode("append").start()
    try {
      in.addData(incomingRows.take(3): _*)
      q.processAllAvailable()
      in.addData(incomingRows.drop(3): _*)
      q.processAllAvailable()
      val got = spark.table("fuzzy_cross_eq").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(got.length == got.toSet.size, "pair emitted twice (stream)")
      assert(got.toSet == naiveCross,
        s"only-stream=${got.toSet -- naiveCross} " +
          s"only-naive=${naiveCross -- got.toSet}")
    } finally q.stop()
    // and a streaming corpus is rejected loudly
    val e = intercept[IllegalArgumentException] {
      Joins.fuzzyCrossJoin(incoming,
        in.toDS().toDF("id", "name"), 1)
    }
    assert(e.getMessage.contains("BOUNDED"))
  }

  test("k=1 long-string guard fails loudly naming the right tool") {
    // a document body accidentally bound to the key descriptor must
    // fail with a diagnostic, not stall in an O(n²) per-row loop
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val doc = "x" * 20001
    val ex = intercept[Exception] {
      Seq(doc).toDF("name")
        .selectExpr("deletion_variants(name, 1)").collect()
    }
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + chain(t.getCause)
    assert(chain(ex).contains("MinHash"),
      s"unexpected diagnostic: ${chain(ex)}")
  }

  test("non-literal k is an analysis error, not a runtime crash") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val df = Seq((1L, "ab")).toDF("id", "name")
    val exCol = intercept[org.apache.spark.sql.AnalysisException] {
      df.selectExpr("deletion_variants(name, id)").collect()
    }
    assert(exCol.getMessage.contains("integer literal"),
      s"unexpected: ${exCol.getMessage}")
    val exStr = intercept[org.apache.spark.sql.AnalysisException] {
      df.selectExpr("deletion_variants(name, 'two')").collect()
    }
    assert(exStr.getMessage.contains("integer literal"),
      s"unexpected: ${exStr.getMessage}")
  }
}
