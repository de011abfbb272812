package graft.queries

import java.security.MessageDigest

import graft.SparkSpec

/** ExactSubstr removal boundaries on a hand corpus: a shared 10-gram
  * removes exactly its covered positions, unshared tails survive, docs
  * without cross-doc grams are untouched, and a fully-shared doc empties
  * to md5(""). The full-corpus behavior is pinned by the DuckDB oracle;
  * this spec pins the POLICY on cases small enough to check by hand.
  */
class SubstrApplySpec extends SparkSpec {

  private def md5(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("shared-span removal keeps exactly the uncovered tail") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("substr_apply").toString
    val shared = "a b c d e f g h i j" // one 10-gram, shared by docs 1+2
    Seq(
      (1L, s"$shared tail1 tail2"),
      (2L, s"$shared x y"),
      (3L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11"), // no cross-doc gram
      (4L, shared) // fully covered — empties out
    ).toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val rows = graft.SparkEntry.queries("q_dedup_substr_apply")(spark, dir)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(rows(1L) == ((2L, 10L, md5("tail1 tail2"))))
    assert(rows(2L) == ((2L, 10L, md5("x y"))))
    assert(rows(3L) == ((11L, 0L, md5("u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11"))))
    assert(rows(4L) == ((0L, 10L, md5(""))))
  }

  test("overlapping shared spans merge their coverage") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("substr_apply2").toString
    // docs share an 11-word run -> two overlapping 10-grams in each;
    // coverage is the union (all 11 words), keeping only the tails
    val run = "p q r s t u v w x y z"
    Seq((1L, s"$run keepA"), (2L, s"$run keepB"))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val rows = graft.SparkEntry.queries("q_dedup_substr_apply")(spark, dir)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(rows(1L) == ((1L, 11L, md5("keepA"))))
    assert(rows(2L) == ((1L, 11L, md5("keepB"))))
  }

  test("stop-gram dfCap: capped kernels match uncapped below the cap, " +
    "drop above it, and prune hot grams before the h-exchange") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // one boilerplate 10-gram in EVERY doc (df=4) + one pair-shared
    // gram (df=2); distinct leading token keeps the grams distinct
    val boiler = "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10"
    val pair = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10"
    val docs = Seq(
      (1L, s"$boiler $pair"), (2L, s"$boiler $pair"),
      (3L, s"$boiler only3a only3b"), (4L, s"$boiler only4a only4b"))
      .toDF("doc_id", "text")

    // cap >= 4 keeps every gram: identical rows to the uncapped kernel
    val uncapped = Dedup.substrDupStats(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val capHigh = Dedup.substrDupStats(docs, dfCap = Some(4L)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(uncapped.toSeq == capHigh.toSeq)

    // cap = 3 drops the boilerplate gram (df=4) from both counts:
    // docs 1/2 keep the pair-shared gram chain, docs 3/4 keep only
    // their private grams (n_dup 0)
    val capped = Dedup.substrDupStats(docs, dfCap = Some(3L)).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(capped(3L)._2 == 0L && capped(4L)._2 == 0L)
    assert(capped(1L)._2 > 0L && capped(1L) == capped(2L))

    // the capped plan prunes hot grams with a BROADCAST anti-join
    // BEFORE the h-exchange (the straggler escape), and the apply
    // variant stops removing the boilerplate span once it's capped
    val plan = Dedup.substrDupStats(docs, dfCap = Some(3L))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("LeftAnti"), plan.take(3000))
    // doc1 = boiler ++ pair (20 words): gram pos 0 is pure boilerplate
    // (df=4, capped away); pos 1..10 mix into the pair's tokens and are
    // shared ONLY by docs 1/2 (df=2, kept) — so the removal set is
    // exactly 1..10 and doc 3 (no surviving dup gram) has no row
    val starts = Dedup.substrDupStarts(docs, dfCap = Some(3L))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(starts(1L).toSet == (1 to 10).toSet && !starts.contains(3L),
      starts.toString)
  }
}
