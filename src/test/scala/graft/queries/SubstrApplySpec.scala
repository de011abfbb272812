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
}
