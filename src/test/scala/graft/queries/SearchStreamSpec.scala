package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming BM25 probe ([[Search.bm25TopKStream]]): the row-local
  * frozen-index scoring must emit rows IDENTICAL to the batch
  * [[Search.bm25TopK]] over the same data — same addends, same
  * decimal-exact sums, same (score DESC, doc_id) order, same k cut —
  * plus the df-cap and contract edges.
  */
class SearchStreamSpec extends SparkSpec {

  private def stagedDocs(): String =
    StreamingGate.stagedTableDir(sf, "documents")

  private def drain(df: DataFrame, name: String): DataFrame = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(300000), s"$name drain timed out")
    q.stop()
    spark.table(name)
  }

  private def rows(df: DataFrame): Set[(Long, Long, Double, Int)] =
    df.collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("doc_id"),
      r.getAs[Double]("score"), r.getAs[Int]("rank"))).toSet

  private val qCarve = Seq("doc_id AS qid",
    "concat_ws(' ', slice(split(text, ' '), 1, 4)) AS qtext")

  test("streaming probe equals the batch scorer bit-for-bit") {
    val staged = stagedDocs()
    val schema = spark.read.parquet(staged).schema
    val corpus = spark.read.parquet(staged)
    val batchQ = corpus.filter(col("doc_id") % 97 === 3)
      .selectExpr(qCarve: _*)
    val streamQ = spark.readStream.schema(schema).parquet(staged)
      .filter(col("doc_id") % 97 === 3).selectExpr(qCarve: _*)
    val batch = rows(Search.bm25TopK(batchQ, corpus, "qid", "qtext",
      "doc_id", "text", k = 10))
    val streamed = rows(drain(Search.bm25TopKStream(streamQ, corpus,
      "qid", "qtext", "doc_id", "text", k = 10), "bm25_eq"))
    assert(batch.nonEmpty)
    assert(streamed == batch,
      s"stream-batch divergence: only-stream=${streamed -- batch} " +
        s"only-batch=${batch -- streamed}")
  }

  test("df cap drops stop-grade terms from scoring on both routes " +
    "identically") {
    val staged = stagedDocs()
    val schema = spark.read.parquet(staged).schema
    val corpus = spark.read.parquet(staged)
    val batchQ = corpus.filter(col("doc_id") % 97 === 3)
      .selectExpr(qCarve: _*)
    val streamQ = spark.readStream.schema(schema).parquet(staged)
      .filter(col("doc_id") % 97 === 3).selectExpr(qCarve: _*)
    val cap = Some(Search.OracleDfCap)
    val capped = rows(Search.bm25TopK(batchQ, corpus, "qid", "qtext",
      "doc_id", "text", k = 10, dfCap = cap))
    val uncapped = rows(Search.bm25TopK(batchQ, corpus, "qid", "qtext",
      "doc_id", "text", k = 10))
    // the cap must actually bite on the dense-vocabulary fixture —
    // stop-grade terms leave the scoring, so results change
    assert(capped != uncapped, "df cap had no effect — fixture drifted?")
    val streamedCapped = rows(drain(Search.bm25TopKStream(streamQ,
      corpus, "qid", "qtext", "doc_id", "text", k = 10, dfCap = cap),
      "bm25_cap_eq"))
    assert(streamedCapped == capped)
  }

  test("df cap semantics on a hand corpus: capped terms score zero, " +
    "stats stay uncapped") {
    import spark.implicits._
    // 'common' df=3 > cap=2 → dropped from scoring; 'rare' df=1 kept
    val corpus = Seq(
      (1L, "common rare"),
      (2L, "common filler"),
      (3L, "common other")).toDF("doc_id", "text")
    val q = Seq((9L, "common rare")).toDF("qid", "qtext")
    val got = Search.bm25TopK(q, corpus, "qid", "qtext", "doc_id",
      "text", k = 10, dfCap = Some(2L))
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    // only doc 1 scores (via 'rare'); 'common' matches contribute nothing
    assert(got.map(_._1).toSeq == Seq(1L))
    // idf uses the UNCAPPED corpus stats: N=3, df(rare)=1, dl=2, avgdl=2
    val idf = (2.0 * (3 - 1) + 1.0) / (2.0 * 1 + 1.0)
    val sat = (1.0 * 2.2) / (1.0 + 1.2 * (0.25 + 0.75 * 2 / 2.0))
    val exp = BigDecimal(idf * sat)
      .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.head._2 == exp)
    // a cap below every df returns no rows (and does not crash)
    assert(Search.bm25TopK(q, corpus, "qid", "qtext", "doc_id", "text",
      k = 10, dfCap = Some(0L + 1) /* df(rare)=1 survives */)
      .collect().map(_.getLong(1)).toSeq == Seq(1L))
    val e = intercept[IllegalArgumentException] {
      Search.bm25TopK(q, corpus, "qid", "qtext", "doc_id", "text",
        k = 10, dfCap = Some(0L))
    }
    assert(e.getMessage.contains("df cap"))
  }

  test("streaming probe rejects > maxTerms distinct terms loudly " +
    "(never silently truncates)") {
    val staged = stagedDocs()
    val schema = spark.read.parquet(staged).schema
    val corpus = spark.read.parquet(staged)
    val streamQ = spark.readStream.schema(schema).parquet(staged)
      .filter(col("doc_id") % 97 === 3)
      .selectExpr("doc_id AS qid", "text AS qtext") // full docs: >2 terms
    val probe = Search.bm25TopKStream(streamQ, corpus, "qid", "qtext",
      "doc_id", "text", k = 5, maxTerms = 2)
    val q = probe.writeStream.format("memory").queryName("bm25_over")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    val e = intercept[Exception] { q.awaitTermination(300000) }
    try q.stop() catch { case _: Throwable => () }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("distinct query terms")),
      msgs(e).mkString(" | "))
  }

  test("a streaming corpus is rejected loudly; batch query side too") {
    val staged = stagedDocs()
    val schema = spark.read.parquet(staged).schema
    val streaming = spark.readStream.schema(schema).parquet(staged)
    val e = intercept[IllegalArgumentException] {
      Search.bm25TopKStream(streaming, streaming, "qid", "qtext",
        "doc_id", "text")
    }
    assert(e.getMessage.contains("BOUNDED"))
    val batch = spark.read.parquet(staged)
    val e2 = intercept[IllegalArgumentException] {
      Search.bm25TopKStream(batch, batch, "qid", "qtext", "doc_id",
        "text")
    }
    assert(e2.getMessage.contains("streaming query side"))
  }
}
