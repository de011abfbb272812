package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** BM25 retrieval + TF-IDF keyword extraction ([[Search]]). */
class SearchSpec extends SparkSpec {

  import scala.math.BigDecimal.RoundingMode

  // the operator's exact per-addend arithmetic, replicated in plain
  // Scala doubles (same IEEE tree) + the dsum6 decimal truncation
  private def bm25Score(n: Long, total: Long,
      hits: Seq[(Long, Long, Long)] /* (tf, dl, df) */): Double = {
    val avgdl = total.toDouble / n
    hits.map { case (tf, dl, df) =>
      val idf = (2.0 * (n - df) + 1.0) / (2.0 * df + 1.0)
      val sat = (tf.toDouble * 2.2) /
        (tf.toDouble + 1.2 * (0.25 + 0.75 * dl / avgdl))
      BigDecimal(idf * sat).setScale(6, RoundingMode.HALF_UP)
    }.sum.toDouble
  }

  test("bm25TopK matches a hand-computed corpus exactly") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "cherry apple durian"),
      (4L, "durian durian durian kiwi")).toDF("doc_id", "text")
    val queries = Seq((100L, "apple durian")).toDF("qid", "qtext")

    val got = Search.bm25TopK(queries, corpus, "qid", "qtext",
      "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).sortBy(_._4)

    // N=4, total=12; df: apple=2, durian=2
    val s1 = bm25Score(4, 12, Seq((2L, 3L, 2L)))            // doc 1: apple tf2
    val s3 = bm25Score(4, 12, Seq((1L, 3L, 2L), (1L, 3L, 2L))) // doc 3: both
    val s4 = bm25Score(4, 12, Seq((3L, 4L, 2L)))            // doc 4: durian tf3
    // doc 3 matches two terms, doc 4 has the saturated tf=3 single term
    val expectTop2 = Seq((100L, 3L, s3), (100L, 4L, s4), (100L, 1L, s1))
      .sortBy { case (_, id, s) => (-s, id) }.take(2)
      .zipWithIndex.map { case ((q, d, s), i) => (q, d, s, i + 1) }
    assert(got.toSeq == expectTop2, s"got=${got.toSeq} want=$expectTop2")
  }

  test("index build tokenizes the corpus ONCE (stats reuse tf's " +
    "exchange) and scores stay deterministic across partitionings") {
    val docs = graft.Tables.load(spark, sf, "documents")
    val q = docs.filter(col("doc_id") % 7 === 0)
      .selectExpr("doc_id AS qid",
        "concat_ws(' ', slice(split(text, ' '), 1, 3)) AS qtext")
    val res = Search.bm25TopK(q, docs, "qid", "qtext", "doc_id", "text",
      k = 5)
    val rows = res.collect()
    assert(rows.nonEmpty)
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange") ||
      plan.contains("ReusedQueryStage"), plan)
    // column pruning reaches the parquet scan: the documents table has
    // 5 columns but the index needs only (doc_id, text)
    val reads = "ReadSchema: [^\n]+".r.findAllIn(plan).toList
    assert(reads.nonEmpty && reads.forall { r =>
      !r.contains("lang") && !r.contains("source") && !r.contains("n_chars")
    }, reads.mkString("\n"))
    // per-qid contract: ranks are 1..k' dense, scores non-increasing
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getInt(3))
      assert(byRank.map(_.getInt(3)).toSeq == (1 to rs.length))
      assert(byRank.sliding(2).forall {
        case Array(a, b) => a.getDouble(2) >= b.getDouble(2)
        case _ => true
      })
    }
    // repartitioning the inputs must not change a single score bit
    // (the dsum6 decimal sum is order-free)
    val rows2 = Search.bm25TopK(q.repartition(7), docs.repartition(5),
      "qid", "qtext", "doc_id", "text", k = 5)
      .collect()
    assert(rows2.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
      r.getInt(3))).toSet ==
      rows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).toSet)
  }

  test("queries with out-of-vocabulary terms return no rows; k " +
    "validated") {
    import spark.implicits._
    val corpus = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    val q = Seq((9L, "zzz qqq")).toDF("qid", "qtext")
    assert(Search.bm25TopK(q, corpus, "qid", "qtext", "doc_id", "text")
      .collect().isEmpty)
    val e = intercept[IllegalArgumentException] {
      Search.bm25TopK(q, corpus, "qid", "qtext", "doc_id", "text", k = 0)
    }
    assert(e.getMessage.contains("k must be"))
  }

  test("keywordsTfidf ranks corpus-distinctive terms first") {
    import spark.implicits._
    // 'rare' appears only in doc 1; 'common' in all three docs
    val corpus = Seq(
      (1L, "common rare common"),
      (2L, "common filler words"),
      (3L, "common more words")).toDF("doc_id", "text")
    val got = Search.keywordsTfidf(corpus, "doc_id", "text", k = 1)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got(1L) == "rare")
    // weight formula check for doc 1 / 'rare': tf/dl * odds idf
    val w = Search.keywordsTfidf(corpus, "doc_id", "text", k = 3)
      .filter(col("doc_id") === 1 && col("term") === "rare")
      .collect().head.getDouble(2)
    assert(w == (1.0 / 3) * ((2.0 * (3 - 1) + 1.0) / (2.0 * 1 + 1.0)))
  }
}
