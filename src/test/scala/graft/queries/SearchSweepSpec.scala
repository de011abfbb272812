package graft.queries

import graft.SparkSpec
import scala.util.Random

/** Randomized BM25 equivalence sweep: [[Search.bm25TopK]] against an
  * independent brute-force Scala reference (same arithmetic, computed
  * per query over the whole corpus with no posting index, no window,
  * no decimal-sum shortcut beyond the contract's) across random
  * corpora, query shapes, and k — the adversarial-generator pattern
  * that caught the keyed-rewrite alias hole in r13. Exercises empty
  * queries, out-of-vocabulary terms, repeated terms (de-dup
  * contract), ties (deterministic doc_id break), and k larger than
  * the match set.
  */
class SearchSweepSpec extends SparkSpec {

  private val Vocab = Vector("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta", "iota", "kappa", "mu", "nu")

  private def refBm25(corpus: Seq[(Long, String)],
      queries: Seq[(Long, String)], k: Int): Set[(Long, Long, Double, Int)] = {
    import scala.math.BigDecimal.RoundingMode
    val docs = corpus.map { case (id, t) => (id, t.split(" ", -1).toSeq) }
    val n = docs.length.toLong
    val totalTok = docs.map(_._2.length.toLong).sum
    val avgdl = totalTok.toDouble / n
    val df = docs.flatMap { case (_, w) => w.distinct }
      .groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    // the contract dedups (qid, term) across the whole relation, so a
    // duplicated qid row merges its terms rather than double-counting
    val qTerms = queries.groupBy(_._1).view.mapValues(
      _.flatMap(_._2.split(" ", -1)).distinct).toSeq
    val out = for {
      (qid, terms) <- qTerms
      scored = docs.flatMap { case (docId, w) =>
        val addends = terms.flatMap { term =>
          val tf = w.count(_ == term).toLong
          if (tf == 0 || !df.contains(term)) None
          else {
            val d = df(term)
            val dl = w.length.toLong
            val idf = (2.0 * (n - d) + 1.0) / (2.0 * d + 1.0)
            val sat = (tf.toDouble * 2.2) /
              (tf.toDouble + 1.2 * (0.25 + 0.75 * dl / avgdl))
            Some(BigDecimal(idf * sat).setScale(6, RoundingMode.HALF_UP))
          }
        }
        if (addends.isEmpty) None
        else Some((docId, addends.sum.toDouble))
      }
      ((docId, score), i) <- scored
        .sortBy { case (d, s) => (-s, d) }.take(k).zipWithIndex
    } yield (qid, docId, score, i + 1)
    out.toSet
  }

  test("bm25TopK equals the brute-force reference over 25 random " +
    "corpora (ties, dup terms, OOV, k overshoot)") {
    import spark.implicits._
    val rnd = new Random(20260815L)
    for (round <- 1 to 25) {
      val nDocs = 1 + rnd.nextInt(12)
      val corpus = (0 until nDocs).map { i =>
        val len = 1 + rnd.nextInt(8)
        (i.toLong, Seq.fill(len)(Vocab(rnd.nextInt(
          // small vocab slice → frequent ties and repeats
          2 + rnd.nextInt(Vocab.length - 2)))).mkString(" "))
      }
      val nQ = 1 + rnd.nextInt(4)
      val queries = (0 until nQ).map { i =>
        val len = 1 + rnd.nextInt(4)
        val terms = Seq.fill(len)(
          if (rnd.nextBoolean()) Vocab(rnd.nextInt(Vocab.length))
          else "oov" + rnd.nextInt(3)) // some out-of-vocabulary
        // ~1/3 of rows REUSE a qid: duplicate qid rows must merge
        // their distinct terms, never double-count
        val qid = if (rnd.nextInt(3) == 0) 100L else (100 + i).toLong
        (qid, terms.mkString(" "))
      }
      val k = 1 + rnd.nextInt(nDocs + 2) // sometimes > matchable docs
      val got = Search.bm25TopK(
        queries.toDF("qid", "qtext"), corpus.toDF("doc_id", "text"),
        "qid", "qtext", "doc_id", "text", k)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getInt(3))).toSet
      val want = refBm25(corpus, queries, k)
      assert(got == want,
        s"round $round diverged (nDocs=$nDocs k=$k):\n" +
          s"  only-spark=${got -- want}\n  only-ref=${want -- got}\n" +
          s"  corpus=$corpus\n  queries=$queries")
    }
  }
}
