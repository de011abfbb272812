package graft.queries

import scala.util.Random

import graft.SparkSpec

/** The rank-table mapPartitions BPE encoder ([[TextAnalysis.bpeEncodeLarge]])
  * vs the codegen replace chain it must be bit-equal to, plus the
  * replace chain's merge-count guard and the TOKENIZE surface's size
  * routing. The chain is DEFINITIONAL (it replays the trainer, which
  * the DuckDB oracle unrolls), so every divergence is a large-encoder
  * bug by construction.
  */
class TokenizeLargeVocabSpec extends SparkSpec {

  private val Glue = ""

  private def both(docs: Seq[String], merges: Seq[(String, String)])
      : (Seq[(Long, Long, String)], Seq[(Long, Long, String)]) = {
    import spark.implicits._
    val df = docs.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .sortBy(_._1).toSeq
    (rows(TextAnalysis.bpeEncodeChain(df, "doc_id", "text", merges)),
      rows(TextAnalysis.bpeEncodeLarge(df, "doc_id", "text", merges)))
  }

  test("large encoder equals the chain on trained tables, random corpora") {
    val rnd = new Random(18)
    for (trial <- 1 to 4) {
      import spark.implicits._
      val vocab = (0 until (2 + rnd.nextInt(5))).map(i => s"w$i")
      val docs = Seq.fill(15 + rnd.nextInt(30)) {
        Seq.fill(2 + rnd.nextInt(25))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" ")
      }
      // deep tables: small vocabularies force repeated symbols,
      // overlapping runs, and merges that reference merged symbols
      val rounds = 8 + rnd.nextInt(17)
      val merges =
        TextAnalysis.bpeMergeList(docs.toDF("text"), "text", rounds)
      val (chain, large) = both(docs, merges)
      assert(large == chain, s"trial $trial (rounds=$rounds)")
    }
  }

  test("large encoder equals the chain on adversarial hand corpora") {
    import spark.implicits._
    // overlapping runs (left-to-right non-overlapping within a rank),
    // suffix/prefix symbol overlap (the anchored-replace corpora),
    // empty docs, single-word docs
    val docs = Seq("a a a a a", "a a", "xa b a b", "b cy b c",
      "a b c a b a b c", "", "solo", "a b")
    val merges = TextAnalysis.bpeMergeList(
      docs.filter(_.nonEmpty).toDF("text"), "text", 5)
    val (chain, large) = both(docs, merges)
    assert(large == chain)
    // the chain's exact render survives: boundary pipes + glue as space
    assert(chain.find(_._3 == "||").isDefined) // the empty doc
  }

  test("minRank pins chain order when a merge recreates an earlier pair") {
    // synthetic table where rank 2's merge creates the exact string
    // rank 1's pair references: the chain ran pass 1 BEFORE that
    // string existed and never revisits, so (z, x·y·u) must stay
    // unmerged; a naive heap loop would resurrect rank 1 and collapse
    // the doc to one token
    val merges = Seq(("x", "y"), ("z", s"x${Glue}y${Glue}u"),
      (s"x${Glue}y", "u"))
    val (chain, large) = both(Seq("z x y u"), merges)
    assert(chain.head._2 == 2L && chain.head._3 == "|z|x y u|")
    assert(large == chain)
  }

  /** Left-leaning synthetic chain: rank i merges the length-(i+1)
    * prefix symbol with the next word, so a matching doc exercises
    * every rank in sequence through both encoders.
    */
  private def chainTable(n: Int): Seq[(String, String)] =
    (0 until n).map { i =>
      ((0 to i).map(j => s"w$j").mkString(Glue), s"w${i + 1}")
    }

  test("replace-chain guard: 64 passes, 65 throws loudly") {
    import spark.implicits._
    val df = Seq((0L, (0 to 65).map(j => s"w$j").mkString(" ")))
      .toDF("doc_id", "text")
    // boundary: exactly the cap is fine
    val ok = TextAnalysis.bpeEncode(df, "doc_id", "text", chainTable(64))
      .collect()
    assert(ok.head.getLong(1) == 2L) // w0..w63 collapsed + w65... w64 merged in; 66 words - 64 merges
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.bpeEncode(df, "doc_id", "text", chainTable(65))
    }
    assert(e.getMessage.contains("65 merges exceeds the 64 cap"))
    assert(e.getMessage.contains("bpeEncodeLarge"))
  }

  test("TOKENIZE surface routes large tables to mapPartitions, bit-equal") {
    import spark.implicits._
    val words = (0 to 70).map(j => s"w$j")
    val docs = Seq(words.mkString(" "), words.take(10).mkString(" "),
      "w5 w6 w7", "unrelated words here")
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val table = chainTable(65)
    val auto = TextAnalysis.bpeEncodeAuto(df, "doc_id", "text", table)
    // past the cap the router must pick the object path, not the chain
    assert(auto.queryExecution.executedPlan.toString
      .contains("MapPartitions"))
    val viaChain = TextAnalysis
      .bpeEncodeChain(df, "doc_id", "text", table).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._1)
    val viaAuto = auto.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._1)
    assert(viaAuto.toSeq == viaChain.toSeq)
    // at or under the cap the router keeps the codegen chain
    val small = TextAnalysis.bpeEncodeAuto(df, "doc_id", "text",
      chainTable(8))
    assert(!small.queryExecution.executedPlan.toString
      .contains("MapPartitions"))
  }
}
