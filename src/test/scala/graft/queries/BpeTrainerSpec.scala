package graft.queries

import scala.collection.mutable
import scala.util.Random

import graft.SparkSpec

/** The distributed BPE trainer vs a plain-Scala reference: greedy
  * left-to-right non-overlapping merges, argmax tie-broken by
  * (count desc, "a b" string asc) — the exact loop the DuckDB oracle
  * unrolls. Property-swept on seeded random corpora whose small
  * vocabularies force repeated symbols, overlapping runs (a a a), and
  * count ties.
  */
class BpeTrainerSpec extends SparkSpec {

  private val Glue = "\u0002"

  private def reference(docs: Seq[String], rounds: Int)
      : Seq[(Int, String, String, Long)] = {
    var corpus: Seq[Vector[String]] = docs.map(_.split(" ").toVector)
    val out = mutable.ArrayBuffer[(Int, String, String, Long)]()
    for (r <- 1 to rounds) {
      val counts = mutable.Map[(String, String), Long]().withDefaultValue(0L)
      corpus.foreach { w =>
        var i = 0
        while (i + 1 < w.length) {
          counts((w(i), w(i + 1))) += 1; i += 1
        }
      }
      val ((a, b), c) = counts.toSeq
        .sortBy { case ((x, y), n) => (-n, x + " " + y) }.head
      out += ((r, a, b, c))
      corpus = corpus.map { w =>
        val buf = Vector.newBuilder[String]
        var i = 0
        while (i < w.length) {
          if (i + 1 < w.length && w(i) == a && w(i + 1) == b) {
            buf += a + Glue + b; i += 2
          } else { buf += w(i); i += 1 }
        }
        buf.result()
      }
    }
    out.toSeq
  }

  private def trained(docs: Seq[String], rounds: Int)
      : Seq[(Int, String, String, Long)] = {
    import spark.implicits._
    TextAnalysis.bpeMerges(docs.toDF("text"), "text", rounds)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq
  }

  test("trainer matches the reference on adversarial hand corpora") {
    // overlapping runs: greedy left-to-right must merge [a,a,a] -> [aa,a]
    assert(trained(Seq("a a a a a", "a a"), 2) ==
      reference(Seq("a a a a a", "a a"), 2))
    // ties everywhere: resolved by pair-string ascending
    assert(trained(Seq("b a", "a b", "c a", "a c"), 3) ==
      reference(Seq("b a", "a b", "c a", "a c"), 3))
    // merged symbols participate in later rounds atomically
    assert(trained(Seq("x y z x y z x y z"), 3) ==
      reference(Seq("x y z x y z x y z"), 3))
  }

  test("merge rewrite is anchored to symbol boundaries") {
    // suffix overlap: vocab 'a'/'xa' — an unanchored replace of
    // (a, b) would also corrupt 'xa b' into a bogus symbol, shifting
    // later rounds' counts and argmaxes
    val suffix = Seq.fill(30)("a b").++(Seq.fill(20)("xa b")) ++
      Seq.fill(5)("xa b a b")
    assert(trained(suffix, 3) == reference(suffix, 3))
    // prefix overlap on the right symbol: vocab 'c'/'cy'
    val prefix = Seq.fill(30)("b c") ++ Seq.fill(20)("b cy") ++
      Seq.fill(5)("b c b cy")
    assert(trained(prefix, 3) == reference(prefix, 3))
    // merged-symbol suffix: after round 1 merges ('a','b'), the symbol
    // 'a·b' must not be corrupted when a later round merges ('b','c')
    // — the ADVICE simulation corpus (50×'a b' + 40×'b c' + 10×'a b c')
    val merged = Seq.fill(50)("a b") ++ Seq.fill(40)("b c") ++
      Seq.fill(10)("a b c")
    assert(trained(merged, 3) == reference(merged, 3))
  }

  test("trainer stops cleanly when no adjacent pair remains") {
    // single-word docs: zero pairs from round 1 — empty merge table,
    // not a NoSuchElementException
    assert(trained(Seq("alpha", "beta", "alpha"), 3) == Seq())
    // pairs exhaust mid-loop: 'a b' merges once, then every doc is a
    // single symbol — rounds 2..4 must return the round-1 table only
    val d = Seq.fill(8)("a b")
    assert(trained(d, 4) == reference(d, 1))
  }

  test("trainer matches the reference on seeded random corpora") {
    val rnd = new Random(17)
    for (trial <- 1 to 5) {
      val vocab = (0 until (2 + rnd.nextInt(6))).map(i => s"w$i")
      val docs = Seq.fill(20 + rnd.nextInt(40)) {
        Seq.fill(2 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" ")
      }
      val rounds = 1 + rnd.nextInt(4)
      assert(trained(docs, rounds) == reference(docs, rounds),
        s"trial $trial (rounds=$rounds)")
    }
  }

  /** Reference ENCODE: apply the merges in round order to one doc's
    * word symbols — the same greedy left-to-right applier the trainer
    * reference uses per round.
    */
  private def refEncode(doc: String,
      merges: Seq[(String, String)]): Vector[String] =
    merges.foldLeft(doc.split(" ").toVector) { case (w, (a, b)) =>
      val buf = Vector.newBuilder[String]
      var i = 0
      while (i < w.length) {
        if (i + 1 < w.length && w(i) == a && w(i + 1) == b) {
          buf += a + Glue + b; i += 2
        } else { buf += w(i); i += 1 }
      }
      buf.result()
    }

  private def encoded(docs: Seq[String], rounds: Int)
      : Seq[(Long, Long, String)] = {
    import spark.implicits._
    TextAnalysis.bpeFitEncode(
      docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"),
      "doc_id", "text", rounds)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1).toSeq
  }

  test("encode(fit(corpus)) matches the reference applier, including " +
    "the rendered token stream") {
    val corpora = Seq(
      Seq("a b c a b", "a b", "c c c"),
      Seq("x y x y x y", "y x"),
      // suffix-overlap vocab: anchoring matters on the encode side too
      Seq.fill(30)("a b") ++ Seq.fill(20)("xa b") ++ Seq.fill(5)("a b c"))
    for (docs <- corpora; rounds <- Seq(1, 3)) {
      val merges = reference(docs, rounds).map(m => (m._2, m._3))
      val want = docs.zipWithIndex.map { case (d, i) =>
        val toks = refEncode(d, merges).filter(_.nonEmpty)
        (i.toLong, toks.length.toLong,
          "|" + refEncode(d, merges).map(_.replace(Glue, " "))
            .mkString("|") + "|")
      }
      assert(encoded(docs, rounds) == want, s"rounds=$rounds docs=$docs")
    }
  }

  test("a planted two-level merge round-trips: 'a b c' encodes to ONE " +
    "token after the learned (a,b) then (a·b,c) merges") {
    // 'a b' dominates round 1; the merged symbol then pairs with 'c'
    // and dominates round 2
    val docs = Seq.fill(20)("a b c") ++ Seq.fill(5)("a b")
    val out = encoded(docs, 2)
    assert(out.take(20).forall(_._2 == 1L),
      "each 'a b c' doc must be a single token")
    assert(out.take(20).forall(_._3 == "|a b c|"))
    assert(out.drop(20).forall(t => t._2 == 1L && t._3 == "|a b|"))
  }

  test("cross-corpus encode equals fit-encode when incoming == corpus, " +
    "and the frozen merge table is cached per corpus version") {
    import spark.implicits._
    StaticIndexCache.clear()
    val docs = (Seq.fill(20)("a b c") ++ Seq.fill(5)("d e"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("bpe_cross").toString
    docs.write.mode("overwrite").parquet(dir)
    val corpus = spark.read.parquet(dir)
    val viaCross = TextAnalysis
      .bpeEncodeWith(corpus, corpus, "doc_id", "text", 2)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val viaFit = TextAnalysis.bpeFitEncode(corpus, "doc_id", "text", 2)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(viaCross == viaFit)
    // second invocation over the same corpus version reuses the frozen
    // merge table: the cache holds exactly one bpe_merges entry and no
    // retraining jobs run (entry count stays flat)
    val before = StaticIndexCache.size
    TextAnalysis.bpeEncodeWith(corpus.limit(3), corpus, "doc_id", "text", 2)
      .collect()
    assert(StaticIndexCache.size == before)
    // a streaming corpus (fit side) is rejected loudly
    val schema = corpus.schema
    val streaming = spark.readStream.schema(schema).parquet(dir)
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.bpeEncodeWith(corpus, streaming, "doc_id", "text", 2)
    }
    assert(e.getMessage.contains("BOUNDED"))
    StaticIndexCache.clear()
  }

  test("encode with zero learned merges counts whitespace tokens") {
    import spark.implicits._
    val df = Seq((1L, "u v w"), (2L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeEncode(df, "doc_id", "text", Seq.empty)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 3L, 2L -> 0L))
  }

  test("trainer is partition-invariant") {
    import spark.implicits._
    // one Random OUTSIDE the fills so docs actually vary — a per-token
    // new Random(7) made every token identical and the test trivial
    val rnd = new Random(7)
    val docs = Seq.fill(200)(
      Seq.fill(10)(s"t${rnd.nextInt(4)}").mkString(" "))
    val a = TextAnalysis.bpeMerges(
      docs.toDF("text").repartition(1), "text", 3).collect().toSeq
    val b = TextAnalysis.bpeMerges(
      docs.toDF("text").repartition(13), "text", 3).collect().toSeq
    assert(a.sortBy(_.getInt(0)) == b.sortBy(_.getInt(0)))
  }
}
