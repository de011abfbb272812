package graft.queries

import graft.{SparkSpec, Tables}

/** Parameterized MinHash-LSH: band/row counts are the scale/recall knobs
  * with MMDS sizing guidance; the oracle defaults stay fixed for the
  * gate query.
  */
class MinhashSpec extends SparkSpec {

  test("band config sizing follows the (1/b)^(1/r) S-curve midpoint") {
    // default 4×4 config targets ~0.7 — right for the 0.8-verify gate
    assert(math.abs(Dedup.lshThreshold(4, 4) - 0.707) < 0.01)
    assert(Dedup.bandConfigFor(16, 0.7) == ((4, 4)))
    // looser target → more bands, fewer rows per band
    val (bLoose, rLoose) = Dedup.bandConfigFor(16, 0.3)
    assert(bLoose > 4 && rLoose < 4)
    // tighter target → fewer bands, more rows per band
    val (bTight, rTight) = Dedup.bandConfigFor(16, 0.95)
    assert(bTight < 4 && rTight > 4)
  }

  test("hot-bucket cap bounds candidate expansion on a duplicate-heavy corpus") {
    import spark.implicits._
    // 200 byte-identical docs: every band bucket degenerates to all 200
    // members — the boilerplate-heavy-corpus skew case. Plus one small
    // legitimate duplicate pair that must survive the cap.
    val boiler = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = ((1 to 200).map(i => (i.toLong, boiler)) ++
      Seq((901L, "one two three four five"),
        (902L, "one two three four five")))
      .toDF("doc_id", "text")
    // uncapped: the degenerate group alone expands to 200*199/2 pairs
    val uncapped = Dedup.minhashCandidates(docs, maxBucket = Int.MaxValue).count()
    assert(uncapped >= 200L * 199 / 2, s"uncapped=$uncapped")
    // capped: degenerate buckets dropped (and logged via the observe
    // metric), candidate count bounded far below m²/2; the small pair is
    // untouched
    val capped = Dedup.minhashCandidates(docs, maxBucket = 50).collect()
    assert(capped.length == 1, capped.mkString(","))
    assert(capped.head.getLong(0) == 901L && capped.head.getLong(1) == 902L)
  }

  test("default cap is a no-op on the gate corpus (oracle has no cap)") {
    val docs = Tables.load(spark, sf, "documents")
    val def_ = Dedup.minhashCandidates(docs).count()
    val unc = Dedup.minhashCandidates(docs, maxBucket = Int.MaxValue).count()
    assert(def_ == unc, s"default-cap=$def_ uncapped=$unc")
  }

  test("empty and all-short corpora yield no candidates (no listener NPE)") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.minhashCandidates(empty).count() == 0)
    // short docs are filtered before shingling → empty bucket aggregation
    // → the observe() sums are NULL; the drop logger must guard the unbox
    val short_ = Seq((1L, "one two")).toDF("doc_id", "text")
    assert(Dedup.minhashCandidates(short_).count() == 0)
  }

  test("more bands / fewer rows per band yields at least as many candidates") {
    val docs = Tables.load(spark, sf, "documents")
    val n44 = Dedup.minhashCandidates(docs, k = 16,
      bands = 4, rowsPerBand = 4).count()
    val n82 = Dedup.minhashCandidates(docs, k = 16,
      bands = 8, rowsPerBand = 2).count()
    // threshold drops 0.71 → 0.35: strictly more pairs collide per band
    assert(n82 >= n44 && n82 > 0,
      s"expected candidate growth: 4x4=$n44, 8x2=$n82")
  }

  test("three-limb SimHash (w>30) matches brute-force hamming over the " +
    "same 180-bit signatures") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // widths past 30 draw chunk keys from the third (salted-digest)
    // limb; no test corpus is big enough to trigger that by sizing, so
    // force w=35 and verify the blocked output against an all-pairs
    // hamming scan over the SAME signatures — losslessness must hold
    // across both limb boundaries (bit 60 and bit 120).
    val base = "the quick brown fox jumps over the lazy dog again and " +
      "again while seven wizards brew hazy potions at midnight"
    val docs = ((1 to 40).map(i =>
      (i.toLong, s"$base unique token$i tail$i")) ++
      Seq((101L, base + " shared suffix of the duplicate pair"),
        (102L, base + " shared suffix of the duplicate pair")))
      .toDF("doc_id", "text")
    val w = 35
    val blocked = Dedup.simhashVerifiedPairs(docs, "doc_id", "text", w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val sigs = Dedup.simhashSignatures(
      docs.select($"doc_id", split($"text", " ").as("w"))
        .filter(size($"w") >= 2), nLimbs = 3)
    def m(bits: Int): Long = if (bits <= 0) 0L else (1L << bits) - 1
    val bits = Seq(math.min(60, 4 * w), math.min(60, 4 * w - 60), 4 * w - 120)
    val a = sigs.select($"doc_id".as("ida"), $"s1".as("a1"), $"s2".as("a2"),
      $"s3".as("a3"))
    val b = sigs.select($"doc_id".as("idb"), $"s1".as("b1"), $"s2".as("b2"),
      $"s3".as("b3"))
    val brute = a.join(b, $"ida" < $"idb")
      .select($"ida", $"idb",
        (bit_count(($"a1" bitwiseXOR $"b1") bitwiseAND lit(m(bits(0)))) +
          bit_count(($"a2" bitwiseXOR $"b2") bitwiseAND lit(m(bits(1)))) +
          bit_count(($"a3" bitwiseXOR $"b3") bitwiseAND lit(m(bits(2)))))
          .cast("long").as("hamming"))
      .filter($"hamming" <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(blocked == brute, s"blocked=$blocked brute=$brute")
    // the near-dup pair must actually be found (non-vacuous test), and
    // the hamming must involve third-limb bits for at least one pair
    // direction (4w = 140 > 120 covered)
    assert(blocked.exists { case (x, y, _) =>
      Set(x, y) == Set(101L, 102L) })
  }

  // --- streaming cross-corpus dedup (minhashCrossPairsStream) ---

  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

  private def crossCorpusDocs: Seq[(Long, String)] = {
    def sent(i: Int) = (0 until 12).map(j => s"w${i}x$j").mkString(" ")
    // corpus: 20 distinct docs; a couple of short docs (filtered) too
    (1 to 20).map(i => (i.toLong, sent(i))) :+ (90L, "too short")
  }

  private def crossIncomingDocs: Seq[(Long, String)] = Seq(
    (101L, sentOf(3)),                         // exact dup of corpus 3
    (102L, sentOf(7) + " extra"),              // near dup of corpus 7
    (103L, (0 until 12).map(j => s"zz$j").mkString(" ")), // unrelated
    (104L, sentOf(3)),                         // second dup of corpus 3
    (105L, "tiny doc"))                        // filtered (<3 words)
  private def sentOf(i: Int) = (0 until 12).map(j => s"w${i}x$j").mkString(" ")

  test("streaming cross-pairs equals the batch kernel across " +
    "micro-batch splits of the incoming side") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = crossCorpusDocs.toDF("doc_id", "text")
    val batchOut = Dedup.minhashCrossPairs(
      crossIncomingDocs.toDF("doc_id", "text"), corpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(batchOut.nonEmpty, "vacuous: batch kernel found no pairs")
    assert(batchOut.exists(p => p._1 == 101L && p._2 == 3L))

    val in = MemoryStream[(Long, String)]
    val out = Dedup.minhashCrossPairsStream(
      in.toDS().toDF("doc_id", "text"), corpus, "doc_id", "text")
    val q = out.writeStream.format("memory").queryName("cross_stream_eq")
      .outputMode("append").start()
    try {
      // split the shard mid-way: the second dup of corpus 3 arrives in a
      // LATER micro-batch than the first — both must emit (stateless
      // plan: nothing about batch 1 can suppress batch 2's rows)
      in.addData(crossIncomingDocs.take(2): _*)
      q.processAllAvailable()
      in.addData(crossIncomingDocs.drop(2): _*)
      q.processAllAvailable()
      val got = spark.table("cross_stream_eq").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == batchOut, s"stream=$got batch=$batchOut")
    } finally q.stop()
  }

  test("streaming cross-pairs plan reads the materialized corpus index " +
    "only — no per-micro-batch corpus re-shingle") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = crossCorpusDocs.toDF("doc_id", "text")
    val in = MemoryStream[(Long, String)]
    val out = Dedup.minhashCrossPairsStream(
      in.toDS().toDF("doc_id", "text"), corpus, "doc_id", "text")
    val plan = out.queryExecution.analyzed
    // the only non-streaming relations are the two parquet index files;
    // the corpus's LocalRelation (and any md5/shingle work over it) is
    // gone from the per-batch plan entirely
    val fileRels = plan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case f: org.apache.spark.sql.execution.datasources
              .HadoopFsRelation => f.location.rootPaths.mkString(",")
          case _ => ""
        }
    }
    assert(fileRels.size == 2 &&
      fileRels.forall(_.contains("graft_cross_idx")), fileRels.toString)
    val locals = plan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }
    assert(locals.isEmpty,
      "corpus LocalRelation leaked into the streaming plan")
  }

  test("repeated cross-pairs invocations reuse ONE persisted corpus index") {
    // the block-manager pinning fix: same (corpus, params) → one cached
    // (meta, idx) pair; a second call must not persist a second copy
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = crossCorpusDocs.toDF("doc_id", "text")
    StaticIndexCache.clear()
    val in1 = MemoryStream[(Long, String)]
    Dedup.minhashCrossPairsStream(
      in1.toDS().toDF("doc_id", "text"), corpus, "doc_id", "text")
    val afterFirst = StaticIndexCache.size
    assert(afterFirst >= 1)
    val in2 = MemoryStream[(Long, String)]
    Dedup.minhashCrossPairsStream(
      in2.toDS().toDF("doc_id", "text"),
      crossCorpusDocs.toDF("doc_id", "text"), // rebuilt, same data/plan
      "doc_id", "text")
    assert(StaticIndexCache.size == afterFirst,
      "second invocation pinned a second corpus index")
    // a different threshold is query-time only — still the same index
    val in3 = MemoryStream[(Long, String)]
    Dedup.minhashCrossPairsStream(
      in3.toDS().toDF("doc_id", "text"), corpus, "doc_id", "text",
      threshold = 0.5)
    assert(StaticIndexCache.size == afterFirst)
  }

  test("embed cross-pairs: stream equals batch across micro-batch " +
    "splits; streaming corpus rejected") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    val emb = graft.Tables.load(spark, sf, "embeddings")
    val incomingRows = emb.filter(col("vec_id") % 4 === 0)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    assert(incomingRows.length >= 4)
    val batchOut = Dedup.embedCrossPairs(
      emb.filter(col("vec_id") % 4 === 0), emb, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(batchOut.nonEmpty)
    assert(batchOut.length == batchOut.toSet.size, "duplicate pair (batch)")
    // every incoming row matches itself at cosine 1.0 (exact-hit dup)
    assert(batchOut.count { case (a, b, _) => a == b } ==
      incomingRows.length)

    val in = MemoryStream[(Long, Seq[Float])]
    val q = Dedup.embedCrossPairs(
      in.toDS().toDF("vec_id", "embedding"), emb, "vec_id", "embedding")
      .writeStream.format("memory").queryName("embed_cross_eq")
      .outputMode("append").start()
    try {
      val (h, t) = incomingRows.splitAt(incomingRows.length / 2)
      in.addData(h.toIndexedSeq: _*)
      q.processAllAvailable()
      in.addData(t.toIndexedSeq: _*)
      q.processAllAvailable()
      val got = spark.table("embed_cross_eq").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(got.length == got.toSet.size, "duplicate pair (stream)")
      assert(got.toSet == batchOut.toSet,
        s"only-stream=${got.toSet -- batchOut.toSet} " +
          s"only-batch=${batchOut.toSet -- got.toSet}")
    } finally q.stop()

    val e = intercept[IllegalArgumentException] {
      Dedup.embedCrossPairs(in.toDS().toDF("vec_id", "embedding"),
        in.toDS().toDF("vec_id", "embedding"), "vec_id", "embedding")
    }
    assert(e.getMessage.contains("BOUNDED"))
  }

  test("sized embed cross-pairs: cells=1 degenerates to the exact " +
    "all-pairs slice×corpus scan; invalid cells rejected") {
    import org.apache.spark.sql.functions.col
    val emb = graft.Tables.load(spark, sf, "embeddings")
    val inc = emb.filter(col("vec_id") % 4 === 0)
    // with ONE fitted cell, blocking filters nothing: the output must
    // equal the brute-force cosine filter over slice×corpus
    val got = Dedup.embedCrossPairsSized(inc, emb, "vec_id", "embedding",
      cells = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val p = emb.select(col("vec_id"),
      graft.queries.Vec.quant(col("embedding")).as("qe"))
      .withColumn("nrm", graft.queries.Vec.dotQ(col("qe"), col("qe")))
    val a = p.filter(col("vec_id") % 4 === 0)
      .select(col("vec_id").as("ida"), col("qe").as("qa"),
        col("nrm").as("na"))
    val expected = a.crossJoin(
        p.select(col("vec_id").as("idb"), col("qe").as("qb"),
          col("nrm").as("nb")))
      .filter(graft.queries.Vec.cosineQ(col("qa"), col("qb"),
        col("na"), col("nb")) >= 0.35)
      .select("ida", "idb").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected && got.nonEmpty)
    val e = intercept[IllegalArgumentException] {
      Dedup.embedCrossPairsSized(inc, emb, "vec_id", "embedding", 0)
    }
    assert(e.getMessage.contains("cells must be"))
  }

  test("a corpus OVERWRITTEN at the same path misses the frozen-index " +
    "cache: results reflect the new data, not the stale index") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("refresh_corpus")
      .toString
    def corpusOf(label: String) = (0L until 8L)
      .map(i => (i, s"$label shared tokens for doc $i $label $label"))
      .toDF("vec_id", "text")
    corpusOf("alpha").write.mode("overwrite").parquet(dir)
    val incoming = Seq((100L, "alpha shared tokens for doc 0 alpha alpha"))
      .toDF("vec_id", "text")
    def run() = Dedup.minhashCrossPairs(incoming,
      spark.read.parquet(dir), "vec_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val first = run()
    assert(first.nonEmpty, "the alpha corpus must match the alpha probe")
    // refresh the corpus AT THE SAME PATH with disjoint content: the
    // frozen band index must be rebuilt (file-fingerprinted cache key),
    // not served stale — a stale index would still emit alpha matches
    corpusOf("omega").write.mode("overwrite").parquet(dir)
    assert(run().isEmpty,
      "stale frozen index served after a same-path corpus overwrite")
  }

  test("streaming cross-pairs rejects a streaming corpus and a batch " +
    "incoming loudly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val streamDf = in.toDS().toDF("doc_id", "text")
    val batchDf = crossCorpusDocs.toDF("doc_id", "text")
    val e1 = intercept[IllegalArgumentException] {
      Dedup.minhashCrossPairsStream(streamDf, streamDf, "doc_id", "text")
    }
    assert(e1.getMessage.contains("BOUNDED"))
    val e2 = intercept[IllegalArgumentException] {
      Dedup.minhashCrossPairsStream(batchDf, batchDf, "doc_id", "text")
    }
    assert(e2.getMessage.contains("streaming incoming"))
  }
}
