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
}
