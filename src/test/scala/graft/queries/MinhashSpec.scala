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
}
