package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Parameterized ANN kernels: the scale knobs (hyperplane count, centroid
  * count, probe width) are arguments with √n sizing guidance; the oracle
  * defaults stay fixed for the gate queries.
  */
class AnnSpec extends SparkSpec {

  private def quantized() = {
    Vec.ensureRegistered(spark)
    Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), Vec.quant(col("embedding")).as("qe"))
      .withColumn("nrm", Vec.dotQ(col("qe"), col("qe")))
  }

  test("recommended sizing follows sqrt(n)") {
    assert(Similarity.recommendedPlanes(65536) == 8)   // 2^8 = 256 ≈ √65536
    assert(Similarity.recommendedPlanes(1L << 32) == 16)
    assert(Similarity.recommendedPlanes(100) >= 4)     // floor
    // 100 TB ≈ 10^11 docs → ~19 planes, far above the test default of 8
    assert(Similarity.recommendedPlanes(100000000000L) == 19)
    assert(Similarity.recommendedCentroids(10000) == 100)
    assert(Similarity.recommendedCentroids(1000000) == 1000)
  }

  test("plane count controls LSH bucket fan-out") {
    val emb = quantized()
    def fanout(planes: Int): Long =
      emb.select(Similarity.bucketOf(col("qe"), planes).as("b"))
        .agg(countDistinct(col("b"))).head.getLong(0)
    val f4 = fanout(4)
    val f8 = fanout(8)
    val f12 = fanout(12)
    assert(f4 <= 16) // 2^4 buckets max
    assert(f4 < f8 && f8 < f12,
      s"fan-out must grow with planes: $f4, $f8, $f12")
  }

  test("parameterized LSH returns per-query top-k; results agree with brute force") {
    val emb = quantized()
    val qs = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("qe").as("qqe"),
        col("nrm").as("qnrm"))
    val corpus = emb.filter(col("vec_id") >= 8)
    val lsh = Similarity.annLsh(corpus, qs, k = 3, nPlanes = 12).collect()
    assert(lsh.nonEmpty)
    val perQuery = lsh.groupBy(_.getAs[Long]("qid")).values
    assert(perQuery.forall(_.length <= 3))
    // every LSH hit carries the same cosine the exact scorer computes for
    // that (query, neighbor) pair — the bucketing narrows candidates but
    // must never alter scores
    val brute = Similarity.annBrute(corpus, qs, k = 1000)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid")) ->
        r.getAs[Double]("cosine")).toMap
    assert(lsh.forall { r =>
      brute((r.getAs[Long]("qid"), r.getAs[Long]("nid"))) ==
        r.getAs[Double]("cosine")
    })
  }

  test("PQ candidate scan + exact re-rank recovers most brute-force neighbors") {
    def pairs(name: String) =
      Similarity.queries(name)(spark, sf).collect()
        .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"))).toSet
    val brute = pairs("q_ann_brute")
    val pq = pairs("q_ann_pq")
    assert(pq.size == brute.size, "same k per query on both paths")
    val recall = (pq & brute).size.toDouble / brute.size
    // 0.92 measured on this corpus; generous floor so codebook-agnostic
    // regressions (broken encode, candidate cut, re-rank order) fail
    // loudly without pinning the exact approximation quality
    assert(recall >= 0.8, s"PQ recall@5 degraded to $recall")
    // a PQ hit's cosine must equal the exact scorer's for that pair —
    // the compression narrows candidates, it must never alter scores
    val bruteCos = {
      import org.apache.spark.sql.functions.col
      val emb = quantized()
      val qs = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("qe").as("qqe"),
          col("nrm").as("qnrm"))
      Similarity.annBrute(emb.filter(col("vec_id") >= 8), qs, k = 1000)
        .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid")) ->
          r.getAs[Double]("cosine")).toMap
    }
    val pqRows = Similarity.queries("q_ann_pq")(spark, sf).collect()
    assert(pqRows.forall { r =>
      bruteCos((r.getAs[Long]("qid"), r.getAs[Long]("nid"))) ==
        r.getAs[Double]("cosine")
    })
  }

  test("IVF+PQ routes the ADC scan to probed cells and keeps exact scores") {
    def pairs(name: String) =
      Similarity.queries(name)(spark, sf).collect()
        .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"))).toSet
    val ivfpqRows = Similarity.queries("q_ann_ivfpq")(spark, sf).collect()
    assert(ivfpqRows.nonEmpty)
    // k results per query, same contract as the other tiers
    val perQuery = ivfpqRows.groupBy(_.getAs[Long]("qid"))
    assert(perQuery.values.forall(_.length <= 5))
    val viaIvf = ivfpqRows.map(r =>
      (r.getAs[Long]("qid"), r.getAs[Long]("nid"))).toSet
    // routing is a strict narrowing: every IVF+PQ hit must live in one
    // of the query's probed cells, i.e. be reachable by plain IVF with
    // an unbounded k (both paths share the identical cell routing)
    val emb = quantized()
    val cellMembers = {
      val cent = emb.filter(col("vec_id") >= 100 && col("vec_id") < 116)
        .select(col("vec_id").as("cid"), col("qe").as("ce"),
          col("nrm").as("cnrm"))
      val qsv = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("qe").as("qqe"),
          col("nrm").as("qnrm"))
      Similarity.annIvf(emb.filter(col("vec_id") >= 8), qsv, cent, k = 100000)
        .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"))).toSet
    }
    assert((viaIvf -- cellMembers).isEmpty,
      s"IVF+PQ surfaced neighbors outside the probed cells: " +
        s"${viaIvf -- cellMembers}")
    // the PQ candidate cut can drop IVF top-k hits but never add a
    // neighbor outside the probed cells; scores are the exact quantized
    // cosine — compression narrows candidates, it must never alter them
    val ivf = pairs("q_ann_ivf")
    val qs = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("qe").as("qqe"),
        col("nrm").as("qnrm"))
    val bruteCos = Similarity.annBrute(emb.filter(col("vec_id") >= 8), qs,
        k = 1000)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid")) ->
        r.getAs[Double]("cosine")).toMap
    assert(ivfpqRows.forall { r =>
      bruteCos((r.getAs[Long]("qid"), r.getAs[Long]("nid"))) ==
        r.getAs[Double]("cosine")
    })
    // and the composition still finds most of what plain IVF finds —
    // the ADC cut is a 100-candidate budget over probed-cell members
    val recall = (viaIvf & ivf).size.toDouble / ivf.size
    info(f"IVF+PQ recall vs IVF@5: $recall%.3f")
    assert(recall >= 0.8, s"IVF+PQ recall vs IVF degraded to $recall")
  }

  test("pq_encode emits in-range codes and matches a reference argmin") {
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    val m = 2; val c = 3; val d = 2
    // codebook: subspace 0 -> {(0,0),(10,0),(0,10)}, subspace 1 -> same
    val cb = Array[Long](0, 0, 10, 0, 0, 10, 0, 0, 10, 0, 0, 10)
    val df = spark.range(1).select(
      typedLit(Seq(9L, 1L, 0L, 11L)).as("v"))
    val codes = df.select(graft.functions.GraftFunctions
        .pqEncode(col("v"), cb, m, c, d).as("codes"))
      .head.getSeq[Long](0)
    // (9,1): d0=82, d1=2, d2=162 -> code 1; (0,11): d0=121, d1=221, d2=1 -> code 2
    assert(codes == Seq(1L, 2L))
    // ties break to the LOWEST codeword index (argmin ORDER BY d, cid)
    val tied = spark.range(1).select(typedLit(Seq(5L, 0L, 5L, 0L)).as("v"))
      .select(graft.functions.GraftFunctions
        .pqEncode(col("v"), Array[Long](0, 0, 10, 0, 0, 10, 0, 0, 10, 0, 0, 10), m, c, d).as("codes"))
      .head.getSeq[Long](0)
    // (5,0): dist to (0,0)=25, to (10,0)=25, to (0,10)=125 -> tie -> 0
    assert(tied == Seq(0L, 0L))
    // wrong-length vector -> NULL, never silent truncation
    val bad = spark.range(1).select(typedLit(Seq(1L, 2L, 3L)).as("v"))
      .select(graft.functions.GraftFunctions
        .pqEncode(col("v"), cb, m, c, d).as("codes"))
      .head
    assert(bad.isNullAt(0))
  }

  test("fitted PQ codebooks: Lloyd rounds move the codebook and recall does not regress") {
    // sf0.01: the slice seeds need vec_id in [100, 164) to exist, and a
    // 500-vector corpus makes the candidate budget bind. A TIGHT budget
    // (10 of ~492, vs the gate default of 100) is what separates codebook
    // quality: with 100 candidates both variants recall ~everything.
    val dir = "/root/testdata/sf0.01"
    Vec.ensureRegistered(spark)
    val emb = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), Vec.quant(col("embedding")).as("qe"))
      .withColumn("nrm", Vec.dotQ(col("qe"), col("qe")))
    val corpus = emb.filter(col("vec_id") >= 8)
    val seed = Similarity.pqSliceCodebook(emb)
    val fitted = Similarity.pqFit(corpus, seed, 2)
    // the fit is not a no-op: Lloyd moved codewords toward member means
    assert(!java.util.Arrays.equals(seed, fitted),
      "two Lloyd rounds left every codeword unchanged")
    // determinism: refitting from the same seed gives the same codebook
    assert(java.util.Arrays.equals(fitted,
      Similarity.pqFit(corpus, seed, 2)))

    val qs = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("qe").as("qqe"),
        col("nrm").as("qnrm"))
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r =>
        (r.getAs[Long]("qid"), r.getAs[Long]("nid"))).toSet
    val truth = pairs(Similarity.annBrute(corpus, qs, k = 5))
    def recall(cb: Array[Long]): Double = {
      val got = pairs(Similarity.pqSearch(spark, emb, cb, cand = 10, k = 5))
      got.intersect(truth).size.toDouble / truth.size
    }
    val rSeed = recall(seed)
    val rFit = recall(fitted)
    info(f"recall@5 (cand=10): slice=$rSeed%.3f fitted=$rFit%.3f")
    // fitted codebooks must quantize the corpus more faithfully — the
    // measured gap is large (0.225 → 0.425 on this corpus), so a strict
    // inequality is a stable pin, and the floor guards against a future
    // change quietly gutting the fit
    assert(rFit > rSeed,
      f"fitted codebooks lost recall: $rFit%.3f <= $rSeed%.3f")
    assert(rFit >= 0.35, f"fitted recall unreasonably low: $rFit%.3f")
  }

  test("fitCentroids: ids that dodge the stride sample fail loudly " +
    "with the escape hatch named") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    graft.queries.Vec.ensureRegistered(spark)
    // n=4 odd ids, cells=2 -> stride=2; no id satisfies id % 2 == 0
    val prepped = Seq(1L, 3L, 5L, 7L)
      .map(i => (i, Seq.fill(4)(i), 4 * i * i)).toDF("vec_id", "qe", "nrm")
    val e = intercept[IllegalArgumentException] {
      Similarity.fitCentroids(prepped, cells = 2)
    }
    assert(e.getMessage.contains("no seed ids") &&
      e.getMessage.contains("*With"), e.getMessage)
    // dense ids with the same shape fit fine
    val dense = Seq(0L, 1L, 2L, 3L)
      .map(i => (i, Seq.fill(4)(i + 1), 4 * (i + 1) * (i + 1)))
      .toDF("vec_id", "qe", "nrm")
    assert(Similarity.fitCentroids(dense, cells = 2).length == 2)
  }
}
