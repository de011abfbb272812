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
}
