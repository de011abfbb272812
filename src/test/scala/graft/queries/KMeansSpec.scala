package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Iterative k-means fit: deterministic, lineage-flat, and actually
  * descending the within-cluster cost from the seed assignment — the
  * training pass that turns the fixed test centroids into real ones for
  * IVF cells and SemDeDup blocking.
  */
class KMeansSpec extends SparkSpec {
  import spark.implicits._

  private def base() = {
    Vec.ensureRegistered(spark)
    Tables.load(spark, sf, "embeddings")
      .select($"vec_id", Vec.quant($"embedding").as("qe"))
      .withColumn("nrm", Vec.dotQ($"qe", $"qe"))
  }

  private def seeds(b: org.apache.spark.sql.DataFrame) = b
    .filter($"vec_id" >= 100 && $"vec_id" < 108)
    .select(($"vec_id" - 100).as("cid"), $"qe", $"nrm")
    .collect()
    .map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2)))
    .sortBy(_._1).toSeq

  test("three Lloyd rounds cut the within-cluster cost vs the seed slice") {
    val b = base().persist()
    try {
      val s = seeds(b)
      val fitted = Similarity.kmeansFit(b, s, iters = 3)
      val before = Similarity.kmeansCost(b, s)
      val after = Similarity.kmeansCost(b, fitted)
      assert(after < before,
        s"cost did not improve: seed=$before fitted=$after")
      // fitted centroids keep the cid keying and dimensionality
      assert(fitted.map(_._1) == s.map(_._1))
      assert(fitted.forall(_._2.size == s.head._2.size))
    } finally b.unpersist()
  }

  test("the fit is deterministic: same seeds, same centroids") {
    val b = base().persist()
    try {
      val s = seeds(b)
      val f1 = Similarity.kmeansFit(b, s, iters = 2)
      val f2 = Similarity.kmeansFit(b, s, iters = 2)
      assert(f1 == f2)
    } finally b.unpersist()
  }

  test("fitted cells still partition the corpus") {
    val b = base().persist()
    try {
      val fitted = Similarity.kmeansFit(b, seeds(b), iters = 2)
      val assigned = Vec.argminAssignWith(b, fitted)
      assert(assigned.count() == b.count())
      assert(assigned.filter($"cell".isNull).count() == 0)
      // every cell id in the assignment is a fitted centroid id
      val cells = assigned.select($"cell").distinct()
        .as[Long].collect().toSet
      assert(cells.subsetOf(fitted.map(_._1).toSet))
    } finally b.unpersist()
  }
}
