package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Native cell_cos_pairs: bit-equivalence with the higher-order
  * `filter(transform(ms, ...), cos >= θ)` tree it replaced in
  * [[graft.queries.Dedup.embedCrossPairsWith]], including the NULL /
  * zero-norm / dim-mismatch edges.
  */
class CellCosPairsSpec extends SparkSpec {
  import spark.implicits._

  private val theta = 0.85

  /** The exact pre-r18 formulation (Vec.cosineQ over long_dot, inlined —
    * Vec is queries-package-private), kept here as the reference.
    */
  private def referencePairs(qa: org.apache.spark.sql.Column,
      na: org.apache.spark.sql.Column,
      ms: org.apache.spark.sql.Column,
      th: Double = theta): org.apache.spark.sql.Column = {
    def cosineQ(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
        nA: org.apache.spark.sql.Column, nB: org.apache.spark.sql.Column) =
      GraftFunctions.longDot(a, b).cast("double") /
        nullif(sqrt(nA.cast("double")) * sqrt(nB.cast("double")), lit(0.0))
    val scored = transform(ms, m =>
      struct(m.getField("idb").as("idb"),
        cosineQ(qa, m.getField("qe"), na, m.getField("nrm")).as("cosine")))
    filter(scored, m => m.getField("cosine") >= th)
  }

  test("cell_cos_pairs equals the transform+filter tree on random cells") {
    GraftFunctions.register(spark)
    val dim = 16
    def vec(seed: org.apache.spark.sql.Column) =
      transform(sequence(lit(1), lit(dim)),
        i => pmod(hash(seed * i), lit(201)).cast("long") - 100L)
    val members = spark.range(400).select(
      (col("id") % 20).as("cell"),
      struct(col("id").as("idb"), vec(col("id") + 7).as("qe"),
        aggregate(vec(col("id") + 7), lit(0L),
          (acc, x) => acc + x * x).as("nrm")).as("m"))
      .groupBy("cell").agg(collect_list("m").as("ms"))
    val incoming = spark.range(60).select(
      col("id").as("ida"), (col("id") % 20).as("cell"),
      vec(col("id")).as("qa"),
      aggregate(vec(col("id")), lit(0L),
        (acc, x) => acc + x * x).as("na"))
    // random integer vectors are near-orthogonal, so a tiny threshold
    // is what actually splits this population (cosines straddle 0)
    val thRnd = 0.05
    val joined = incoming.join(members, "cell")
    val cmp = joined.select(
      GraftFunctions.cellCosPairs($"qa", $"na", $"ms", thRnd).as("fast"),
      referencePairs($"qa", $"na", $"ms", thRnd).as("slow"))
    // struct-array equality is element- and bit-wise (cosine is DOUBLE)
    assert(cmp.count() == 60)
    assert(cmp.filter(not($"fast" <=> $"slow")).count() == 0)
    // sanity: the threshold actually splits the population
    val kept = cmp.select(sum(size($"fast"))).as[Long].head()
    assert(kept > 0, "no pair cleared the threshold — test vectors degenerate")
    val total = joined.select(sum(size($"ms"))).as[Long].head()
    assert(kept < total, "every pair cleared the threshold — test vectors degenerate")
  }

  test("cell_cos_pairs: NULL / zero-norm / dim-mismatch edges match the lambda tree") {
    GraftFunctions.register(spark)
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (array(3L, 4L), 25L,
        |   array(named_struct('idb', 1L, 'qe', array(3L, 4L), 'nrm', 25L),
        |         named_struct('idb', 2L, 'qe', array(0L, 0L), 'nrm', 0L),
        |         named_struct('idb', 3L, 'qe', array(1L, 2L, 3L), 'nrm', 14L),
        |         named_struct('idb', 4L, 'qe', CAST(NULL AS ARRAY<BIGINT>), 'nrm', 4L),
        |         named_struct('idb', 5L, 'qe', array(1L, CAST(NULL AS BIGINT)), 'nrm', 2L),
        |         named_struct('idb', 6L, 'qe', array(-3L, -4L), 'nrm', 25L))),
        |  (array(0L, 0L), 0L,
        |   array(named_struct('idb', 7L, 'qe', array(1L, 0L), 'nrm', 1L))),
        |  (CAST(NULL AS ARRAY<BIGINT>), 9L,
        |   array(named_struct('idb', 8L, 'qe', array(1L, 0L), 'nrm', 1L)))
        |  AS t(qa, na, ms)""".stripMargin)
    val cmp = df.select(
      GraftFunctions.cellCosPairs($"qa", $"na", $"ms", theta).as("fast"),
      referencePairs($"qa", $"na", $"ms").as("slow"))
    assert(cmp.filter(not($"fast" <=> $"slow")).count() == 0)
    // the identical vector (idb 1) is the only survivor of row 1;
    // zero-norm / NULL / mismatch rows keep nothing
    val sizes = cmp.select(size($"fast")).as[Int].collect().toSeq
    assert(sizes == Seq(1, 0, 0))
  }

  test("cell_cos_pairs: NULL member array yields NULL (matches transform)") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT cell_cos_pairs(array(1L), 1L,
        |  CAST(NULL AS ARRAY<STRUCT<idb BIGINT, qe ARRAY<BIGINT>, nrm BIGINT>>),
        |  0.5D) AS p""".stripMargin).collect().head
    assert(row.isNullAt(0))
  }
}
