package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Native LongDotProduct: equivalence with the composable higher-order
  * formulation, null handling, and codegen participation.
  */
class VecSpec extends SparkSpec {
  import spark.implicits._

  test("long_dot equals aggregate(zip_with(...)) on random vectors") {
    GraftFunctions.register(spark)
    val df = spark.range(200).select($"id",
      transform(sequence(lit(1), lit(64)),
        i => pmod(hash($"id" * i), lit(1000)).cast("long")).as("a"),
      transform(sequence(lit(1), lit(64)),
        i => pmod(hash($"id" + i), lit(1000)).cast("long")).as("b"))
    val cmp = df.select(
      GraftFunctions.longDot($"a", $"b").as("fast"),
      aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0L),
        (acc, x) => acc + x).as("slow"))
    assert(cmp.filter($"fast" =!= $"slow").count() == 0)
  }

  test("long_dot: SQL-conformant nulls — null array, length mismatch, null element") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT long_dot(CAST(NULL AS ARRAY<BIGINT>), array(1L)) AS n,
        |       long_dot(array(), array()) AS z,
        |       long_dot(array(2L, 3L), array(10L, 100L)) AS v,
        |       long_dot(array(1L, 2L, 3L), array(1L, 2L)) AS mismatch,
        |       long_dot(array(1L, CAST(NULL AS BIGINT)), array(1L, 1L)) AS nullel""".stripMargin)
      .collect().head
    assert(row.isNullAt(0))
    assert(row.getLong(1) == 0L)
    assert(row.getLong(2) == 320L)
    assert(row.isNullAt(3)) // zip_with would pad with NULL → NULL sum
    assert(row.isNullAt(4)) // NULL element nulls the sum, not read as 0
  }

  test("argmin_cos: winner, tie-break, null paths — codegen and interpreted agree") {
    GraftFunctions.register(spark)
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val cids = Array(0L, 1L, 2L)
    // centroids: (1,0), (0,1), (1,0) — cid 2 duplicates cid 0
    val cents = Array(1L, 0L, 0L, 1L, 1L, 0L)
    val cnorms = Array(1L, 1L, 1L)
    val schema = StructType(Seq(
      StructField("qe", ArrayType(LongType), nullable = true),
      StructField("nrm", LongType, nullable = true)))
    val rows = Seq(
      Row(Seq(3L, 1L), 10L),   // cos: c0=3/√10, c1=1/√10, c2=3/√10 → tie c0/c2 → cid 0
      Row(Seq(0L, 5L), 25L),   // c1 wins
      Row(Seq(0L, 0L), 0L),    // zero norm → all NULL → cell 0, ccos NULL
      Row(null, 4L),           // NULL vector → cell 0, ccos NULL
      Row(Seq(1L, 2L, 3L), 14L)) // dim mismatch → cell 0, ccos NULL
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
      .select(GraftFunctions.argminCos($"qe", $"nrm", cids, cents, cnorms)
        .as("am"))
      .select($"am.cell", $"am.ccos")
    val got = df.collect().map(r =>
      (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    assert(got(0) == (0L, Some(3.0 / math.sqrt(10.0)))) // tie → lowest cid
    assert(got(1) == (1L, Some(1.0)))
    assert(got(2) == (0L, None))
    assert(got(3) == (0L, None))
    assert(got(4) == (0L, None))
    // the fused node stays inside whole-stage codegen
    val plan = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) """.r.findFirstIn(plan).isDefined, plan)
  }

  test("long_dot participates in whole-stage codegen") {
    GraftFunctions.register(spark)
    val df = spark.range(10).select(
      transform(sequence(lit(1), lit(4)), i => i.cast("long")).as("a"))
      .select(GraftFunctions.longDot($"a", $"a").as("d"))
    // the `*(n)` prefix marks operators inside a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[long_dot""".r.findFirstIn(plan).isDefined, plan)
    assert(df.collect().map(_.getLong(0)).forall(_ == 30L)) // 1+4+9+16
  }
}
