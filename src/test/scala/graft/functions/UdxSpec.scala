package graft.functions

import graft.SparkSpec
import graft.sqlgate.ScriptRunner
import org.apache.spark.sql.functions._

/** UDF / UDAF / UDTF surface: direct registration and via the gate's
  * `CREATE FUNCTION name AS 'class'` DDL (reference UDF contract).
  */
class UdxSpec extends SparkSpec {

  test("scalar UDF + Aggregator UDAF + generator UDTF") {
    import spark.implicits._
    spark.udf.register("norm", Udx.normalize)
    spark.udf.register("dsum", udaf(new Udx.DecimalSum))
    spark.udf.register("ngrams", Udx.ngrams)

    val df = Seq(("  Hello   World ", 1.005), ("FOO bar", 2.005))
      .toDF("s", "x")
    df.createOrReplaceTempView("udx_in")

    val row = spark.sql(
      """SELECT collect_list(norm(s)) AS ns, dsum(x) AS dx FROM udx_in""")
      .collect().head
    assert(row.getSeq[String](0).toSet == Set("hello world", "foo bar"))
    // BigDecimal half-up at scale 2: 1.005→1.01 (stored double is
    // 1.00499... so rounds to 1.00? No: java BigDecimal(double) sees the
    // full binary expansion) — assert the exact deterministic result:
    val expected = Seq(1.005, 2.005).map(v =>
      new java.math.BigDecimal(v).setScale(2, java.math.RoundingMode.HALF_UP))
      .reduce(_.add(_)).doubleValue
    assert(row.getDouble(1) == expected)

    val grams = spark.sql(
      "SELECT explode(ngrams('a b c d', 2)) AS g").as[String].collect()
    assert(grams.toSeq == Seq("a b", "b c", "c d"))
  }

  test("gate: CREATE FUNCTION AS 'class' registers and is usable in INSERT") {
    import spark.implicits._
    val runner = new ScriptRunner(spark, batchMode = true)
    Seq(("  MiXeD Case  ", 1L)).toDF("txt", "k")
      .createOrReplaceTempView("fn_src")
    runner.run(
      """CREATE FUNCTION my_norm AS 'graft.functions.Normalize';
        |CREATE TABLE fn_snk (t VARCHAR, k BIGINT)
        |  WITH ('connector' = 'memory');
        |INSERT INTO fn_snk SELECT my_norm(txt) AS t, k FROM fn_src;
        |""".stripMargin)
    val out = spark.table("fn_snk_out").as[(String, Long)].collect()
    assert(out.toSeq == Seq(("mixed case", 1L)))
  }
}
