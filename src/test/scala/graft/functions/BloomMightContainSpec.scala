package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Pins [[BloomMightContain]] against the sketch library's own probe:
  * identical might-contain set (the expression must not admit or drop
  * anything the driver-side `mightContain(string)` path wouldn't), zero
  * false negatives for inserted keys, NULL propagation, binary input,
  * and the whole point of the expression — the probe runs inside
  * whole-stage codegen with no UDF boundary.
  */
class BloomMightContainSpec extends SparkSpec {
  import spark.implicits._

  private def filterOf(keys: Seq[String], fpp: Double = 0.03): BloomFilter = {
    val bf = BloomFilter.create(math.max(keys.size, 1).toLong, fpp)
    keys.foreach(bf.putString)
    bf
  }

  test("probe set is identical to the sketch's own mightContainString " +
    "(interpreted AND codegen paths)") {
    // salted md5-ish tokens plus non-ASCII — byte-level hashing must
    // agree beyond the ASCII plane
    val inserted = (0 until 500).map(i => s"k$i-é✓-${i * 31}")
    val absent = (0 until 500).map(i => s"missing-$i-漢")
    val bf = filterOf(inserted)
    val bc = spark.sparkContext.broadcast(bf)
    val df = (inserted ++ absent).toDF("s")
      .withColumn("m", BloomMightContain($"s", bc))
    val got = df.collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    val exp = (inserted ++ absent).map(s => s -> bf.mightContainString(s))
    assert(exp.forall { case (s, e) => got(s) == e },
      "expression and driver-side probe must agree on every key")
    // no false negatives: every inserted key passes
    assert(inserted.forall(got(_)))
  }

  test("NULL input yields NULL, not false — a NULL digest must not be " +
    "silently classified as definitely-new") {
    val bc = spark.sparkContext.broadcast(filterOf(Seq("a")))
    val rows = Seq(Some("a"), None).toDF("s")
      .select(BloomMightContain($"s", bc).as("m")).collect()
    assert(rows(0).getBoolean(0))
    assert(rows(1).isNullAt(0))
  }

  test("binary input probes the same bytes as its string spelling") {
    val keys = Seq("alpha", "β-beta")
    val bc = spark.sparkContext.broadcast(filterOf(keys))
    val viaString = Seq("alpha", "β-beta", "gamma").toDF("s")
      .select(BloomMightContain($"s", bc).as("m"))
      .collect().map(_.getBoolean(0)).toSeq
    val viaBinary = Seq("alpha", "β-beta", "gamma").toDF("s")
      .select(BloomMightContain($"s".cast("binary"), bc).as("m"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(viaString == viaBinary)
    assert(viaString.take(2) == Seq(true, true))
  }

  test("probe compiles into whole-stage codegen — no UDF boundary") {
    val bc = spark.sparkContext.broadcast(filterOf(Seq("7", "42")))
    // range source: a local relation would be constant-folded at plan
    // time (the interpreted eval path), sidestepping codegen entirely
    val df = spark.range(100).select($"id".cast("string").as("s"))
      .filter(BloomMightContain($"s", bc))
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" is the WholeStageCodegen stage marker in the compact plan
    // form — the Filter carrying the probe must be inside a stage
    assert(plan.linesIterator.exists(l =>
      l.contains("Filter bloom_might_contain") && l.contains("*(")),
      s"bloom probe should stay in codegen, got:\n$plan")
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"),
      s"bloom probe must not cross a UDF boundary, got:\n$plan")
    // the generated code actually runs, and inserted keys survive
    val got = df.collect().map(_.getString(0)).toSet
    assert(Set("7", "42").subsetOf(got))
  }

  test("non-string/binary input is rejected at analysis") {
    val bc = spark.sparkContext.broadcast(filterOf(Seq("x")))
    val e = intercept[Exception] {
      Seq(1L).toDF("v").select(BloomMightContain($"v", bc)).collect()
    }
    assert(e.getMessage.contains("bloom_might_contain"))
  }
}
