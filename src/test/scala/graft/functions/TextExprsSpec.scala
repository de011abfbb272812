package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Native text expressions (WordNgrams / CountInSet / TextFingerprint):
  * element-for-element equivalence with the interpreted higher-order
  * formulations they replace, null handling, and codegen participation.
  */
class TextExprsSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a b",
    "single",
    "the the the the",
    "numbers 123 and symbols £µ€ stay utf8 safe").toDF("text")
    .withColumn("w", split($"text", " "))

  test("word_ngrams equals transform(sequence(...)) shingles for n=2,3") {
    GraftFunctions.register(spark)
    for (n <- Seq(2, 3)) {
      val hof = transform(sequence(lit(1), size($"w") - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at($"w", i + k)): _*))
      val rows = docs.filter(size($"w") >= n)
        .select(GraftFunctions.wordNgrams($"w", n).as("fused"), hof.as("hof"))
        .collect()
      assert(rows.nonEmpty)
      rows.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1), r))
    }
  }

  test("word_ngrams yields empty array under n tokens; null array → null") {
    GraftFunctions.register(spark)
    val out = Seq(Some("one"), None).toDF("text")
      .select(GraftFunctions.wordNgrams(split($"text", " "), 3).as("g"))
      .collect()
    assert(out(0).getSeq[String](0) == Seq.empty)
    assert(out(1).isNullAt(0))
  }

  test("count_in equals size(filter(array_contains)) incl. repeats and misses") {
    GraftFunctions.register(spark)
    val set = Seq("the", "a", "of")
    val hof = size(filter($"w", x => array_contains(typedLit(set), x)))
    val rows = docs
      .select(GraftFunctions.countIn($"w", set).as("fused"), hof.as("hof"))
      .collect()
    assert(rows.map(_.getInt(0)).toSeq == rows.map(_.getInt(1)).toSeq)
    // repeats counted per occurrence, not per distinct hit
    assert(rows.map(_.getInt(0)).contains(4)) // "the the the the"
  }

  test("text_fingerprint equals the aggregate(transform(md5)) rolling fold") {
    GraftFunctions.register(spark)
    val codes = transform($"w",
      x => conv(substring(md5(x), 1, 15), 16, 10).cast("long") % 1000000L)
    val hof = aggregate(codes, lit(0L),
      (acc, x) => (acc * 31L + x) % 1000000007L)
    val rows = docs
      .select(GraftFunctions.textFingerprint($"w").as("fused"), hof.as("hof"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r))
    // order sensitivity: permuted tokens change the fingerprint
    val fp = (t: String) => Seq(t).toDF("text")
      .select(GraftFunctions.textFingerprint(split($"text", " ")))
      .collect().head.getLong(0)
    assert(fp("a b c") != fp("c b a"))
  }

  test("jaccard_distinct equals size(intersect)/size(union) on distinct arrays") {
    GraftFunctions.register(spark)
    val pairs = docs.select(array_distinct($"w").as("a"))
      .crossJoin(docs.select(array_distinct($"w").as("b")))
    val hof = size(array_intersect($"a", $"b")).cast("double") /
      size(array_union($"a", $"b"))
    val rows = pairs
      .select(GraftFunctions.jaccardDistinct($"a", $"b").as("fused"),
        hof.as("hof"))
      .collect()
    assert(rows.length == 25)
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1), r))
    // empty ∪ empty → NULL, matching 0/0 under a nullif guard
    val e = Seq((Seq.empty[String], Seq.empty[String])).toDF("a", "b")
      .select(GraftFunctions.jaccardDistinct($"a", $"b")).collect().head
    assert(e.isNullAt(0))
  }

  test("first_common_pos equals the filter/array_position lambda it replaces") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(18)
    val vocab = (0 until 40).map(i => s"t$i")
    val data = (0 until 300).map { _ =>
      def arr() = rnd.shuffle(vocab).take(rnd.nextInt(12)).sorted
      (arr(), arr(), 1 + rnd.nextInt(12))
    }
    val df = data.toDF("a", "b", "lim")
    // the streaming Jaccard kernel's original anchors, as oracles:
    // full-array — first b element contained in a, via its position
    val hofFull = array_position($"b",
      try_element_at(filter($"b", t => array_contains($"a", t)), lit(1)))
    // limited — first b element among the first `lim` elements of a
    val hofLim = array_position($"b",
      try_element_at(filter($"b",
        t => array_position($"a", t).between(lit(1), $"lim")), lit(1)))
    val rows = df.select(
        GraftFunctions.firstCommonPos($"a", $"b").as("pf"),
        when(hofFull === 0, null).otherwise(hofFull).as("hf"),
        GraftFunctions.firstCommonPos($"a", $"b", $"lim").as("pl"),
        when(hofLim === 0, null).otherwise(hofLim).as("hl"))
      .collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1) &&
        (r.isNullAt(0) || r.getInt(0).toLong == r.getLong(1)), r)
      assert(r.isNullAt(2) == r.isNullAt(3) &&
        (r.isNullAt(2) || r.getInt(2).toLong == r.getLong(3)), r)
    }
    // disjoint and empty inputs → NULL; limit past |a| is a no-op clamp
    val edge = Seq((Seq("x", "y"), Seq("p", "q"), 99))
      .toDF("a", "b", "lim")
      .select(GraftFunctions.firstCommonPos($"a", $"b").as("d"),
        GraftFunctions.firstCommonPos($"a", array().cast("array<string>"))
          .as("eb"),
        GraftFunctions.firstCommonPos(array().cast("array<string>"), $"b")
          .as("ea"),
        GraftFunctions.firstCommonPos($"a", $"b", $"lim").as("dl"))
      .collect().head
    (0 until 4).foreach(i => assert(edge.isNullAt(i), edge))
  }

  test("quant_vec equals the transform(floor) quantization lambda") {
    GraftFunctions.register(spark)
    val df = spark.range(100).select(
      transform(sequence(lit(1), lit(64)),
        i => (hash($"id" * i).cast("double") / 1e7).cast("float")).as("v"))
    val hof = transform($"v",
      x => floor(x.cast("double") * lit(1000000.0) + lit(0.5)))
    val rows = df.select(GraftFunctions.quantVec($"v").as("fused"),
      hof.as("hof")).collect()
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1), r))
    // null elements stay null, null array is null
    val edge = Seq((Seq(Option(1.5f), Option.empty[Float]),
      Option.empty[Seq[Float]]))
      .toDF("a", "b")
      .select(GraftFunctions.quantVec($"a").as("qa"),
        GraftFunctions.quantVec($"b").as("qb"))
      .collect().head
    assert(edge.getSeq[Any](0) == Seq(1500000L, null))
    assert(edge.isNullAt(1))
  }

  test("native text exprs run inside whole-stage codegen") {
    GraftFunctions.register(spark)
    // range source: a literal local table would be constant-folded into
    // a LocalTableScan with no codegen stage at all
    val plan = spark.range(100)
      .select(split(concat_ws(" ", lit("the"), $"id".cast("string"),
        lit("quick fox")), " ").as("w"))
      .select(
      GraftFunctions.wordNgrams($"w", 2).as("g"),
      GraftFunctions.countIn($"w", Seq("the")).as("c"),
      GraftFunctions.textFingerprint($"w").as("f"))
      .queryExecution.executedPlan.toString
    // the `*(n)` prefix marks operators fused into a whole-stage-codegen
    // stage; the projection holding all three expressions must carry it
    assert("\\*\\(\\d+\\) Project \\[word_ngrams".r.findFirstIn(plan).isDefined,
      plan)
  }
}
