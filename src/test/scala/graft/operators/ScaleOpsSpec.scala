package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Scale mechanics: salted-join equivalence under extreme skew, bucketed
  * co-located joins (no Exchange), and partition-pruned reads.
  */
class ScaleOpsSpec extends SparkSpec {

  test("saltedJoin: identical results to a plain join under 90% hot-key skew") {
    import spark.implicits._
    // 9000 rows on key 0, 1000 spread over 1..1000
    val big = spark.range(10000).select(
      when($"id" < 9000, 0L).otherwise($"id" - 8999).as("k"),
      $"id".as("payload"))
    val small = spark.range(0, 1001).select($"id".as("k"),
      concat(lit("dim_"), $"id").as("name"))
    val expected = big.join(small, Seq("k"))
      .select($"k", $"payload", $"name").collect().toSet
    val got = ScaleOps.saltedJoin(big, small, Seq("k"), salts = 8)
      .select($"k", $"payload", $"name").collect().toSet
    assert(got == expected)
    assert(got.size == 10000)
  }

  test("hotKeys surfaces the skewed key") {
    import spark.implicits._
    val big = spark.range(1000).select(
      when($"id" < 900, 7L).otherwise($"id").as("k"))
    val hot = ScaleOps.hotKeys(big, Seq("k"), 1).collect().head
    assert(hot.getLong(0) == 7L && hot.getLong(1) == 900L)
  }

  test("bucketize: equal-width buckets, clamped at the edges") {
    import spark.implicits._
    val out = spark.range(1).select(
      ScaleOps.bucketize(lit(-5.0), 0.0, 100.0, 10).as("lo"),
      ScaleOps.bucketize(lit(0.0), 0.0, 100.0, 10).as("b0"),
      ScaleOps.bucketize(lit(55.0), 0.0, 100.0, 10).as("b5"),
      ScaleOps.bucketize(lit(100.0), 0.0, 100.0, 10).as("hi"),
      ScaleOps.bucketize(lit(999.0), 0.0, 100.0, 10).as("over"))
      .as[(Int, Int, Int, Int, Int)].head()
    assert(out == ((0, 0, 5, 9, 9)))
  }

  test("bucketed tables join without a shuffle (co-located SMJ)") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS bko_a")
    spark.sql("DROP TABLE IF EXISTS bko_b")
    spark.range(1000).select($"id".as("k"), ($"id" * 2).as("va"))
      .write.bucketBy(8, "k").sortBy("k").saveAsTable("bko_a")
    spark.range(500).select($"id".as("k"), ($"id" * 3).as("vb"))
      .write.bucketBy(8, "k").sortBy("k").saveAsTable("bko_b")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bko_a").join(spark.table("bko_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == 500)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("partitionBy write → partition-pruned read (PartitionFilters)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("part_prune").toString
    spark.range(1000)
      .select($"id", ($"id" % 10).as("p"))
      .write.partitionBy("p").mode("overwrite").parquet(dir)
    val pruned = spark.read.parquet(dir).filter($"p" === 3)
    val scan = pruned.queryExecution.sparkPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    // the partition filter prunes 9 of 10 directories at planning time
    assert(scan.metadata("PartitionFilters").contains("(p"),
      scan.metadata("PartitionFilters"))
    assert(scan.relation.location.listFiles(scan.partitionFilters, Nil)
      .length == 1)
    assert(pruned.count() == 100)
  }
}
