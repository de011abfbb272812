package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Z-order layout: interleave arithmetic pinned against a bit-twiddling
  * reference, and the clustering property that justifies the operator —
  * range-partitioning on the Z-key gives every partition a tight
  * min/max envelope on BOTH dimensions.
  */
class ZOrderSpec extends SparkSpec {

  private def refSpread(x: Long): Long = {
    var v = x & 0xFFFFL
    v = (v | (v << 8)) & 0x00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0FL
    v = (v | (v << 2)) & 0x33333333L
    v = (v | (v << 1)) & 0x55555555L
    v
  }
  private def refZ(a: Long, b: Long): Long = refSpread(a) | (refSpread(b) << 1)

  test("zValue2 matches the reference interleave on boundary and random values") {
    import spark.implicits._
    val cases = Seq[(Long, Long)]((0, 0), (1, 0), (0, 1), (0xFFFF, 0xFFFF),
      (0xFFFF, 0), (0, 0xFFFF), (12345, 54321), (50, 99), (32768, 1)) ++
      (1 to 50).map(i => ((i * 2654435761L) & 0xFFFFL, (i * 40503L) & 0xFFFFL))
    val df = cases.toDF("a", "b")
      .withColumn("z", ZOrder.zValue2(col("a"), col("b")))
    df.collect().foreach { r =>
      assert(r.getLong(2) == refZ(r.getLong(0), r.getLong(1)),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("zValue2 is monotone in each dimension holding the other fixed") {
    // Morton order preserves per-dimension order: more of either
    // coordinate can only increase the key when the other is fixed.
    for (b <- Seq(0L, 7L, 1000L); a <- 1L to 100L)
      assert(refZ(a, b) > refZ(a - 1, b))
    for (a <- Seq(0L, 7L, 1000L); b <- 1L to 100L)
      assert(refZ(a, b) > refZ(a, b - 1))
  }

  test("clusterBy2 envelopes are tight on both dims; a 1-D sort is not") {
    import spark.implicits._
    // A 64x64 grid, shuffled: 4096 points, both dims uniform.
    val pts = spark.range(4096).select(
      ($"id" % 64).as("x"), ($"id" / 64).as("y"))
      .repartition(8) // destroy any incidental ordering
    val nPart = 16

    def avgSpans(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val spans = df.groupBy(spark_partition_id().as("p"))
        .agg((max($"x") - min($"x")).as("sx"), (max($"y") - min($"y")).as("sy"))
        .agg(avg($"sx"), avg($"sy")).head()
      (spans.getDouble(0), spans.getDouble(1))
    }

    val (zx, zy) = avgSpans(
      ZOrder.clusterBy2(pts, col("x"), col("y"), nPart))
    val (sx, sy) = avgSpans(
      pts.repartitionByRange(nPart, col("x")).sortWithinPartitions(col("x")))

    // 1-D layout: perfect on x, useless on y (full 63 span).
    assert(sx < 8, s"1-D sort should be tight on x, got $sx")
    assert(sy > 55, s"1-D sort should cover ~all of y, got $sy")
    // Z-order: BOTH dims well under half the domain in every partition
    // on average — each partition is a rectangle, not a stripe.
    assert(zx < 32, s"z-order x span too wide: $zx")
    assert(zy < 32, s"z-order y span too wide: $zy")
  }

  test("the pruning win, measured: a 2nd-dim filter reads fewer z-files") {
    import spark.implicits._
    // Write the SAME 64x64 grid both ways, 16 files each, then count
    // the files a min/max pruner must read for a filter on the SECOND
    // dimension — the case a linear sort cannot skip. The per-file
    // min/max envelope is exactly what parquet row-group stats (or any
    // file-level index) prune on, so 'files whose envelope overlaps the
    // predicate' IS the files-read count of a stats-based scan.
    val pts = spark.range(4096).select(
      ($"id" % 64).as("x"), ($"id" / 64).as("y")).repartition(8)
    val zDir = java.nio.file.Files.createTempDirectory("zord_z").toString
    val xDir = java.nio.file.Files.createTempDirectory("zord_x").toString
    ZOrder.clusterBy2(pts, col("x"), col("y"), 16)
      .write.mode("overwrite").parquet(zDir)
    pts.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(xDir)

    def filesOverlapping(dir: String, lo: Int, hi: Int): (Long, Long) = {
      val stats = spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min($"y").as("ymin"), max($"y").as("ymax"))
      (stats.filter($"ymax" >= lo && $"ymin" <= hi).count(), stats.count())
    }

    val (zRead, zTotal) = filesOverlapping(zDir, 16, 23)
    val (xRead, xTotal) = filesOverlapping(xDir, 16, 23)
    assert(zTotal == 16 && xTotal == 16, s"$zTotal / $xTotal files written")
    // x-sorted stripes all span the full y domain — nothing prunes
    assert(xRead == 16, s"1-D layout should read every file, got $xRead")
    // z-order rectangles: only the tiles whose y-envelope overlaps the
    // 8-row band survive — at most half the files, typically a quarter
    assert(zRead <= 8, s"z-order should prune most files, read $zRead of 16")
  }
}
