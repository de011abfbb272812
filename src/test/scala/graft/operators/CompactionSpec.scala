package graft.operators

import graft.SparkSpec
import java.nio.file.Files

class CompactionSpec extends SparkSpec {

  private def parquetFiles(dir: String): Int =
    new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))

  test("writeCompacted hits the exact file budget") {
    import spark.implicits._
    val dir = Files.createTempDirectory("cmp1").toString
    val files = Compaction.writeCompacted(
      spark.range(10000).toDF("id"), dir, targetRowsPerFile = 3000)
    assert(files == 4)
    assert(parquetFiles(dir) == 4)
    assert(spark.read.parquet(dir).count() == 10000)
  }

  test("writeCapped splits oversized partitions at the cap") {
    import spark.implicits._
    val dir = Files.createTempDirectory("cmp2").toString
    Compaction.writeCapped(
      spark.range(10000).toDF("id").coalesce(1), dir, maxRecordsPerFile = 2500)
    assert(parquetFiles(dir) == 4)
    assert(spark.read.parquet(dir).count() == 10000)
  }

  test("writeCompacted on an empty frame still writes a readable table") {
    import spark.implicits._
    val dir = Files.createTempDirectory("cmp0").toString
    val files = Compaction.writeCompacted(
      spark.range(0).toDF("id"), dir, targetRowsPerFile = 1000)
    assert(files == 1)
    assert(spark.read.parquet(dir).count() == 0)
  }

  test("compactDir rewrites a fragmented directory") {
    import spark.implicits._
    val frag = Files.createTempDirectory("cmp3").toString
    spark.range(5000).toDF("id").repartition(50).write
      .mode("overwrite").parquet(frag)
    assert(parquetFiles(frag) == 50)
    val dst = Files.createTempDirectory("cmp4").toString
    Compaction.compactDir(spark, frag, dst, targetRowsPerFile = 5000)
    assert(parquetFiles(dst) == 1)
    assert(spark.read.parquet(dst).count() == 5000)
  }
}
