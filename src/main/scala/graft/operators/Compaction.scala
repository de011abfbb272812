package graft.operators

import org.apache.spark.sql.DataFrame

/** Output-layout control: parquet file-count/size management. Small-file
  * explosions are a top-3 operational failure at 100 TB (NameNode
  * pressure, scan task overhead); every long-lived table write should go
  * through one of these.
  */
object Compaction {

  /** Write df as ceil(n / targetRowsPerFile) parquet files. One extra
    * count() pass buys an exact file budget — preferable for final
    * tables; for intermediate writes use [[writeCapped]] (no extra pass).
    */
  def writeCompacted(df: DataFrame, path: String, targetRowsPerFile: Long,
      mode: String = "overwrite"): Long = {
    val n = df.count()
    val files = math.max(1, math.ceil(n.toDouble / targetRowsPerFile).toInt)
    df.repartition(files).write.mode(mode).parquet(path)
    files.toLong
  }

  /** Cap rows per file without a count pass (Spark splits files at the
    * cap during write; partition count stays the plan's).
    */
  def writeCapped(df: DataFrame, path: String, maxRecordsPerFile: Long,
      mode: String = "overwrite"): Unit =
    df.write.mode(mode)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)

  /** Rewrite an existing parquet directory to the target layout —
    * the maintenance "compact small files" job.
    */
  def compactDir(spark: org.apache.spark.sql.SparkSession, srcDir: String,
      dstDir: String, targetRowsPerFile: Long): Long =
    writeCompacted(spark.read.parquet(srcDir), dstDir, targetRowsPerFile)
}
