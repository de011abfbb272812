package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files
import scala.collection.mutable

/** Stop-with-savepoint / restore-from-savepoint over a file-source
  * streaming query: after restoring the checkpoint snapshot, the
  * restarted query resumes from the saved offsets — already-processed
  * files are not reprocessed, new files are.
  */
class SavepointSpec extends SparkSpec {

  object EventLog {
    val seen: mutable.Buffer[Long] = mutable.Buffer()
  }

  test("snapshot → restore resumes from saved offsets, no duplicates") {
    import spark.implicits._
    val srcDir = Files.createTempDirectory("sp_src").toString
    val ckpt = Files.createTempDirectory("sp_ckpt").toString
    val spRoot = Files.createTempDirectory("sp_root").toString

    def startQuery(checkpoint: String) =
      spark.readStream.schema("id LONG").parquet(srcDir)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          EventLog.synchronized {
            EventLog.seen ++= b.collect().map(_.getLong(0))
          }
          ()
        }
        .option("checkpointLocation", checkpoint)
        .trigger(Trigger.AvailableNow())
        .start()

    // phase 1: two files processed, then stop (graceful, like /api/stop)
    spark.range(0, 5).toDF("id").coalesce(1).write.mode("append").parquet(srcDir)
    spark.range(5, 10).toDF("id").coalesce(1).write.mode("append").parquet(srcDir)
    val q1 = startQuery(ckpt)
    q1.awaitTermination(60000)
    assert(EventLog.seen.sorted == (0L until 10L).toBuffer)

    // savepoint the stopped query's checkpoint
    val sp = Savepoints.snapshot(ckpt, spRoot, "job1")
    assert(Savepoints.list(spRoot, "job1") == Seq(sp))

    // phase 2: new data lands after the savepoint
    spark.range(10, 15).toDF("id").coalesce(1).write.mode("append").parquet(srcDir)

    // restore into a FRESH checkpoint dir and restart the same plan
    val ckpt2 = Files.createTempDirectory("sp_ckpt2").toString
    Savepoints.restore(sp, ckpt2)
    val q2 = startQuery(ckpt2)
    q2.awaitTermination(60000)

    // only the post-savepoint file was processed — no duplicates
    assert(EventLog.seen.sorted == (0L until 15L).toBuffer,
      s"got ${EventLog.seen.sorted}")
  }
}
