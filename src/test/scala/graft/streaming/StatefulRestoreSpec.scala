package graft.streaming

import graft.SparkSpec
import graft.operators.{PatternMeasure, PatternVar, RowPattern, RowPatternSpec}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files
import scala.collection.mutable

/** Stop-with-savepoint → restore for the STATEFUL streaming operators
  * (the reference's headline platform verb, CommandUtil.java:34-36,
  * previously proven only for source offsets): a streaming
  * MATCH_RECOGNIZE and a runningOverFrame OVER are killed MID-DRAIN
  * with live keyed state — buffered rows whose matches/frames have not
  * flushed — restarted from the same checkpoint, and must emit exactly
  * what an uninterrupted run emits. Also pins that the MATCH_RECOGNIZE
  * state is EXPLICIT-SCHEMA encoded (the checkpoint's state schema
  * names the prepped projection columns), not an opaque Kryo blob tied
  * to Scala class shape.
  */
class StatefulRestoreSpec extends SparkSpec {

  object Sink {
    val rows: mutable.Buffer[Seq[Any]] = mutable.Buffer()
  }

  private def collectBatches(df: DataFrame, ckpt: String,
      mode: String = "append") =
    df.writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Row], _: Long) =>
        val got = b.collect().map(_.toSeq)
        Sink.synchronized { Sink.rows ++= got }
        ()
      }
      .outputMode(mode)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()

  // ---- MATCH_RECOGNIZE over a file source ----

  private val mrSpec = RowPatternSpec(
    partitionBy = Seq("user"),
    orderBy = "ts",
    vars = Seq(
      PatternVar("A", 1, 1, greedy = true, cond = Some("v = 1")),
      PatternVar("B", 1, 1, greedy = true, cond = Some("v = 2"))),
    measures = Seq(
      PatternMeasure("A", "v", first = true, alias = "a_v"),
      PatternMeasure("B", "v", first = false, alias = "b_v")),
    withinMs = Some(10000L),
    skipPastLastRow = true)

  private def mrStream(srcDir: String): DataFrame = {
    val src = spark.readStream
      .schema("user STRING, ts TIMESTAMP, v LONG").parquet(srcDir)
      .withWatermark("ts", "1 second")
    RowPattern.streaming(src, mrSpec)
  }

  private def writeRows(dir: String, rows: (String, Long, Long)*): Unit = {
    import spark.implicits._
    rows.toSeq.toDF("user", "ts_s", "v")
      .select(col("user"), timestamp_seconds(col("ts_s")).as("ts"), col("v"))
      .coalesce(1).write.mode("append").parquet(dir)
  }

  // phase 1 leaves a COMPLETE (A at t=1, B at t=2) match pending: its
  // anchor's WITHIN horizon (t=11s) is far past phase 1's watermark
  // (max ts 5s − 1s delay = 4s), so the match lives only in keyed
  // state at the kill. phase 2 advances the watermark past the horizon.
  private val phase1 = Seq(("u1", 1L, 1L), ("u1", 2L, 2L), ("u2", 5L, 7L))
  private val phase2 = Seq(("u1", 30L, 1L), ("u1", 31L, 2L),
    ("u2", 60L, 7L))

  test("streaming MATCH_RECOGNIZE: kill with a pending match in keyed " +
    "state, restore from checkpoint, output equals the uninterrupted run") {
    // uninterrupted baseline: all files visible from the start
    val fullDir = Files.createTempDirectory("mr_full_src").toString
    writeRows(fullDir, phase1: _*); writeRows(fullDir, phase2: _*)
    Sink.rows.clear()
    val qFull = collectBatches(mrStream(fullDir),
      Files.createTempDirectory("mr_full_ck").toString)
    qFull.awaitTermination(120000)
    val expected = Sink.synchronized(Sink.rows.toVector).sortBy(_.toString)
    // both (A,B) matches must be in the baseline
    assert(expected.size == 2, s"baseline: $expected")

    // interrupted run: phase 1 → stop with live state → restore
    val srcDir = Files.createTempDirectory("mr_kill_src").toString
    val ckpt = Files.createTempDirectory("mr_kill_ck").toString
    writeRows(srcDir, phase1: _*)
    Sink.rows.clear()
    val q1 = collectBatches(mrStream(srcDir), ckpt)
    q1.awaitTermination(120000)
    val beforeKill = Sink.synchronized(Sink.rows.size)
    assert(beforeKill == 0,
      s"phase 1 must leave the match PENDING in state, emitted: " +
        Sink.synchronized(Sink.rows.toVector))

    // the checkpointed state schema names the prepped projection
    // columns — explicit-schema encoding, not a Kryo binary blob
    import scala.jdk.CollectionConverters._
    val stateFiles = Files.walk(java.nio.file.Paths.get(ckpt))
      .iterator().asScala.filter(Files.isRegularFile(_)).toVector
    val schemaHit = stateFiles.exists { f =>
      val bytes = Files.readAllBytes(f)
      new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
        .contains("__graft_mr_c0")
    }
    assert(schemaHit,
      "no checkpoint file names the prepped state columns — state is " +
        s"not explicit-schema encoded (scanned ${stateFiles.size} files)")

    writeRows(srcDir, phase2: _*)
    val q2 = collectBatches(mrStream(srcDir), ckpt)
    q2.awaitTermination(120000)
    val got = Sink.synchronized(Sink.rows.toVector).sortBy(_.toString)
    assert(got == expected,
      s"restore diverged: got=$got expected=$expected")
  }

  // ---- runningOverFrame over a file source ----

  private def overStream(srcDir: String) = {
    import spark.implicits._
    val src = spark.readStream
      .schema("user_id LONG, ts_us LONG, event_id LONG, cents LONG")
      .parquet(srcDir).as[OverIn]
    StreamOps.runningOverFrame(src, preceding = 2, delay = "1 second")
  }

  private def writeOver(dir: String, rows: (Long, Long, Long, Long)*): Unit = {
    import spark.implicits._
    rows.toSeq.toDF("user_id", "ts_us", "event_id", "cents")
      .coalesce(1).write.mode("append").parquet(dir)
  }

  // phase 1: rows at 1s/2s ripen (wm = 5s − 1s = 4s); the 5s row is
  // HELD in state with the live 2-row frame. phase 2's 30s row pushes
  // the watermark to 29s, ripening it — the 30s row itself never
  // ripens (nothing advances the watermark past it), in BOTH runs.
  private val over1 = Seq((1L, 1000000L, 1L, 10L), (1L, 2000000L, 2L, 20L),
    (1L, 5000000L, 3L, 30L))
  private val over2 = Seq((1L, 30000000L, 4L, 40L))

  test("runningOverFrame: kill with held rows and a live frame, restore, " +
    "output equals the uninterrupted run") {
    val fullDir = Files.createTempDirectory("ov_full_src").toString
    writeOver(fullDir, over1: _*); writeOver(fullDir, over2: _*)
    Sink.rows.clear()
    val qFull = collectBatches(overStream(fullDir).toDF(),
      Files.createTempDirectory("ov_full_ck").toString, "update")
    qFull.awaitTermination(120000)
    val expected = Sink.synchronized(Sink.rows.toVector).sortBy(_.toString)
    assert(expected.size == 3, s"baseline: $expected")

    val srcDir = Files.createTempDirectory("ov_kill_src").toString
    val ckpt = Files.createTempDirectory("ov_kill_ck").toString
    writeOver(srcDir, over1: _*)
    Sink.rows.clear()
    val q1 = collectBatches(overStream(srcDir).toDF(), ckpt, "update")
    q1.awaitTermination(120000)
    val emitted1 = Sink.synchronized(Sink.rows.toVector)
    assert(emitted1.size == 2,
      s"phase 1 must hold the 5s row in state at the kill, emitted: " +
        emitted1.toString)

    writeOver(srcDir, over2: _*)
    val q2 = collectBatches(overStream(srcDir).toDF(), ckpt, "update")
    q2.awaitTermination(120000)
    val got = Sink.synchronized(Sink.rows.toVector).sortBy(_.toString)
    assert(got == expected,
      s"restore diverged: got=$got expected=$expected")
  }
}
