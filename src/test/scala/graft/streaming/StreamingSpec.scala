package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.sql.Timestamp

final case class Ev(user: Long, kind: String, ts: Timestamp, value: Double)

/** Structured Streaming behavior specs driven by MemoryStream: windowed
  * aggs with watermark + late-data drop, session windows, stream-stream
  * interval join, within-watermark dedup, custom keyed state, foreachBatch
  * upsert. These pin the semantics the batch Windows pack checks against
  * DuckDB, on actual incremental execution.
  */
class StreamingSpec extends SparkSpec {

  private def t(minute: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:$sec%02d")

  test("tumbling window with watermark: closed windows emit, late rows drop") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val out = StreamOps.tumblingAgg(in.toDF(), "ts", "1 minute",
      "1 minute", Seq("kind"))
    val q = out.writeStream.format("memory").queryName("tumble_t")
      .outputMode("append").start()
    try {
      in.addData(Ev(1, "a", t(0, 10), 1.0), Ev(2, "a", t(0, 50), 2.0),
        Ev(3, "b", t(1, 10), 3.0))
      q.processAllAvailable() // watermark ~10:00:10; nothing closed yet
      in.addData(Ev(4, "a", t(5, 0), 4.0)) // advances watermark to 10:04
      q.processAllAvailable() // closes 10:00 and 10:01 windows
      val rows = spark.table("tumble_t")
        .select($"wstart".cast("string"), $"kind", $"n", $"sum_value")
        .as[(String, String, Long, Double)].collect().toSet
      assert(rows == Set(
        ("2024-01-01 10:00:00", "a", 2L, 3.0),
        ("2024-01-01 10:01:00", "b", 1L, 3.0)))
      // late row inside an already-closed window: dropped
      in.addData(Ev(5, "a", t(0, 30), 100.0))
      q.processAllAvailable()
      assert(spark.table("tumble_t").count() == 2)
    } finally q.stop()
  }

  test("session window merges within gap, splits past gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val out = StreamOps.sessionAgg(in.toDF(), "ts", "1 minute",
      "2 minutes", Seq("user"))
    val q = out.writeStream.format("memory").queryName("sess_t")
      .outputMode("append").start()
    try {
      // user 1: events at 10:00, 10:01, 10:05 → sessions {00,01} and {05}
      in.addData(Ev(1, "a", t(0), 1.0), Ev(1, "a", t(1), 1.0),
        Ev(1, "a", t(5), 1.0))
      in.addData(Ev(9, "z", t(30), 0.0)) // watermark pusher
      q.processAllAvailable()
      val rows = spark.table("sess_t")
        .filter($"user" === 1)
        .select($"wstart".cast("string"), $"n")
        .as[(String, Long)].collect().toSet
      assert(rows == Set(("2024-01-01 10:00:00", 2L),
        ("2024-01-01 10:05:00", 1L)))
    } finally q.stop()
  }

  test("stream-stream interval join (demo_2 dual-stream shape)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val buys = MemoryStream[Ev]
    val joined = StreamOps.intervalJoin(
      clicks.toDF().select($"user", $"ts"),
      buys.toDF().select($"user".as("r_user"), $"ts".as("bts"), $"value"),
      "user", "ts", "bts", "1 minute", "'10' MINUTE")
    val q = joined.writeStream.format("memory").queryName("join_t")
      .outputMode("append").start()
    try {
      clicks.addData(Ev(1, "c", t(0), 0), Ev(2, "c", t(0), 0))
      buys.addData(Ev(1, "b", t(5), 9.5), // within 10 min of click → joins
        Ev(2, "b", t(20), 7.0)) // outside → no join
      clicks.addData(Ev(9, "c", t(40), 0)) // watermark pushers
      buys.addData(Ev(9, "b", t(40), 0))
      q.processAllAvailable()
      val rows = spark.table("join_t").select($"user", $"value")
        .as[(Long, Double)].collect().toSet
      // user 9 is the watermark pusher (joins with itself at t40);
      // the real assertions: user 1 joined within bounds, user 2 did not.
      assert(rows.filter(_._1 != 9L) == Set((1L, 9.5)))
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER interval join: unmatched left emits nulls " +
      "after the watermark closes its window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val buys = MemoryStream[Ev]
    val joined = StreamOps.intervalJoin(
      clicks.toDF().select($"user", $"ts"),
      buys.toDF().select($"user".as("r_user"), $"ts".as("bts"), $"value"),
      "user", "ts", "bts", "1 minute", "'10' MINUTE",
      joinType = "left_outer")
    val q = joined.writeStream.format("memory").queryName("ljoin_t")
      .outputMode("append").start()
    try {
      clicks.addData(Ev(1, "c", t(0), 0), Ev(2, "c", t(0), 0))
      buys.addData(Ev(1, "b", t(5), 9.5)) // matches user 1's window
      q.processAllAvailable()
      // push the watermark far past t(0)+10min+delay on BOTH sides so
      // user 2's join window provably closes
      clicks.addData(Ev(9, "c", t(60), 0))
      buys.addData(Ev(9, "b", t(60), 0))
      q.processAllAvailable()
      val rows = spark.table("ljoin_t")
        .select($"user", $"r_user", $"value")
        .as[(Long, Option[Long], Option[Double])].collect().toSet
        .filter(_._1 != 9L)
      // user 1 matched inside the interval; user 2 emitted exactly once,
      // null-padded, only after the horizon passed
      assert(rows == Set((1L, Some(1L), Some(9.5)),
        (2L, None, None)))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark: replayed events collapse") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val out = StreamOps.dedupWithinWatermark(in.toDF(), "ts", "10 minutes",
      Seq("user", "kind"))
    val q = out.writeStream.format("memory").queryName("dedup_t")
      .outputMode("append").start()
    try {
      in.addData(Ev(1, "x", t(0), 1.0), Ev(1, "x", t(0, 30), 1.0),
        Ev(2, "x", t(1), 2.0))
      q.processAllAvailable()
      in.addData(Ev(1, "x", t(2), 1.0)) // still a dup within watermark
      q.processAllAvailable()
      assert(spark.table("dedup_t").count() == 2) // (1,x) once + (2,x) once
    } finally q.stop()
  }

  test("flatMapGroupsWithState: running totals update across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Double)]
    val q = StreamOps.runningTotals(in.toDS())
      .writeStream.format("memory").queryName("state_t")
      .outputMode("update").start()
    try {
      in.addData(("a", 1.0), ("a", 2.0), ("b", 5.0))
      q.processAllAvailable()
      in.addData(("a", 4.0))
      q.processAllAvailable()
      val last = spark.table("state_t").groupBy($"key")
        .agg(max(struct($"n", $"total")).as("s"))
        .select($"key", $"s.n", $"s.total")
        .as[(String, Long, Double)].collect().toSet
      assert(last == Set(("a", 3L, 7.0), ("b", 1L, 5.0)))
    } finally q.stop()
  }

  test("runningOverFrame: out-of-order multi-batch arrival matches the " +
      "batch window oracle (watermark buffering)") {
    import graft.streaming.{OverIn, OverOut}
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def us(sec: Long): Long = sec * 1000000L
    val in = MemoryStream[OverIn]
    val q = StreamOps.runningOverFrame(in.toDS(), preceding = 2,
      delay = "10 seconds")
      .writeStream.format("memory").queryName("over_t")
      .outputMode("update").start()
    try {
      // batch 1: key 1 rows at t=100,102 (out of order in the batch) and
      // a row far ahead at t=130; key 2 one row. Watermark after the
      // batch = 130-10 = 120 s → t=100,102 flush; t=130 stays buffered.
      in.addData(OverIn(1L, us(102), 11L, 20L), OverIn(1L, us(100), 10L, 10L),
        OverIn(1L, us(130), 13L, 80L), OverIn(2L, us(100), 20L, 5L))
      q.processAllAvailable()
      assert(spark.table("over_t").count() == 3) // e10, e11, e20 only
      // batch 2: t=125 arrives AFTER t=130 was seen — cross-batch
      // disorder within the 10 s delay. Both stay buffered (wm 120).
      in.addData(OverIn(1L, us(125), 12L, 40L))
      q.processAllAvailable()
      assert(spark.table("over_t").count() == 3) // still buffered
      // batch 3: watermark pushers — the flush must emit t=125 BEFORE
      // t=130 even though t=130 arrived a batch earlier
      in.addData(OverIn(1L, us(300), 99L, 0L), OverIn(2L, us(300), 98L, 0L))
      q.processAllAvailable()
      val got = spark.table("over_t").as[OverOut].collect()
        .filter(_.event_id < 90) // drop the watermark pushers
        .map(o => (o.user_id, o.event_id) -> ((o.run_cents, o.n_frame)))
        .toMap
      assert(got == Map(
        (1L, 10L) -> ((10L, 1L)),
        (1L, 11L) -> ((30L, 2L)),   // 10+20
        (1L, 12L) -> ((70L, 3L)),   // 10+20+40 — ts order, not arrival
        (1L, 13L) -> ((140L, 3L)),  // 20+40+80 — oldest evicted
        (2L, 20L) -> ((5L, 1L))))
    } finally q.stop()
  }

  test("encodeKey: composite keys are unambiguous, nulls preserved") {
    assert(StreamOps.encodeKey(Seq("x|y", "z")) !=
      StreamOps.encodeKey(Seq("x", "y|z")))
    assert(StreamOps.encodeKey(Seq("a", null)) !=
      StreamOps.encodeKey(Seq(null, "a")))
    assert(StreamOps.encodeKey(Seq("a", null)) !=
      StreamOps.encodeKey(Seq("a", "")))
    // single-part traps: SQL NULL vs the literal string "null", and a
    // value containing the raw null sentinel vs a null part
    assert(StreamOps.encodeKey(Seq(null)) !=
      StreamOps.encodeKey(Seq("null")))
    assert(StreamOps.encodeKey(Seq("a", " ")) !=
      StreamOps.encodeKey(Seq("a", null)))
    // ordinary keys keep their plain readable form (stable ES _ids)
    assert(StreamOps.encodeKey(Seq("solo")) == "solo")
    assert(StreamOps.encodeKey(Seq(42, "a")) == "42|a")
  }

  // NOTE: runningTotals' stateTtlMs path (ProcessingTimeTimeout) is not
  // runtime-tested here: a processing-time timeout keeps the query
  // scheduling timeout-evaluation batches, which never settles under
  // MemoryStream + processAllAvailable. The no-TTL path (default) is
  // covered above; the timeout branch is exercised in production-style
  // continuous triggers only.

  test("foreachBatch upsert sink: last write per key wins (demo_1 sink)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    StreamOps.UpsertStore.clear("gmv")
    val in = MemoryStream[Ev]
    val agg = in.toDF().groupBy($"kind")
      .agg(sum($"value").as("total"))
    val q = agg.writeStream
      .outputMode("update")
      .foreachBatch(StreamOps.upsertBatch("gmv", Seq("kind")) _)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      in.addData(Ev(1, "a", t(0), 10.0), Ev(2, "b", t(0), 5.0))
      q.processAllAvailable()
      in.addData(Ev(3, "a", t(1), 2.5))
      q.processAllAvailable()
      val t2 = StreamOps.UpsertStore.table("gmv")
      assert(t2(StreamOps.encodeKey(Seq("a")))(1) == 12.5 &&
        t2(StreamOps.encodeKey(Seq("b")))(1) == 5.0)
    } finally q.stop()
  }
}
