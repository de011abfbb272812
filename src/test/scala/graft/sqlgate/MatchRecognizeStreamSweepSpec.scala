package graft.sqlgate

import graft.SparkSpec
import graft.operators.{PatternMeasure, PatternVar, RowPattern,
  RowPatternSpec}
import java.sql.Timestamp

/** Randomized batch/stream equality sweep for the STREAMING
  * MATCH_RECOGNIZE shape. The claim under test is the one COVERAGE.md
  * makes verbatim: emitted matches are bit-identical to the batch
  * matcher ACROSS ANY MICRO-BATCH SPLIT — the split is an execution
  * accident, never a semantic input.
  *
  * Each seeded scenario draws a random event tape (several keys,
  * random kinds weighted toward partial funnels, duplicate timestamps,
  * keys that never match), splits it into random CONTIGUOUS event-time
  * chunks (watermark delay is 0, so only inter-batch order is
  * constrained; rows are shuffled WITHIN each chunk to exercise
  * unsorted micro-batches), appends a far-future flush row on a
  * reserved key so every anchor's WITHIN horizon closes, drains, and
  * asserts set-equality with `RowPattern.apply` over the same tape.
  * Quantifier shape and WITHIN bound also vary per scenario.
  */
class MatchRecognizeStreamSweepSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private def specOf(maxB: Int, withinS: Long, skipPast: Boolean) =
    RowPatternSpec(
      partitionBy = Seq("user_id"), orderBy = "t",
      vars = Seq(
        PatternVar("A", 1, 1, greedy = true, cond = Some("kind = 'x'")),
        PatternVar("B", 1, maxB, greedy = true, cond = Some("kind = 'y'")),
        PatternVar("C", 1, 1, greedy = true, cond = Some("kind = 'z'"))),
      measures = Seq(
        PatternMeasure("A", "t", first = false, alias = "a_t"),
        PatternMeasure("B", "t", first = true, alias = "b_first"),
        PatternMeasure("B", "t", first = false, alias = "b_last"),
        PatternMeasure("C", "v", first = false, alias = "z_v")),
      withinMs = Some(withinS * 1000L), skipPastLastRow = skipPast)

  private def key(r: org.apache.spark.sql.Row) =
    (r.getLong(0), r.getTimestamp(1).getTime, r.getTimestamp(2).getTime,
      r.getTimestamp(3).getTime, r.getDouble(4))

  test("random tapes, random contiguous splits: streaming == batch") {
    for (seed <- 1 to 12) {
      val rnd = new scala.util.Random(seed)
      val nKeys = 2 + rnd.nextInt(4)
      val kinds = Array("x", "y", "z", "w") // w = never-matching noise
      // weighted toward y so B+ runs of varying length appear
      def draw(): String = kinds(rnd.nextInt(6) match {
        case 0 => 0; case 1 | 2 | 3 => 1; case 4 => 2; case _ => 3
      })
      val tape = (1 to (20 + rnd.nextInt(40))).map { i =>
        // duplicate timestamps across keys; strictly increasing overall
        // is NOT required — only chunk boundaries must respect time
        MrSwEv(1L + rnd.nextInt(nKeys), ts(i / 2 + 1), draw(),
          rnd.nextInt(100) / 4.0)
      }.sortBy(_.t.getTime)
      val flush = MrSwEv(9999L, ts(100000L), "w", 0.0)

      // random contiguous chunking of the time-sorted tape; rows
      // shuffled within each chunk (intra-batch disorder is legal)
      val cuts = tape.indices.drop(1)
        .filter(_ => rnd.nextDouble() < 0.25).toVector
      val chunks = (Vector(0) ++ cuts :+ tape.length).sliding(2).collect {
        case Vector(a, b) if a < b => rnd.shuffle(tape.slice(a, b))
      }.toVector

      // chunk boundaries must not split a timestamp across batches:
      // watermark delay 0 finalizes the boundary ts after the first
      // chunk, making an equal-ts row in the next chunk late-dropped
      // in streaming but visible in batch — a watermark artifact, not
      // a matcher divergence. Merge such chunks.
      val merged = chunks.foldLeft(Vector.empty[Seq[MrSwEv]]) { (acc, c) =>
        if (acc.nonEmpty &&
            acc.last.map(_.t.getTime).max >= c.map(_.t.getTime).min)
          acc.init :+ (acc.last ++ c)
        else acc :+ c
      }

      // skip mode randomized too: SKIP TO NEXT ROW emits overlapping
      // matches, so buffer-consumption bookkeeping differs — equality
      // must hold under both
      val spec = specOf(
        maxB = if (rnd.nextBoolean()) Int.MaxValue else 1 + rnd.nextInt(2),
        withinS = 2L + rnd.nextInt(8),
        skipPast = rnd.nextBoolean())

      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[MrSwEv]
      val src = in.toDF().withWatermark("t", "0 seconds")
      val q = RowPattern.streaming(src, spec).writeStream
        .format("memory").queryName(s"mr_sweep_$seed")
        .outputMode("append").start()
      val got =
        try {
          merged.foreach { c => in.addData(c); q.processAllAvailable() }
          in.addData(Seq(flush)); q.processAllAvailable()
          spark.table(s"mr_sweep_$seed").collect().map(key).toSet
        } finally q.stop()

      val batch = RowPattern((tape :+ flush).toDF(), spec)
        .collect().map(key).toSet
      assert(got == batch,
        s"seed=$seed chunks=${merged.map(_.size).mkString(",")} " +
          s"stream-only=${(got -- batch).take(3)} " +
          s"batch-only=${(batch -- got).take(3)}")
    }
  }
}

final case class MrSwEv(user_id: Long, t: Timestamp, kind: String,
    v: Double)
