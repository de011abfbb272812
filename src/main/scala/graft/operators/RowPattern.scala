package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** One pattern variable of a `MATCH_RECOGNIZE` clause.
  *
  * @param cond row-local SQL predicate with the variable's own prefix
  *             already stripped; `None` = an undefined (always-true)
  *             variable, Flink's gap-marker idiom.
  * @param minRep / maxRep quantifier bounds: `A`=(1,1), `A+`=(1,∞),
  *             `A*`=(0,∞), `A?`=(0,1); `maxRep = Int.MaxValue` for ∞.
  * @param greedy SQL:2016 default; `false` for the reluctant forms
  *             `+?` `*?` `??`.
  */
final case class PatternVar(name: String, minRep: Int, maxRep: Int,
    greedy: Boolean, cond: Option[String])

/** `FIRST(V.col)` (first=true) or `LAST(V.col)`/bare `V.col` (first=false). */
final case class PatternMeasure(variable: String, col: String,
    first: Boolean, alias: String)

final case class RowPatternSpec(
    partitionBy: Seq[String],
    orderBy: String,
    vars: Seq[PatternVar],
    measures: Seq[PatternMeasure],
    withinMs: Option[Long],
    skipPastLastRow: Boolean,
    /** Per-key cap on matcher steps (predicate probes + backtracking
      * attempts). Backtracking over adversarial overlapping predicates
      * is worst-case exponential — Flink's own NFA pathology — and
      * without a bound it burns CPU silently; exceeding the budget
      * fails LOUDLY naming the knob instead. The default is far above
      * any honest pattern's cost (normal matching is O(rows·vars) per
      * key) yet reached within seconds by a blowup.
      */
    stepBudget: Long = RowPattern.DefaultStepBudget)

// Keyed state of [[RowPattern.streaming]] is a single-field Row
// `{rows: ARRAY<STRUCT<prepped projection>>}` — the buffered source
// rows whose anchors the watermark has not yet finalized — encoded
// with an EXPLICIT schema (Encoders.row over the prepped schema), not
// Kryo: schema-driven state survives class-shape evolution of this
// file, so a checkpoint written by one build restores under the next
// as long as the projected schema (source columns + predicate
// booleans + order/tiebreak) is unchanged. The reference's headline
// verb is stop-with-savepoint → restore (CommandUtil.java:34-36);
// Kryo-encoded state would tie that restore to Scala class shape.
// UPGRADE BOUNDARY: checkpoints written by the pre-r14 Kryo build do
// NOT restore under this encoding (the state-store schema check
// rejects BINARY vs ARRAY<STRUCT>) — a one-time break accepted when
// the explicit schema landed; jobs crossing it must drain-and-restart
// rather than restore.

/** The per-key backtracking matcher shared by the batch and streaming
  * execution shapes — works over one key's rows sorted by
  * (ORDER BY, content-hash tiebreak), reading only precomputed
  * boolean predicate columns and ordinals (see [[RowPattern]] for the
  * semantics it implements).
  *
  * @param ordUsOrd ordinal of the epoch-micros ORDER BY column, -1 when
  *                 the pattern has no WITHIN bound (batch only).
  */
private[graft] final class PatternMatcher(
    vars: Array[PatternVar],
    condOrds: Array[Int],
    ordUsOrd: Int,
    withinUs: Option[Long],
    skipPast: Boolean,
    budget: Long,
    keyOrds: Array[Int],
    measPlan: Array[(Int, Int, Boolean)]) extends Serializable {

  private val nVars = vars.length

  private def ordUs(rows: IndexedSeq[Row], i: Int): Long =
    if (ordUsOrd < 0) 0L
    else {
      // WITHIN arithmetic on a NULL event time has no defined answer —
      // reject loudly (Flink likewise refuses a null rowtime) instead
      // of NPE-ing or silently matching.
      if (rows(i).isNullAt(ordUsOrd))
        throw new IllegalArgumentException(
          "MATCH_RECOGNIZE WITHIN: NULL ORDER BY value encountered; " +
            "filter null event times before the matcher")
      rows(i).getLong(ordUsOrd)
    }

  /** Match one key's ordered rows. Anchors are processed left to right;
    * with `finalUs = Some(f)` (streaming) the scan stops at the FIRST
    * anchor whose WITHIN horizon the watermark has not closed yet
    * (anchorUs + within > f) — every row that could join a match at a
    * closed anchor has event time ≤ f and has therefore arrived (or
    * was dropped late). `None` (batch) processes every anchor.
    *
    * Returns (match rows, consumed prefix length): rows before the
    * returned index can never participate in a future match, because
    * matching only scans forward from the anchor and the anchor pointer
    * never moves backwards.
    */
  def run(rows: IndexedSeq[Row], finalUs: Option[Long]): (Seq[Row], Int) = {
    val n = rows.length
    val spans = new Array[Int](nVars * 2) // (start, endExcl) pairs
    val results = scala.collection.mutable.ArrayBuffer[Row]()
    var steps = 0L

    def step(): Unit = {
      steps += 1
      if (steps > budget)
        throw new IllegalStateException(
          s"MATCH_RECOGNIZE exceeded the backtracking step budget " +
            s"($budget steps) on one PARTITION BY key ($n rows) — " +
            "the pattern's overlapping predicates are backtracking " +
            "combinatorially (the NFA pathology). Add/tighten a " +
            "WITHIN bound, make the variable predicates mutually " +
            "exclusive, or raise " +
            "'graft.match-recognize.step-budget'")
    }

    // backtracking matcher from `anchor`; returns end index
    // (exclusive) of the match or -1
    def tryVar(vi: Int, pos: Int, anchorUs: Long): Int = {
      if (vi == nVars) return pos
      val v = vars(vi)
      var run = 0
      while (run < v.maxRep && pos + run < n && {
          step()
          rows(pos + run).getBoolean(condOrds(vi)) &&
          withinUs.forall(w => ordUs(rows, pos + run) - anchorUs <= w)
        })
        run += 1
      if (run < v.minRep) return -1
      val reps =
        if (v.greedy) run to v.minRep by -1 else v.minRep to run
      for (r <- reps) {
        step()
        spans(vi * 2) = pos
        spans(vi * 2 + 1) = pos + r
        val end = tryVar(vi + 1, pos + r, anchorUs)
        if (end >= 0) return end
      }
      -1
    }

    def emit(anchor: Int): Row = {
      val vals = new Array[Any](keyOrds.length + measPlan.length)
      var i = 0
      while (i < keyOrds.length) {
        vals(i) = rows(anchor).get(keyOrds(i)) // all rows share the key
        i += 1
      }
      var j = 0
      while (j < measPlan.length) {
        val (vi, colOrd, first) = measPlan(j)
        val s = spans(vi * 2); val e = spans(vi * 2 + 1)
        vals(keyOrds.length + j) =
          if (e <= s) null
          else if (first) rows(s).get(colOrd)
          else rows(e - 1).get(colOrd)
        j += 1
      }
      new org.apache.spark.sql.catalyst.expressions.GenericRow(vals)
    }

    def isFinal(a: Int): Boolean = finalUs.forall { f =>
      ordUs(rows, a) + withinUs.getOrElse(0L) <= f
    }

    var anchor = 0
    while (anchor < n && isFinal(anchor)) {
      val end = tryVar(0, anchor, ordUs(rows, anchor))
      if (end > anchor) {
        results += emit(anchor)
        anchor = if (skipPast) end else anchor + 1
      } else anchor += 1
    }
    (results.toSeq, anchor)
  }
}

/** Row-pattern recognition (SQL:2016 `MATCH_RECOGNIZE`, the clause Flink
  * SQL executes with its CEP NFA operator — reference surface:
  * `/root/reference/README.md` §四 routes any Flink-1.13 SQL, which
  * includes MATCH_RECOGNIZE). Spark has no pattern operator, so this is
  * a whole-operator implementation (preference (d), `mapPartitions` /
  * `flatMapGroupsWithState`, justified: no composition of built-ins can
  * express backtracking row-pattern matching).
  *
  * BATCH ([[apply]]): ONE hash shuffle on the PARTITION BY key, a
  * per-partition sort on (key, order, tiebreak) — the exact cost class
  * of a window aggregate — then a linear scan running a per-key
  * backtracking matcher, exactly Flink's per-key CepOperator shape.
  *
  * STREAMING ([[streaming]]): Flink's headline use of CEP SQL is
  * pattern-over-stream; here the same matcher runs inside
  * `flatMapGroupsWithState` over watermark-ripened keyed buffers (the
  * proven shape of `StreamOps.runningOverFrame`): arriving rows buffer
  * per key in event-time order, and the matcher processes an anchor
  * only once the watermark passes its WITHIN horizon — every row that
  * could join the match has then arrived, so the decision (and the
  * emitted measures) is bit-identical to the batch matcher over the
  * same rows, across any micro-batch split of the input within the
  * watermark delay. Matches emit in APPEND mode (a CEP match is final
  * when emitted, Flink's semantics). `WITHIN` is REQUIRED on a stream:
  * without it no anchor's horizon ever closes and keyed state is
  * unbounded — rejected loudly, the documented deviation. State per
  * key = the rows inside the watermark+WITHIN horizon, O(horizon·rate),
  * the same bound Flink's CEP state holds; an event-time timeout
  * re-fires the key when the watermark passes the oldest buffered
  * anchor's horizon, so buffered matches flush without further input
  * on the key. Rows later than the watermark are dropped by Spark's
  * late-row filter on the watermarked input — the same fate Flink's
  * CEP gives them (a dropped row can merge its neighbours into strict
  * contiguity, as in Flink). Like `runningOverFrame`, rows at EXACTLY
  * the watermark are still delivered, leaving a whole-millisecond
  * reordering window at the exact horizon boundary in exchange for not
  * stranding anchors whose horizon equals the final watermark.
  *
  * Semantics are Flink-exact on the supported subset (this replaced a
  * chained-window rewrite that emitted only the earliest match per key
  * with relaxed contiguity — both documented deviations are now gone):
  *
  *   - STRICT contiguity: consecutive pattern rows are adjacent rows of
  *     the key's ordered stream. Relaxed matching is spelled the Flink
  *     way — an undefined (always-true) variable with `*` between
  *     stages.
  *   - MULTI-MATCH: every match is emitted. `AFTER MATCH SKIP PAST LAST
  *     ROW` resumes after the match's last row; `SKIP TO NEXT ROW`
  *     resumes at the row after the match's anchor (overlaps allowed).
  *   - Greedy quantifiers prefer the longest repetition and backtrack;
  *     reluctant (`+?` `*?` `??`) prefer the shortest.
  *   - `WITHIN d`: every matched row's event time lies within `d` of the
  *     match's first row (inclusive bound, as the previous rewrite and
  *     its oracle pinned).
  *   - Ties on (key, ORDER BY) order deterministically by a content hash
  *     of the full row (`xxhash64`), so duplicate timestamps can never
  *     silently flip measure values between runs (Flink breaks ties by
  *     arrival order, which a batch replay does not have; a
  *     deterministic total order is the honest batch equivalent — and
  *     the streaming path sorts its ripened buffers the same way, so
  *     both shapes agree row for row).
  *
  * Scale: predicates are evaluated ONCE per row as codegen'd boolean
  * columns before the shuffle — the matcher itself reads only booleans
  * and ordinals. Rows are buffered per key (not per partition); memory
  * is bounded by the largest single key's row count (batch) or its
  * watermark+WITHIN horizon (streaming), the same bound Flink's CEP
  * state holds per key. Backtracking is worst-case exponential only for
  * adversarial overlapping predicates — Flink's own NFA pathology;
  * `WITHIN` caps the scan horizon in production patterns, and a per-key
  * step budget ([[RowPatternSpec.stepBudget]], gate knob
  * `graft.match-recognize.step-budget`) fails LOUDLY when a pattern
  * backtracks combinatorially instead of burning CPU silently.
  */
object RowPattern {

  /** ~1e9 steps ≈ a few seconds of CPU per key — far past any honest
    * pattern (O(rows·vars) per key), reached quickly by an exponential
    * backtracking blowup. Gate scripts tune it via
    * `SET 'graft.match-recognize.step-budget' = '<n>'`.
    */
  val DefaultStepBudget: Long = 1000000000L

  private val P = "__graft_mr_"

  /** Shared validation + prepped projection (source columns + codegen'd
    * predicate booleans + epoch-micros order column when WITHIN needs
    * it + xxhash64 tiebreak) and the ordinal/measure plan over it.
    */
  private final case class Prepped(df: DataFrame, keyOrds: Array[Int],
      condOrds: Array[Int], ordUsOrd: Int, tbOrd: Int,
      measPlan: Array[(Int, Int, Boolean)], outSchema: StructType)

  private def prep(df: DataFrame, spec: RowPatternSpec): Prepped = {
    require(spec.vars.nonEmpty, "MATCH_RECOGNIZE: empty PATTERN")
    require(spec.vars.exists(_.minRep >= 1),
      "MATCH_RECOGNIZE: pattern where every variable is optional would " +
        "permit empty matches — at least one variable must be required")
    require(!df.columns.exists(_.toLowerCase(java.util.Locale.ROOT)
        .startsWith(P)),
      s"MATCH_RECOGNIZE: source schema contains reserved '$P*' columns")
    require(spec.stepBudget > 0,
      s"MATCH_RECOGNIZE step budget must be positive, got " +
        s"${spec.stepBudget}")

    val srcCols = df.columns.toSeq
    val ordType = df.schema(spec.orderBy).dataType
    spec.withinMs.foreach { _ =>
      require(ordType == TimestampType,
        s"MATCH_RECOGNIZE WITHIN needs a TIMESTAMP ORDER BY column, " +
          s"got $ordType")
    }

    // row-local predicates → codegen'd boolean columns, one scan, no UDF.
    // COALESCE(..., false): SQL:2016 (and Flink's CEP) treat a NULL
    // predicate as non-matching; without it the matcher's getBoolean
    // would NPE on e.g. `A.value > 10` over a NULL value.
    val condExprs = spec.vars.zipWithIndex.map { case (v, i) =>
      s"COALESCE(CAST((${v.cond.getOrElse("true")}) AS BOOLEAN), false) " +
        s"AS ${P}c$i"
    }
    val ordUsExpr = spec.withinMs.map(_ =>
      s"unix_micros(`${spec.orderBy}`) AS ${P}ord").toSeq
    val tbExpr = s"xxhash64(${srcCols.map(c => s"`$c`").mkString(", ")}) " +
      s"AS ${P}tb"
    val prepped = df.selectExpr(
      (srcCols.map(c => s"`$c`") ++ condExprs ++ ordUsExpr :+ tbExpr): _*)

    val in = prepped.schema
    val keyOrds = spec.partitionBy.map(in.fieldIndex).toArray
    val condOrds =
      spec.vars.indices.map(i => in.fieldIndex(s"${P}c$i")).toArray
    val ordUsOrd =
      if (spec.withinMs.isDefined) in.fieldIndex(s"${P}ord") else -1
    val tbOrd = in.fieldIndex(s"${P}tb")
    val varIdx = spec.vars.map(_.name).zipWithIndex.toMap
    val measPlan = spec.measures.map { m =>
      (varIdx.getOrElse(m.variable, throw new IllegalArgumentException(
        s"MATCH_RECOGNIZE: measure references unknown variable " +
          s"${m.variable}")),
        in.fieldIndex(m.col), m.first)
    }.toArray
    val outSchema = StructType(
      spec.partitionBy.map(c => in(c)) ++
        spec.measures.map(m =>
          StructField(m.alias, in(in.fieldIndex(m.col)).dataType,
            nullable = true)))
    Prepped(prepped, keyOrds, condOrds, ordUsOrd, tbOrd, measPlan,
      outSchema)
  }

  private def matcherOf(p: Prepped, spec: RowPatternSpec): PatternMatcher =
    new PatternMatcher(spec.vars.toArray, p.condOrds, p.ordUsOrd,
      spec.withinMs.map(_ * 1000L), spec.skipPastLastRow, spec.stepBudget,
      p.keyOrds, p.measPlan)

  /** Batch execution shape (see object scaladoc). */
  def apply(df: DataFrame, spec: RowPatternSpec): DataFrame = {
    require(!df.isStreaming,
      "RowPattern.apply is the batch shape — route streaming inputs " +
        "through RowPattern.streaming (watermark-buffered keyed state)")
    val p = prep(df, spec)
    val sorted = p.df
      .repartition(spec.partitionBy.map(col): _*)
      .sortWithinPartitions(
        (spec.partitionBy :+ spec.orderBy :+ s"${P}tb").map(col): _*)
    val keyOrds = p.keyOrds
    val matcher = matcherOf(p, spec)

    val out = sorted.mapPartitions { it =>
      val bufIt = it.buffered

      def sameKey(a: Row, b: Row): Boolean =
        keyOrds.forall(o => a.get(o) == b.get(o))

      // keys are contiguous after the sort; pull one key's rows at a time
      def nextKeyRows(): IndexedSeq[Row] = {
        val head = bufIt.next()
        val buf = scala.collection.mutable.ArrayBuffer[Row](head)
        while (bufIt.hasNext && sameKey(head, bufIt.head))
          buf += bufIt.next()
        buf.toIndexedSeq
      }

      new Iterator[Row] {
        private var cur: Iterator[Row] = Iterator.empty
        def hasNext: Boolean = {
          while (!cur.hasNext && bufIt.hasNext)
            cur = matcher.run(nextKeyRows(), None)._1.iterator
          cur.hasNext
        }
        def next(): Row = {
          if (!hasNext) throw new NoSuchElementException; cur.next()
        }
      }
    }(Encoders.row(p.outSchema))

    out
  }

  /** Streaming execution shape (see object scaladoc): the same matcher
    * over watermark-ripened keyed buffers, append-mode output. The
    * input must be a streaming DataFrame carrying an event-time
    * watermark on the ORDER BY column (the gate declares it with
    * `WATERMARK FOR <col> AS …` in the source DDL), and the pattern
    * must carry a WITHIN bound.
    */
  def streaming(df: DataFrame, spec: RowPatternSpec): DataFrame = {
    require(df.isStreaming,
      "RowPattern.streaming needs a streaming input — use RowPattern" +
        ".apply for batch")
    val withinUs = spec.withinMs.map(_ * 1000L).getOrElse(
      throw new IllegalArgumentException(
        "streaming MATCH_RECOGNIZE requires a WITHIN bound: without " +
          "it no match is ever final and the keyed row buffer grows " +
          "without bound — add `WITHIN INTERVAL '…' <unit>` to the " +
          "pattern, or run the script in batch mode"))
    val wmCols = df.queryExecution.analyzed.collect {
      case e: org.apache.spark.sql.catalyst.plans.logical
          .EventTimeWatermark => e.eventTime.name
    }
    require(wmCols.contains(spec.orderBy),
      s"streaming MATCH_RECOGNIZE needs an event-time watermark on the " +
        s"ORDER BY column '${spec.orderBy}' — declare `WATERMARK FOR " +
        s"${spec.orderBy} AS ${spec.orderBy} - INTERVAL '…' SECOND` in " +
        "the source DDL" +
        (if (wmCols.isEmpty) "" else s" (watermark found on: ${
          wmCols.mkString(", ")})"))

    val p = prep(df, spec)
    val matcher = matcherOf(p, spec)
    val ordUsOrd = p.ordUsOrd
    val tbOrd = p.tbOrd

    // explicit-schema keyed state: {rows: ARRAY<STRUCT<prepped>>} —
    // see the state-encoding note above [[RowPattern]]
    val stateSchema = StructType(Seq(
      StructField("rows", ArrayType(p.df.schema, containsNull = false),
        nullable = false)))
    val stateEnc: Encoder[Row] = Encoders.row(stateSchema)
    val outEnc: Encoder[Row] = Encoders.row(p.outSchema)
    val keyOrds = p.keyOrds

    // group by an injective string encoding of the PARTITION BY values
    // (the output rows carry the real key columns, read from the rows)
    val keyed = p.df.groupByKey(r =>
      graft.streaming.StreamOps.encodeKey(
        keyOrds.map(r.get).toSeq))(Encoders.STRING)

    keyed.flatMapGroupsWithState[Row, Row](
      OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
      (_: String, it: Iterator[Row], state: GroupState[Row]) =>
        val prior: Vector[Row] = state.getOption
          .map(_.getSeq[Row](0).toVector)
          .getOrElse(Vector.empty)
        val all = prior ++ it
        if (all.isEmpty) { state.remove(); Iterator.empty }
        else {
          // same total order as the batch shape's per-partition sort:
          // (ORDER BY epoch-micros, content-hash tiebreak)
          val sorted = all.sortBy(r =>
            (r.getLong(ordUsOrd), r.getLong(tbOrd))).toIndexedSeq
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (matches, consumed) = matcher.run(sorted, Some(wmUs))
          val rest = sorted.drop(consumed)
          if (rest.isEmpty) state.remove()
          else {
            state.update(new org.apache.spark.sql.catalyst.expressions
              .GenericRow(Array[Any](rest)))
            // wake when the watermark passes the oldest pending
            // anchor's WITHIN horizon (must be strictly beyond the
            // current watermark), so buffered matches flush even if
            // the key receives no further rows
            val horizonMs =
              (rest.head.getLong(ordUsOrd) + withinUs + 999L) / 1000L
            state.setTimeoutTimestamp(
              math.max(horizonMs, state.getCurrentWatermarkMs() + 1L))
          }
          matches.iterator
        }
    }(stateEnc, outEnc).toDF()
  }
}
