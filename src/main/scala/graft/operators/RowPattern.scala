package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
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

/** Row-pattern recognition (SQL:2016 `MATCH_RECOGNIZE`, the clause Flink
  * SQL executes with its CEP NFA operator — reference surface:
  * `/root/reference/README.md` §四 routes any Flink-1.13 SQL, which
  * includes MATCH_RECOGNIZE). Spark has no pattern operator, so this is
  * a whole-operator implementation (preference (d), `mapPartitions`,
  * justified: no composition of built-ins can express backtracking
  * row-pattern matching): ONE hash shuffle on the PARTITION BY key, a
  * per-partition sort on (key, order, tiebreak) — the exact cost class
  * of a window aggregate — then a linear scan running a per-key
  * backtracking matcher, exactly Flink's per-key CepOperator shape.
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
  *     deterministic total order is the honest batch equivalent).
  *
  * Scale: predicates are evaluated ONCE per row as codegen'd boolean
  * columns before the shuffle — the matcher itself reads only booleans
  * and ordinals. Rows are buffered per key (not per partition); memory
  * is bounded by the largest single key's row count, the same bound
  * Flink's CEP state holds per key. Backtracking is worst-case
  * exponential only for adversarial overlapping predicates — Flink's
  * own NFA pathology; `WITHIN` caps the scan horizon in production
  * patterns, and a per-key step budget ([[RowPatternSpec.stepBudget]],
  * gate knob `graft.match-recognize.step-budget`) fails LOUDLY when a
  * pattern backtracks combinatorially instead of burning CPU silently.
  */
object RowPattern {

  /** ~1e9 steps ≈ a few seconds of CPU per key — far past any honest
    * pattern (O(rows·vars) per key), reached quickly by an exponential
    * backtracking blowup. Gate scripts tune it via
    * `SET 'graft.match-recognize.step-budget' = '<n>'`.
    */
  val DefaultStepBudget: Long = 1000000000L

  private val P = "__graft_mr_"

  def apply(df: DataFrame, spec: RowPatternSpec): DataFrame = {
    require(spec.vars.nonEmpty, "MATCH_RECOGNIZE: empty PATTERN")
    require(spec.vars.exists(_.minRep >= 1),
      "MATCH_RECOGNIZE: pattern where every variable is optional would " +
        "permit empty matches — at least one variable must be required")
    require(!df.columns.exists(_.toLowerCase(java.util.Locale.ROOT)
        .startsWith(P)),
      s"MATCH_RECOGNIZE: source schema contains reserved '$P*' columns")
    require(!df.isStreaming,
      "MATCH_RECOGNIZE runs in batch gate mode (a streaming variant " +
        "would need watermark-buffered keyed state; rejected loudly " +
        "rather than silently mis-ordering)")

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

    val sorted = prepped
      .repartition(spec.partitionBy.map(col): _*)
      .sortWithinPartitions(
        (spec.partitionBy :+ spec.orderBy :+ s"${P}tb").map(col): _*)

    val in = sorted.schema
    val keyOrds = spec.partitionBy.map(in.fieldIndex).toArray
    val condOrds = spec.vars.indices.map(i => in.fieldIndex(s"${P}c$i")).toArray
    val ordUsOrd = spec.withinMs.map(_ => in.fieldIndex(s"${P}ord"))
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

    val vars = spec.vars.toArray
    val withinUs = spec.withinMs.map(_ * 1000L)
    val skipPast = spec.skipPastLastRow
    val nVars = vars.length
    val budget = spec.stepBudget
    require(budget > 0, s"MATCH_RECOGNIZE step budget must be positive, " +
      s"got $budget")

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

      def matchKey(rows: IndexedSeq[Row]): Iterator[Row] = {
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

        def ordUs(i: Int): Long = ordUsOrd match {
          case Some(o) =>
            // WITHIN arithmetic on a NULL event time has no defined
            // answer — reject loudly (Flink likewise refuses a null
            // rowtime) instead of NPE-ing or silently matching.
            if (rows(i).isNullAt(o))
              throw new IllegalArgumentException(
                "MATCH_RECOGNIZE WITHIN: NULL ORDER BY value encountered; " +
                  "filter null event times before the matcher")
            rows(i).getLong(o)
          case None => 0L
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
              withinUs.forall(w => ordUs(pos + run) - anchorUs <= w)
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

        def emit(): Row = {
          val vals = new Array[Any](keyOrds.length + measPlan.length)
          var i = 0
          while (i < keyOrds.length) {
            vals(i) = rows(0).get(keyOrds(i)) // all rows share the key
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

        var anchor = 0
        while (anchor < n) {
          val end = tryVar(0, anchor, ordUs(anchor))
          if (end > anchor) {
            results += emit()
            anchor = if (skipPast) end else anchor + 1
          } else anchor += 1
        }
        results.iterator
      }

      new Iterator[Row] {
        private var cur: Iterator[Row] = Iterator.empty
        def hasNext: Boolean = {
          while (!cur.hasNext && bufIt.hasNext)
            cur = matchKey(nextKeyRows())
          cur.hasNext
        }
        def next(): Row = { if (!hasNext) throw new NoSuchElementException; cur.next() }
      }
    }(Encoders.row(outSchema))

    out
  }
}
