package graft.sqlgate

/** `MATCH_RECOGNIZE` (row-pattern recognition) → chained window minima.
  *
  * The reference's SQL contract is "whatever Flink SQL accepts"
  * (`/root/reference/README.md` §四 "sql语法问题 flink官方文档"), and
  * Flink 1.13 SQL includes the SQL:2016 MATCH_RECOGNIZE clause for CEP.
  * Spark has no row-pattern operator, so the gate rewrites the simple
  * funnel-shaped subset — the shape the platform's event-pipeline jobs
  * actually use — into Spark SQL whose execution is the chained
  * whole-partition window-minima plan of `queries/Analytic.scala`
  * `q_funnel`: ONE shuffle on the PARTITION BY key, consecutive Window
  * nodes sharing the partitioning, state per key one row — not a
  * pattern automaton. That plan survives 100× data: no per-row UDF, no
  * driver collect, no pair expansion.
  *
  * Supported subset (anything outside raises IllegalArgumentException —
  * the gate NEVER silently degrades semantics):
  *
  *   - `PARTITION BY k1[, k2…]`, `ORDER BY ts` (one ordering column)
  *   - `MEASURES` items of the forms `V.col AS a`, `FIRST(V.col) AS a`,
  *     `LAST(V.col) AS a`
  *   - `ONE ROW PER MATCH` (the default; ALL ROWS PER MATCH rejected)
  *   - `AFTER MATCH SKIP PAST LAST ROW` / `SKIP TO NEXT ROW` (accepted —
  *     with at most one emitted match per key, below, both coincide)
  *   - `PATTERN (A B+ C …)` — a sequence of variables, each optionally
  *     `+`-quantified; variables with no DEFINE entry are always-true
  *     gap markers and may carry `*`/`?`
  *   - `WITHIN INTERVAL 'n' UNIT` (overall match duration bound)
  *   - `DEFINE V AS <row-local predicate>` — the predicate may reference
  *     only `V.`-prefixed columns of its own variable (no cross-variable
  *     or FIRST/LAST references)
  *
  * Implemented semantics — earliest-anchored first match per partition
  * key: stage 1 matches at its earliest qualifying row, each later
  * stage at its earliest qualifying row strictly after the previous
  * stage's anchor, and one row is emitted per key whose every stage
  * matched. Non-matching rows may sit between stages (Flink CEP's
  * relaxed-contiguity `followedBy`, i.e. the pattern behaves as if
  * `ANY*?` were interleaved); strict SQL:2016 contiguity and
  * backtracking to later anchors are NOT implemented — jobs needing
  * them are rejected loudly only insofar as they use syntax outside
  * the subset, so the contract is documented here and in COVERAGE.md.
  * `FIRST(V.col)` reads V's anchor row; `LAST(V.col)` on a
  * `+`-quantified V reads the last row satisfying V's predicate before
  * the next stage's anchor (end of partition for the final stage); a
  * bare `V.col` means `LAST(V.col)` as in Flink's ONE ROW PER MATCH
  * final-state semantics. Ordering values are assumed unique per key
  * within a stage's qualifying rows (event streams with µs timestamps).
  */
object MatchRecognizeRewrite {

  private case class Stage(name: String, plus: Boolean, cond: String)

  private val Keyword = """(?i)\bMATCH_RECOGNIZE\b""".r

  def apply(sql: String): String = Keyword.findFirstMatchIn(sql) match {
    case None => sql
    case Some(m) =>
      val head = sql.substring(0, m.start)
      val FromRe = """(?is)(.*\bFROM\s+)([`\w.]+)\s*$""".r
      val (prefix, src) = head match {
        case FromRe(p, t) => (p, t)
        case _ => throw new IllegalArgumentException(
          "MATCH_RECOGNIZE must directly follow FROM <table>")
      }
      val open = sql.indexOf('(', m.end)
      require(open >= 0, "MATCH_RECOGNIZE requires a parenthesized block")
      // paren scan skips single-quoted literals ('' = escaped quote), so
      // a ')' inside a DEFINE string can't truncate the block
      var depth = 0
      var i = open
      var close = -1
      var inStr = false
      while (i < sql.length && close < 0) {
        val ch = sql.charAt(i)
        if (inStr) { if (ch == '\'') inStr = false }
        else ch match {
          case '\'' => inStr = true
          case '(' => depth += 1
          case ')' => depth -= 1; if (depth == 0) close = i
          case _ =>
        }
        i += 1
      }
      require(close > 0, "unbalanced parentheses in MATCH_RECOGNIZE block")
      val derived = build(src, sql.substring(open + 1, close))
      // keep any `AS alias` that follows the block; recurse for safety
      apply(prefix + derived + sql.substring(close + 1))
  }

  /** Split on commas at paren depth 0, outside single-quoted literals. */
  private def splitTop(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    var start = 0
    var inStr = false
    for (i <- 0 until s.length) {
      val ch = s.charAt(i)
      if (inStr) { if (ch == '\'') inStr = false }
      else ch match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 =>
          out += s.substring(start, i).trim; start = i + 1
        case _ =>
      }
    }
    out += s.substring(start).trim
    out.result().filter(_.nonEmpty)
  }

  private def find(re: scala.util.matching.Regex, s: String,
      what: String): scala.util.matching.Regex.Match =
    re.findFirstMatchIn(s).getOrElse(
      throw new IllegalArgumentException(s"MATCH_RECOGNIZE: missing $what"))

  private def build(src: String, block: String): String = {
    if ("""(?i)\bALL\s+ROWS\s+PER\s+MATCH""".r.findFirstIn(block).isDefined)
      throw new IllegalArgumentException(
        "MATCH_RECOGNIZE: only ONE ROW PER MATCH is supported")
    """(?i)\bAFTER\s+MATCH\s+SKIP\s+(?:PAST\s+LAST\s+ROW|TO\s+NEXT\s+ROW)|\bAFTER\s+MATCH\b""".r
      .findFirstIn(block).foreach { hit =>
        if (!hit.toUpperCase(java.util.Locale.ROOT).contains("ROW"))
          throw new IllegalArgumentException(
            "MATCH_RECOGNIZE: only SKIP PAST LAST ROW / SKIP TO NEXT ROW " +
              "are supported")
      }

    val pks = splitTop(find(
      """(?is)\bPARTITION\s+BY\s+(.*?)\s+ORDER\s+BY""".r, block,
      "PARTITION BY … ORDER BY").group(1))
    val ord = find(
      """(?is)\bORDER\s+BY\s+([`\w.]+)\s+MEASURES""".r, block,
      "ORDER BY <one column> before MEASURES").group(1)
    val measuresTxt = find(
      """(?is)\bMEASURES\s+(.*?)\s*(?=\bONE\s+ROW\b|\bAFTER\s+MATCH\b|\bPATTERN\b)""".r,
      block, "MEASURES").group(1)
    val patternTxt = find(
      """(?is)\bPATTERN\s*\(([^)]*)\)""".r, block, "PATTERN (…)").group(1)
    val within = """(?is)\bWITHIN\s+INTERVAL\s+'(\d+)'\s+(\w+)""".r
      .findFirstMatchIn(block).map(m => (m.group(1), m.group(2)))
    val defineTxt = find(
      """(?is)\bDEFINE\s+(.*)$""".r, block, "DEFINE").group(1)

    // DEFINE entries: VAR AS <row-local predicate>
    val DefRe = """(?is)^(\w+)\s+AS\s+(.*)$""".r
    val defs: Map[String, String] = splitTop(defineTxt).map {
      case DefRe(v, pred) => v.toUpperCase(java.util.Locale.ROOT) -> pred.trim
      case other => throw new IllegalArgumentException(
        s"MATCH_RECOGNIZE: cannot parse DEFINE entry '$other'")
    }.toMap

    // PATTERN variables in order; undefined ones are gap markers
    val VarRe = """(\w+)([+*?]?)""".r
    def parseVar(v: String, q: String): Stage = {
      val name = v.toUpperCase(java.util.Locale.ROOT)
      defs.get(name) match {
        case None =>
          // gap marker: undefined variables may pad between stages with
          // * or ? — but a '+' gap would REQUIRE at least one in-between
          // row, which the chained-minima form cannot enforce; degrading
          // it silently to zero-or-more would emit extra matches
          if (q == "+") throw new IllegalArgumentException(
            s"MATCH_RECOGNIZE: '+' on undefined variable $name (at least " +
              "one gap row) is not supported — use '*' for optional gaps")
          Stage(name, plus = false, cond = null)
        case Some(pred) =>
          if (q == "*" || q == "?") throw new IllegalArgumentException(
            s"MATCH_RECOGNIZE: optional quantifier '$q' on defined " +
              s"variable $name is not supported")
          // strip the variable's own prefix; reject cross-variable and
          // navigation references (not row-local)
          val cond = s"(?i)\\b$name\\.".r.replaceAllIn(pred, "")
          for (o <- defs.keys if o != name)
            if (s"(?i)\\b$o\\.".r.findFirstIn(pred).isDefined)
              throw new IllegalArgumentException(
                s"MATCH_RECOGNIZE: DEFINE $name references $o — only " +
                  "row-local predicates are supported")
          if ("""(?i)\b(?:FIRST|LAST|PREV|NEXT)\s*\(""".r
              .findFirstIn(pred).isDefined)
            throw new IllegalArgumentException(
              s"MATCH_RECOGNIZE: DEFINE $name uses navigation functions" +
                " — only row-local predicates are supported")
          Stage(name, plus = q == "+", cond = cond)
      }
    }
    val stages: Seq[Stage] = patternTxt.trim.split("""\s+""").toSeq.map {
      case VarRe(v, q) => parseVar(v, q)
      case other => throw new IllegalArgumentException(
        s"MATCH_RECOGNIZE: cannot parse PATTERN variable '$other'")
    }.filter(_.cond != null)
    require(stages.nonEmpty,
      "MATCH_RECOGNIZE: PATTERN has no DEFINE'd variables")
    val idx: Map[String, Int] = stages.zipWithIndex
      .map { case (s, i) => s.name -> (i + 1) }.toMap

    // nested window layers: g_t1 … g_tN, one per defined stage
    var from = src
    for ((st, i0) <- stages.zipWithIndex) {
      val i = i0 + 1
      val chain = if (i == 1) "" else s" AND $ord > g_t${i - 1}"
      from = s"(SELECT *, MIN(CASE WHEN (${st.cond})$chain THEN $ord END)" +
        s" OVER (PARTITION BY ${pks.mkString(", ")}) AS g_t$i" +
        s" FROM $from g_mr$i)"
    }

    // MEASURES → per-key aggregates reading the anchored rows
    val MFirst = """(?is)^FIRST\s*\(\s*(\w+)\.([`\w]+)\s*\)$""".r
    val MLast = """(?is)^LAST\s*\(\s*(\w+)\.([`\w]+)\s*\)$""".r
    val MBare = """(?is)^(\w+)\.([`\w]+)$""".r
    val MeasRe = """(?is)^(.*?)\s+AS\s+(\w+)$""".r
    def stageOf(v: String): Int = idx.getOrElse(
      v.toUpperCase(java.util.Locale.ROOT),
      throw new IllegalArgumentException(
        s"MATCH_RECOGNIZE: measure references unknown variable $v"))
    def anchor(i: Int, col: String): String =
      s"MAX(CASE WHEN $ord = g_t$i THEN $col END)"
    def lastOf(i: Int, col: String): String = {
      val st = stages(i - 1)
      if (!st.plus) anchor(i, col)
      else {
        // middle + stages are bounded by the next anchor (which is in
        // turn ≤ the WITHIN-checked final anchor); the FINAL + stage has
        // no next anchor, so the WITHIN bound must cap it directly or
        // LAST() could read rows outside the declared match duration
        val ub =
          if (i < stages.size) s" AND $ord < g_t${i + 1}"
          else within.fold("") { case (amt, unit) =>
            s" AND $ord <= g_t1 + INTERVAL '$amt' $unit"
          }
        val in = s"(${st.cond}) AND $ord >= g_t$i$ub"
        s"MAX_BY(CASE WHEN $in THEN $col END, CASE WHEN $in THEN $ord END)"
      }
    }
    val measures = splitTop(measuresTxt).map {
      case MeasRe(expr, alias) =>
        val agg = expr.trim match {
          case MFirst(v, c) => anchor(stageOf(v), c)
          case MLast(v, c)  => lastOf(stageOf(v), c)
          case MBare(v, c)  => lastOf(stageOf(v), c)
          case other => throw new IllegalArgumentException(
            s"MATCH_RECOGNIZE: unsupported measure '$other' — use " +
              "V.col, FIRST(V.col) or LAST(V.col)")
        }
        s"$agg AS $alias"
      case other => throw new IllegalArgumentException(
        s"MATCH_RECOGNIZE: measure '$other' lacks an AS alias")
    }

    val n = stages.size
    val withinPred = within.fold("") { case (amt, unit) =>
      s" AND g_t$n <= g_t1 + INTERVAL '$amt' $unit"
    }
    s"(SELECT ${pks.mkString(", ")}, ${measures.mkString(", ")}" +
      s" FROM $from g_mr WHERE g_t$n IS NOT NULL$withinPred" +
      s" GROUP BY ${pks.mkString(", ")})"
  }
}
