package graft.sqlgate

import graft.operators.{PatternMeasure, PatternVar, RowPattern, RowPatternSpec}
import org.apache.spark.sql.SparkSession

/** `MATCH_RECOGNIZE` (SQL:2016 row-pattern recognition) gate dialect.
  *
  * The reference's SQL contract is "whatever Flink SQL accepts"
  * (`/root/reference/README.md` §四 "sql语法问题 flink官方文档"), and
  * Flink 1.13 SQL includes MATCH_RECOGNIZE for CEP. Spark has no
  * row-pattern operator, so the gate parses the clause and routes the
  * source through [[graft.operators.RowPattern]] — a per-key
  * backtracking matcher with Flink-exact semantics on the supported
  * subset — registering the result as a temp view and splicing the view
  * name into the statement. (An earlier round rewrote to chained window
  * minima, which silently emitted only the earliest match per key with
  * relaxed contiguity; both deviations are gone — strict contiguity,
  * every match emitted, SKIP PAST LAST ROW vs SKIP TO NEXT ROW
  * distinguished.)
  *
  * Supported subset (anything outside raises IllegalArgumentException —
  * the gate NEVER silently degrades semantics):
  *
  *   - `PARTITION BY k1[, k2…]`, `ORDER BY ts` (one ordering column)
  *   - `MEASURES` items of the forms `V.col AS a`, `FIRST(V.col) AS a`,
  *     `LAST(V.col) AS a` (bare `V.col` = LAST, Flink's ONE ROW PER
  *     MATCH final-state semantics)
  *   - `ONE ROW PER MATCH` (the default; ALL ROWS PER MATCH rejected)
  *   - `AFTER MATCH SKIP PAST LAST ROW` (default) / `SKIP TO NEXT ROW`
  *   - `PATTERN (A B+ C* D? …)` with greedy or reluctant (`+?` `*?`
  *     `??`) quantifiers; variables with no DEFINE entry are
  *     always-true (Flink's relaxed-contiguity spelling is an undefined
  *     `G*` between stages); at least one variable must be required
  *   - `WITHIN INTERVAL 'n' UNIT` (overall match duration bound)
  *   - `DEFINE V AS <row-local predicate>` — the predicate may reference
  *     only `V.`-prefixed columns of its own variable (no cross-variable
  *     or FIRST/LAST/PREV/NEXT references)
  *
  * Batch sources route through [[RowPattern.apply]]; STREAMING sources
  * route through [[RowPattern.streaming]] — the same matcher over
  * watermark-ripened keyed buffers (append mode), requiring a WITHIN
  * bound and a `WATERMARK FOR <order col>` declaration in the source
  * DDL (both enforced loudly). Internal columns use the `__graft_mr_`
  * prefix and collide loudly (RowPattern's reserved-prefix require),
  * never silently.
  */
object MatchRecognizeRewrite {

  private val Keyword = """(?i)\bMATCH_RECOGNIZE\b""".r
  private val viewCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** True iff the statement contains a MATCH_RECOGNIZE clause. */
  def present(sql: String): Boolean = Keyword.findFirstIn(sql).isDefined

  /** Source table names (lower-cased) of every MATCH_RECOGNIZE clause in
    * the statement — extracted textually so the gate can instantiate
    * registry sources BEFORE the session-aware rewrite resolves them.
    */
  def sourceTables(sql: String): Set[String] =
    Keyword.findAllMatchIn(sql).flatMap { m =>
      val FromRe = """(?is).*\bFROM\s+([`\w.]+)\s*$""".r
      sql.substring(0, m.start) match {
        case FromRe(t) =>
          Some(t.replace("`", "").split('.').last
            .toLowerCase(java.util.Locale.ROOT))
        case _ => None
      }
    }.toSet

  /** Session-aware rewrite: execute each MATCH_RECOGNIZE clause through
    * [[RowPattern]] over `spark.table(src)`, register the result as a
    * temp view, and splice the view name into the statement text.
    */
  def apply(spark: SparkSession, sql: String): String =
    rewriteTracking(spark, sql)._1

  /** Like [[apply]], but also returns the names of the temp views the
    * rewrite registered, so the caller can drop them once the consuming
    * statement has been ANALYZED (Dataset construction resolves the view
    * into the plan eagerly; after that the catalog entry is dead weight —
    * leaving it would pin the source plan for the session's lifetime).
    */
  def rewriteTracking(spark: SparkSession, sql: String): (String, Seq[String]) = {
    val created = Seq.newBuilder[String]
    val out = rewriteWith(sql) { (src, spec0) =>
      // gate knob for the backtracking failsafe: SET
      // 'graft.match-recognize.step-budget' = '<n>' (ScriptRunner
      // forwards graft.* keys into the session conf)
      val spec = spec0.copy(stepBudget =
        spark.conf.getOption("graft.match-recognize.step-budget")
          .map(_.trim.toLong)
          .getOrElse(graft.operators.RowPattern.DefaultStepBudget))
      val srcDf = spark.table(src)
      val result =
        if (srcDf.isStreaming) RowPattern.streaming(srcDf, spec)
        else RowPattern(srcDf, spec)
      val view = s"__graft_mr_out_${viewCounter.incrementAndGet()}"
      result.createOrReplaceTempView(view)
      created += view
      view
    }
    (out, created.result())
  }

  /** Syntax-validation form (no session, nothing executed): the clause
    * is parsed — so out-of-subset scripts are rejected with the same
    * loud errors pre-flight as at run time — and replaced by a
    * placeholder relation so the surrounding statement parses.
    */
  def validateOnly(sql: String): String =
    rewriteWith(sql)((_, _) => "__graft_mr_validated")

  private def rewriteWith(sql: String)(
      exec: (String, RowPatternSpec) => String): String =
    Keyword.findFirstMatchIn(sql) match {
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
        val spec = parse(sql.substring(open + 1, close))
        val rel = exec(src.replace("`", ""), spec)
        // keep any `AS alias` that follows the block; recurse for safety
        rewriteWith(prefix + rel + sql.substring(close + 1))(exec)
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

  private val msPerUnit = Map(
    "second" -> 1000L, "minute" -> 60000L, "hour" -> 3600000L,
    "day" -> 86400000L)

  /** Parse the clause body into a [[RowPatternSpec]]. */
  private[sqlgate] def parse(block: String): RowPatternSpec = {
    if ("""(?i)\bALL\s+ROWS\s+PER\s+MATCH""".r.findFirstIn(block).isDefined)
      throw new IllegalArgumentException(
        "MATCH_RECOGNIZE: only ONE ROW PER MATCH is supported")
    val skipPast = """(?i)\bAFTER\s+MATCH\s+SKIP\s+(PAST\s+LAST\s+ROW|TO\s+NEXT\s+ROW)|\bAFTER\s+MATCH\b""".r
      .findFirstMatchIn(block) match {
      case None => true // Flink's default is SKIP PAST LAST ROW
      case Some(m) => Option(m.group(1)) match {
        case Some(g) => g.toUpperCase(java.util.Locale.ROOT).startsWith("PAST")
        case None => throw new IllegalArgumentException(
          "MATCH_RECOGNIZE: only SKIP PAST LAST ROW / SKIP TO NEXT ROW " +
            "are supported")
      }
    }

    val pks = splitTop(find(
      """(?is)\bPARTITION\s+BY\s+(.*?)\s+ORDER\s+BY""".r, block,
      "PARTITION BY … ORDER BY").group(1)).map(_.replace("`", ""))
    val ord = find(
      """(?is)\bORDER\s+BY\s+([`\w.]+)\s+MEASURES""".r, block,
      "ORDER BY <one column> before MEASURES").group(1).replace("`", "")
    val measuresTxt = find(
      """(?is)\bMEASURES\s+(.*?)\s*(?=\bONE\s+ROW\b|\bAFTER\s+MATCH\b|\bPATTERN\b)""".r,
      block, "MEASURES").group(1)
    val patternTxt = find(
      """(?is)\bPATTERN\s*\(([^)]*)\)""".r, block, "PATTERN (…)").group(1)
    val within = """(?is)\bWITHIN\s+INTERVAL\s+'(\d+)'\s+(\w+)""".r
      .findFirstMatchIn(block).map { m =>
        val u = m.group(2).toLowerCase(java.util.Locale.ROOT).stripSuffix("s")
        m.group(1).toLong * msPerUnit.getOrElse(u,
          throw new IllegalArgumentException(
            s"MATCH_RECOGNIZE: unsupported WITHIN unit ${m.group(2)}"))
      }
    val defineTxt = find(
      """(?is)\bDEFINE\s+(.*)$""".r, block, "DEFINE").group(1)

    // DEFINE entries: VAR AS <row-local predicate>
    val DefRe = """(?is)^(\w+)\s+AS\s+(.*)$""".r
    val defs: Map[String, String] = splitTop(defineTxt).map {
      case DefRe(v, pred) => v.toUpperCase(java.util.Locale.ROOT) -> pred.trim
      case other => throw new IllegalArgumentException(
        s"MATCH_RECOGNIZE: cannot parse DEFINE entry '$other'")
    }.toMap

    val VarRe = """(\w+)(\+\?|\*\?|\?\?|[+*?])?""".r
    def parseVar(v: String, q: String): PatternVar = {
      val name = v.toUpperCase(java.util.Locale.ROOT)
      val (minRep, maxRep, greedy) = q match {
        case null | "" => (1, 1, true)
        case "+"  => (1, Int.MaxValue, true)
        case "+?" => (1, Int.MaxValue, false)
        case "*"  => (0, Int.MaxValue, true)
        case "*?" => (0, Int.MaxValue, false)
        case "?"  => (0, 1, true)
        case "??" => (0, 1, false)
      }
      val cond = defs.get(name).map { pred =>
        // strip the variable's own prefix; reject cross-variable and
        // navigation references (not row-local)
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
        s"(?i)\\b$name\\.".r.replaceAllIn(pred, "")
      }
      PatternVar(name, minRep, maxRep, greedy, cond)
    }
    val vars: Seq[PatternVar] = patternTxt.trim.split("""\s+""").toSeq.map {
      case VarRe(v, q) => parseVar(v, q)
      case other => throw new IllegalArgumentException(
        s"MATCH_RECOGNIZE: cannot parse PATTERN variable '$other'")
    }
    require(vars.exists(_.cond.isDefined),
      "MATCH_RECOGNIZE: PATTERN has no DEFINE'd variables")
    require(vars.exists(_.minRep >= 1),
      "MATCH_RECOGNIZE: pattern where every variable is optional would " +
        "permit empty matches — at least one variable must be required")

    // MEASURES → FIRST/LAST/bare over pattern variables
    val MFirst = """(?is)^FIRST\s*\(\s*(\w+)\.([`\w]+)\s*\)$""".r
    val MLast = """(?is)^LAST\s*\(\s*(\w+)\.([`\w]+)\s*\)$""".r
    val MBare = """(?is)^(\w+)\.([`\w]+)$""".r
    val MeasRe = """(?is)^(.*?)\s+AS\s+(\w+)$""".r
    def measure(v: String, c: String, first: Boolean,
        alias: String): PatternMeasure = {
      val name = v.toUpperCase(java.util.Locale.ROOT)
      require(vars.exists(_.name == name),
        s"MATCH_RECOGNIZE: measure references unknown variable $v")
      PatternMeasure(name, c.replace("`", ""), first, alias)
    }
    val measures = splitTop(measuresTxt).map {
      case MeasRe(expr, alias) => expr.trim match {
        case MFirst(v, c) => measure(v, c, first = true, alias)
        case MLast(v, c)  => measure(v, c, first = false, alias)
        case MBare(v, c)  => measure(v, c, first = false, alias)
        case other => throw new IllegalArgumentException(
          s"MATCH_RECOGNIZE: unsupported measure '$other' — use " +
            "V.col, FIRST(V.col) or LAST(V.col)")
      }
      case other => throw new IllegalArgumentException(
        s"MATCH_RECOGNIZE: measure '$other' lacks an AS alias")
    }

    RowPatternSpec(pks, ord, vars, measures, within, skipPast)
  }
}
