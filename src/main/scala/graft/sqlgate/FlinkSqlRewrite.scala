package graft.sqlgate

/** Flink-SQL → Spark-SQL dialect rewrite for gate-script queries — the
  * surface a reference user's scripts actually exercise beyond what the
  * two parsers share (`docs/sql_demo/demo_4.md:77-84` TUMBLE,
  * `demo_5.md:77-84` HOP, `demo_3.md:94-109` temporal lookup join):
  *
  *   TUMBLE(ts, INTERVAL 'n' U)            → window(ts, 'n u')
  *   HOP(ts, INTERVAL slide, INTERVAL size)→ window(ts, size, slide)
  *                                           (Flink argument order is
  *                                           (time, slide, size); Spark's
  *                                           is (time, size, slide))
  *   SESSION(ts, INTERVAL gap)             → session_window(ts, gap)
  *   TUMBLE_START/_END, HOP_START/_END     → window.start / window.end
  *   SESSION_START/_END                    → session_window.start/.end
  *   FOR SYSTEM_TIME AS OF x.proctime      → removed: a batch JDBC scan
  *                                           is already a per-job snapshot
  *                                           of the dim table, which is
  *                                           the processing-time temporal
  *                                           join semantics for a dim that
  *                                           doesn't change mid-job (the
  *                                           TTL'd refresh path is
  *                                           graft.streaming.LookupJoin)
  *
  * The rewrites are plain-text: window calls carry only identifiers and
  * INTERVAL literals (no nested parens), so regexes are exact here.
  * Spark-native queries pass through untouched — every pattern is
  * anchored on a Flink-only keyword.
  */
object FlinkSqlRewrite {

  private val Interval = """INTERVAL\s+'(\d+)'\s+(\w+)"""

  // boundary extractors first: TUMBLE_START contains the token TUMBLE
  private val TumbleStartRe = """(?i)\bTUMBLE_START\s*\([^)]*\)""".r
  private val TumbleEndRe = """(?i)\bTUMBLE_END\s*\([^)]*\)""".r
  private val HopStartRe = """(?i)\bHOP_START\s*\([^)]*\)""".r
  private val HopEndRe = """(?i)\bHOP_END\s*\([^)]*\)""".r
  private val SessionStartRe = """(?i)\bSESSION_START\s*\([^)]*\)""".r
  private val SessionEndRe = """(?i)\bSESSION_END\s*\([^)]*\)""".r

  private val TumbleRe =
    ("""(?i)\bTUMBLE\s*\(\s*([`\w.]+)\s*,\s*""" + Interval + """\s*\)""").r
  private val HopRe =
    ("""(?i)\bHOP\s*\(\s*([`\w.]+)\s*,\s*""" + Interval +
      """\s*,\s*""" + Interval + """\s*\)""").r
  private val SessionRe =
    ("""(?i)\bSESSION\s*\(\s*([`\w.]+)\s*,\s*""" + Interval + """\s*\)""").r
  private val SystemTimeRe =
    """(?i)\s+FOR\s+SYSTEM_TIME\s+AS\s+OF\s+[`\w.]+""".r

  private def dur(n: String, unit: String): String =
    s"$n ${unit.toLowerCase(java.util.Locale.ROOT).stripSuffix("s")}s"

  def apply(sql: String): String = {
    var s = sql
    s = TumbleStartRe.replaceAllIn(s, "window.start")
    s = TumbleEndRe.replaceAllIn(s, "window.end")
    s = HopStartRe.replaceAllIn(s, "window.start")
    s = HopEndRe.replaceAllIn(s, "window.end")
    s = SessionStartRe.replaceAllIn(s, "session_window.start")
    s = SessionEndRe.replaceAllIn(s, "session_window.end")
    s = TumbleRe.replaceAllIn(s, m =>
      s"window(${m.group(1)}, '${dur(m.group(2), m.group(3))}')")
    s = HopRe.replaceAllIn(s, m =>
      s"window(${m.group(1)}, '${dur(m.group(4), m.group(5))}', " +
        s"'${dur(m.group(2), m.group(3))}')")
    s = SessionRe.replaceAllIn(s, m =>
      s"session_window(${m.group(1)}, '${dur(m.group(2), m.group(3))}')")
    s = SystemTimeRe.replaceAllIn(s, "")
    s
  }
}
