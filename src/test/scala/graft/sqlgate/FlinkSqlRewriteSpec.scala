package graft.sqlgate

import org.scalatest.funsuite.AnyFunSuite

/** Dialect-rewrite unit coverage: every Flink-only construct the demo
  * scripts use maps to its Spark equivalent, and Spark-native SQL passes
  * through byte-identical.
  */
class FlinkSqlRewriteSpec extends AnyFunSuite {

  test("TUMBLE family") {
    assert(FlinkSqlRewrite(
      "SELECT TUMBLE_START(ts, INTERVAL '1' HOUR) as ws, " +
        "TUMBLE_END(ts, INTERVAL '1' HOUR) as we, n FROM t " +
        "GROUP BY TUMBLE(ts, INTERVAL '1' HOUR)") ==
      "SELECT window.start as ws, window.end as we, n FROM t " +
        "GROUP BY window(ts, '1 hours')")
  }

  test("HOP swaps Flink (slide, size) into Spark (size, slide)") {
    assert(FlinkSqlRewrite(
      "GROUP BY HOP (ts, INTERVAL '30' SECOND, INTERVAL '1' MINUTE), u") ==
      "GROUP BY window(ts, '1 minutes', '30 seconds'), u")
  }

  test("SESSION maps to session_window") {
    assert(FlinkSqlRewrite(
      "SELECT SESSION_START(ts, INTERVAL '5' MINUTE) FROM t " +
        "GROUP BY SESSION(ts, INTERVAL '5' MINUTE)") ==
      "SELECT session_window.start FROM t " +
        "GROUP BY session_window(ts, '5 minutes')")
  }

  test("FOR SYSTEM_TIME AS OF is dropped, aliases survive") {
    assert(FlinkSqlRewrite(
      "FROM s LEFT JOIN dim FOR SYSTEM_TIME AS OF s.proctime as b ON b.id = s.id")
      == "FROM s LEFT JOIN dim as b ON b.id = s.id")
  }

  test("TUMBLE window TVF rewrites to epoch-floored scalars") {
    val out = FlinkSqlRewrite(
      "FROM TABLE(TUMBLE(TABLE ev, DESCRIPTOR(ts), INTERVAL '1' HOUR))")
    assert(out.startsWith("FROM (SELECT ev.*, "))
    assert(out.contains(
      "timestamp_micros(unix_micros(ts) div 3600000000 * 3600000000) AS window_start"))
    assert(out.contains("+ 3600000000) AS window_end"))
    assert(out.contains("- 1000) AS window_time"))
    assert(out.endsWith("FROM ev)"))
  }

  test("HOP window TVF explodes the containing window ends") {
    val out = FlinkSqlRewrite(
      "FROM TABLE(HOP(TABLE ev, DESCRIPTOR(ts), INTERVAL '1' HOUR, INTERVAL '2' HOUR))")
    assert(out.contains("LATERAL VIEW explode(sequence("))
    // slide=3.6e9, size=7.2e9: ends anchor to the slide grid
    assert(out.contains("unix_micros(ts) div 3600000000 * 3600000000 + 3600000000"))
    assert(out.contains("timestamp_micros(g_we - 7200000000) AS window_start"))
  }

  test("CUMULATE window TVF explodes the growing window ends") {
    val out = FlinkSqlRewrite(
      "FROM TABLE(CUMULATE(TABLE ev, DESCRIPTOR(ts), INTERVAL '1' HOUR, INTERVAL '4' HOUR)) " +
        "GROUP BY window_start, window_end")
    assert(out.contains("LATERAL VIEW explode(sequence("))
    assert(out.contains(
      "timestamp_micros(unix_micros(ts) div 14400000000 * 14400000000) AS window_start"))
    assert(out.contains("+ 14400000000, 3600000000)) g_tvf AS g_we"))
    // trailing GROUP BY is untouched
    assert(out.endsWith("GROUP BY window_start, window_end"))
  }

  test("HOP/CUMULATE TVFs reject a size not divisible by the slide/step") {
    intercept[IllegalArgumentException](FlinkSqlRewrite(
      "TABLE(HOP(TABLE ev, DESCRIPTOR(ts), INTERVAL '2' HOUR, INTERVAL '3' HOUR))"))
    intercept[IllegalArgumentException](FlinkSqlRewrite(
      "TABLE(CUMULATE(TABLE ev, DESCRIPTOR(ts), INTERVAL '7' MINUTE, INTERVAL '1' HOUR))"))
  }

  private val mr =
    """SELECT user_id, a_ts, b_last FROM ev MATCH_RECOGNIZE (
      |  PARTITION BY user_id
      |  ORDER BY ts
      |  MEASURES A.ts AS a_ts, LAST(B.ts) AS b_last
      |  ONE ROW PER MATCH
      |  AFTER MATCH SKIP PAST LAST ROW
      |  PATTERN (A B+)
      |  DEFINE A AS A.kind = 'x', B AS B.kind = 'y'
      |)""".stripMargin

  test("MATCH_RECOGNIZE rewrites to chained window minima") {
    val out = FlinkSqlRewrite(mr)
    assert(!out.toUpperCase.contains("MATCH_RECOGNIZE"))
    // two stages → two nested MIN layers, chained on the order column
    assert(out.contains(
      "MIN(CASE WHEN (kind = 'x') THEN ts END) OVER (PARTITION BY user_id) AS g_t1"))
    assert(out.contains(
      "MIN(CASE WHEN (kind = 'y') AND ts > g_t1 THEN ts END) OVER (PARTITION BY user_id) AS g_t2"))
    // the match gate and the one-row-per-key aggregation
    assert(out.contains("WHERE g_t2 IS NOT NULL"))
    assert(out.contains("GROUP BY user_id"))
    // FIRST/anchor measure reads the anchored row; LAST on a + variable
    // reads the last qualifying row via MAX_BY
    assert(out.contains("MAX(CASE WHEN ts = g_t1 THEN ts END) AS a_ts"))
    assert(out.contains("MAX_BY(CASE WHEN (kind = 'y') AND ts >= g_t2"))
  }

  test("MATCH_RECOGNIZE: WITHIN bounds the match duration") {
    val out = FlinkSqlRewrite(mr.replace("PATTERN (A B+)",
      "PATTERN (A B+) WITHIN INTERVAL '1' HOUR"))
    assert(out.contains("AND g_t2 <= g_t1 + INTERVAL '1' HOUR"))
  }

  test("MATCH_RECOGNIZE: undefined pattern variables are gap markers") {
    val out = FlinkSqlRewrite(mr.replace("PATTERN (A B+)",
      "PATTERN (A GAP* B+)"))
    assert(out.contains("AS g_t2")) // still two defined stages
    assert(!out.contains("g_t3"))
  }

  test("MATCH_RECOGNIZE: quoted parens in DEFINE don't truncate the block") {
    val out = FlinkSqlRewrite(mr.replace("A AS A.kind = 'x'",
      "A AS A.kind = ':)'"))
    assert(!out.toUpperCase.contains("MATCH_RECOGNIZE"))
    assert(out.contains("MIN(CASE WHEN (kind = ':)') THEN ts END)"))
  }

  test("MATCH_RECOGNIZE: WITHIN caps a trailing + variable's LAST()") {
    val out = FlinkSqlRewrite(mr.replace("PATTERN (A B+)",
      "PATTERN (A B+) WITHIN INTERVAL '1' HOUR"))
    // the final + stage has no next anchor; LAST(B.ts) must not read
    // rows beyond the declared match duration
    assert(out.contains(
      "AND ts >= g_t2 AND ts <= g_t1 + INTERVAL '1' HOUR"))
  }

  test("MATCH_RECOGNIZE: unsupported forms are rejected loudly") {
    // ALL ROWS PER MATCH
    intercept[IllegalArgumentException](FlinkSqlRewrite(
      mr.replace("ONE ROW PER MATCH", "ALL ROWS PER MATCH")))
    // cross-variable DEFINE (not row-local)
    intercept[IllegalArgumentException](FlinkSqlRewrite(
      mr.replace("B AS B.kind = 'y'", "B AS B.v > A.v")))
    // navigation functions in DEFINE
    intercept[IllegalArgumentException](FlinkSqlRewrite(
      mr.replace("B AS B.kind = 'y'", "B AS B.v > LAST(B.v)")))
    // optional quantifier on a DEFINE'd variable
    intercept[IllegalArgumentException](FlinkSqlRewrite(
      mr.replace("PATTERN (A B+)", "PATTERN (A B*)")))
    // SKIP TO LAST <var>
    intercept[IllegalArgumentException](FlinkSqlRewrite(
      mr.replace("AFTER MATCH SKIP PAST LAST ROW",
        "AFTER MATCH SKIP TO LAST B")))
    // '+' on an undefined gap variable (at least one gap row) cannot be
    // enforced — must fail, not degrade to zero-or-more
    intercept[IllegalArgumentException](FlinkSqlRewrite(
      mr.replace("PATTERN (A B+)", "PATTERN (A GAP+ B+)")))
    // computed measure outside the V.col / FIRST / LAST grammar
    intercept[IllegalArgumentException](FlinkSqlRewrite(
      mr.replace("A.ts AS a_ts", "A.ts + 1 AS a_ts")))
  }

  test("Spark-native SQL passes through untouched") {
    val sql = "SELECT window.start, hopper, system_time FROM t " +
      "GROUP BY window(ts, '1 hour'), hopper, system_time"
    assert(FlinkSqlRewrite(sql) == sql)
  }
}
