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

  test("Spark-native SQL passes through untouched") {
    val sql = "SELECT window.start, hopper, system_time FROM t " +
      "GROUP BY window(ts, '1 hour'), hopper, system_time"
    assert(FlinkSqlRewrite(sql) == sql)
  }
}
