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

  test("Spark-native SQL passes through untouched") {
    val sql = "SELECT window.start, hopper, system_time FROM t " +
      "GROUP BY window(ts, '1 hour'), hopper, system_time"
    assert(FlinkSqlRewrite(sql) == sql)
  }
}
