package graft.queries

import graft.{Num, QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-time windowing — the reference's core streaming operators
  * (TUMBLE `demo_4.md:77-84`, HOP `demo_5.md:77-84`, session windows as
  * Flink-SQL parity per SURVEY §2.3) expressed with Spark's `window()` /
  * `session_window()`. The very same expressions run under readStream with
  * a watermark (see graft.streaming specs); running them on the batch
  * events table lets the DuckDB oracle check the windowing semantics
  * (epoch-aligned bucketing, hop expansion, gap-merge sessions).
  *
  * Scale notes: tumble/hop aggregation is a single shuffle keyed by
  * (window, group) with map-side partial aggregation; session windows
  * shuffle once by user and sort locally within partitions.
  */
object Windows extends QueryPack {
  import Num._

  /** Shared hop-window oracle (2h windows sliding 1h → VALUES (0),(1)
    * window offsets per event); StreamingGate's q_stream_hop reuses it so
    * the batch and streaming mirrors cannot drift apart.
    */
  private[queries] val oHopSql: String =
    """SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS wstart,
      |  event_type, COUNT(*) AS n
      |FROM (
      |  SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP))
      |    - k.k * INTERVAL 1 HOUR AS wstart, event_type
      |  FROM events CROSS JOIN (VALUES (0), (1)) k(k)) t
      |GROUP BY wstart, event_type""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Tumbling 1-hour event-time window per event type (TUMBLE +
    // TUMBLE_START/TUMBLE_END of demo_4).
    "q_window_tumble" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "events")
        .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
        .agg(count(lit(1)).as("n"), dsum2($"value").as("sum_value"))
        .select(
          date_format($"w.start", "yyyy-MM-dd HH:mm:ss").as("wstart"),
          date_format($"w.end", "yyyy-MM-dd HH:mm:ss").as("wend"),
          $"event_type", $"n", $"sum_value")
    }),

    // Hopping (sliding) window, size 2h slide 1h (HOP of demo_5): every
    // event lands in exactly two windows.
    "q_window_hop" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "events")
        .groupBy(window($"ts", "2 hours", "1 hour").as("w"), $"event_type")
        .agg(count(lit(1)).as("n"))
        .select(
          date_format($"w.start", "yyyy-MM-dd HH:mm:ss").as("wstart"),
          $"event_type", $"n")
    }),

    // Session window with a 2-hour inactivity gap per user (Flink SQL
    // session windows; Spark 3.2+ session_window). Output uses min/max
    // event times so the oracle's gaps-and-islands formulation matches
    // without modeling Spark's [start, last+gap) end convention.
    "q_window_session" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "events")
        .groupBy(session_window($"ts", "2 hours").as("w"), $"user_id")
        .agg(count(lit(1)).as("n_events"),
          date_format(min($"ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("sess_start"),
          date_format(max($"ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("sess_last"))
        .select($"user_id", $"sess_start", $"sess_last", $"n_events")
    }),

    // Cumulating window (Flink 1.13+ CUMULATE TVF): growing windows
    // [ws, ws+1h), [ws, ws+2h) … [ws, ws+4h) per 4h-aligned bucket —
    // early partial results that converge on the tumble answer. Spark
    // has no native cumulate; the epoch-aligned long-µs explode below
    // IS the operator (shared shape with FlinkSqlRewrite's CUMULATE TVF
    // rewrite), and stays whole-stage-codegen'd: sequence + explode +
    // integer division, then one (ws, we, type)-keyed aggregation with
    // map-side partials — same single-shuffle profile as tumble/hop.
    "q_window_cumulate" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "events")
        .selectExpr("event_type", "value",
          s"unix_micros(ts) div $CumSizeUs * $CumSizeUs AS g_ws",
          s"explode(sequence(" +
            s"unix_micros(ts) div $CumSizeUs * $CumSizeUs + " +
            s"(unix_micros(ts) - unix_micros(ts) div $CumSizeUs * $CumSizeUs) " +
            s"div $CumStepUs * $CumStepUs + $CumStepUs, " +
            s"unix_micros(ts) div $CumSizeUs * $CumSizeUs + $CumSizeUs, " +
            s"$CumStepUs)) AS g_we")
        .groupBy($"g_ws", $"g_we", $"event_type")
        .agg(count(lit(1)).as("n"), dsum2($"value").as("sum_value"))
        .select(
          date_format(expr("timestamp_micros(g_ws)"), "yyyy-MM-dd HH:mm:ss").as("wstart"),
          date_format(expr("timestamp_micros(g_we)"), "yyyy-MM-dd HH:mm:ss").as("wend"),
          $"event_type", $"n", $"sum_value")
    }))

  /** CUMULATE step 1h / size 4h (shared with the streaming mirror). */
  private[queries] val CumStepUs: Long = 3600L * 1000000L
  private[queries] val CumSizeUs: Long = 4L * 3600L * 1000000L

  /** Shared cumulate oracle: each event lands in the growing windows
    * whose end exceeds it within its 4h bucket — the k∈1..4 hop-style
    * cross join with an end>ts filter. time_bucket's 2000-01-01 origin
    * is 4h-aligned to the epoch, so buckets match Spark's epoch floor.
    */
  private[queries] val oCumulateSql: String =
    s"""SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS wstart,
       |  strftime(ws + k.k * INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S') AS wend,
       |  event_type, COUNT(*) AS n, ${Num.oSum2("value")} AS sum_value
       |FROM (SELECT time_bucket(INTERVAL 4 HOUR, CAST(ts AS TIMESTAMP)) AS ws,
       |        CAST(ts AS TIMESTAMP) AS t, event_type, value FROM events)
       |CROSS JOIN (VALUES (1), (2), (3), (4)) k(k)
       |WHERE t < ws + k.k * INTERVAL 1 HOUR
       |GROUP BY ws, k.k, event_type""".stripMargin

  /** Shared session-window oracle (gaps-and-islands over a 2h inactivity
    * gap per user); StreamingGate's q_stream_session reuses it so the
    * batch and streaming mirrors cannot drift apart.
    */
  private[queries] val oSessionSql: String =
    """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
      |flag AS (SELECT user_id, ts,
      |    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
      |         >= INTERVAL 2 HOUR OR
      |         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |    THEN 1 ELSE 0 END AS new_sess
      |  FROM e),
      |sess AS (SELECT user_id, ts,
      |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM flag)
      |SELECT user_id,
      |  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS sess_start,
      |  strftime(MAX(ts), '%Y-%m-%d %H:%M:%S.%f') AS sess_last,
      |  COUNT(*) AS n_events
      |FROM sess GROUP BY user_id, sid""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q_window_tumble" ->
      s"""SELECT strftime(tb, '%Y-%m-%d %H:%M:%S') AS wstart,
         |  strftime(tb + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S') AS wend,
         |  event_type, COUNT(*) AS n, ${oSum2("value")} AS sum_value
         |FROM (SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS tb,
         |        event_type, value FROM events) t
         |GROUP BY tb, event_type""".stripMargin,

    "q_window_hop" -> Windows.oHopSql,

    "q_window_session" -> Windows.oSessionSql,

    "q_window_cumulate" -> Windows.oCumulateSql)
}
