package graft.queries

import graft.{Num, QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Core relational operators from SURVEY.md §2.3 expressed Spark-first:
  * projection, filter, aggregation, joins, date/time scalars, JSON decode.
  * Filters/projections are written so Catalyst pushes them into the parquet
  * scan (verified via .explain in BenchSpec); joins against the small
  * dimension tables broadcast.
  */
object Relational extends QueryPack {
  import Num._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1 shape: scan-heavy agg with arithmetic inside agg args
    // (reference surface: demo_1.md:58-61 continuous SUM; demo_2.md:79
    // arithmetic in agg args; SUM/COUNT per demo_1/demo_4).
    "q1_agg" -> ((s, dir) => {
      import s.implicits._
      // spread the one-split scan so the partial aggregation runs on
      // every core (§2.5); filter and pruning still push below the
      // exchange to the parquet scan (checked in plans/r18), and the
      // decimal sums are order-free so results are partition-invariant
      graft.Par.spread(Tables.load(s, dir, "lineitem"))
        .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          dsum2($"l_quantity").as("sum_qty"),
          dsum2($"l_extendedprice").as("sum_base_price"),
          dsum6($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"),
          davg2($"l_quantity").as("avg_qty"),
          davg2($"l_discount").as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }),

    // Projection + filter pushdown (demo_6.md:155,225).
    "q_filter_project" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "orders")
        .filter($"o_orderstatus" === "O" && $"o_totalprice" > 100000.0)
        .select($"o_orderkey", $"o_custkey",
          ($"o_totalprice" * 0.9).as("discounted"))
        .orderBy($"o_orderkey")
    }),

    // TPC-H Q3 shape: 3-way join, derived agg, order+limit. customer is
    // small -> broadcast; lineitem|orders shuffle on the join key once.
    "q3_join_topk" -> ((s, dir) => {
      import s.implicits._
      val cust = Tables.load(s, dir, "customer")
        .filter($"c_mktsegment" === "BUILDING")
      val ord = Tables.load(s, dir, "orders")
        .filter($"o_orderdate" < lit("1998-03-15").cast("timestamp"))
      val li = Tables.load(s, dir, "lineitem")
        .filter($"l_shipdate" > lit("1998-03-15").cast("timestamp"))
      li.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(cust), $"o_custkey" === $"c_custkey")
        .groupBy($"o_orderkey", date_format($"o_orderdate", "yyyy-MM-dd").as("orderdate"))
        .agg(dsum6($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
        .orderBy($"revenue".desc, $"o_orderkey")
        .limit(10)
    }),

    // Group-by over a derived key (demo_6.md:222-226 DATE_FORMAT group).
    "q_datetime_group" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "orders")
        .groupBy(date_format($"o_orderdate", "yyyy-MM").as("order_month"))
        .agg(count(lit(1)).as("n_orders"),
          dsum2($"o_totalprice").as("sum_price"))
        .orderBy($"order_month")
    }),

    // JSON decode with error tolerance (demo_1.md:41-42 json format
    // options) — from_json is PERMISSIVE (null on parse error) by default.
    "q_json_extract" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "events")
        .select($"event_type",
          from_json($"props", org.apache.spark.sql.types.StructType.fromDDL("k INT"))
            .getField("k").as("k"))
        .groupBy($"event_type")
        .agg(sum($"k").as("sum_k"), count($"k").as("n_k"))
        .orderBy($"event_type")
    }))

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${oSum2("l_quantity")} AS sum_qty,
         |  ${oSum2("l_extendedprice")} AS sum_base_price,
         |  ${oSum6("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
         |  ${oAvg2("l_quantity")} AS avg_qty,
         |  ${oAvg2("l_discount")} AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_filter_project" ->
      """SELECT o_orderkey, o_custkey, o_totalprice * 0.9 AS discounted
        |FROM orders WHERE o_orderstatus = 'O' AND o_totalprice > 100000.0
        |ORDER BY o_orderkey""".stripMargin,

    "q3_join_topk" ->
      s"""SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
         |  ${oSum6("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-03-15'
         |  AND l_shipdate > TIMESTAMP '1998-03-15'
         |GROUP BY o_orderkey, orderdate
         |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,

    "q_datetime_group" ->
      s"""SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
         |  COUNT(*) AS n_orders, ${oSum2("o_totalprice")} AS sum_price
         |FROM orders GROUP BY order_month ORDER BY order_month""".stripMargin,

    "q_json_extract" ->
      """SELECT event_type,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
        |  COUNT(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS n_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
}
