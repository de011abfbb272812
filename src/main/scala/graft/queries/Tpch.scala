package graft.queries

import graft.{Num, QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Classic TPC-H query shapes (adapted to the driver's schema — no
  * commitdate/receiptdate/partsupp) — each exercises a distinct
  * optimizer pattern: pure scan-agg (Q6), EXISTS semi-join (Q4),
  * conditional aggregation over a join (Q12), join with CASE-fraction
  * (Q14), distinct-count rollup (Q16), OR-of-ANDs pushdown (Q19).
  */
object Tpch extends QueryPack {
  import Num._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q6: forecast revenue change — the purest scan benchmark: one
    // pushed-filter scan, one agg, zero shuffles of consequence.
    "q6_forecast" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
          $"l_shipdate" < lit("1997-01-01").cast("timestamp") &&
          $"l_discount" >= 0.05 && $"l_discount" <= 0.07 &&
          $"l_quantity" < 24.0)
        .agg(dsum6($"l_extendedprice" * $"l_discount").as("revenue"))
    }),

    // Q4 shape: order-priority checking via EXISTS (left-semi).
    "q4_priority" -> ((s, dir) => {
      import s.implicits._
      val lateLines = Tables.load(s, dir, "lineitem")
        .filter($"l_shipdate" > lit("1997-06-30").cast("timestamp"))
        .select($"l_orderkey")
      Tables.load(s, dir, "orders")
        .filter($"o_orderdate" >= lit("1997-01-01").cast("timestamp") &&
          $"o_orderdate" < lit("1997-04-01").cast("timestamp"))
        .join(lateLines, $"o_orderkey" === $"l_orderkey", "left_semi")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
    }),

    // Q12 shape: shipping-mode/priority classification over a join with
    // conditional (CASE) aggregation.
    "q12_shipmode" -> ((s, dir) => {
      import s.implicits._
      val ord = Tables.load(s, dir, "orders")
      Tables.load(s, dir, "lineitem")
        .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
          $"l_shipdate" < lit("1997-01-01").cast("timestamp"))
        .join(ord, $"l_orderkey" === $"o_orderkey")
        .groupBy($"l_returnflag")
        .agg(
          sum(when($"o_orderpriority" === "1-URGENT" ||
            $"o_orderpriority" === "2-HIGH", 1).otherwise(0)).as("high_line_count"),
          sum(when($"o_orderpriority" =!= "1-URGENT" &&
            $"o_orderpriority" =!= "2-HIGH", 1).otherwise(0)).as("low_line_count"))
    }),

    // Q14 shape: promo revenue fraction — join + CASE numerator over a
    // shared decimal denominator (single pass).
    "q14_promo" -> ((s, dir) => {
      import s.implicits._
      val part = Tables.load(s, dir, "part")
      Tables.load(s, dir, "lineitem")
        .filter($"l_shipdate" >= lit("1996-03-01").cast("timestamp") &&
          $"l_shipdate" < lit("1996-04-01").cast("timestamp"))
        .join(broadcast(part), $"l_partkey" === $"p_partkey")
        .agg(
          (dsum6(when($"p_type" === "PROMO",
            $"l_extendedprice" * (lit(1.0) - $"l_discount")).otherwise(0.0)) /
            dsum6($"l_extendedprice" * (lit(1.0) - $"l_discount")) * 100.0)
            .as("promo_revenue_pct"))
    }),

    // Q16 shape: supplier diversity per brand/size (distinct count over
    // a join, multi-column group).
    "q16_suppliers" -> ((s, dir) => {
      import s.implicits._
      val part = Tables.load(s, dir, "part")
        .filter($"p_brand" =!= "Brand#1" && $"p_size".isin(1, 5, 9, 13, 17))
      Tables.load(s, dir, "lineitem")
        .join(broadcast(part), $"l_partkey" === $"p_partkey")
        .groupBy($"p_brand", $"p_type", $"p_size")
        .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
    }),

    // Q19 shape: disjunction of conjunctive band predicates across the
    // join — Catalyst must push the common parts and keep the OR.
    "q19_bands" -> ((s, dir) => {
      import s.implicits._
      val part = Tables.load(s, dir, "part")
      Tables.load(s, dir, "lineitem")
        .join(broadcast(part), $"l_partkey" === $"p_partkey")
        .filter(
          ($"p_brand" === "Brand#12" && $"p_size".between(1, 15) &&
            $"l_quantity".between(1.0, 11.0)) ||
          ($"p_brand" === "Brand#23" && $"p_size".between(1, 25) &&
            $"l_quantity".between(10.0, 20.0)) ||
          ($"p_brand" === "Brand#34" && $"p_size".between(1, 35) &&
            $"l_quantity".between(20.0, 30.0)))
        .agg(dsum6($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
          count(lit(1)).as("n_lines"))
    }))

  def oracleSql: Map[String, String] = Map(
    "q6_forecast" ->
      s"""SELECT ${oSum6("l_extendedprice * l_discount")} AS revenue
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |  AND l_shipdate < TIMESTAMP '1997-01-01'
         |  AND l_discount >= 0.05 AND l_discount <= 0.07
         |  AND l_quantity < 24.0""".stripMargin,

    "q4_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
        |    AND l_shipdate > TIMESTAMP '1997-06-30')
        |GROUP BY o_orderpriority""".stripMargin,

    "q12_shipmode" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY l_returnflag""".stripMargin,

    "q14_promo" ->
      s"""SELECT ${oSum6("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")} /
         |  ${oSum6("l_extendedprice * (1.0 - l_discount)")} * 100.0
         |  AS promo_revenue_pct
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE l_shipdate >= TIMESTAMP '1996-03-01'
         |  AND l_shipdate < TIMESTAMP '1996-04-01'""".stripMargin,

    "q16_suppliers" ->
      """SELECT p_brand, p_type, p_size,
        |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 9, 13, 17)
        |GROUP BY p_brand, p_type, p_size""".stripMargin,

    "q19_bands" ->
      s"""SELECT ${oSum6("l_extendedprice * (1.0 - l_discount)")} AS revenue,
         |  COUNT(*) AS n_lines
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
         |       AND l_quantity BETWEEN 1.0 AND 11.0)
         |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
         |       AND l_quantity BETWEEN 10.0 AND 20.0)
         |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
         |       AND l_quantity BETWEEN 20.0 AND 30.0)""".stripMargin)
}
