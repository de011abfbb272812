package graft.queries

import graft.{Num, QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar expressions, set operations, subqueries, DISTINCT, sort/limit —
  * the remaining SURVEY.md §2.3 built-in-parity surface. Date/time scalars
  * mirror the reference demos (DATE_FORMAT demo_6.md:223, TO_TIMESTAMP /
  * FROM_UNIXTIME demo_4.md:45-46); everything stays inside Catalyst
  * built-ins so whole-stage codegen covers the full expression tree.
  */
object Scalars extends QueryPack {
  import Num._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // String scalar battery over customer names.
    "q_str_funcs" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "customer")
        .filter($"c_name".like("%1%"))
        .select($"c_custkey",
          upper($"c_name").as("uname"),
          lower($"c_mktsegment").as("lseg"),
          length($"c_name").as("nlen"),
          substring($"c_name", 1, 8).as("prefix"),
          concat_ws("#", $"c_name", $"c_mktsegment").as("joined"),
          lpad($"c_custkey".cast("string"), 8, "0").as("padded"),
          regexp_replace($"c_name", "[0-9]+", "N").as("depat"))
    }),

    // Date/time scalar battery (reference: DATE_FORMAT / EXTRACT family).
    "q_date_funcs" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "orders")
        .filter($"o_orderkey" % 100 === 0)
        .select($"o_orderkey",
          year($"o_orderdate").as("y"),
          quarter($"o_orderdate").as("q"),
          month($"o_orderdate").as("m"),
          dayofmonth($"o_orderdate").as("d"),
          date_format(date_trunc("month", $"o_orderdate"), "yyyy-MM-dd").as("month_start"),
          date_format(last_day($"o_orderdate"), "yyyy-MM-dd").as("month_end"),
          datediff(lit("1999-01-01").cast("date"), $"o_orderdate".cast("date")).as("days_to_99"))
    }),

    // CASE/WHEN + coalesce/nullif/greatest/least.
    "q_case_expr" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "orders")
        .select($"o_orderkey",
          when($"o_totalprice" > 300000.0, "big")
            .when($"o_totalprice" > 150000.0, "mid")
            .otherwise("small").as("size_band"),
          coalesce(nullif($"o_orderstatus", lit("P")), lit("pending")).as("status2"),
          greatest($"o_totalprice" * 0.1, lit(5000.0)).as("fee"),
          least($"o_custkey", $"o_orderkey").as("lo_key"))
    }),

    // Numeric scalar battery: floor/ceil/round/abs/mod/pow on 2-dp prices.
    "q_num_funcs" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "part")
        .select($"p_partkey",
          floor($"p_retailprice").as("fl"),
          ceil($"p_retailprice").as("ce"),
          round($"p_retailprice", 1).as("rd1"),
          abs($"p_retailprice" - 1000.0).as("dist"),
          ($"p_partkey" % 7).as("m7"),
          pow($"p_size".cast("double"), 2.0).as("size_sq"))
    }),

    // UNION / INTERSECT / EXCEPT with distinct set semantics.
    "q_setops" -> ((s, dir) => {
      import s.implicits._
      val building = Tables.load(s, dir, "customer")
        .filter($"c_mktsegment" === "BUILDING").select($"c_nationkey")
      val auto = Tables.load(s, dir, "customer")
        .filter($"c_mktsegment" === "AUTOMOBILE").select($"c_nationkey")
      val rich = Tables.load(s, dir, "customer")
        .filter($"c_acctbal" > 9900.0).select($"c_nationkey")
      // intersect/except already have distinct set semantics
      building.intersect(auto).except(rich)
        .select($"c_nationkey".as("nationkey"))
    }),

    // Scalar subquery: orders above the global (deterministic) average.
    "q_sub_scalar" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(
        s"""SELECT o_orderkey, o_totalprice FROM orders
           |WHERE o_totalprice > (SELECT ${oAvg2("o_totalprice")} FROM orders)
           |  AND o_orderstatus = 'F'""".stripMargin)
    }),

    // IN subquery: customers in ASIA nations.
    "q_sub_in" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT c_custkey, c_nationkey FROM customer
          |WHERE c_nationkey IN (
          |  SELECT n_nationkey FROM nation JOIN region
          |  ON n_regionkey = r_regionkey WHERE r_name = 'ASIA')""".stripMargin)
    }),

    // Correlated scalar subquery (Catalyst decorrelates to an agg+join).
    "q_sub_corr" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(
        s"""SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
           |WHERE o_totalprice > 2.0 * (
           |  SELECT ${oAvg2("o_totalprice")} FROM orders i
           |  WHERE i.o_custkey = o.o_custkey)""".stripMargin)
    }),

    // CTE (WITH) chain.
    "q_cte" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(
        s"""WITH nat AS (
           |  SELECT n_nationkey, n_name FROM nation WHERE n_regionkey < 2
           |), bal AS (
           |  SELECT c_nationkey, ${oSum2("c_acctbal")} AS tot
           |  FROM customer GROUP BY c_nationkey
           |)
           |SELECT n_name, tot FROM nat JOIN bal ON n_nationkey = c_nationkey""".stripMargin)
    }),

    // DISTINCT projection.
    "q_distinct" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "orders")
        .select($"o_orderstatus", $"o_orderpriority").distinct()
    }),

    // Global sort + LIMIT/OFFSET pagination over a unique total order.
    "q_top_offset" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "orders")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .select($"o_orderkey", $"o_totalprice")
        .offset(10).limit(20)
    }))

  def oracleSql: Map[String, String] = Map(
    "q_str_funcs" ->
      """SELECT c_custkey, upper(c_name) AS uname, lower(c_mktsegment) AS lseg,
        |  length(c_name) AS nlen, substr(c_name, 1, 8) AS prefix,
        |  concat_ws('#', c_name, c_mktsegment) AS joined,
        |  lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
        |  regexp_replace(c_name, '[0-9]+', 'N', 'g') AS depat
        |FROM customer WHERE c_name LIKE '%1%'""".stripMargin,

    "q_date_funcs" ->
      """SELECT o_orderkey, year(o_orderdate) AS y, quarter(o_orderdate) AS q,
        |  month(o_orderdate) AS m, day(o_orderdate) AS d,
        |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        |  strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
        |  date_diff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01') AS days_to_99
        |FROM orders WHERE o_orderkey % 100 = 0""".stripMargin,

    "q_case_expr" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 300000.0 THEN 'big'
        |       WHEN o_totalprice > 150000.0 THEN 'mid'
        |       ELSE 'small' END AS size_band,
        |  COALESCE(NULLIF(o_orderstatus, 'P'), 'pending') AS status2,
        |  GREATEST(o_totalprice * 0.1, 5000.0) AS fee,
        |  LEAST(o_custkey, o_orderkey) AS lo_key
        |FROM orders""".stripMargin,

    "q_num_funcs" ->
      """SELECT p_partkey, CAST(floor(p_retailprice) AS BIGINT) AS fl,
        |  CAST(ceil(p_retailprice) AS BIGINT) AS ce,
        |  round(p_retailprice, 1) AS rd1,
        |  abs(p_retailprice - 1000.0) AS dist,
        |  p_partkey % 7 AS m7,
        |  pow(CAST(p_size AS DOUBLE), 2.0) AS size_sq
        |FROM part""".stripMargin,

    "q_setops" ->
      """SELECT DISTINCT c_nationkey AS nationkey FROM (
        |  SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |  INTERSECT
        |  SELECT c_nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        |  EXCEPT
        |  SELECT c_nationkey FROM customer WHERE c_acctbal > 9900.0) t""".stripMargin,

    "q_sub_scalar" ->
      s"""SELECT o_orderkey, o_totalprice FROM orders
         |WHERE o_totalprice > (SELECT ${oAvg2("o_totalprice")} FROM orders)
         |  AND o_orderstatus = 'F'""".stripMargin,

    "q_sub_in" ->
      """SELECT c_custkey, c_nationkey FROM customer
        |WHERE c_nationkey IN (
        |  SELECT n_nationkey FROM nation JOIN region
        |  ON n_regionkey = r_regionkey WHERE r_name = 'ASIA')""".stripMargin,

    "q_sub_corr" ->
      s"""SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
         |WHERE o_totalprice > 2.0 * (
         |  SELECT ${oAvg2("o_totalprice")} FROM orders i
         |  WHERE i.o_custkey = o.o_custkey)""".stripMargin,

    "q_cte" ->
      s"""WITH nat AS (
         |  SELECT n_nationkey, n_name FROM nation WHERE n_regionkey < 2
         |), bal AS (
         |  SELECT c_nationkey, ${oSum2("c_acctbal")} AS tot
         |  FROM customer GROUP BY c_nationkey
         |)
         |SELECT n_name, tot FROM nat JOIN bal ON n_nationkey = c_nationkey""".stripMargin,

    "q_distinct" ->
      "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",

    "q_top_offset" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20 OFFSET 10""".stripMargin)
}
