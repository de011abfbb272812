package graft.queries

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Remaining built-in-parity surface: epoch/unixtime conversions
  * (demo_4.md:45-46 computed-column shape), array + struct expressions,
  * null semantics (null-safe equality, NVL family), regexp extraction,
  * ordered string aggregation, and approximate distinct (rows-only
  * check — HLL sketches are engine-specific by design).
  */
object Extras extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // FROM_UNIXTIME / UNIX_TIMESTAMP round-trip (reference computed-col
    // shape TO_TIMESTAMP(FROM_UNIXTIME(ts/1000, ...))).
    "q_unixtime" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "events")
        .filter($"event_id" % 50 === 0)
        .select($"event_id",
          unix_timestamp($"ts").as("epoch_s"),
          from_unixtime(unix_timestamp($"ts"), "yyyy-MM-dd HH:mm:ss").as("sec_str"),
          (unix_timestamp($"ts") / 60).cast("long").as("epoch_min"))
    }),

    // Array expression battery + struct output. Array/struct columns are
    // built with the real array/struct ops, then serialized to strings for
    // the compared output — the driver's pandas-based hasher cannot sort
    // array- or struct-typed columns.
    "q_array_funcs" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "documents")
        .filter($"doc_id" < 50)
        .select($"doc_id",
          size(split($"text", " ")).as("n"),
          slice(split($"text", " "), 1, 3).as("first3_arr"),
          array_contains(split($"text", " "), "spark").as("has_spark"),
          element_at(split($"text", " "), -1).as("last_word"),
          array_position(split($"text", " "), "data").cast("long").as("data_pos"),
          struct($"lang".as("l"), $"source".as("s")).as("meta_struct"))
        .select($"doc_id", $"n",
          array_join($"first3_arr", " ").as("first3"),
          $"has_spark", $"last_word", $"data_pos",
          concat_ws("|", $"meta_struct.l", $"meta_struct.s").as("meta"))
    }),

    // Null semantics: NULLIF-generated nulls, null-safe equality,
    // NVL/NVL2, COUNT(col) vs COUNT(*).
    "q_null_semantics" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "orders")
        .select($"o_orderkey",
          nullif($"o_orderstatus", lit("P")).as("st"),
          $"o_totalprice")
        .groupBy($"st")
        .agg(count(lit(1)).as("n_all"), count($"st").as("n_nonnull"),
          count(when($"st" <=> lit(null), 1)).as("n_nullsafe_null"))
    }),

    // Regexp extraction + ordered string aggregation.
    "q_regexp_stragg" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "customer")
        .filter($"c_custkey" < 200)
        .select($"c_mktsegment",
          regexp_extract($"c_name", "([0-9]+)", 1).as("num"))
        .groupBy($"c_mktsegment")
        .agg(array_join(sort_array(collect_list($"num")), ",").as("nums"),
          count(lit(1)).as("n"))
    }),

    // Approximate distinct. HLL++ sketch values are engine-specific, so the
    // compared output carries the exact count plus a tolerance check on the
    // sketch (|approx-exact| <= 15% of exact — 3x the default 5% rsd); the
    // oracle asserts the exact column and that the bound held.
    "q_agg_approx" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(approx_count_distinct($"l_partkey").as("approx_parts"),
          countDistinct($"l_partkey").as("exact_parts"))
        .select($"l_returnflag", $"exact_parts",
          (abs($"approx_parts" - $"exact_parts") <=
            $"exact_parts" * 0.15).as("approx_within_tol"))
    }),

    // Order-independent table checksum — the migration-validation tool a
    // user switching engines runs on both sides: each row canonicalizes
    // to an explicit string form (decimals at fixed scale, timestamps at
    // second precision — never engine-default float/ts formatting), the
    // first 32 bits of its md5 sum across rows. Commutative, so the
    // checksum is partitioning- and order-invariant; 100% distributed
    // (scan → partial sums).
    // Table profiling — schema-driven one-scan ANALYZE (see
    // graft.operators.TableProfile for the plan shape and the explicit
    // min/max rendering discipline); also gate-reachable as PROFILE.
    "q_profile_table" -> ((s, dir) =>
      graft.operators.TableProfile.profile(Tables.load(s, dir, "orders"))),

    "q_table_checksum" -> ((s, dir) => {
      import s.implicits._
      def sum32(rowStr: org.apache.spark.sql.Column) =
        sum(conv(substring(md5(rowStr), 1, 8), 16, 10).cast("long"))
      // every field rides through coalesce(…, '\N'): concat_ws would
      // silently SKIP a NULL field (shifting the row string) while the
      // oracle's || chain nulls the whole row — a NULL anywhere must
      // hash identically on both engines for a migration checksum
      def nn(c: org.apache.spark.sql.Column) = coalesce(c, lit("\\N"))
      val orders = Tables.load(s, dir, "orders").agg(
        count(lit(1)).as("n_rows"),
        sum32(concat_ws("|",
          nn($"o_orderkey".cast("string")), nn($"o_custkey".cast("string")),
          nn($"o_orderstatus"),
          nn($"o_totalprice".cast("decimal(18,2)").cast("string")),
          nn(date_format($"o_orderdate", "yyyy-MM-dd HH:mm:ss")),
          nn($"o_orderpriority"))).as("checksum"))
        .select(lit("orders").as("tbl"), $"n_rows", $"checksum")
      val customer = Tables.load(s, dir, "customer").agg(
        count(lit(1)).as("n_rows"),
        sum32(concat_ws("|",
          nn($"c_custkey".cast("string")), nn($"c_name"),
          nn($"c_nationkey".cast("string")),
          nn($"c_acctbal".cast("decimal(18,2)").cast("string")),
          nn($"c_mktsegment"))).as("checksum"))
        .select(lit("customer").as("tbl"), $"n_rows", $"checksum")
      orders.unionByName(customer)
    }))

  def oracleSql: Map[String, String] = Map(
    "q_unixtime" ->
      """SELECT event_id,
        |  CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS epoch_s,
        |  strftime(date_trunc('second', CAST(ts AS TIMESTAMP)),
        |           '%Y-%m-%d %H:%M:%S') AS sec_str,
        |  CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) // 60 AS epoch_min
        |FROM events WHERE event_id % 50 = 0""".stripMargin,

    "q_array_funcs" ->
      """WITH t AS (SELECT doc_id, lang, source,
        |    regexp_split_to_array(text, ' ') AS w FROM documents
        |  WHERE doc_id < 50)
        |SELECT doc_id, len(w) AS n, array_to_string(w[1:3], ' ') AS first3,
        |  list_contains(w, 'spark') AS has_spark,
        |  w[-1] AS last_word,
        |  CAST(coalesce(list_position(w, 'data'), 0) AS BIGINT) AS data_pos,
        |  concat_ws('|', lang, source) AS meta
        |FROM t""".stripMargin,

    "q_null_semantics" ->
      """SELECT NULLIF(o_orderstatus, 'P') AS st, COUNT(*) AS n_all,
        |  COUNT(NULLIF(o_orderstatus, 'P')) AS n_nonnull,
        |  COUNT(CASE WHEN NULLIF(o_orderstatus, 'P') IS NOT DISTINCT FROM
        |    NULL THEN 1 END) AS n_nullsafe_null
        |FROM orders GROUP BY 1""".stripMargin,

    "q_agg_approx" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_parts,
        |  TRUE AS approx_within_tol
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q_regexp_stragg" ->
      """SELECT c_mktsegment,
        |  string_agg(regexp_extract(c_name, '([0-9]+)', 1), ','
        |    ORDER BY regexp_extract(c_name, '([0-9]+)', 1)) AS nums,
        |  COUNT(*) AS n
        |FROM customer WHERE c_custkey < 200
        |GROUP BY c_mktsegment""".stripMargin,

    // per-column UNION ALL mirror of the one-pass profile; renderings
    // match the Spark side's explicit casts field by field
    "q_profile_table" -> Seq(
      ("o_orderkey", "CAST(MIN(o_orderkey) AS VARCHAR)",
        "CAST(MAX(o_orderkey) AS VARCHAR)", "o_orderkey"),
      ("o_custkey", "CAST(MIN(o_custkey) AS VARCHAR)",
        "CAST(MAX(o_custkey) AS VARCHAR)", "o_custkey"),
      ("o_orderstatus", "MIN(o_orderstatus)", "MAX(o_orderstatus)",
        "o_orderstatus"),
      ("o_totalprice",
        "CAST(CAST(MIN(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR)",
        "CAST(CAST(MAX(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR)",
        "o_totalprice"),
      ("o_orderdate", "strftime(MIN(o_orderdate), '%Y-%m-%d %H:%M:%S')",
        "strftime(MAX(o_orderdate), '%Y-%m-%d %H:%M:%S')", "o_orderdate"),
      ("o_orderpriority", "MIN(o_orderpriority)", "MAX(o_orderpriority)",
        "o_orderpriority")).map { case (c, mn, mx, e) =>
      s"""SELECT '$c' AS col, COUNT(*) AS n_rows,
         |  CAST(COUNT($e) AS BIGINT) AS n_notnull,
         |  CAST(COUNT(DISTINCT $e) AS BIGINT) AS ndv,
         |  $mn AS min_s, $mx AS max_s FROM orders""".stripMargin
    }.mkString("\nUNION ALL\n"),

    "q_table_checksum" ->
      """SELECT 'orders' AS tbl, COUNT(*) AS n_rows,
        |  CAST(SUM(CAST('0x' || substr(md5(
        |    coalesce(CAST(o_orderkey AS VARCHAR), '\N') || '|' ||
        |    coalesce(CAST(o_custkey AS VARCHAR), '\N') || '|' ||
        |    coalesce(o_orderstatus, '\N') || '|' ||
        |    coalesce(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), '\N') || '|' ||
        |    coalesce(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'), '\N') || '|' ||
        |    coalesce(o_orderpriority, '\N')), 1, 8) AS BIGINT)) AS BIGINT) AS checksum
        |FROM orders
        |UNION ALL
        |SELECT 'customer' AS tbl, COUNT(*) AS n_rows,
        |  CAST(SUM(CAST('0x' || substr(md5(
        |    coalesce(CAST(c_custkey AS VARCHAR), '\N') || '|' ||
        |    coalesce(c_name, '\N') || '|' ||
        |    coalesce(CAST(c_nationkey AS VARCHAR), '\N') || '|' ||
        |    coalesce(CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS VARCHAR), '\N') || '|' ||
        |    coalesce(c_mktsegment, '\N')), 1, 8) AS BIGINT)) AS BIGINT) AS checksum
        |FROM customer""".stripMargin)
}
