package graft.queries

import graft.{Num, QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window (ranking) functions, multi-dimensional aggregation
  * (ROLLUP/CUBE/GROUPING SETS), pivot, and statistics — the batch analytic
  * surface SURVEY.md §2.3 maps to Spark built-ins ("Set ops / sorts /
  * limits / window functions ... treat as built-in parity").
  *
  * Scale notes: every window here partitions by a high-cardinality key
  * (custkey / brand), so state per partition is bounded and the sort is
  * local to the hash partition — no global sort, no skewed giant window.
  * Running sums go through exact decimals (graft.Num) so results are
  * bit-stable under any partitioning.
  */
object Analytic extends QueryPack {
  import Num._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Top-N per group via row_number — the standard dedup/TopN pattern
    // (Flink "Top-N" docs shape; deterministic tie-break on orderkey).
    "q_win_topn" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
      Tables.load(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 2)
        .select($"o_custkey", $"rn", $"o_orderkey", $"o_totalprice")
    }),

    // rank / dense_rank / ntile over a unique ordering.
    "q_win_rank" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"p_brand")
        .orderBy($"p_retailprice".desc, $"p_partkey")
      Tables.load(s, dir, "part")
        .select($"p_brand", $"p_partkey", $"p_retailprice",
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          ntile(4).over(w).as("quartile"),
          // (rank-1)/(n-1) and peers/n: double divisions of identical
          // integers, bit-equal across engines
          percent_rank().over(w).as("prk"),
          cume_dist().over(w).as("cdist"))
        .filter($"rnk" <= 8)
    }),

    // lag/lead: order-to-order price delta per customer.
    "q_win_lag" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate", $"o_orderkey")
      Tables.load(s, dir, "orders")
        .select($"o_custkey", $"o_orderkey",
          date_format($"o_orderdate", "yyyy-MM-dd").as("d"),
          ($"o_totalprice" - lag($"o_totalprice", 1).over(w)).as("delta"),
          lead($"o_orderkey", 1).over(w).as("next_order"))
    }),

    // Running (cumulative) sum + count per customer — exact decimal sum.
    "q_win_running" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate", $"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.load(s, dir, "orders")
        .select($"o_custkey", $"o_orderkey",
          dwin2($"o_totalprice", w).as("run_sum"),
          count(lit(1)).over(w).as("run_n"))
    }),

    // first_value / last_value over the full partition frame.
    "q_win_firstlast" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate", $"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.load(s, dir, "orders")
        .select($"o_custkey", $"o_orderkey",
          first($"o_orderkey").over(w).as("first_order"),
          last($"o_orderkey").over(w).as("last_order"))
        .distinct()
    }),

    // Time-RANGE window frame (RANGE BETWEEN INTERVAL ... PRECEDING):
    // 30-day trailing spend per customer. Spark's RANGE frames take a
    // numeric order key, so the frame runs over unix microseconds with
    // a 30-day µs bound — value-based peers, identical to the oracle's
    // timestamp RANGE frame (orderdates are midnights, no sub-µs risk).
    // One shuffle on the partition key; the frame itself is a
    // single-pass sliding sum within each sorted partition.
    "q_win_range_interval" -> ((s, dir) => {
      import s.implicits._
      val DayUs = 86400L * 1000000L
      // o_orderdate loads as TIMESTAMP_NTZ; the session TZ is pinned to
      // UTC, so the cast to TIMESTAMP is value-identity.
      val w = Window.partitionBy($"o_custkey")
        .orderBy(unix_micros($"o_orderdate".cast("timestamp")))
        .rangeBetween(-30L * DayUs, 0L)
      Tables.load(s, dir, "orders")
        .select($"o_custkey", $"o_orderkey",
          dwin2($"o_totalprice", w).as("trail_sum"),
          count(lit(1)).over(w).as("trail_n"))
    }),

    // ROLLUP over (mktsegment, nation bucket) with GROUPING markers.
    "q_agg_rollup" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "customer")
        .select($"c_mktsegment", ($"c_nationkey" % 5).as("nbucket"), $"c_acctbal")
        .rollup($"c_mktsegment", $"nbucket")
        .agg(grouping($"c_mktsegment").as("g_seg"),
          grouping($"nbucket").as("g_nb"),
          count(lit(1)).as("n"), dsum2($"c_acctbal").as("sum_bal"))
    }),

    // CUBE over (orderstatus, orderpriority).
    "q_agg_cube" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "orders")
        .cube($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n"), dsum2($"o_totalprice").as("sum_price"))
    }),

    // Explicit GROUPING SETS via SQL (Catalyst expands to Expand node).
    "q_agg_groupsets" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(
        s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           |  ${oSum2("o_totalprice")} AS sum_price
           |FROM orders
           |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
           |""".stripMargin)
    }),

    // Pivot (conditional aggregation): order counts per month × status.
    "q_pivot_status" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "orders")
        .groupBy(date_format($"o_orderdate", "yyyy-MM").as("order_month"))
        .pivot("o_orderstatus", Seq("O", "F", "P"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("O", "F", "P")) // COUNT FILTER yields 0, pivot null
    }),

    // Deterministic variance/stddev from exact decimal sums:
    // var = (sumsq - sum*sum/n) / (n-1), all in identical IEEE double ops.
    "q_agg_stats" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "customer")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n"), dsum2($"c_acctbal").as("s1"),
          dsumsq($"c_acctbal").as("s2"))
        .select($"c_mktsegment", $"n",
          // nullif: a 1-row group divides by zero, which throws under
          // Spark 4's default ANSI mode while DuckDB yields NULL
          (($"s2" - $"s1" * $"s1" / $"n") / nullif($"n" - 1, lit(0L)))
            .as("variance"))
    }),

    // Exact heavy hitters at unbounded key cardinality: bounded-state
    // Misra-Gries sketch nominates candidates, an exact candidate-only
    // count answers, and the sketch error bound PROVES exactness (see
    // graft.operators.HeavyHitters — the fallback makes the result
    // exact even when the proof fails, so the oracle is a plain
    // GROUP BY top-k either way). The key is skew-shaped from user_id
    // (70% of events collapse onto 3 hot keys, the rest stay unique) —
    // the distribution heavy-hitter queries exist for.
    "q_agg_heavyhitters" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
        .select(when($"user_id" % 10 < 7, $"user_id" % 3)
          .otherwise($"user_id").as("k"))
      graft.operators.HeavyHitters.exactTopK(ev, "k", k = 3, capacity = 64)
        .select($"key".as("k"), $"cnt")
    }),

    // Sorted array aggregation (order-insensitive collect); joined to a
    // string so the driver harness can hash the compared column.
    "q_agg_collect" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "nation")
        .groupBy($"n_regionkey")
        .agg(array_join(sort_array(collect_list($"n_name")), ",").as("nations"),
          count(lit(1)).as("n"))
    }),

    // min/max/count(distinct) per group.
    "q_agg_minmax" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(min($"l_quantity").as("min_qty"), max($"l_quantity").as("max_qty"),
          countDistinct($"l_suppkey").as("n_supp"),
          min($"l_shipdate").cast("date").cast("string").as("first_ship"))
    }),

    // HAVING (post-aggregation filter).
    "q_agg_having" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "orders")
        .groupBy($"o_custkey")
        .agg(count(lit(1)).as("n_orders"), dsum2($"o_totalprice").as("total"))
        .filter($"n_orders" >= 25)
    }),

    // Ordered-sequence (funnel) detection — the MATCH_RECOGNIZE / CEP
    // shape: per user, the earliest view, the earliest click AFTER that
    // view, the earliest purchase AFTER that click. Three chained minima
    // as whole-partition window aggregates over ONE user_id shuffle —
    // consecutive Window nodes share the partitioning, so no
    // re-exchange, and state per partition is one row per user, not a
    // pattern automaton. Timestamps format to strings for the
    // cross-engine hash; the conversion latency is exact integer micros.
    "q_funnel" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id")
      val fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
      Tables.load(s, dir, "events")
        .withColumn("t1",
          min(when($"event_type" === "view", $"ts")).over(w))
        .withColumn("t2",
          min(when($"event_type" === "click" && $"ts" > $"t1", $"ts")).over(w))
        .withColumn("t3",
          min(when($"event_type" === "purchase" && $"ts" > $"t2", $"ts")).over(w))
        .groupBy($"user_id")
        .agg(
          date_format(first($"t1"), fmt).as("first_view"),
          date_format(first($"t2"), fmt).as("first_click"),
          date_format(first($"t3"), fmt).as("first_purchase"),
          (unix_micros(first($"t3")) - unix_micros(first($"t1")))
            .as("convert_micros"))
    }),

    // Time-series gap filling (regularization): hourly counts per event
    // type with missing hours zero-filled over the global range — what
    // every downstream forecaster/monitor wants instead of a sparse
    // series. The [lo, hi] bounds are a 2-scalar driver collect
    // (control plane); the dense grid is distinct-keys × explode'd
    // hour sequence, left-joined to the sparse aggregate. Grid size is
    // keys × hours regardless of corpus row count.
    "q_gapfill" -> ((s, dir) => {
      import s.implicits._
      // ONE corpus scan: the sparse aggregate (keys × active hours,
      // corpus-independent size) is cached and everything else — global
      // bounds, the distinct key set, the dense grid's join side —
      // derives from it, not from re-reading events.
      val agg = Tables.load(s, dir, "events")
        .select($"event_type", date_trunc("hour", $"ts").as("h"))
        .groupBy($"event_type", $"h").agg(count(lit(1)).as("n"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val b = agg.agg(min($"h").as("lo"), max($"h").as("hi")).head
      val grid = agg.select($"event_type").distinct()
        .crossJoin(
          s.range(1).select(explode(sequence(
            lit(b.getTimestamp(0)), lit(b.getTimestamp(1)),
            expr("interval 1 hour"))).as("h")))
      grid.join(agg, Seq("event_type", "h"), "left")
        .select($"event_type",
          date_format($"h", "yyyy-MM-dd HH:mm:ss").as("hour"),
          coalesce($"n", lit(0L)).as("n"))
    }),

    // Behavior-graph analytics: per-user consecutive event transitions →
    // a Markov transition matrix → 3 PageRank power iterations over the
    // event-type graph. The 100 TB shape: the ONLY corpus-scale work is
    // the lead() window (one user_id shuffle) and the (src,dst) count —
    // after that the edge table is |types|² rows (control-plane sized)
    // and each iteration is a broadcast join over it. Dangling mass
    // (types with no out-transitions) is deliberately dropped — the
    // standard leaked-PageRank variant for fixed-iteration scoring.
    //
    // Determinism: p = n/tot and every product are per-row IEEE ops;
    // the per-node contribution SUM (the one order-dependent float op)
    // goes through a DECIMAL(38,20) cast — finer than any double ulp in
    // range, so both engines sum identical decimals.
    "q_event_markov" -> ((s, dir) => {
      import s.implicits._
      val damp = 0.85
      val edges = Tables.load(s, dir, "events")
        .select($"user_id", $"event_type".as("src"), $"ts", $"event_id")
        .withColumn("dst", lead($"src", 1).over(
          Window.partitionBy($"user_id").orderBy($"ts", $"event_id")))
        .filter($"dst".isNotNull)
        .groupBy($"src", $"dst").agg(count(lit(1)).as("n"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val probs = edges.join(
          edges.groupBy($"src").agg(sum($"n").as("tot")), "src")
        .select($"src", $"dst", ($"n".cast("double") / $"tot").as("p"))
      val nodes = Tables.load(s, dir, "events")
        .select($"event_type".as("node")).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nNodes = nodes.count()
      val base = 0.15 / nNodes
      var ranks = nodes.select($"node", lit(1.0 / nNodes).as("r"))
      for (_ <- 1 to 3) {
        val contrib = probs.join(broadcast(ranks),
            probs("src") === ranks("node"))
          .select($"dst".as("node"),
            ($"r" * $"p").cast(org.apache.spark.sql.types.DecimalType(38, 20))
              .as("term"))
          .groupBy($"node").agg(sum($"term").cast("double").as("s"))
        ranks = nodes.join(contrib, Seq("node"), "left")
          .select($"node",
            (lit(base) + lit(damp) * coalesce($"s", lit(0.0))).as("r"))
      }
      ranks.join(edges.groupBy($"src").agg(sum($"n").as("n_out"))
          .withColumnRenamed("src", "node"), Seq("node"), "left")
        .select($"node".as("event_type"),
          coalesce($"n_out", lit(0L)).as("n_out"), $"r".as("pagerank"))
    }))

  def oracleSql: Map[String, String] = Map(
    "q_win_topn" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t WHERE rn <= 2""".stripMargin,

    "q_win_rank" ->
      """SELECT p_brand, p_partkey, p_retailprice, rnk, drnk, quartile,
        |    prk, cdist FROM (
        |  SELECT p_brand, p_partkey, p_retailprice,
        |    RANK() OVER w AS rnk, DENSE_RANK() OVER w AS drnk,
        |    NTILE(4) OVER w AS quartile,
        |    PERCENT_RANK() OVER w AS prk, CUME_DIST() OVER w AS cdist
        |  FROM part
        |  WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey)
        |) t WHERE rnk <= 8""".stripMargin,

    "q_win_lag" ->
      """SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS d,
        |  o_totalprice - LAG(o_totalprice, 1) OVER w AS delta,
        |  LEAD(o_orderkey, 1) OVER w AS next_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,

    "q_win_running" ->
      s"""SELECT o_custkey, o_orderkey,
         |  ${oWin2("o_totalprice",
               "PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey " +
               "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW")} AS run_sum,
         |  COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_n
         |FROM orders""".stripMargin,

    "q_win_firstlast" ->
      """SELECT DISTINCT o_custkey, o_orderkey,
        |  FIRST_VALUE(o_orderkey) OVER w AS first_order,
        |  LAST_VALUE(o_orderkey) OVER w AS last_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin,

    "q_win_range_interval" ->
      s"""SELECT o_custkey, o_orderkey,
         |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
         |    PARTITION BY o_custkey ORDER BY o_orderdate
         |    RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW)
         |    AS DOUBLE) AS trail_sum,
         |  COUNT(*) OVER (
         |    PARTITION BY o_custkey ORDER BY o_orderdate
         |    RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW) AS trail_n
         |FROM orders""".stripMargin,

    "q_agg_rollup" ->
      s"""SELECT c_mktsegment, nbucket, GROUPING(c_mktsegment) AS g_seg,
         |  GROUPING(nbucket) AS g_nb, COUNT(*) AS n,
         |  ${oSum2("c_acctbal")} AS sum_bal
         |FROM (SELECT c_mktsegment, c_nationkey % 5 AS nbucket, c_acctbal
         |      FROM customer) t
         |GROUP BY ROLLUP (c_mktsegment, nbucket)""".stripMargin,

    "q_agg_cube" ->
      s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
         |  ${oSum2("o_totalprice")} AS sum_price
         |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,

    "q_agg_groupsets" ->
      s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
         |  ${oSum2("o_totalprice")} AS sum_price
         |FROM orders
         |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin,

    "q_pivot_status" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
        |  COUNT(*) FILTER (o_orderstatus = 'O') AS "O",
        |  COUNT(*) FILTER (o_orderstatus = 'F') AS "F",
        |  COUNT(*) FILTER (o_orderstatus = 'P') AS "P"
        |FROM orders GROUP BY order_month""".stripMargin,

    "q_agg_stats" ->
      s"""SELECT c_mktsegment, n, (s2 - s1*s1/n) / nullif(n-1, 0) AS variance FROM (
         |  SELECT c_mktsegment, COUNT(*) AS n, ${oSum2("c_acctbal")} AS s1,
         |    ${oSumSq("c_acctbal")} AS s2
         |  FROM customer GROUP BY c_mktsegment) t""".stripMargin,

    "q_agg_heavyhitters" ->
      """WITH e AS (SELECT CASE WHEN user_id % 10 < 7 THEN user_id % 3
        |    ELSE user_id END AS k FROM events)
        |SELECT k, COUNT(*) AS cnt FROM e
        |GROUP BY k ORDER BY cnt DESC, k LIMIT 3""".stripMargin,

    "q_agg_collect" ->
      """SELECT n_regionkey, array_to_string(list_sort(list(n_name)), ',')
        |    AS nations, COUNT(*) AS n
        |FROM nation GROUP BY n_regionkey""".stripMargin,

    "q_agg_minmax" ->
      """SELECT l_returnflag, MIN(l_quantity) AS min_qty,
        |  MAX(l_quantity) AS max_qty, COUNT(DISTINCT l_suppkey) AS n_supp,
        |  CAST(CAST(MIN(l_shipdate) AS DATE) AS VARCHAR) AS first_ship
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q_agg_having" ->
      s"""SELECT o_custkey, COUNT(*) AS n_orders,
         |  ${oSum2("o_totalprice")} AS total
         |FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 25""".stripMargin,

    "q_funnel" ->
      """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
        |    FROM events),
        |a AS (SELECT *, min(CASE WHEN event_type = 'view' THEN ts END)
        |    OVER (PARTITION BY user_id) AS t1 FROM e),
        |b AS (SELECT *, min(CASE WHEN event_type = 'click' AND ts > t1
        |    THEN ts END) OVER (PARTITION BY user_id) AS t2 FROM a),
        |c AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t2
        |    THEN ts END) OVER (PARTITION BY user_id) AS t3 FROM b)
        |SELECT user_id,
        |  strftime(min(t1), '%Y-%m-%d %H:%M:%S.%f') AS first_view,
        |  strftime(min(t2), '%Y-%m-%d %H:%M:%S.%f') AS first_click,
        |  strftime(min(t3), '%Y-%m-%d %H:%M:%S.%f') AS first_purchase,
        |  epoch_us(min(t3)) - epoch_us(min(t1)) AS convert_micros
        |FROM c GROUP BY user_id""".stripMargin,

    "q_gapfill" ->
      """WITH e AS (SELECT event_type,
        |    time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS h
        |  FROM events),
        |agg AS (SELECT event_type, h, count(*) AS n FROM e GROUP BY 1, 2),
        |bounds AS (SELECT min(h) AS lo, max(h) AS hi FROM e),
        |hours AS (SELECT unnest([x for x in
        |    generate_series(lo, hi, INTERVAL 1 HOUR)]) AS h FROM bounds),
        |grid AS (SELECT t.event_type, hours.h
        |  FROM (SELECT DISTINCT event_type FROM e) t CROSS JOIN hours)
        |SELECT g.event_type, strftime(g.h, '%Y-%m-%d %H:%M:%S') AS hour,
        |  coalesce(agg.n, 0) AS n
        |FROM grid g LEFT JOIN agg
        |  ON g.event_type = agg.event_type AND g.h = agg.h""".stripMargin,

    "q_event_markov" -> {
      // unrolled power iterations; the contribution SUM mirrors the Spark
      // side's DECIMAL(38,20) exact summation
      val iters = (1 to 3).map { i =>
        s"""c$i AS (SELECT p.dst AS node,
           |    CAST(SUM(CAST(r.r * p.p AS DECIMAL(38,20))) AS DOUBLE) AS s
           |  FROM p JOIN r${i - 1} r ON p.src = r.node GROUP BY p.dst),
           |r$i AS (SELECT nodes.node,
           |    CAST(0.15 AS DOUBLE) / (SELECT n FROM nn)
           |      + CAST(0.85 AS DOUBLE) * COALESCE(c$i.s, 0.0) AS r
           |  FROM nodes LEFT JOIN c$i ON nodes.node = c$i.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH seq AS (SELECT event_type AS src,
         |    lead(event_type) OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS dst
         |  FROM events),
         |e AS (SELECT src, dst, COUNT(*) AS n FROM seq
         |  WHERE dst IS NOT NULL GROUP BY src, dst),
         |tot AS (SELECT src, CAST(SUM(n) AS BIGINT) AS tot FROM e GROUP BY src),
         |p AS (SELECT e.src, e.dst, CAST(e.n AS DOUBLE) / tot.tot AS p
         |  FROM e JOIN tot ON e.src = tot.src),
         |nodes AS (SELECT DISTINCT event_type AS node FROM events),
         |nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
         |r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS r
         |  FROM nodes),
         |$iters
         |SELECT r3.node AS event_type, COALESCE(tot.tot, 0) AS n_out,
         |  r3.r AS pagerank
         |FROM r3 LEFT JOIN tot ON r3.node = tot.src""".stripMargin
    })
}
