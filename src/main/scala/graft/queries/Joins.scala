package graft.queries

import graft.{Num, QueryPack, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators from SURVEY.md §2.3 (reference surface: demo_2.md:76-91
  * dual-stream equi join, demo_3.md:94-109 lookup join, demo_6.md:154-158
  * multi-way join) plus the beyond-reference shapes (range join, as-of join)
  * a 100 TB pipeline needs.
  *
  * Scale notes: every small side (customer 150k rows at sf=1, nation,
  * region, supplier, inline dims) is explicitly broadcast so the big
  * fact tables (lineitem/orders/events) never shuffle for them; the only
  * shuffles left are fact-fact joins on their join key. The as-of join is
  * the union+window formulation — one shuffle on (key), no range explosion,
  * which is the formulation that survives 1000 executors.
  */
object Joins extends QueryPack {
  import Num._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Plain equi inner join, dim side broadcast (demo_3 lookup-join shape:
    // the dim snapshot is small and replicated to every task).
    "q_join_inner" -> ((s, dir) => {
      import s.implicits._
      val cust = Tables.load(s, dir, "customer")
      Tables.load(s, dir, "orders")
        .filter($"o_totalprice" > 150000.0)
        .join(broadcast(cust), $"o_custkey" === $"c_custkey")
        .select($"o_orderkey", $"c_name", $"c_mktsegment", $"o_totalprice")
    }),

    // LEFT join where the right side is filtered → genuine null extension.
    "q_join_left" -> ((s, dir) => {
      import s.implicits._
      val bigOrders = Tables.load(s, dir, "orders")
        .filter($"o_totalprice" > 300000.0)
        .groupBy($"o_custkey").agg(count(lit(1)).as("n_big"))
      Tables.load(s, dir, "customer")
        .join(bigOrders, $"c_custkey" === $"o_custkey", "left")
        .select($"c_custkey", $"c_name",
          coalesce($"n_big", lit(0L)).as("n_big"))
    }),

    // FULL OUTER join of two filtered aggregates — unmatched rows on both
    // sides. Both inputs are pre-aggregated (map-side combine) before the
    // join so the shuffle carries one row per nation, not per fact row.
    "q_join_full" -> ((s, dir) => {
      import s.implicits._
      val csmall = Tables.load(s, dir, "customer")
        .filter($"c_nationkey" < 15)
        .groupBy($"c_nationkey").agg(count(lit(1)).as("n_cust"))
      val ssmall = Tables.load(s, dir, "supplier")
        .filter($"s_nationkey" >= 10)
        .groupBy($"s_nationkey").agg(count(lit(1)).as("n_supp"))
      csmall.join(ssmall, $"c_nationkey" === $"s_nationkey", "full_outer")
        .select(
          coalesce($"c_nationkey", $"s_nationkey").as("nationkey"),
          coalesce($"n_cust", lit(0L)).as("n_cust"),
          coalesce($"n_supp", lit(0L)).as("n_supp"))
    }),

    // LEFT SEMI: customers having at least one urgent open order.
    "q_join_semi" -> ((s, dir) => {
      import s.implicits._
      val urgent = Tables.load(s, dir, "orders")
        .filter($"o_orderpriority" === "1-URGENT" && $"o_orderstatus" === "O")
      Tables.load(s, dir, "customer")
        .join(urgent, $"c_custkey" === $"o_custkey", "left_semi")
        .select($"c_custkey", $"c_name", $"c_acctbal")
    }),

    // LEFT ANTI: customers with no high-value order.
    "q_join_anti" -> ((s, dir) => {
      import s.implicits._
      val big = Tables.load(s, dir, "orders").filter($"o_totalprice" > 250000.0)
      Tables.load(s, dir, "customer")
        .join(big, $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_mktsegment")
    }),

    // TPC-H Q5 shape: 6-way join; all dims broadcast, lineitem⋈orders is
    // the single shuffle (AQE picks sort-merge vs shuffled-hash by size).
    "q_join_multiway" -> ((s, dir) => {
      import s.implicits._
      val region = Tables.load(s, dir, "region").filter($"r_name" === "ASIA")
      val nation = Tables.load(s, dir, "nation")
      val cust = Tables.load(s, dir, "customer")
      val supp = Tables.load(s, dir, "supplier")
      val ord = Tables.load(s, dir, "orders")
        .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
          $"o_orderdate" < lit("1997-01-01").cast("timestamp"))
      Tables.load(s, dir, "lineitem")
        .join(ord, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(cust), $"o_custkey" === $"c_custkey")
        .join(broadcast(supp),
          $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
        .join(broadcast(nation), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
        .groupBy($"n_name")
        .agg(dsum6($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
    }),

    // Range (theta) join against a broadcast inline band dim — BETWEEN
    // predicate, no equi key. Broadcast-nested-loop on a 4-row dim is the
    // right physical plan; the fact side streams through untouched.
    "q_join_range" -> ((s, dir) => {
      import s.implicits._
      val bands = s.createDataFrame(Seq(
        ("low", 0.0, 925.0), ("mid", 925.0, 950.0),
        ("high", 950.0, 975.0), ("top", 975.0, 1e9)))
        .toDF("band", "lo", "hi")
      Tables.load(s, dir, "part")
        .join(broadcast(bands),
          $"p_retailprice" >= $"lo" && $"p_retailprice" < $"hi")
        .groupBy($"band")
        .agg(count(lit(1)).as("n_parts"), dsum2($"p_retailprice").as("sum_price"))
    }),

    // As-of join: for each purchase event, the latest click of the same
    // user at click.ts <= purchase.ts. Implemented as the scalable
    // union+window formulation: tag both sides, one shuffle on user_id,
    // last(click_ts) ignoreNulls over (user ORDER BY ts, tag). Clicks sort
    // before purchases at equal ts, giving <= semantics. DuckDB oracle uses
    // its native ASOF JOIN.
    "q_join_asof" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id", $"ts", lit(0).as("tag"), lit(null).cast("double").as("pvalue"))
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"ts", lit(1).as("tag"), $"value".as("pvalue"))
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      clicks.unionByName(purchases)
        .withColumn("click_ts",
          last(when($"tag" === 0, $"ts"), ignoreNulls = true).over(w))
        .filter($"tag" === 1)
        .select($"user_id",
          date_format($"ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").as("purchase_ts"),
          date_format($"click_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").as("click_ts"),
          $"pvalue")
    }),

    // Fuzzy self-join: all pairs within edit distance 1, via the
    // deletion-neighborhood blocking of [[fuzzySelfJoin]] — never the
    // O(n²) all-pairs scan the DuckDB oracle runs. On customer names the
    // matches are ids differing in one digit; the shared 'Customer#'
    // prefix is exactly the adversarial case that defeats prefix/segment
    // blocking schemes and leaves deletion keys unscathed.
    "q_join_fuzzy" -> ((s, dir) => {
      import s.implicits._
      fuzzySelfJoin(Tables.load(s, dir, "customer")
        .select($"c_custkey".as("id"), $"c_name".as("name")), 1)
        .select($"ida", $"idb", $"dist")
    }),

    // Cross-corpus fuzzy match: a 1-in-20 incoming slice resolved
    // against the FULL customer corpus (self-matches at dist 0 are
    // part of the contract — an exact hit IS a match). The blocked
    // kernel must reproduce the naive slice×corpus filter exactly.
    "q_join_fuzzy_cross" -> ((s, dir) => {
      import s.implicits._
      val cust = Tables.load(s, dir, "customer")
        .select($"c_custkey".as("id"), $"c_name".as("name"))
      fuzzyCrossJoin(cust.filter($"id" % 20 === 0), cust, 1)
    }))

  /** All pairs (ida < idb) of `df`'s rows whose `name` strings are within
    * edit distance `k`, without ever forming the O(n²) candidate space:
    * FastSS/SymSpell deletion-neighborhood blocking. Every string emits
    * its ≤k-deletion variants (hashed to 64 bits); two strings within
    * edit distance k are guaranteed to share a variant (pigeonhole over
    * the edit script: delete each substituted/inserted position), so the
    * equality join on the variant hash is a LOSSLESS candidate generator
    * and the `levenshtein ≤ k` verify makes the result exact — a hash
    * collision only adds a candidate the verify then rejects.
    *
    * Scale shape: n·O(L^k) keys (L+1 per row at k=1), one shuffle on the
    * 8-byte variant hash, candidate volume bounded by true near-pairs +
    * collisions — immune to shared prefixes/suffixes, which collapse
    * segment-based blocking (every TPC-H customer shares 'Customer#').
    * The one adversarial input is massive EXACT duplication (all copies
    * share all variants): run exact dedup first — q_dedup_exact is the
    * operator for that.
    *
    * `df` must carry (id, name); requires 1 ≤ k ≤ 2 (variant count grows
    * as L choose k; beyond 2 use MinHash/n-gram blocking instead).
    */
  def fuzzySelfJoin(df: DataFrame, k: Int): DataFrame = {
    require(k >= 1 && k <= 2, s"fuzzySelfJoin supports k in [1,2], got $k")
    graft.functions.GraftFunctions.register(df.sparkSession)
    // the ≤k-deletion neighborhood, hashed, as one fused native loop
    // (functions/DeletionVariants) — no per-variant string
    // materialization, no interpreted higher-order lambdas on the
    // corpus-scan hot path
    val variants =
      graft.functions.GraftFunctions.deletionVariants(col("name"), k)
    // Verify BEFORE the pair dedup, and dedup via a (ida, idb)-keyed
    // aggregate rather than a whole-row DISTINCT: levenshtein is a
    // cheap codegen'd map, so running it per candidate OCCURRENCE
    // (pairs sharing m variants appear m times, a small factor) costs
    // little, while it shrinks the dedup's input to verified rows and
    // keys the exchange on two longs instead of hashing full name
    // strings. The tempting alternative — shuffling only (vk, id)
    // through the candidate stage and joining names back onto the
    // deduped pairs — measures 2x faster at oracle scale but 3x SLOWER
    // at sf10: once the name table outgrows the broadcast threshold,
    // the join-back sort-merges the full candidate-pair set twice.
    // (Same-JVM sf10 decade measurements, taken before the variant
    // stage was fused into deletion_variants — the dedup-shape ordering
    // is unaffected: this shape 44 s, whole-row DISTINCT 134 s,
    // narrow+join-back 108 s.)
    // spread a sub-split input before the variant fan-out: the deletion
    // neighborhood and the per-candidate levenshtein verify are the
    // query's CPU, and a single-split scan would run both sides' variant
    // generation on one core (guide §2.5). Identity at scale.
    val kv = graft.Par.spread(df).select(col("id"), col("name"),
      explode(variants).as("vk"))
    kv.select(col("vk"), col("id").as("ida"), col("name").as("na"))
      .join(kv.select(col("vk"), col("id").as("idb"), col("name").as("nb")),
        "vk")
      .filter(col("ida") < col("idb"))
      .withColumn("dist", levenshtein(col("na"), col("nb")).cast("long"))
      .filter(col("dist") <= k)
      .groupBy(col("ida"), col("idb")) // a pair sharing m variants is
      .agg(first(col("na")).as("na"),  // one result row, not m
        first(col("nb")).as("nb"), first(col("dist")).as("dist"))
  }

  /** Cross-corpus fuzzy match: every (incoming, corpus) pair within
    * edit distance `k`, by the same FastSS deletion-neighborhood
    * blocking as [[fuzzySelfJoin]] — two strings within edit distance
    * k share a ≤k-deletion variant, so the variant-hash equality join
    * is a lossless candidate generator and the levenshtein verify is
    * exact. The production cadence is a STREAMING incoming side
    * (entity resolution / fuzzy decontamination at ingest) against a
    * BOUNDED reference corpus, and the plan is built so the SAME code
    * serves both shapes:
    *
    *   1. The corpus freezes ONCE to two parquet files, cached per
    *      (session, corpus plan, k) and persisted PRE-PARTITIONED on
    *      their join keys (the [[Dedup.minhashCrossPairsStream]]
    *      discipline — micro-batches exchange only their own rows):
    *      `idx(vk, idb)` — the exploded variant index — and
    *      `meta(idb, nb, vb)` — the name and its full variant array.
    *   2. Each incoming row computes its own variant array ROW-LOCALLY
    *      (the fused native `deletion_variants` loop), explodes it,
    *      and equi-joins `idx` on the 8-byte variant key, then `meta`
    *      on idb.
    *   3. A pair sharing m variants surfaces m times; instead of a
    *      stateful DISTINCT the row survives only when the matched
    *      variant is the MINIMUM of the two variant arrays'
    *      intersection — a row-local rule (both arrays ride the row),
    *      so each (ida, idb) pair emits exactly once with no state.
    *   4. Exact `levenshtein ≤ k` verify, as in the self-join.
    *
    * Batch incoming runs the identical plan (the stream-static joins
    * become plain joins) and is what the DuckDB oracle mirrors.
    * At 100 TB the index is a bucketed table keyed on vk; per-row cost
    * is the variant fan-out (L+1 keys at k=1) times bucket occupancy,
    * bounded by true matches + hash collisions the verify rejects.
    * State: none. `incoming`/`corpus` must carry (id, name).
    */
  def fuzzyCrossJoin(incoming: DataFrame, corpus: DataFrame,
      k: Int): DataFrame = {
    require(k >= 1 && k <= 2, s"fuzzyCrossJoin supports k in [1,2], got $k")
    require(!corpus.isStreaming,
      "FUZZY_JOIN_CROSS: the corpus side must be a BOUNDED relation " +
        "(its variant index is built once and frozen) — declare it " +
        "with 'source.bounded' = 'true' or a batch connector")
    val s = corpus.sparkSession
    graft.functions.GraftFunctions.register(s)
    val variants = graft.functions.GraftFunctions.deletionVariants _

    val (idx, meta) = StaticIndexCache.getOrBuild[(DataFrame, DataFrame)](
      StaticIndexCache.corpusKey(s, corpus, "fuzzy_cross_idx", k)) {
      val dir = StaticIndexCache.newTmpDir("graft_fuzzy_idx")
      corpus.select(col("id").as("idb"), col("name").as("nb"),
          variants(col("name"), k).as("vb"))
        .write.parquet(s"$dir/meta")
      val m = s.read.parquet(s"$dir/meta")
        .repartition(col("idb"))
        .sortWithinPartitions(col("idb"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      m.select(col("idb"), explode(col("vb")).as("vk"))
        .write.parquet(s"$dir/idx")
      val i = s.read.parquet(s"$dir/idx")
        .repartition(col("vk"))
        .sortWithinPartitions(col("vk"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      (i, m)
    }

    incoming.select(col("id").as("ida"), col("name").as("na"),
        variants(col("name"), k).as("va"))
      .select(col("ida"), col("na"), col("va"),
        explode(col("va")).as("vk"))
      .join(idx, "vk")
      .join(meta, "idb")
      // row-local pair dedup: survive only at the smallest shared
      // variant (both arrays are sorted-distinct by construction)
      .filter(col("vk") === array_min(array_intersect(col("va"), col("vb"))))
      .withColumn("dist", levenshtein(col("na"), col("nb")).cast("long"))
      .filter(col("dist") <= k)
      .select(col("ida"), col("idb"), col("dist"))
  }

  def oracleSql: Map[String, String] = Map(
    "q_join_inner" ->
      """SELECT o_orderkey, c_name, c_mktsegment, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_totalprice > 150000.0""".stripMargin,

    "q_join_left" ->
      """SELECT c_custkey, c_name, COALESCE(n_big, 0) AS n_big
        |FROM customer LEFT JOIN (
        |  SELECT o_custkey, COUNT(*) AS n_big FROM orders
        |  WHERE o_totalprice > 300000.0 GROUP BY o_custkey) b
        |ON c_custkey = b.o_custkey""".stripMargin,

    "q_join_full" ->
      """SELECT COALESCE(c.c_nationkey, s.s_nationkey) AS nationkey,
        |  COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
        |FROM (SELECT c_nationkey, COUNT(*) AS n_cust FROM customer
        |      WHERE c_nationkey < 15 GROUP BY c_nationkey) c
        |FULL OUTER JOIN
        |     (SELECT s_nationkey, COUNT(*) AS n_supp FROM supplier
        |      WHERE s_nationkey >= 10 GROUP BY s_nationkey) s
        |ON c.c_nationkey = s.s_nationkey""".stripMargin,

    "q_join_semi" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |  AND o_orderpriority = '1-URGENT' AND o_orderstatus = 'O')""".stripMargin,

    "q_join_anti" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |  AND o_totalprice > 250000.0)""".stripMargin,

    "q_join_multiway" ->
      s"""SELECT n_name, ${oSum6("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1997-01-01'
         |GROUP BY n_name""".stripMargin,

    "q_join_range" ->
      s"""SELECT band, COUNT(*) AS n_parts, ${oSum2("p_retailprice")} AS sum_price
         |FROM part
         |JOIN (VALUES ('low', 0.0, 925.0), ('mid', 925.0, 950.0),
         |             ('high', 950.0, 975.0), ('top', 975.0, 1e9))
         |  AS bands(band, lo, hi)
         |ON p_retailprice >= lo AND p_retailprice < hi
         |GROUP BY band""".stripMargin,

    "q_join_asof" ->
      """SELECT p.user_id,
        |  strftime(CAST(p.ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
        |  strftime(CAST(c.ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
        |  p.value AS pvalue
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |ON p.user_id = c.user_id AND c.ts <= p.ts""".stripMargin,

    // the naive quadratic spec the blocked join must reproduce exactly
    "q_join_fuzzy" ->
      """SELECT a.c_custkey AS ida, b.c_custkey AS idb,
        |  levenshtein(a.c_name, b.c_name) AS dist
        |FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
        |WHERE levenshtein(a.c_name, b.c_name) <= 1""".stripMargin,

    // naive slice×corpus mirror of the blocked cross kernel
    "q_join_fuzzy_cross" ->
      """SELECT a.c_custkey AS ida, b.c_custkey AS idb,
        |  levenshtein(a.c_name, b.c_name) AS dist
        |FROM customer a JOIN customer b
        |  ON levenshtein(a.c_name, b.c_name) <= 1
        |WHERE a.c_custkey % 20 = 0""".stripMargin)
}
