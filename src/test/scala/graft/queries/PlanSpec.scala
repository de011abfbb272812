package graft.queries

import graft.{SparkSpec, SparkEntry}

/** Plan-shape assertions — the 100 TB design claims of SCALE.md pinned as
  * tests: filters reach the parquet scan, scans are column-pruned,
  * dimension joins broadcast, fact-fact joins are the only shuffling
  * joins, and per-group windows don't introduce global sorts.
  */
class PlanSpec extends SparkSpec {

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString

  test("q1_agg: shipdate filter pushed, scan pruned to 5 columns") {
    val p = plan("q1_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
    val scan = SparkEntry.queries("q1_agg")(spark, sf)
      .queryExecution.sparkPlan.collectLeaves().collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.head
    // 5 projected + l_shipdate for the residual filter; 6 of 11 columns
    val cols = scan.requiredSchema.fieldNames.toSeq
    assert(cols.length == 6, cols)
    assert(!cols.contains("l_orderkey"), cols) // unused key pruned
  }

  test("q3_join_topk: customer dim broadcast, filters pushed on all scans") {
    val p = plan("q3_join_topk")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
    assert("PushedFilters: \\[[^\\]]*GreaterThan\\(l_shipdate".r
      .findFirstIn(p).isDefined, p)
    assert("PushedFilters: \\[[^\\]]*LessThan\\(o_orderdate".r
      .findFirstIn(p).isDefined, p)
  }

  test("q_join_multiway: all four dims broadcast; only lineitem⋈orders shuffles") {
    val p = plan("q_join_multiway")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).size
    assert(broadcasts >= 4, s"expected >=4 broadcast joins, got $broadcasts\n$p")
    val shuffleJoins = ("SortMergeJoin".r.findAllIn(p).size
      + "ShuffledHashJoin".r.findAllIn(p).size)
    assert(shuffleJoins <= 1, s"expected <=1 shuffling join, got $shuffleJoins")
  }

  test("q_join_range: tiny band dim under broadcast nested loop") {
    val p = plan("q_join_range")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_dedup_embed: bounded probe side broadcast, corpus streams") {
    val p = plan("q_dedup_embed")
    // BuildLeft = the vec_id<bound probe; BuildRight would broadcast the
    // (unbounded at scale) corpus
    assert(p.contains("BroadcastNestedLoopJoin BuildLeft"), p)
  }

  test("q_win_topn: per-group window sorts locally, no global Sort") {
    val p = plan("q_win_topn")
    // rangepartitioning = global sort; window needs only hash partitioning
    assert(!p.contains("rangepartitioning"), p)
    assert(p.contains("hashpartitioning(o_custkey"), p)
  }

  test("q_top_offset: global order executes as TakeOrdered, not full sort") {
    val p = plan("q_top_offset")
    assert(p.contains("TakeOrdered"), p)
  }

  test("q_dedup_minhash: shuffles keyed by doc/band, no cartesian") {
    val p = plan("q_dedup_minhash")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_dedup_minhash: single signature pass — no Union, bounded scans") {
    val p = plan("q_dedup_minhash")
    // band keys come from ONE posexplode projection over the minhash
    // aggregation, not a k-way unionByName re-instantiating it
    assert(!p.contains("Union"), p)
    // documents is read once for signatures + twice for the exact-verify
    // shingle sets (sa/sb sides) — never once per band
    val scans = "FileScan parquet".r.findAllIn(p).size
    assert(scans <= 3, s"expected <=3 documents scans, got $scans\n$p")
  }

  test("q_dedup_simhash: single signature pass — no Union") {
    val p = plan("q_dedup_simhash")
    assert(!p.contains("Union"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_dedup_cross: band-keyed join between sides, no pair blowup") {
    val p = plan("q_dedup_cross")
    // the candidate stage must be an equality join on (band, bkey) —
    // an unkeyed plan here would be incoming × corpus
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("Union"), p)
  }

  test("q_dedup_semantic: centroid assignment is a zero-shuffle projection") {
    val p = plan("q_dedup_semantic")
    // the collected centroids fold into an argmin projection — no join,
    // no per-vector window; the ONLY corpus shuffle is the groupBy(cell)
    assert(!p.contains("Join"), p)
    assert(!p.contains("Window"), p)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected exactly 1 shuffle, got $exchanges\n$p")
  }

  test("q_media_phash_pairs: one band-keyed shuffle, candidates never " +
    "cross a second exchange") {
    val p = plan("q_media_phash_pairs")
    // decode → band explode → groupBy(band, bkey) is the ONLY exchange;
    // pair generation, first-shared-band dedup, and the hamming verify
    // all run inside the bucket row (the measured ~n²/2^16 candidate
    // mass of a fixed 64-bit code must stay row-local — SCALE.md r17)
    assert(!p.contains("Join"), p)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected exactly 1 shuffle, got $exchanges\n$p")
  }

  test("q_text_pii: pure per-row map — no shuffle anywhere") {
    val p = plan("q_text_pii")
    assert(!p.contains("Exchange"), p)
  }

  test("q_funnel: chained sequence minima share one user_id shuffle") {
    val p = plan("q_funnel")
    // three Window nodes + the final groupBy all partition on user_id —
    // one exchange total, no re-shuffle between pattern steps
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected exactly 1 shuffle, got $exchanges\n$p")
  }

  test("q_pack_sequences: blocked prefix sum — no single-partition stage") {
    val p = plan("q_pack_sequences")
    // the classic concat-and-chunk trap is a global (unpartitioned)
    // running-sum window that drags the corpus through one partition
    assert(!p.contains("SinglePartition"), p)
    // block offsets join must broadcast, never shuffle the corpus
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q8_marketshare: every dim broadcast; lineitem⋈orders is the one shuffle join") {
    val p = plan("q8_marketshare")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).size
    assert(broadcasts >= 3, s"expected >=3 broadcast joins, got $broadcasts\n$p")
    val shuffleJoins = ("SortMergeJoin".r.findAllIn(p).size
      + "ShuffledHashJoin".r.findAllIn(p).size)
    assert(shuffleJoins <= 1, s"expected <=1 shuffling join, got $shuffleJoins\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q17_smallqty: brand parts broadcast; per-part averages shuffle on partkey") {
    val p = plan("q17_smallqty")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("hashpartitioning(l_partkey"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q21_waiting: per-order aggregates instead of correlated probes — no cartesian, dims broadcast") {
    val p = plan("q21_waiting")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // supplier + nation ride broadcasts; the l_orderkey-keyed joins may
    // shuffle (they carry the corpus) but nothing quadratic appears
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    assert(p.contains("hashpartitioning(l_orderkey") ||
      p.contains("hashpartitioning(ns_key") || p.contains("BroadcastHashJoin"), p)
  }

  test("q_window_cumulate: codegen'd explode, one aggregation shuffle") {
    val p = plan("q_window_cumulate")
    assert(p.contains("Generate explode"), p)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected exactly 1 shuffle, got $exchanges\n$p")
  }

  test("q_dedup_substr: inverted gram index — hash-keyed joins only, no pair expansion") {
    val p = plan("q_dedup_substr")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // grams join back to per-gram counts on the 60-bit hash
    assert(p.contains("hashpartitioning(h"), p)
  }

  test("q2_mincost: size filter semi-joins BELOW the unit-cost aggregation") {
    val p = plan("q2_mincost")
    // the sized-part semi-join must gate the lineitem scan before the
    // (partkey, suppkey) groupBy — the corpus shuffle then carries only
    // qualifying parts; and the global order runs as top-k, not a sort
    assert(p.contains("LeftSemi"), p)
    assert(p.indexOf("LeftSemi") > p.indexOf("HashAggregate"),
      "semi-join should appear below (after, in plan text) the aggregate\n" + p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("annTopkOn: query side broadcast, corpus never shuffles") {
    // the gate's ANN_TOPK TVF routes here — the 100 TB property is one
    // corpus scan joined against a broadcast query set, with the only
    // exchange being the per-query top-k window on qid
    val raw = spark.read.parquet(s"$sf/embeddings.parquet")
    val p = Similarity.annTopkOn(raw.filter("vec_id >= 8"),
      raw.filter("vec_id < 8"), "vec_id", "embedding", 5)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), p)
    assert(!p.contains("CartesianProduct"), p)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 1, s"expected <=1 shuffle (qid window), got $exchanges\n$p")
  }

  test("qualityOn / langidOn: pure per-row maps — no shuffle anywhere") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    for (df <- Seq(TextAnalysis.qualityOn(docs, "doc_id", "text"),
        TextAnalysis.langidOn(docs, "doc_id", "text"))) {
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), p)
    }
  }

  test("q9_profit: star dims all broadcast, single aggregation shuffle") {
    // At this SF the optimizer also auto-broadcasts orders, so the whole
    // star collapses to one aggregation shuffle. That is NOT the claim
    // at scale — see the next test for the 100 TB shape.
    val p = plan("q9_profit")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p)
    assert(!p.contains("CartesianProduct"), p)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 1, s"expected <=1 shuffle, got $exchanges\n$p")
  }

  test("q9_profit at scale: orders is a keyed shuffle join, dims stay broadcast") {
    // Simulate the 100 TB planner decision: with auto-broadcast off
    // (orders too big to broadcast on a real cluster), lineitem⋈orders
    // must become a keyed shuffle join on the order key — never a
    // cartesian — while the explicitly-hinted dims (supplier, nation,
    // part) remain broadcast regardless of the threshold.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = plan("q9_profit")
      assert("BroadcastHashJoin".r.findAllIn(p).size >= 3,
        s"hinted dims must broadcast even with the threshold off\n$p")
      val shuffleJoins = ("SortMergeJoin".r.findAllIn(p).size
        + "ShuffledHashJoin".r.findAllIn(p).size)
      assert(shuffleJoins == 1,
        s"expected exactly the lineitem⋈orders shuffle join, got $shuffleJoins\n$p")
      assert(("(?s)(SortMergeJoin|ShuffledHashJoin).{0,200}l_orderkey".r
        .findFirstIn(p).isDefined) || p.contains("o_orderkey"),
        s"the shuffle join must key on the order key\n$p")
      assert(!p.contains("CartesianProduct"), p)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q15_topsupp: revenue view materialized once — no lineitem re-scan") {
    // ReuseExchange does NOT dedup the max-probe and join subtrees
    // (measured: two separate hashpartitioning(l_suppkey) stages), so
    // the query localCheckpoints the small per-supplier view; the final
    // plan must read the materialized blocks, not parquet.
    val p = plan("q15_topsupp")
    assert(!p.contains("lineitem.parquet"),
      "final plan should consume the checkpointed revenue view\n" + p)
    assert(p.contains("ExistingRDD") || p.contains("Scan\n"), p)
  }

  test("q_win_range_interval: one partition shuffle, RANGE frame, no global sort") {
    val p = plan("q_win_range_interval")
    assert(p.contains("RangeFrame"), p)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected exactly 1 shuffle, got $exchanges\n$p")
    assert(!p.contains("rangepartitioning"), p) // per-group sort only
  }

  test("q_zorder_layout: pure scan→agg — interleave stays in the projection") {
    val p = plan("q_zorder_layout")
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges == 1, s"expected exactly 1 exchange, got $exchanges\n$p")
    assert(!p.contains("BatchEvalPython") && !p.contains("Invoke"), p)
    // scan pruned to the two clustered dimensions
    assert(p.contains("ReadSchema: struct<p_size:int,p_retailprice:double>"), p)
  }

  test("q_text_lm_score at scale: model joins stay keyed, never cartesian") {
    // With auto-broadcast off (an unbounded vocabulary cannot broadcast
    // on a real cluster), scoring must be keyed shuffle joins — gram for
    // the model probe, w1 for the prefix totals — and nothing cartesian.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = plan("q_text_lm_score")
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), p)
      val shuffleJoins = ("SortMergeJoin".r.findAllIn(p).size
        + "ShuffledHashJoin".r.findAllIn(p).size)
      assert(shuffleJoins == 2,
        s"expected the gram-model and prefix joins, got $shuffleJoins\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q_ann_ivf / q_ann_ivfpq: corpus cell assignment is a fused " +
    "projection — no corpus-keyed window, no corpus exchange for it") {
    // the coarse quantizer used to explode |corpus|×|cells| rows through
    // row_number().over(partitionBy(vec_id)) — a corpus-sized exchange +
    // sort. It is now the same zero-shuffle argmin_cos projection
    // semantic dedup uses; only QUERY-side windows (qid — bounded by the
    // fixture's 8 query rows) may remain.
    for (q <- Seq("q_ann_ivf", "q_ann_ivfpq")) {
      val p = plan(q)
      assert(!p.contains("windowspecdefinition(vec_id"),
        s"$q still windows over the corpus vec_id:\n$p")
      assert(p.contains("argmin_cos"),
        s"$q does not route assignment through argmin_cos:\n$p")
    }
  }

  test("q_embed_outliers: zero-shuffle assignment, one cell-keyed exchange") {
    // argmin assignment is a projection (no shuffle); the decile ranking
    // partitions once on the cell key and both window functions reuse it.
    val p = plan("q_embed_outliers")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected exactly 1 shuffle, got $exchanges\n$p")
    assert(!p.contains("rangepartitioning"), p) // no global sort
  }

  test("q_profile_table: ONE scan of orders feeds every per-column agg") {
    // the multi-distinct plans via Expand over a single file scan — a
    // per-column scan would read the table ncols times at 100 TB
    val scans = SparkEntry.queries("q_profile_table")(spark, sf)
      .queryExecution.sparkPlan.collectLeaves().collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
    assert(scans.length == 1, scans.map(_.nodeName))
    assert(plan("q_profile_table").contains("Expand"),
      "multi-distinct should plan via Expand")
  }

  test("q_agg_heavyhitters: scans prune to the key column only") {
    // both passes (sketch + candidate count) read user_id alone; at
    // 100 TB reading any other column is pure waste. The exact pass's
    // isin() can't push to parquet (the key is derived), but the scan
    // width is what dominates.
    val scans = SparkEntry.queries("q_agg_heavyhitters")(spark, sf)
      .queryExecution.sparkPlan.collectLeaves().collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
    scans.foreach { s =>
      assert(s.requiredSchema.fieldNames.toSeq == Seq("user_id"),
        s.requiredSchema.fieldNames.toSeq)
    }
  }
}
