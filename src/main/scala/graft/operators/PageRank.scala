package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Power-iteration PageRank over an edge list — the domain-authority
  * score behind crawl-curation quality filters (rank a host graph, keep
  * documents from authoritative domains; the CommonCrawl-style pass a
  * training-data pipeline runs before quality gates).
  *
  * All arithmetic is scaled-integer (BIGINT) so a SQL oracle replays it
  * bit-exactly: ranks start at `scale`, each iteration computes
  *
  *   r'(v) = floor(scale * 15 / 100)
  *         + floor(85 * sum over in-edges u→v of m(u,v) * floor(r(u) / outdeg(u)) / 100)
  *
  * i.e. damping 0.85 with truncating division at exactly two points,
  * identical in Spark (`div`) and DuckDB (`//`) for the non-negative
  * values ranks take. Dangling nodes (no out-edges) drop their mass —
  * documented, standard for filtering use (relative order is what the
  * curation threshold consumes).
  *
  * Scale shape: the corpus-sized work is the ONE edge-aggregation
  * shuffle (`groupBy(src, dst)`) — a web-scale crawl has ~1e11 links
  * but only ~1e8 distinct (src, dst) domain pairs. Every iteration after
  * that is graph-sized, not corpus-sized: one join of the weighted edge
  * list against the rank vector plus one groupBy(dst), both shuffling
  * on node keys. The weighted edges and node list are cached across
  * iterations, and lineage is truncated per round exactly as
  * [[graft.queries.Dedup.connectedComponents]] does (localCheckpoint
  * locally, reliable checkpoint on a cluster) so the plan never
  * re-embeds N rounds of upstream pipeline.
  *
  * `scale` trades rank resolution for overflow headroom: total mass is
  * bounded by nNodes·scale, and the kernel refuses combinations where
  * the damping multiply could wrap (85·nNodes·scale must fit a signed
  * long — with the 1e9 default that is ~1e8 nodes; shrink scale as the
  * graph grows past that).
  */
object PageRank {

  /** @param edges (src, dst) string/any-keyed directed multigraph;
    *              duplicate rows are edge multiplicity.
    * @param iters power-iteration rounds (fixed — the oracle unrolls
    *              the same count; convergence detection would make the
    *              round count data-dependent and unreplayable).
    * @return (node, rank) for every node appearing as src or dst.
    */
  def apply(edges: DataFrame, iters: Int,
      scale: Long = 1000000000L, reliable: Boolean = false): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val s = edges.sparkSession
    if (reliable) require(s.sparkContext.getCheckpointDir.isDefined,
      "reliable=true needs SparkContext.setCheckpointDir")
    def truncate(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint() else df.localCheckpoint()
    // NULL endpoints are dropped up front, on both sides of the oracle
    // contract (the SQL mirror filters identically): a NULL node is
    // meaningless for ranking, and leaving such edges in would let the
    // inner joins below silently drop them from flow while the node
    // set kept them — the worst of both
    val e = edges.toDF("src", "dst")
      .filter(col("src").isNotNull && col("dst").isNotNull)
    // the one corpus-sized stage: collapse link multiplicity
    val ew = e.groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("m"))
    val deg = ew.groupBy(col("src")).agg(sum(col("m")).as("outdeg"))
    // weighted edges carry their source's outdeg so the per-iteration
    // join is rank-vector-only; truncate = this is the reused base.
    // Pre-partitioned on the per-iteration join key BEFORE the
    // checkpoint (checkpoint preserves outputPartitioning): every
    // round's ewd-side exchange — the graph-sized one — disappears,
    // leaving only the rank vector to shuffle per iteration
    val ewd = truncate(ew.join(deg, "src").repartition(col("src")))
    // node set from the CHECKPOINTED weighted edges, not from `ew`: the
    // inner join with deg preserves every (src, dst) row, and deriving
    // from ewd keeps this graph-sized — a second derivation from ew
    // would replay the whole corpus-sized edge aggregation (and its
    // upstream lineage) in a separate job
    val nodes = truncate(
      ewd.select(col("src").as("node"))
        .union(ewd.select(col("dst").as("node"))).distinct())
    // total mass never exceeds nNodes·scale (each round emits
    // 0.15·scale + 0.85·(inflow), and inflow sums to at most the
    // previous total), so a single node's aggregate contribution is
    // bounded by nNodes·scale — guard the damping multiply against
    // silent Long wrap instead of letting a hub's rank go negative
    val nNodes = nodes.count()
    require(nNodes == 0 || scale <= Long.MaxValue / 85L / nNodes,
      s"scale=$scale with $nNodes nodes can overflow the damping " +
        "multiply (85 * contribution must fit a signed 64-bit long); " +
        "lower scale")
    val base = scale * 15L / 100L
    var r = nodes.withColumn("rank", lit(scale))
    for (_ <- 1 to iters) {
      val contrib = ewd
        .join(r.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          (col("m") * expr("`rank` div outdeg")).as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("s"))
      r = truncate(nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr("(85 * coalesce(s, 0L)) div 100"))
            .as("rank")))
    }
    r
  }
}
