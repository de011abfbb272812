package graft.operators

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Exact top-k heaviest keys at unbounded key cardinality: a bounded-
  * state Misra-Gries sketch pass nominates candidates, an exact count
  * pass restricted to those candidates produces the answer, and the
  * sketch's error bound PROVES the answer exact (or triggers the honest
  * fallback).
  *
  * Why not plain `groupBy(key).count().orderBy(desc).limit(k)`: at
  * 100 TB with billions of distinct keys the partial aggregation hash
  * tables cover the full key domain per task (spill), and the shuffle
  * carries one row per distinct key. Here pass 1 carries one
  * ≤ capacity-entry summary per partition (shuffle size independent of
  * key cardinality) and pass 2's hash tables hold ≤ capacity keys —
  * both scan-bound, never domain-bound.
  *
  * Exactness: the MG invariant says every key absent from the summary
  * has true count ≤ `dropped` ≤ n/(capacity+1). After exact-counting
  * the candidates, if the k-th candidate count is STRICTLY greater than
  * `dropped`, no missed key can displace it (even by tie-break), so the
  * top-k is provably exact. Otherwise the operator falls back to the
  * full groupBy — correctness is never traded for the optimization; on
  * skewed (Zipf-ish) real distributions the check passes with small
  * capacities, and the fallback only fires on near-uniform data where
  * "heavy hitters" is ill-posed anyway.
  *
  * Ties at the k boundary break by key ascending, deterministically on
  * both engines.
  */
object HeavyHitters {

  /** Exact top-k keys of `df` by frequency of `key`, with counts.
    * Output: (key, cnt BIGINT), the k heaviest (count desc, key asc).
    */
  def exactTopK(df: DataFrame, key: String, k: Int,
      capacity: Int = 256): DataFrame = {
    require(k > 0 && capacity > k,
      s"heavy_hitters: need capacity > k > 0, got k=$k capacity=$capacity")
    val spark = df.sparkSession
    GraftFunctions.register(spark)
    val keyCol = col(key)
    // pass 1: one job, two control-plane-sized results — the candidate
    // summary (≤ capacity entries) and the row count. Driver-side
    // collect is bounded by construction.
    val head = df.agg(
      GraftFunctions.heavyHitters(keyCol, capacity).as("sk"),
      count(keyCol).as("n")).head()
    val entries = head.getSeq[org.apache.spark.sql.Row](0)
    val dropped = if (entries.isEmpty) 0L else entries.head.getLong(2)
    exactTopKFromSummary(df, key, k, entries.map(_.get(0)), dropped)
  }

  /** The verify half of [[exactTopK]], reusable with a summary built
    * elsewhere (e.g. incrementally over a stream): exact candidate-only
    * counts, the provable-exactness check against `dropped`, and the
    * full-domain fallback. Exact output regardless of HOW (or how well)
    * the candidates were nominated.
    */
  def exactTopKFromSummary(df: DataFrame, key: String, k: Int,
      candidates: Seq[Any], dropped: Long): DataFrame = {
    val keyCol = col(key)
    def topK(src: DataFrame): DataFrame = src
      .groupBy(keyCol.as("key")).agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("key")).limit(k)
    if (candidates.isEmpty) return topK(df.limit(0))
    // pass 2: exact counts over candidate keys only — map-side hash
    // tables bounded at `capacity` entries, shuffle of ≤ capacity rows.
    // Small candidate sets go through an In-list (codegen'd, pushable
    // into the scan); large ones (the TVF accepts capacity up to 2^20)
    // through a broadcast semi-join instead — a ~1M-literal In
    // expression stalls Catalyst planning on the driver.
    val filtered =
      if (candidates.size <= 1024) df.where(keyCol.isin(candidates: _*))
      else {
        val s = df.sparkSession
        val keyType = df.schema(df.schema.fieldIndex(key)).dataType
        val cands = s.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](
            candidates.map(org.apache.spark.sql.Row(_)).asJava),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("__hh_key", keyType))))
        df.join(broadcast(cands), keyCol === col("__hh_key"), "left_semi")
      }
    val exact = topK(filtered)
    val rows = exact.collect()
    // dropped == 0: the summary never shed mass, so candidates are ALL
    // keys and the exact pass is trivially complete. Otherwise the k-th
    // count must strictly beat the bound on any missed key's count.
    val provable = dropped == 0L ||
      (rows.length == k && rows.last.getLong(1) > dropped)
    if (provable) exact
    else topK(df) // honest fallback: full-domain aggregation
  }

  /** Column-expression variant for composed plans (no exactness check —
    * the raw summary, for callers that want estimates + bounds).
    */
  def sketch(key: Column, capacity: Int): Column =
    GraftFunctions.heavyHitters(key, capacity)
}
