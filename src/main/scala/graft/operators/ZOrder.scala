package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering keys for multi-dimensional data skipping.
  *
  * At 100 TB a scan filtered on TWO columns only prunes files when the
  * layout is clustered on both at once; sorting on (a, b) gives perfect
  * pruning on `a` and none on `b`. Interleaving the bits of both columns
  * into one sort key gives each file a tight min/max envelope on BOTH
  * dimensions, so parquet row-group stats (or any min/max file index)
  * prune on either predicate.
  *
  * The bit-spread is the classic mask-shift cascade, built from Spark's
  * own shiftleft/bitwise columns — no UDF, no custom Expression, stays
  * inside whole-stage codegen, and the identical arithmetic runs as the
  * DuckDB oracle (`q_zorder_layout`).
  */
object ZOrder {

  /** Spread the low 16 bits of a non-negative column so bit i lands at
    * position 2i (mask-shift cascade, exact for 0 <= x < 2^16).
    */
  def spread16(x: Column): Column = {
    val m0 = x.cast("long").bitwiseAND(lit(0xFFFFL))
    val m1 = m0.bitwiseOR(shiftleft(m0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val m2 = m1.bitwiseOR(shiftleft(m1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val m3 = m2.bitwiseOR(shiftleft(m2, 2)).bitwiseAND(lit(0x33333333L))
    m3.bitwiseOR(shiftleft(m3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Morton interleave of two 16-bit dimensions: a in even bits, b in
    * odd bits. Callers normalize each dimension into [0, 2^16) first —
    * equal-width bucketing is fine; Z-order only needs rank order, not
    * exact values.
    */
  def zValue2(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Cluster a DataFrame by Z-value for write-out: range partition on
    * the key (one skew-aware range shuffle — sampled bounds, same
    * mechanics as a global sort) and sort within each partition, so
    * every output file covers a tight Z-range = a tight rectangle in
    * (a, b) space. `numFiles` is the output file budget.
    */
  def clusterBy2(df: DataFrame, a: Column, b: Column,
      numFiles: Int): DataFrame = {
    // collision-proof internal key name: a user column named "__z" must
    // not be silently overwritten and dropped
    val zkey = "__graft_zkey"
    require(!df.columns.contains(zkey),
      s"input already has a $zkey column")
    val keyed = df.withColumn(zkey, zValue2(a, b))
    keyed.repartitionByRange(numFiles, col(zkey))
      .sortWithinPartitions(col(zkey))
      .drop(zkey)
  }
}
