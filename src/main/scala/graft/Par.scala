package graft

import org.apache.spark.sql.DataFrame

/** Input-parallelism helper (optimization guide §2.5/§2.6: input skew /
  * idle capacity). A small parquet file arrives as ONE scan split, which
  * serializes every CPU-heavy narrow stage above it — shingling, hashing,
  * edit-distance verification, media codecs — on a single core no matter
  * how many the session has. `spread` repartitions such a sub-split input
  * to the session's default parallelism; the exchange moves only the rows
  * the caller has already projected, so call it AFTER the narrow
  * projection. Scale-adaptive by construction, not a local[32] constant:
  * a production-sized scan already carries >= defaultParallelism splits
  * and passes through untouched, so the bench's lower-core runs and any
  * cluster run see the same plan shape with their own core count.
  */
object Par {
  /** The exact split-count check (`df.rdd.getNumPartitions`) forces a
    * physical-planning pass of the subtree on the driver — cheap here,
    * measurable on a wide-cluster plan. When the logical-plan size
    * estimate already proves the scan carries at least
    * defaultParallelism × maxPartitionBytes of input, the scan cannot
    * arrive under-split, so the exact check (and its planning pass) is
    * skipped. The estimate only SKIPS work, never triggers a
    * repartition — a wrong estimate can at worst leave a medium
    * relation unspread, where each core still owns ≥ one full split of
    * work.
    */
  private def provablyWideEnough(df: DataFrame): Boolean = {
    val sess = df.sparkSession
    val p = sess.sparkContext.defaultParallelism
    val maxSplit = sess.sessionState.conf.filesMaxPartitionBytes
    df.queryExecution.optimizedPlan.stats.sizeInBytes >=
      BigInt(p) * BigInt(maxSplit)
  }

  def spread(df: DataFrame): DataFrame =
    if (df.isStreaming || provablyWideEnough(df)) df
    else {
      val p = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions < p) df.repartition(p) else df
    }

  /** Stream-capable spread for CPU-heavy STATELESS probe pipelines
    * (ANN index probes, signature computes, prefix explodes at ingest):
    * a file-staged micro-batch arrives as one partition, serializing
    * the whole probe on one core (measured r18: the ivfpq drain's
    * addBatch was 3.6 s of its 4.0 s trigger). For a stream this
    * repartitions unconditionally — `.rdd` is undefined pre-start, and
    * the probe compute dominates the O(batch) exchange by construction
    * (that is the caller's contract); batch inputs get the usual
    * conditional [[spread]]. Stateless + append-mode safe: round-robin
    * repartition changes row placement, never row content.
    */
  def spreadAny(df: DataFrame): DataFrame =
    if (df.isStreaming)
      df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    else spread(df)

  /** Materialize a DOC-LEVEL intermediate that the enclosing plan
    * references several times (guide §3/§5: materialise an intermediate
    * to truncate the plan). Catalyst performs no subtree reuse below an
    * exchange, so a kernel that joins its own shingle/signature relation
    * back to itself recomputes the whole tokenize per reference — the
    * ppjoin plan measured 12 scans / 10 shingle passes / 30 exchanges
    * for ONE query (r18). An eager localCheckpoint computes it once and
    * serves every reference (lineage also truncates, keeping plan size
    * flat). Only for doc-level relations (one row per document) — never
    * exploded token relations, whose materialization would be a ×gram
    * blow-up at scale; recompute beats storing those. Identity for
    * streams (checkpointing is undefined pre-start).
    */
  def pin(df: DataFrame): DataFrame =
    if (df.isStreaming) df else df.localCheckpoint(true)

  /** Size-aware variant for ITERATED passes (the BPE trainer's K
    * rounds): every round pays a fixed per-partition cost (task launch,
    * checkpoint block, agg partials), multiplied by K — so the slice
    * count must be backed by real bytes, not just core count. Slices
    * are ceil(inputBytes / bytesPerSlice) capped at defaultParallelism;
    * a corpus too small to amortize the per-round overhead stays at its
    * natural split count (measured r18: blanket 32-way spread cost the
    * 4-round sf0.1 trainer +0.4 s while the 50k-doc stress corpus needs
    * the parallelism).
    */
  def spreadSliced(df: DataFrame, bytesPerSlice: Long): DataFrame =
    if (df.isStreaming || provablyWideEnough(df)) df
    else {
      val p = df.sparkSession.sparkContext.defaultParallelism
      val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
      val want = ((bytes + bytesPerSlice - 1) / bytesPerSlice)
        .min(BigInt(p)).max(BigInt(1)).toInt
      if (df.rdd.getNumPartitions < want) df.repartition(want) else df
    }
}
