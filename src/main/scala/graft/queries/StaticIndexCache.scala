package graft.queries

import org.apache.spark.sql.SparkSession

/** Session-lifetime cache for FROZEN stream-static index artifacts
  * (the LSH bucket index of [[Similarity.annLshTopkStream]], the
  * band/meta index of [[Dedup.minhashCrossPairsStream]], …).
  *
  * Why: each of those builds materializes a corpus-sized artifact —
  * a tmp parquet directory and/or MEMORY_AND_DISK-persisted frames —
  * whose lifetime is "as long as anyone may still probe it". A naive
  * per-call build leaks one artifact per gate invocation in a long
  * session (disk via deleteOnExit-only tmp dirs, block manager via
  * never-unpersisted frames). Caching by (session, canonicalized
  * corpus plan, index parameters) makes repeated invocations reuse
  * ONE artifact: the in-session analogue of the production shape,
  * where the frozen index is a bucketed table built once and probed
  * by every subsequent query.
  *
  * Keys include the [[SparkSession]] because the cached value (a
  * DataFrame or persisted frame) is bound to its session; the session
  * reference is weak-equivalent here since entries die with the JVM
  * and sessions are few. Canonicalized logical plans compare
  * structurally (the same mechanism as `QueryPlan.sameResult`), so
  * two reads of the same table with the same projection hit the same
  * entry while a changed corpus misses.
  */
private[graft] object StaticIndexCache {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[Any, AnyRef]()

  /** Build-once-then-reuse. `build` runs at most once per distinct
    * key (ConcurrentHashMap.computeIfAbsent's mutual exclusion).
    */
  def getOrBuild[T <: AnyRef](key: Any)(build: => T): T =
    cache.computeIfAbsent(key, _ => build).asInstanceOf[T]

  /** Cache key for a corpus-derived index: the session, the corpus's
    * canonicalized analyzed plan, a fingerprint of its backing FILES,
    * and the index parameters.
    *
    * The file fingerprint matters: for filesystem relations the
    * canonicalized plan compares only root paths (Spark's
    * InMemoryFileIndex equality), so a corpus OVERWRITTEN or APPENDED
    * at the same path mid-session would otherwise silently keep
    * serving the old frozen index. Spark-written data always produces
    * fresh part-file names, so hashing the sorted `inputFiles` list
    * catches both cases; non-file sources report no input files and
    * fall back to plan equality alone.
    */
  def corpusKey(s: SparkSession, corpus: org.apache.spark.sql.DataFrame,
      family: String, params: Any*): Any = {
    val files = corpus.inputFiles
    java.util.Arrays.sort(files.asInstanceOf[Array[Object]])
    // cryptographic digest, not hashCode: a collision here would
    // silently serve the wrong index (same rationale as carrying
    // centroid VALUES in the sized-index key)
    val md = java.security.MessageDigest.getInstance("SHA-256")
    files.foreach { f =>
      md.update(f.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      md.update(0.toByte)
    }
    val fp = java.util.Base64.getEncoder.encodeToString(md.digest())
    (s, corpus.queryExecution.analyzed.canonicalized, files.length, fp,
      family, params.toList)
  }

  /** Test hook: entry count (to pin reuse) and reset. */
  private[graft] def size: Int = cache.size
  private[graft] def clear(): Unit = cache.clear()
}
