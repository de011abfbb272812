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
  * Keys split into a stable PREFIX (session, canonical plan, family,
  * params) and a VERSION (backing-file fingerprint). Entries are
  * stored per prefix: a version mismatch — the corpus was overwritten
  * or appended at the same path — REPLACES the superseded entry and
  * unpersists its cached frames, so a long session refreshing the
  * same corpus holds one live index per (corpus, family), not one per
  * corpus VERSION. Tmp parquet dirs a build registers via
  * [[newTmpDir]] are reclaimed a GRACE PERIOD after their entry is
  * superseded (an in-flight query planned against the old index
  * finishes its scan inside the window — the vacuum contract);
  * deleteOnExit remains the backstop for live entries.
  *
  * Keys include the [[SparkSession]] because the cached value (a
  * DataFrame or persisted frame) is bound to its session; the session
  * reference is weak-equivalent here since entries die with the JVM
  * and sessions are few. Canonicalized logical plans compare
  * structurally (the same mechanism as `QueryPlan.sameResult`), so
  * two reads of the same table with the same projection hit the same
  * entry while a changed corpus misses.
  *
  * Concurrency: the map operation is O(1) — builds run in a per-key
  * lazy cell OUTSIDE the map's bin locks (a multi-second Spark job
  * inside `computeIfAbsent` would serialize unrelated builders that
  * hash to the same bin, and a nested getOrBuild inside a build
  * closure would throw recursive-update). Two racing builders of the
  * SAME key still build at most once (the lazy cell's monitor).
  */
private[graft] object StaticIndexCache {

  /** Split cache key — see [[corpusKey]]. */
  final case class CorpusKey(prefix: Any, version: Any)

  /** Per-key build cell: at-most-once via the lazy monitor, with a
    * forced-flag so eviction can unpersist exactly the values that
    * were actually built (forcing an unbuilt cell just to clean it
    * up would RUN the multi-second build). Tmp parquet dirs the build
    * registers through [[newTmpDir]] are captured here so eviction can
    * reclaim them (grace-period delete, not just deleteOnExit).
    */
  private final class Cell(build: () => AnyRef) {
    @volatile private var forced = false
    @volatile private[StaticIndexCache] var dirs: Seq[java.nio.file.Path] =
      Nil
    lazy val value: AnyRef = {
      val buf = scala.collection.mutable.ArrayBuffer[java.nio.file.Path]()
      // save/restore rather than remove: a NESTED getOrBuild inside this
      // build closure (a supported pattern) runs its own cell build on
      // the same thread — an unconditional remove() in its finally would
      // clear OUR buffer, so dirs the outer build registers after the
      // nested call would never be captured for grace-period reaping
      val prev = buildDirs.get()
      buildDirs.set(buf)
      val v = try build()
      finally { if (prev == null) buildDirs.remove() else buildDirs.set(prev) }
      dirs = buf.toSeq
      forced = true
      v
    }
    def builtValue: Option[AnyRef] = if (forced) Some(value) else None
  }

  /** Dirs registered by the build currently running on this thread —
    * builds run synchronously inside the cell's lazy monitor, so a
    * ThreadLocal buffer is exactly scoped to one build.
    */
  private val buildDirs =
    new ThreadLocal[scala.collection.mutable.ArrayBuffer[java.nio.file.Path]]

  /** Create a tmp dir for a frozen-index artifact and REGISTER it with
    * the entry being built, so a same-prefix rebuild (corpus refreshed
    * at the same path) reclaims the superseded dir after
    * [[tmpGraceMs]] instead of leaking it until JVM exit. The grace
    * window exists because eviction is non-blocking: an in-flight query
    * planned against the old index finishes its scan from disk; the
    * window must exceed the longest expected scan (the same contract a
    * production table-format vacuum has). deleteOnExit stays as the
    * backstop for dirs never superseded.
    */
  private[graft] def newTmpDir(tag: String): java.nio.file.Path = {
    val dir = java.nio.file.Files.createTempDirectory(tag)
    dir.toFile.deleteOnExit()
    Option(buildDirs.get()).foreach(_ += dir)
    dir
  }

  /** Grace before a superseded entry's tmp dirs are deleted; system
    * property so the spec can shrink it (default 10 min).
    */
  private def tmpGraceMs: Long =
    sys.props.get("graft.index.tmpGraceMs").flatMap(_.toLongOption)
      .getOrElse(600000L)

  private lazy val reaper = {
    val t = java.util.concurrent.Executors.newSingleThreadScheduledExecutor(
      r => { val th = new Thread(r, "graft-index-reaper")
        th.setDaemon(true); th })
    t
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    try {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverseIterator
        .foreach(f => try java.nio.file.Files.deleteIfExists(f)
          catch { case _: Throwable => () })
    } catch { case _: Throwable => () }

  /** Schedule the superseded entry's registered dirs for deletion after
    * the grace window. Best-effort by design: a failed delete leaves
    * only what deleteOnExit already covered.
    */
  private def reapAfterGrace(dirs: Seq[java.nio.file.Path]): Unit =
    if (dirs.nonEmpty)
      reaper.schedule(new Runnable {
        override def run(): Unit = dirs.foreach(deleteRecursively)
      }, tmpGraceMs, java.util.concurrent.TimeUnit.MILLISECONDS)

  private final case class Holder(version: Any, cell: Cell)

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[Any, Holder]()

  /** Release the block-manager pins of a superseded entry's value
    * (DataFrames nested in tuples/collections included). Non-blocking:
    * in-flight queries over the old frame finish from disk.
    */
  private def unpersistAll(v: Any): Unit = v match {
    case df: org.apache.spark.sql.DataFrame =>
      try df.unpersist(blocking = false) catch { case _: Throwable => () }
    case p: Product => p.productIterator.foreach(unpersistAll)
    case it: Iterable[_] => it.foreach(unpersistAll)
    case _ => ()
  }

  /** Build-once-then-reuse. `build` runs at most once per distinct
    * key; a same-prefix key with a NEWER version evicts (and
    * unpersists) the superseded entry instead of accumulating beside
    * it.
    */
  def getOrBuild[T <: AnyRef](key: Any)(build: => T): T = {
    val (prefix, version) = key match {
      case CorpusKey(p, v) => (p, v)
      case other => (other, ()) // opaque key: the whole key is stable
    }
    var result: AnyRef = null
    var done = false
    while (!done) {
      val cur = cache.get(prefix)
      if (cur != null && cur.version == version) {
        result = cur.cell.value
        done = true
      } else {
        val fresh = Holder(version, new Cell(() => build))
        val installed =
          if (cur == null) cache.putIfAbsent(prefix, fresh) == null
          else cache.replace(prefix, cur, fresh)
        if (installed) {
          if (cur != null) {
            cur.cell.builtValue.foreach(unpersistAll)
            reapAfterGrace(cur.cell.dirs)
          }
          result = fresh.cell.value
          done = true
        } // lost an install race — loop and re-read the winner
      }
    }
    result.asInstanceOf[T]
  }

  /** Cache key for a corpus-derived index: the session, the corpus's
    * canonicalized analyzed plan, the family and index parameters
    * (together the stable prefix), plus a fingerprint of its backing
    * FILES (the version).
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
    CorpusKey(
      (s, corpus.queryExecution.analyzed.canonicalized, family,
        params.toList),
      (files.length, fp))
  }

  /** Explicit invalidation hook: drop (and unpersist) every entry, or
    * with a predicate only the matching prefixes — for callers that
    * know an index family is dead before any same-path rebuild would
    * evict it.
    */
  private[graft] def invalidate(prefixMatch: Any => Boolean): Unit = {
    val it = cache.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (prefixMatch(e.getKey)) {
        e.getValue.cell.builtValue.foreach(unpersistAll)
        reapAfterGrace(e.getValue.cell.dirs)
        it.remove()
      }
    }
  }

  /** Test hook: entry count (to pin reuse) and reset. */
  private[graft] def size: Int = cache.size
  private[graft] def clear(): Unit = invalidate(_ => true)
}
