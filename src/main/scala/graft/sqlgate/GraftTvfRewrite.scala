package graft.sqlgate

import org.apache.spark.sql.SparkSession

/** Gate-reachable dedup operators as polymorphic table-valued functions
  * — the statement-layer door into the LLM-pipeline surface, spelled in
  * the same `TABLE(F(TABLE src, DESCRIPTOR(col), …))` dialect as the
  * Flink window TVFs the gate already accepts (so a reference-style
  * script author uses one idiom for both):
  *
  *   - `TABLE(DEDUP_EXACT(TABLE t, DESCRIPTOR(id), DESCRIPTOR(text)))`
  *     → `(keep_id, n_copies)`: one survivor (min id) per identical
  *     text — [[graft.queries.Dedup.exactGroups]].
  *   - `TABLE(DEDUP_MINHASH_PAIRS(TABLE t, DESCRIPTOR(id),
  *     DESCRIPTOR(text)[, <jaccard>]))` → `(ida, idb, jacc)`: verified
  *     near-dup pairs via MinHash+LSH —
  *     [[graft.queries.Dedup.minhashVerifiedPairs]] (default
  *     threshold 0.8).
  *
  * Same execution shape as [[MatchRecognizeRewrite]]: the operator runs
  * over `spark.table(src)`, the result registers as a tracked temp view
  * (dropped by ScriptRunner once the consuming statement is analyzed),
  * and the view name splices into the statement text. Batch gate mode —
  * both operators aggregate over the whole relation, so a streaming
  * source is rejected loudly by the groupBy analysis rather than
  * silently re-windowed.
  */
object GraftTvfRewrite {

  private val Keyword = """(?i)\bDEDUP_(?:EXACT|MINHASH_PAIRS)\s*\(""".r
  private val viewCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  private val Head =
    """(?i)\bTABLE\s*\(\s*%s\s*\(\s*TABLE\s+([`\w.]+)\s*,\s*DESCRIPTOR\s*\(\s*([`\w]+)\s*\)\s*,\s*DESCRIPTOR\s*\(\s*([`\w]+)\s*\)\s*"""
  private val ExactRe = (Head.format("DEDUP_EXACT") + """\)\s*\)""").r
  private val MinhashRe =
    (Head.format("DEDUP_MINHASH_PAIRS") + """(?:,\s*([0-9.]+)\s*)?\)\s*\)""").r

  /** True iff the statement uses a graft dedup TVF. */
  def present(sql: String): Boolean = Keyword.findFirstIn(sql).isDefined

  /** Source table names (lower-cased) of every dedup TVF in the
    * statement — the gate instantiates registry sources before the
    * session-aware rewrite resolves them (same contract as
    * [[MatchRecognizeRewrite.sourceTables]]).
    */
  def sourceTables(sql: String): Set[String] =
    (ExactRe.findAllMatchIn(sql) ++ MinhashRe.findAllMatchIn(sql))
      .map(_.group(1).replace("`", "").split('.').last
        .toLowerCase(java.util.Locale.ROOT)).toSet

  /** Session-aware rewrite; returns the new text plus the temp views it
    * registered (track-and-drop like MatchRecognizeRewrite).
    */
  def rewriteTracking(spark: SparkSession, sql: String): (String, Seq[String]) = {
    val created = Seq.newBuilder[String]
    def table(src: String): org.apache.spark.sql.DataFrame = {
      val df = spark.table(src)
      require(!df.isStreaming,
        s"dedup TVFs aggregate the whole relation and run in batch gate " +
          s"mode; '$src' is a streaming source (a silent re-windowing " +
          "would change semantics — rejected loudly)")
      df
    }
    def view(df: org.apache.spark.sql.DataFrame): String = {
      val v = s"__graft_tvf_out_${viewCounter.incrementAndGet()}"
      df.createOrReplaceTempView(v)
      created += v
      v
    }
    var out = ExactRe.replaceAllIn(sql, m => {
      view(graft.queries.Dedup.exactGroups(
        table(m.group(1).replace("`", "")),
        m.group(2).replace("`", ""), m.group(3).replace("`", "")))
    })
    out = MinhashRe.replaceAllIn(out, m => {
      val threshold = Option(m.group(4)).map(_.toDouble).getOrElse(0.8)
      view(graft.queries.Dedup.minhashVerifiedPairs(
        table(m.group(1).replace("`", "")),
        m.group(2).replace("`", ""), m.group(3).replace("`", ""), threshold))
    })
    requireFullyRewritten(out)
    (out, created.result())
  }

  /** Syntax-validation form: clauses are shape-checked and replaced by a
    * placeholder relation, nothing executes.
    */
  def validateOnly(sql: String): String = {
    val out = MinhashRe.replaceAllIn(
      ExactRe.replaceAllIn(sql, _ => "__graft_tvf_validated"),
      _ => "__graft_tvf_validated")
    requireFullyRewritten(out)
    out
  }

  /** A DEDUP_* token the regexes did NOT consume is a malformed call —
    * reject loudly instead of letting Spark fail on an unknown TVF.
    */
  private def requireFullyRewritten(sql: String): Unit =
    Keyword.findFirstIn(sql).foreach { _ =>
      throw new IllegalArgumentException(
        "malformed dedup TVF — expected TABLE(DEDUP_EXACT(TABLE t, " +
          "DESCRIPTOR(id), DESCRIPTOR(text))) or " +
          "TABLE(DEDUP_MINHASH_PAIRS(TABLE t, DESCRIPTOR(id), " +
          "DESCRIPTOR(text)[, threshold]))")
    }
}
