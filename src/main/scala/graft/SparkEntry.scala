package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{queries => qp}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries live in graft.queries.* packs; this object unions them.
  */
object SparkEntry {
  private def packs: Seq[QueryPack] = Seq(
    qp.Relational, qp.Joins, qp.Analytic, qp.Scalars, qp.Dedup,
    qp.Similarity, qp.TextAnalysis, qp.Windows, qp.Gate, qp.Multimodal,
    qp.Extras, qp.StreamingGate, qp.Tpch, qp.Shapes, qp.Pipeline,
    qp.Search)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    qp.Relational.queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val all = packs.flatMap(_.queries)
    val m = all.toMap
    // toMap is silently last-wins: a key collision would drop a query
    // from the gate (or pair one pack's query with another's oracle SQL)
    require(all.size == m.size, {
      val dups = all.groupBy(_._1).filter(_._2.size > 1).keys
      s"duplicate query keys across packs: ${dups.mkString(", ")}"
    })
    m
  }

  /** For each key in queries, equivalent SQL runnable by DuckDB on the same
    * parquet tables. Omitted keys get a weaker rows-only check.
    */
  def oracleSql: Map[String, String] = {
    val all = packs.flatMap(_.oracleSql)
    val m = all.toMap
    require(all.size == m.size, "duplicate oracle keys across packs")
    m
  }
}
