package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-driven table profiling — the ANALYZE every ingest pipeline
  * runs before accepting a drop: per column, non-null count, exact NDV,
  * and min/max rendered to EXPLICIT strings (integers raw, floats at
  * DECIMAL(18,2), timestamps at second precision — never engine-default
  * formatting, the q_table_checksum discipline). Non-atomic columns
  * (arrays, maps, structs, binary) get counts but NULL min/max/ndv-only
  * where the type can't support them.
  *
  * ONE scan: every per-column aggregate rides a single Aggregate node —
  * Catalyst plans the multi-distinct via Expand (the row stream is
  * replicated per distinct group, the table is READ once) — then a
  * stack() pivots the wide row into one row per column. At 100 TB the
  * exact NDV is the expensive honest choice; approx_count_distinct in
  * the same frame is the sketched alternative (q_agg_approx's contract).
  */
object TableProfile {

  /** Renderer to an engine-independent string, or None when the type
    * has no stable cross-engine textual form (then min/max are NULL).
    */
  private def renderer(dt: DataType): Option[Column => Column] = dt match {
    case LongType | IntegerType | ShortType | ByteType | StringType |
        BooleanType | DateType =>
      Some(c => c.cast("string"))
    case DoubleType | FloatType | _: DecimalType =>
      Some(c => c.cast("decimal(18,2)").cast("string"))
    case TimestampType | TimestampNTZType =>
      Some(c => date_format(c, "yyyy-MM-dd HH:mm:ss"))
    case _ => None
  }

  /** True for types Spark can GROUP BY / compare (NDV + ordering). */
  private def comparable(dt: DataType): Boolean = dt match {
    case _: MapType => false
    case _ => true
  }

  /** Output: (col, n_rows, n_notnull, ndv, min_s, max_s) — one row per
    * input column, in schema order.
    */
  def profile(df: DataFrame): DataFrame = {
    val fields = df.schema.fields
    require(fields.nonEmpty, "profile: input has no columns")
    val nullS = lit(null).cast("string")
    val nullL = lit(null).cast("long")
    val aggs = fields.zipWithIndex.flatMap { case (f, i) =>
      val c = col(f.name)
      val r = renderer(f.dataType)
      Seq(
        count(c).as(s"nn_$i"),
        (if (comparable(f.dataType)) countDistinct(c) else nullL)
          .as(s"ndv_$i"),
        r.map(fn => fn(min(c))).getOrElse(nullS).as(s"min_$i"),
        r.map(fn => fn(max(c))).getOrElse(nullS).as(s"max_$i"))
    }
    // spread a sub-split scan before the Expand: the multi-distinct
    // replicates every row once per distinct group (~#cols+1 of them),
    // and on a one-split input that whole amplified stream would hash
    // on a single core (guide §2.5 — measured 4.1 s → the map side is
    // 97% of the query at sf0.1). The exchange moves the raw rows once;
    // at scale the scan is already parallel and this is the identity.
    val wide = graft.Par.spread(df)
      .agg(count(lit(1)).as("n_rows"), aggs.toIndexedSeq: _*)
    val stackArgs = fields.zipWithIndex.map { case (f, i) =>
      val lit = f.name.replace("'", "\\'")
      s"'$lit', n_rows, nn_$i, ndv_$i, min_$i, max_$i"
    }.mkString(", ")
    wide.selectExpr(s"stack(${fields.length}, $stackArgs) AS " +
      "(col, n_rows, n_notnull, ndv, min_s, max_s)")
  }
}
