package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Per-row BM25 score merge + top-k as ONE fused expression: input is
  * the flattened posting fetch `ARRAY<STRUCT<doc_id BIGINT, addend
  * DOUBLE>>` (one element per (query term, posting) hit), output is
  * `ARRAY<STRUCT<doc_id BIGINT, score DOUBLE>>` — per-doc sums in
  * (score DESC, doc_id ASC) order, cut to k — with EXACTLY the batch
  * scorer's arithmetic: every addend rounds to DECIMAL(18,6) (HALF_UP,
  * the Cast-to-decimal rule), sums accumulate as exact scale-6
  * integers, and the final score is the decimal→double conversion —
  * so the streaming route hash-matches `dsum6` bit-for-bit, in any
  * addend order.
  *
  * Why a native expression: the pure-SQL spelling of "group an array
  * by key" is `transform(array_distinct(keys), d → aggregate(filter(
  * members, _.doc_id = d), …))` — O(D·n) interpreted higher-order
  * calls per row, measured intractable at stress scale (the fixture's
  * dense vocabulary makes n ≈ Σ df corpus-sized). This node is one
  * O(n) hash merge + an O(D) bounded top-k insertion pass per row,
  * with k baked as a literal.
  *
  * Null contract: a NULL members array yields an empty result (the
  * probe's flatten of coalesced arrays never produces one); NULL
  * elements/fields are skipped defensively (impossible by
  * construction — addends derive from non-null integer stats).
  */
case class Bm25MergeTopK(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, s"bm25_merge_topk: k must be >= 1, got $k")

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("doc_id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "bm25_merge_topk"
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StructType(fields), _)
          if fields.length == 2 && fields(0).dataType == LongType &&
            fields(1).dataType == DoubleType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<STRUCT<BIGINT, DOUBLE>>, " +
          s"got ${other.sql}")
    }

  override def eval(input: InternalRow): Any =
    run(child.eval(input).asInstanceOf[ArrayData])

  /** The fused merge+top-k, shared by interpreted eval and the
    * codegen'd call site (a NULL members array yields an EMPTY result,
    * never NULL).
    */
  def run(arr: ArrayData): ArrayData = {
    if (arr == null) return new GenericArrayData(Array.empty[Any])
    val n = arr.numElements()
    // exact scale-6 accumulation: addend → DECIMAL(18,6) unscaled long
    // (HALF_UP — java.math.BigDecimal.setScale matches Spark's
    // Cast(double→decimal)), summed as longs. Long overflow needs
    // |sum| > 9.2e12 at scale 6 — beyond the DECIMAL(18) bound the
    // batch route shares.
    val sums = new java.util.HashMap[java.lang.Long, Array[Long]]()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val e = arr.getStruct(i, 2)
        if (!e.isNullAt(0) && !e.isNullAt(1)) {
          val micros = java.math.BigDecimal.valueOf(e.getDouble(1))
            .setScale(6, java.math.RoundingMode.HALF_UP)
            .movePointRight(6).longValueExact()
          val cell = sums.computeIfAbsent(e.getLong(0), _ => new Array[Long](1))
          cell(0) += micros
        }
      }
      i += 1
    }
    // bounded top-k insertion over the D merged docs: (score DESC,
    // doc_id ASC), scores compared as the DOUBLES the batch window
    // orders by (two distinct micro-sums can round to one double —
    // the tie then breaks on doc_id, exactly like the batch rank)
    val outN = math.min(k, sums.size())
    val topDoc = new Array[Long](outN)
    val topScore = new Array[Double](outN)
    var filled = 0
    val it = sums.entrySet().iterator()
    while (it.hasNext) {
      val ent = it.next()
      val doc = ent.getKey.longValue()
      val score = java.math.BigDecimal.valueOf(ent.getValue()(0), 6)
        .doubleValue()
      def beats(j: Int): Boolean =
        score > topScore(j) || (score == topScore(j) && doc < topDoc(j))
      if (filled < outN || beats(filled - 1)) {
        var pos = math.min(filled, outN - 1)
        while (pos > 0 && beats(pos - 1)) {
          topDoc(pos) = topDoc(pos - 1)
          topScore(pos) = topScore(pos - 1)
          pos -= 1
        }
        topDoc(pos) = doc
        topScore(pos) = score
        if (filled < outN) filled += 1
      }
    }
    new GenericArrayData(
      (0 until outN).map(j => InternalRow(topDoc(j), topScore(j))).toArray[Any])
  }

  /** Codegen: evaluate the child in the enclosing WholeStageCodegen
    * span and call [[run]] via a reference object — removes the
    * CodegenFallback wrapper that broke the span; the per-row O(n)
    * merge loop itself is unchanged.
    */
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val childEv = child.genCode(ctx)
    val ref = ctx.addReferenceObj("bm25MergeTopK", this)
    val ad = classOf[ArrayData].getName
    ev.copy(code =
      code"""
         |${childEv.code}
         |$ad ${ev.value} =
         |  $ref.run(${childEv.isNull} ? null : ${childEv.value});
         |""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): Bm25MergeTopK = copy(child = newChild)
}
