package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fused in-cell cosine scan of the embedding near-dup kernels
  * ([[graft.queries.Dedup.embedCrossPairsWith]]): for one incoming row
  * (qa, na) and its cell's member array, emit
  * `ARRAY<STRUCT<idb BIGINT, cosine DOUBLE>>` of the members whose
  * quantized cosine clears the threshold — bit-equal to the
  * `filter(transform(ms, m -> struct(idb, cosineQ(...))), c >= θ)`
  * tree it replaces (same exact long dot, same `nullif`-zero-denominator
  * NULL, and a NULL cosine never clears `>=`). Parity holds for
  * NON-NEGATIVE norms only — the internal callers' invariant (nrm is a
  * sum of squares). A caller feeding a NEGATIVE nrm through the
  * session-registered SQL function gets sqrt(neg) = NaN: this loop
  * DROPS the NaN-cosine pair (Java `NaN >= θ` is false), while the
  * lambda tree would KEEP it (Spark's comparison orders NaN above
  * every double) — NaN-vs-threshold has no meaningful answer, and
  * dropping is the conservative one.
  *
  * Why: higher-order `transform`/`filter` lambdas evaluate interpreted,
  * per element — the in-cell scan is |incoming|·|cell| cosine evals
  * (~1.3 M structs for the video-similarity composition at sf0.1,
  * measured as the query's residual cost r18) — while this native loop
  * allocates nothing per element it drops.
  */
case class CellCosPairs(first: Expression, second: Expression,
    third: Expression, threshold: Double)
    extends TernaryExpression {

  override def prettyName: String = "cell_cos_pairs"
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("idb", LongType, nullable = false),
    StructField("cosine", DoubleType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(LongType, _), LongType, ArrayType(s: StructType, _))
          if Seq("idb", "qe", "nrm").forall(s.fieldNames.contains) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<BIGINT>, BIGINT, " +
          s"ARRAY<STRUCT<idb,qe,nrm>>), got ${a.sql} / ${b.sql} / ${c.sql}")
    }

  private lazy val memberSchema =
    third.dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]
  private lazy val fIdb = memberSchema.fieldIndex("idb")
  private lazy val fQe = memberSchema.fieldIndex("qe")
  private lazy val fNrm = memberSchema.fieldIndex("nrm")

  /** The fused per-row scan, shared by interpreted eval and the
    * codegen'd call site (only `ms == null` yields a NULL result —
    * handled by the callers; a NULL qa/na yields an EMPTY array, the
    * lambda tree's filter-drops-NULL behavior).
    */
  def run(qa: ArrayData, naNull: Boolean, na: Long,
      ms: ArrayData): ArrayData = {
    val n = ms.numElements()
    val qaLen = if (qa == null) -1 else qa.numElements()
    val sqrtNa = if (naNull) Double.NaN else Math.sqrt(na.toDouble)
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    var j = 0
    while (j < n) {
      if (!ms.isNullAt(j)) {
        val row = ms.getStruct(j, memberSchema.length)
        if (!row.isNullAt(fQe) && !row.isNullAt(fNrm) && qa != null &&
          !naNull) {
          val qe = row.getArray(fQe)
          if (qe.numElements() == qaLen) {
            var dot = 0L
            var ok = true
            var i = 0
            while (i < qaLen && ok) {
              if (qa.isNullAt(i) || qe.isNullAt(i)) ok = false
              else { dot += qa.getLong(i) * qe.getLong(i); i += 1 }
            }
            if (ok) {
              val denom = sqrtNa * Math.sqrt(row.getLong(fNrm).toDouble)
              if (denom != 0.0) {
                val cosine = dot.toDouble / denom
                if (cosine >= threshold)
                  out += InternalRow(row.getLong(fIdb), cosine)
              }
            }
          }
        }
      }
      j += 1
    }
    new GenericArrayData(out.toArray)
  }

  override def eval(input: InternalRow): Any = {
    val msRaw = third.eval(input)
    if (msRaw == null) return null
    val qaRaw = first.eval(input)
    val naRaw = second.eval(input)
    run(if (qaRaw == null) null else qaRaw.asInstanceOf[ArrayData],
      naRaw == null,
      if (naRaw == null) 0L else naRaw.asInstanceOf[Long],
      msRaw.asInstanceOf[ArrayData])
  }

  /** Codegen: evaluate the children inside the enclosing
    * WholeStageCodegen span and call [[run]] on this expression as a
    * reference object — the per-row fused loop is the win (it already
    * ran native under the r18 CodegenFallback); what this removes is
    * the fallback wrapper that broke the span around the projection
    * (r18 VERDICT "What's wrong #2").
    */
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val qaEv = first.genCode(ctx)
    val naEv = second.genCode(ctx)
    val msEv = third.genCode(ctx)
    val ref = ctx.addReferenceObj("cellCosPairs", this)
    val ad = classOf[ArrayData].getName
    ev.copy(code =
      code"""
         |${qaEv.code}
         |${naEv.code}
         |${msEv.code}
         |boolean ${ev.isNull} = ${msEv.isNull};
         |$ad ${ev.value} = null;
         |if (!${ev.isNull}) {
         |  ${ev.value} = $ref.run(
         |    ${qaEv.isNull} ? null : ${qaEv.value},
         |    ${naEv.isNull}, ${naEv.isNull} ? 0L : ${naEv.value},
         |    ${msEv.value});
         |}""".stripMargin)
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): CellCosPairs =
    copy(first = newFirst, second = newSecond, third = newThird)
}
