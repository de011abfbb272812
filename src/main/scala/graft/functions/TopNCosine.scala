package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** The n nearest centroids by quantized cosine as ONE fused expression
  * returning `ARRAY<BIGINT>` of cell ids in rank order — the top-n
  * generalization of [[ArgminCosine]], with EXACTLY the ordering of
  * the struct-array spelling it replaces (`array_sort` by cosine DESC
  * NULLS LAST, cid ASC, then `slice(_, 1, n)`): a NULL cosine (zero
  * norm, null element, dimension mismatch, or a NULL input vector)
  * sorts after every real score but still fills trailing probe slots,
  * ties break to the lowest cid, and the output length is
  * min(n, #cells).
  *
  * Why: the composed spelling scores k cells through an
  * `array(struct(cosineQ(...), cid) × k)` tree carrying k centroid
  * literals — at the production √n cell count that is a ~k·d-node
  * plan (9 MiB task binaries and 3-39 s drains measured at k=448,
  * sf10) re-planned per micro-batch. As one node with the centroids
  * as flat reference objects the plan is O(1) in k·d. Arithmetic is
  * bit-identical: exact long dot, `Math.sqrt` norms, one double
  * division per cell.
  *
  * Children: (qe ARRAY<BIGINT>, nrm BIGINT); `cids`/flat `cents`/
  * `cnorms` ride along cid-ascending, `n` is the probe count.
  */
case class TopNCosine(left: Expression, right: Expression,
    cids: Array[Long], cents: Array[Long], cnorms: Array[Long], n: Int)
    extends BinaryExpression {
  require(cids.nonEmpty && cents.length % cids.length == 0 &&
    cnorms.length == cids.length,
    s"inconsistent centroid arrays: ${cids.length} cids, " +
      s"${cents.length} components, ${cnorms.length} norms")
  require(n >= 1, s"topn_cos: n must be >= 1, got $n")

  private val c = cids.length
  private val d = cents.length / cids.length
  private val outN = math.min(n, c)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "topn_cos"
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
      case (ArrayType(NullType, _), LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<BIGINT>, BIGINT), got ${l.sql} / ${r.sql}")
    }

  private lazy val sqrtCnorms: Array[Double] =
    cnorms.map(x => Math.sqrt(x.toDouble))

  // content-based equality, same rationale as ArgminCosine
  override def equals(other: Any): Boolean = other match {
    case a: TopNCosine =>
      left == a.left && right == a.right && n == a.n &&
        java.util.Arrays.equals(cids, a.cids) &&
        java.util.Arrays.equals(cents, a.cents) &&
        java.util.Arrays.equals(cnorms, a.cnorms)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(left, right, Int.box(n),
      Int.box(java.util.Arrays.hashCode(cids)),
      Int.box(java.util.Arrays.hashCode(cents)),
      Int.box(java.util.Arrays.hashCode(cnorms)))

  /** Shared kernel: cosines per cell (NaN marks NULL), then outN
    * selection passes with the (non-NULL first, cos desc, cid asc)
    * order. Used by eval; doGenCode emits the same algorithm.
    */
  private def pick(cos: Array[Double]): Array[Long] = {
    val used = new Array[Boolean](c)
    val out = new Array[Long](outN)
    var s = 0
    while (s < outN) {
      var best = -1
      var k = 0
      while (k < c) {
        if (!used(k) && (best < 0 || {
          val kn = cos(k).isNaN; val bn = cos(best).isNaN
          if (kn != bn) bn
          else if (!kn && cos(k) != cos(best)) cos(k) > cos(best)
          else cids(k) < cids(best)
        })) best = k
        k += 1
      }
      used(best) = true
      out(s) = cids(best)
      s += 1
    }
    out
  }

  override def eval(input: InternalRow): Any = {
    val qeRaw = left.eval(input)
    val nrmRaw = right.eval(input)
    run(if (qeRaw == null) null else qeRaw.asInstanceOf[ArrayData],
      nrmRaw == null,
      if (nrmRaw == null) 0L else nrmRaw.asInstanceOf[Long])
  }

  /** The fused scoring+selection, shared by interpreted eval and the
    * codegen'd call site (a NULL qe or nrm means every cosine is NULL
    * — the probe still fills its slots in cid order, never NULL out).
    */
  def run(qe: ArrayData, nrmNull: Boolean, nrm: Long): ArrayData = {
    val cos = new Array[Double](c)
    java.util.Arrays.fill(cos, Double.NaN)
    if (qe != null && !nrmNull) {
      if (qe.numElements() == d) {
        val sqrtNrm = Math.sqrt(nrm.toDouble)
        var bad = false
        var k = 0
        while (k < c && !bad) {
          val denom = sqrtNrm * sqrtCnorms(k)
          if (denom != 0.0) {
            var acc = 0L
            var i = 0
            while (i < d && !bad) {
              if (qe.isNullAt(i)) bad = true
              else { acc += qe.getLong(i) * cents(k * d + i); i += 1 }
            }
            if (!bad) cos(k) = acc.toDouble / denom
          }
          k += 1
        }
        if (bad) java.util.Arrays.fill(cos, Double.NaN)
      }
    }
    new GenericArrayData(pick(cos))
  }

  /** Codegen: evaluate the children in the enclosing WholeStageCodegen
    * span and call [[run]] via a reference object — removes the
    * CodegenFallback wrapper that broke the span; the per-row
    * O(cells·dim) loop itself is unchanged.
    */
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val qeEv = left.genCode(ctx)
    val nrmEv = right.genCode(ctx)
    val ref = ctx.addReferenceObj("topNCosine", this)
    val ad = classOf[ArrayData].getName
    ev.copy(code =
      code"""
         |${qeEv.code}
         |${nrmEv.code}
         |$ad ${ev.value} = $ref.run(
         |  ${qeEv.isNull} ? null : ${qeEv.value},
         |  ${nrmEv.isNull}, ${nrmEv.isNull} ? 0L : ${nrmEv.value});
         |""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopNCosine =
    copy(left = newLeft, right = newRight)
}
