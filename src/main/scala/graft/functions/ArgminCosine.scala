package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Nearest-centroid assignment by cosine as ONE fused expression:
  * `struct(cell, ccos)` of the centroid with the highest quantized
  * cosine to the input vector (ties to the lowest cid; a NULL cosine —
  * zero norm on either side, null element, or dimension mismatch —
  * never wins; if every cosine is NULL the cell falls back to the
  * lowest cid with a NULL ccos). Exactly the semantics of the
  * `array_min((−cos, cid) structs)` formulation it replaces in
  * `Vec.argminAssignWith`, and of the DuckDB oracle's
  * `ROW_NUMBER() OVER (ORDER BY ccos DESC, cid)`.
  *
  * Why an Expression and not the struct-array spelling: with k
  * centroids × d dims the composed version is a ~k·d-node tree carrying
  * k array literals. It computes fine, but any Filter above an alias of
  * it sends the optimizer's constraint propagation into minutes of
  * driver time (measured: 113 s at sf0.01 for q_embed_outliers, 10 s
  * with constraints disabled) and the tree re-plans per AQE stage. As a
  * single node with the centroids as a flat reference object, the plan
  * is O(1) in k·d: the same query optimizes in milliseconds. Cosine
  * arithmetic is bit-identical to the composed form: exact long dot,
  * `Math.sqrt` norms, one double division.
  *
  * Children: (qe ARRAY<BIGINT>, nrm BIGINT); centroids ride along as
  * `cids`/flat `cents`/`cnorms` reference arrays, cid-ascending.
  */
case class ArgminCosine(left: Expression, right: Expression,
    cids: Array[Long], cents: Array[Long], cnorms: Array[Long])
    extends BinaryExpression {
  require(cids.nonEmpty && cents.length % cids.length == 0 &&
    cnorms.length == cids.length,
    s"inconsistent centroid arrays: ${cids.length} cids, " +
      s"${cents.length} components, ${cnorms.length} norms")

  private val c = cids.length
  private val d = cents.length / cids.length

  override def dataType: DataType = StructType(Seq(
    StructField("cell", LongType, nullable = false),
    StructField("ccos", DoubleType, nullable = true)))
  override def prettyName: String = "argmin_cos"
  // a NULL input vector still assigns (all cosines NULL → lowest cid),
  // matching the composed form where coalesce(−cos, +∞) absorbed NULLs
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
      case (ArrayType(NullType, _), LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<BIGINT>, BIGINT), got ${l.sql} / ${r.sql}")
    }

  private lazy val sqrtCnorms: Array[Double] =
    cnorms.map(n => Math.sqrt(n.toDouble))

  // content-based equality: case-class equals on Array fields is
  // reference-based, which would defeat semanticEquals / subexpression
  // elimination / exchange reuse for two calls built from equal centroid
  // seqs
  override def equals(other: Any): Boolean = other match {
    case a: ArgminCosine =>
      left == a.left && right == a.right &&
        java.util.Arrays.equals(cids, a.cids) &&
        java.util.Arrays.equals(cents, a.cents) &&
        java.util.Arrays.equals(cnorms, a.cnorms)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(left, right,
      Int.box(java.util.Arrays.hashCode(cids)),
      Int.box(java.util.Arrays.hashCode(cents)),
      Int.box(java.util.Arrays.hashCode(cnorms)))

  override def eval(input: InternalRow): Any = {
    val qeRaw = left.eval(input)
    val nrmRaw = right.eval(input)
    var bestCid = cids(0)
    var bestCos = 0.0
    var have = false
    if (qeRaw != null && nrmRaw != null) {
      val qe = qeRaw.asInstanceOf[ArrayData]
      val nrm = nrmRaw.asInstanceOf[Long]
      if (qe.numElements() == d) {
        val sqrtNrm = Math.sqrt(nrm.toDouble)
        var k = 0
        var bad = false
        while (k < c && !bad) {
          val denom = sqrtNrm * sqrtCnorms(k)
          if (denom != 0.0) {
            var acc = 0L
            var i = 0
            while (i < d && !bad) {
              if (qe.isNullAt(i)) bad = true
              else { acc += qe.getLong(i) * cents(k * d + i); i += 1 }
            }
            if (!bad) {
              val cos = acc.toDouble / denom
              if (!have || cos > bestCos) { have = true; bestCos = cos; bestCid = cids(k) }
            }
          }
          k += 1
        }
        if (bad) { have = false; bestCid = cids(0) }
      }
    }
    InternalRow(bestCid, if (have) bestCos else null)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cidsRef = ctx.addReferenceObj("amCids", cids, "long[]")
    val centsRef = ctx.addReferenceObj("amCents", cents, "long[]")
    val sqrtRef = ctx.addReferenceObj("amSqrtNorms", sqrtCnorms, "double[]")
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val bestCid = ctx.freshName("bestCid")
    val bestCos = ctx.freshName("bestCos")
    val have = ctx.freshName("have")
    val bad = ctx.freshName("bad")
    val sqrtNrm = ctx.freshName("sqrtNrm")
    val k = ctx.freshName("k")
    val i = ctx.freshName("i")
    val acc = ctx.freshName("acc")
    val denom = ctx.freshName("denom")
    val cos = ctx.freshName("cos")
    val code =
      code"""
        |${l.code}
        |${r.code}
        |long $bestCid = $cidsRef[0];
        |double $bestCos = 0.0;
        |boolean $have = false;
        |if (!${l.isNull} && !${r.isNull} && ${l.value}.numElements() == $d) {
        |  double $sqrtNrm = Math.sqrt((double) ${r.value});
        |  boolean $bad = false;
        |  for (int $k = 0; $k < $c && !$bad; $k++) {
        |    double $denom = $sqrtNrm * $sqrtRef[$k];
        |    if ($denom != 0.0) {
        |      long $acc = 0L;
        |      for (int $i = 0; $i < $d && !$bad; $i++) {
        |        if (${l.value}.isNullAt($i)) { $bad = true; }
        |        else { $acc += ${l.value}.getLong($i) * $centsRef[$k * $d + $i]; }
        |      }
        |      if (!$bad) {
        |        double $cos = ((double) $acc) / $denom;
        |        if (!$have || $cos > $bestCos) {
        |          $have = true; $bestCos = $cos; $bestCid = $cidsRef[$k];
        |        }
        |      }
        |    }
        |  }
        |  if ($bad) { $have = false; $bestCid = $cidsRef[0]; }
        |}
        |InternalRow ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        |  new Object[] { (Object) java.lang.Long.valueOf($bestCid),
        |    $have ? (Object) java.lang.Double.valueOf($bestCos) : null });
       """.stripMargin
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArgminCosine =
    copy(left = newLeft, right = newRight)
}
