package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Product-quantization encode of a quantized BIGINT vector: for each of
  * `m` subspaces of `d` dims, the index of the integer-L2²-nearest of `c`
  * codewords (ties to the lowest index, matching an `ORDER BY dist, cid`
  * argmin). The codebook rides along as a flattened `long[m*c*d]`
  * reference object, and the generated code is a three-deep loop — the
  * expression-tree formulation of the same argmin (m·c·d squared-diff
  * terms, ≈4k nodes at the 8×64×8 default) exceeds janino's 64 KB method
  * limit and silently falls back to interpreted eval, which is exactly
  * the failure this fused expression removes from the encode pass.
  *
  * A null element or a vector whose length ≠ m·d yields NULL (the
  * LongDotProduct convention: never silently truncate).
  */
case class PqEncode(child: Expression, codebook: Array[Long],
    m: Int, c: Int, d: Int) extends UnaryExpression {
  require(codebook.length == m * c * d,
    s"codebook length ${codebook.length} != $m*$c*$d")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_encode"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case ArrayType(org.apache.spark.sql.types.NullType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT>, got ${t.sql}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    if (vec.numElements() != m * d) return null
    val codes = new Array[Long](m)
    var sub = 0
    while (sub < m) {
      var best = -1L
      var bestDist = Long.MaxValue
      var cw = 0
      while (cw < c) {
        var dist = 0L
        var i = 0
        while (i < d) {
          if (vec.isNullAt(sub * d + i)) return null
          val diff = vec.getLong(sub * d + i) - codebook((sub * c + cw) * d + i)
          dist += diff * diff
          i += 1
        }
        if (dist < bestDist) { bestDist = dist; best = cw }
        cw += 1
      }
      codes(sub) = best
      sub += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cb = ctx.addReferenceObj("pqCodebook", codebook, "long[]")
      val codes = ctx.freshName("codes")
      val sub = ctx.freshName("sub")
      val cw = ctx.freshName("cw")
      val i = ctx.freshName("i")
      val best = ctx.freshName("best")
      val bestDist = ctx.freshName("bestDist")
      val dist = ctx.freshName("dist")
      val diff = ctx.freshName("diff")
      s"""
         |if ($a.numElements() != ${m * d}) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $codes = new long[$m];
         |  outer: for (int $sub = 0; $sub < $m; $sub++) {
         |    long $best = -1L;
         |    long $bestDist = Long.MAX_VALUE;
         |    for (int $cw = 0; $cw < $c; $cw++) {
         |      long $dist = 0L;
         |      for (int $i = 0; $i < $d; $i++) {
         |        if ($a.isNullAt($sub * $d + $i)) { ${ev.isNull} = true; break outer; }
         |        long $diff = $a.getLong($sub * $d + $i) - $cb[($sub * $c + $cw) * $d + $i];
         |        $dist += $diff * $diff;
         |      }
         |      if ($dist < $bestDist) { $bestDist = $dist; $best = $cw; }
         |    }
         |    $codes[$sub] = $best;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}
