package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** 60-bit SimHash from an array of 60-bit token hashes, as one codegen'd
  * native expression: per-bit majority vote (bit set iff strictly more
  * than half the tokens have it set — ties clear, matching the oracle's
  * `2*popcount > n`). Fusing the 60-bit × n-token loop into generated
  * Java replaces either a 60-buffer hash aggregation over exploded tokens
  * or 60 interpreted higher-order `aggregate` lambdas per row — both an
  * order of magnitude slower on wide corpora (BENCH history).
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case ArrayType(org.apache.spark.sql.types.NullType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT>, got ${t.sql}")
  }

  // a NULL token hash nulls the signature (SQL conformance), rather than
  // being silently read as hash 0
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](60)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val h = arr.getLong(i)
      var b = 0
      while (b < 60) { counts(b) += ((h >>> b) & 1L).toInt; b += 1 }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < 60) { if (2 * counts(b) > n) sim |= 1L << b; b += 1 }
    sim
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val sim = ctx.freshName("sim")
      s"""
         |int $n = $a.numElements();
         |int[] $counts = new int[60];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  long $h = $a.getLong($i);
         |  for (int $b = 0; $b < 60; $b++) {
         |    $counts[$b] += (int) (($h >>> $b) & 1L);
         |  }
         |}
         |if (!${ev.isNull}) {
         |  long $sim = 0L;
         |  for (int $b = 0; $b < 60; $b++) {
         |    if (2 * $counts[$b] > $n) $sim |= 1L << $b;
         |  }
         |  ${ev.value} = $sim;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}
