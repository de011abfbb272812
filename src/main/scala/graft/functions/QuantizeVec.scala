package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Integer quantization of a float/double embedding:
  * `floor(x * 10^6 + 0.5)` per element, exact in IEEE doubles — the
  * fused equivalent of `transform(c, x => floor(x.cast("double") * 1e6 +
  * 0.5))`, the last interpreted per-element lambda in the similarity
  * pipelines (every quantized vector then flows into [[LongDotProduct]]).
  * Null elements stay null (transform semantics); a null array is null.
  */
case class QuantizeVec(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "quant_vec"

  private lazy val fromFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(org.apache.spark.sql.types.NullType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT|DOUBLE>, got ${t.sql}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val x = if (fromFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        out(i) = math.floor(x * 1000000.0 + 0.5).toLong
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      val x = ctx.freshName("x")
      val get = if (fromFloat) s"(double) $a.getFloat($i)"
        else s"$a.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |Object[] $out = new Object[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    double $x = $get;
         |    $out[$i] = (long) Math.floor($x * 1000000.0 + 0.5);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): QuantizeVec =
    copy(child = newChild)
}
