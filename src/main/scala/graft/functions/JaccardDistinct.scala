package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaccard similarity of two string arrays that are already
  * element-distinct (every dedup call site builds them with
  * `array_distinct`): |a ∩ b| by one hash probe pass, |a ∪ b| =
  * |a| + |b| − |a ∩ b|. Count-only — the composable
  * `size(array_intersect)/size(array_union)` formulation materializes
  * two intermediate arrays per pair, pure overhead when only the ratio
  * is consumed, and the all-pairs verification shapes evaluate this
  * millions of times. Identical arithmetic to the DuckDB mirror
  * (`len(list_intersect)/len(list_distinct(list_concat))`), so oracle
  * results are unchanged.
  */
case class JaccardDistinct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_distinct"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(StringType, _) => true
      case ArrayType(org.apache.spark.sql.types.NullType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING> inputs, " +
        s"got ${left.dataType.sql} / ${right.dataType.sql}")
  }

  // two empty sets have an empty union: 0/0 is NULL (matches the
  // composable formulation under ANSI nullif guards and DuckDB's NULL
  // division)
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val set = new java.util.HashSet[UTF8String](x.numElements() * 2)
    var i = 0
    while (i < x.numElements()) {
      if (!x.isNullAt(i)) set.add(x.getUTF8String(i))
      i += 1
    }
    var inter = 0
    var j = 0
    while (j < y.numElements()) {
      if (!y.isNullAt(j) && set.contains(y.getUTF8String(j))) inter += 1
      j += 1
    }
    val union = x.numElements() + y.numElements() - inter
    if (union == 0) null else inter.toDouble / union
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val utf8 = classOf[UTF8String].getName
      val set = ctx.freshName("set")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val inter = ctx.freshName("inter")
      val union = ctx.freshName("union")
      s"""
         |java.util.HashSet<$utf8> $set =
         |  new java.util.HashSet<$utf8>($a.numElements() * 2);
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  if (!$a.isNullAt($i)) $set.add($a.getUTF8String($i));
         |}
         |int $inter = 0;
         |for (int $j = 0; $j < $b.numElements(); $j++) {
         |  if (!$b.isNullAt($j) && $set.contains($b.getUTF8String($j))) $inter++;
         |}
         |int $union = $a.numElements() + $b.numElements() - $inter;
         |if ($union == 0) { ${ev.isNull} = true; }
         |else { ${ev.value} = (double) $inter / $union; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardDistinct =
    copy(left = newLeft, right = newRight)
}
