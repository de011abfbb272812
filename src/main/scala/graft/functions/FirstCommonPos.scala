package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, IntegerType, LongType, ShortType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 1-based position in `b` of the FIRST element of `b` that is present
  * among the first `alim` elements of `a`; NULL when the two slices
  * share nothing. One hash-set build over the `a`-slice plus one
  * early-exit scan of `b` — O(alim + |b|).
  *
  * Replaces the row-local pair-dedup / positional-cut anchors of the
  * streaming Jaccard kernel, which were phrased as higher-order
  * `filter(b, t => array_position(a, t) <= alim)` lambdas: those are
  * interpreted (no codegen) AND O(|a|·|b|) per row, which at stressed
  * ×10 document length (|ss| ≈ 550, prefix ≈ 220) is ~1.2·10⁵ string
  * scans per candidate row — measured as a 540 s+ hang on the sf0.1
  * long-doc stress cell where this fused probe pass runs in seconds.
  * Semantics are identical: arrays are element-distinct at every call
  * site, so "first element of b whose position in a is ≤ alim" is
  * exactly "first element of b contained in the alim-prefix of a".
  */
case class FirstCommonPos(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "first_common_pos"

  override def checkInputDataTypes(): TypeCheckResult = {
    val arrOk = Seq(first, second).forall(_.dataType match {
      case ArrayType(StringType, _) => true
      case ArrayType(org.apache.spark.sql.types.NullType, _) => true
      case _ => false
    })
    val limOk = third.dataType match {
      case IntegerType | LongType | ShortType | ByteType => true
      case _ => false
    }
    if (arrOk && limOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (ARRAY<STRING>, ARRAY<STRING>, INTEGRAL), " +
        s"got ${first.dataType.sql} / ${second.dataType.sql} / " +
        third.dataType.sql)
  }

  // no shared element → NULL (mirrors element_at(filter(...), 1) on an
  // empty filter result, which is what this expression replaces)
  override def nullable: Boolean = true

  private def limOf(l: Any): Long = l match {
    case n: java.lang.Integer => n.longValue
    case n: java.lang.Long => n.longValue
    case n: java.lang.Short => n.longValue
    case n: java.lang.Byte => n.longValue
    case other => throw new IllegalStateException(
      s"$prettyName: non-integral limit $other")
  }

  override protected def nullSafeEval(a: Any, b: Any, l: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lim = math.min(limOf(l), x.numElements().toLong).toInt
    val set = new java.util.HashSet[UTF8String](math.max(lim * 2, 4))
    var i = 0
    while (i < lim) {
      if (!x.isNullAt(i)) set.add(x.getUTF8String(i))
      i += 1
    }
    var j = 0
    while (j < y.numElements()) {
      if (!y.isNullAt(j) && set.contains(y.getUTF8String(j))) return j + 1
      j += 1
    }
    null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, l) => {
      val utf8 = classOf[UTF8String].getName
      val set = ctx.freshName("set")
      val lim = ctx.freshName("lim")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      s"""
         |int $lim = (int) java.lang.Math.min((long) $l,
         |  (long) $a.numElements());
         |java.util.HashSet<$utf8> $set =
         |  new java.util.HashSet<$utf8>(java.lang.Math.max($lim * 2, 4));
         |for (int $i = 0; $i < $lim; $i++) {
         |  if (!$a.isNullAt($i)) $set.add($a.getUTF8String($i));
         |}
         |${ev.isNull} = true;
         |for (int $j = 0; $j < $b.numElements(); $j++) {
         |  if (!$b.isNullAt($j) && $set.contains($b.getUTF8String($j))) {
         |    ${ev.isNull} = false;
         |    ${ev.value} = $j + 1;
         |    break;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): FirstCommonPos =
    copy(first = newFirst, second = newSecond, third = newThird)
}
