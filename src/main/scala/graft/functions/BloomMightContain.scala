package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd Bloom-filter membership probe over a BROADCAST sketch —
  * the native-expression replacement for the boolean UDF a bloom
  * pre-filter otherwise needs (Spark's own `BloomFilterMightContain` is
  * internal to its runtime-filter rewrite and not constructible from
  * user code). The filter rides an ordinary `Broadcast` handle: the plan
  * serializes the handle, not the bits, so a multi-MB sketch costs the
  * plan nothing (a literal-embedded filter would bloat every task
  * binary), and executors fetch it once per JVM like any broadcast.
  *
  * Hashing matches the sketch library's own string path byte-for-byte:
  * `mightContainString(s)` is defined as `mightContainBinary(utf8(s))`,
  * and `UTF8String.getBytes` IS those bytes — so a probe through this
  * expression admits exactly the same might-contain set as the
  * driver-side `bloom.mightContain(string)` call sites. NULL input →
  * NULL out (standard unary-expression null semantics).
  *
  * This is a PRE-filter primitive: a true return means "might be
  * present" (false-positive rate set at build time), false means
  * "definitely absent". Callers that need exactness re-verify the true
  * branch with a join — the false branch is safe to skip outright.
  */
case class BloomMightContain(child: Expression, bloom: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING or BINARY input, got ${other.sql}")
  }

  private lazy val isString = child.dataType == StringType

  override protected def nullSafeEval(v: Any): Any =
    if (isString)
      bloom.value.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)
    else bloom.value.mightContainBinary(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the broadcast handle is a reference object on the generated class;
    // .value() resolves to the executor-local sketch (one fetch per JVM)
    val ref = ctx.addReferenceObj("bloomBc", bloom,
      classOf[Broadcast[_]].getName)
    val bf = classOf[BloomFilter].getName
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = if (isString) s"$c.getBytes()" else c
      s"${ev.value} = (($bf) $ref.value()).mightContainBinary($bytes);"
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContain = copy(child = newChild)
}

object BloomMightContain {
  /** Column form ([[BloomMightContain]]); not registry-registered — a
    * broadcast handle has no SQL-literal spelling, so the probe is a
    * library-level primitive.
    */
  def apply(c: Column, bloom: Broadcast[BloomFilter]): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      new BloomMightContain(
        org.apache.spark.sql.GraftSqlBridge.expression(c), bloom))
}
