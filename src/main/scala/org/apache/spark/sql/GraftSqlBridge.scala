package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the classic Column ⇄ Expression converters, which are
  * `private[sql]` in Spark 4. The public path for custom expressions is
  * the function registry (`call_function`), and graft uses it everywhere
  * an expression's arguments are columns and literals — but an
  * expression that carries a RUNTIME OBJECT with no literal spelling
  * (e.g. [[graft.functions.BloomMightContain]]'s `Broadcast[BloomFilter]`
  * handle) cannot be built by a registry closure without leaking one
  * registry entry per filter. This is the same package-level bridge
  * every Spark extension library ships for that case; nothing here
  * touches non-public BEHAVIOR — it only converts between the two
  * public-facing types.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
