package graft.functions

import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{Add, Literal}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Compile-time + runtime pin of the `classic.ExpressionUtils` bridge
  * (see GraftSqlBridge's VERSION PIN note): if a Spark upgrade moves or
  * re-scopes the converters, this spec fails the build loudly instead
  * of letting the seam break silently at runtime.
  */
class GraftSqlBridgeSpec extends SparkSpec {

  test("expression→column wraps a raw Catalyst expression usable in a plan") {
    val col = GraftSqlBridge.column(Add(Literal(40L), Literal(2L)))
    val out = spark.range(1).select(col.as("v")).head().getLong(0)
    assert(out == 42L)
  }

  test("column→expression→column round-trips through a real plan") {
    import spark.implicits._
    val c = GraftSqlBridge.column(GraftSqlBridge.expression(lit(7) * lit(6)))
    val out = Seq(1).toDF("x").select(c.as("v")).head().getInt(0)
    assert(out == 42)
  }
}
