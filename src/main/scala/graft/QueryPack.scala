package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** A named group of oracle-checked queries. SparkEntry unions all packs. */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]

  /** DuckDB-dialect SQL equivalent per query key. Keys absent here get the
    * driver's weaker rows-only check (used for ops not SQL-expressible).
    */
  def oracleSql: Map[String, String]
}

/** Determinism helpers shared by all packs.
  *
  * The driver hash-compares our parquet output against DuckDB's result, so
  * floating-point aggregates must be BIT-equal, not just close. Summation
  * order differs between engines, so:
  *   - per-row double arithmetic is fine (IEEE, order-free),
  *   - any SUM over doubles goes through an exact DECIMAL cast first,
  *     then back to DOUBLE (decimal->double conversion is deterministic).
  * Residual risk: the engines' rounding-mode difference (HALF_UP vs
  * HALF_EVEN) fires only when a double sits EXACTLY on a decimal .5
  * boundary. Such doubles exist (dyadic halves like 1/128 = 0.0078125 at
  * scale 6, 1/8 = 0.125 at scale 2) but require a value with ≤7
  * fractional mantissa bits — essentially impossible for products of
  * 2-decimal business data, and none occur in the test corpus. If a
  * future dataset trips it, switch the cast to RoundingMode-explicit
  * expressions on both sides.
  */
object Num {
  private val dec2 = DecimalType(18, 2)
  private val dec6 = DecimalType(18, 6)

  /** Exact SUM of a 2-decimal-place-ish double column, returned as DOUBLE. */
  def dsum2(c: Column): Column = sum(c.cast(dec2)).cast("double")

  /** Exact SUM of a computed double expression, returned as DOUBLE. */
  def dsum6(c: Column): Column = sum(c.cast(dec6)).cast("double")

  /** Deterministic AVG: exact decimal sum, double division by count. */
  def davg2(c: Column): Column = dsum2(c) / count(c)

  /** Exact windowed running SUM of a 2-dp double column, as DOUBLE. */
  def dwin2(c: Column, w: org.apache.spark.sql.expressions.WindowSpec): Column =
    sum(c.cast(dec2)).over(w).cast("double")

  /** Exact SUM of squares of a 2-dp double column (decimal×decimal is
    * exact; (18,2)×(18,2)→(37,4) stays within Spark's 38-digit cap).
    */
  def dsumsq(c: Column): Column = sum(c.cast(dec2) * c.cast(dec2)).cast("double")

  /** Matching DuckDB SQL fragments. */
  def oSum2(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,2))) AS DOUBLE)"
  def oSum6(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,6))) AS DOUBLE)"
  def oAvg2(expr: String): String = s"${oSum2(expr)} / COUNT($expr)"
  def oWin2(expr: String, over: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,2))) OVER ($over) AS DOUBLE)"
  def oSumSq(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,2)) * CAST($expr AS DECIMAL(18,2))) AS DOUBLE)"
}
