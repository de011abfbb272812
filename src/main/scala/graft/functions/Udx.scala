package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

/** The user-function surface the reference exposes through
  * `CREATE FUNCTION name AS 'class'` + UDF jars (`SqlCommand.java:32-34`,
  * `docs/manual-sql.md:102-119`): scalar UDF, typed UDAF (Aggregator),
  * and table function (UDTF), with gate-level registration by class name.
  */
object Udx {

  /** Scalar UDF example mirroring the doc's `jsonHasKey` UDF
    * (`docs/manual-sql.md:112`): here string-normalizing.
    */
  val normalize: String => String = s =>
    if (s == null) null else s.trim.toLowerCase.replaceAll("\\s+", " ")

  /** Typed UDAF: exact decimal sum of doubles — same determinism contract
    * as graft.Num, as an Aggregator (the Spark UDAF idiom).
    */
  class DecimalSum extends Aggregator[Double, java.math.BigDecimal, Double] {
    private def bd(x: Double) =
      new java.math.BigDecimal(x).setScale(2, java.math.RoundingMode.HALF_UP)
    def zero: java.math.BigDecimal = java.math.BigDecimal.ZERO
    def reduce(b: java.math.BigDecimal, a: Double): java.math.BigDecimal =
      b.add(bd(a))
    def merge(x: java.math.BigDecimal, y: java.math.BigDecimal): java.math.BigDecimal =
      x.add(y)
    def finish(b: java.math.BigDecimal): Double = b.doubleValue
    def bufferEncoder: Encoder[java.math.BigDecimal] = Encoders.DECIMAL
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** "UDTF": Spark's idiom is a generator column — explode over an
    * array-producing expression. Word n-gram table function used by the
    * gate registration below.
    */
  val ngrams: (String, Int) => Array[String] = (text, n) => {
    if (text == null) Array.empty
    else {
      val w = text.split(" ")
      (0 to w.length - n).map(i => w.slice(i, i + n).mkString(" ")).toArray
    }
  }

  /** Gate-level `CREATE FUNCTION name AS 'class'` support: resolve a
    * class name to a registration. Built-in names cover the shipped
    * examples; any other class is loaded reflectively and must be a
    * `java.util.function.Function[String, String]` (the doc's scalar-UDF
    * contract).
    */
  def registerByClass(spark: SparkSession, name: String, className: String): Unit =
    className match {
      case "graft.functions.Normalize" =>
        spark.udf.register(name, normalize)
      case "graft.functions.DecimalSum" =>
        spark.udf.register(name,
          org.apache.spark.sql.functions.udaf(new DecimalSum))
      case "graft.functions.NGrams" =>
        spark.udf.register(name, ngrams)
      case other =>
        val f = Class.forName(other).getDeclaredConstructor().newInstance()
          .asInstanceOf[java.util.function.Function[String, String]]
        spark.udf.register(name, (s: String) => f.apply(s))
    }
}
