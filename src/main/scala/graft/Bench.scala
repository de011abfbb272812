package graft
import org.apache.spark.sql.SparkSession
import scala.collection.immutable.ListMap

/** Benchmark main: times every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. Failures are recorded explicitly (value -1 plus an
  * "errors" map) so a crashed query can never masquerade as a fast one.
  * Each query runs once untimed (JVM/codegen warm-up), then timed — the
  * steady-state number is what a long-running cluster job would see.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val ordered = ListMap(SparkEntry.queries.toSeq.sortBy(_._1): _*)
    // warm-up pass: JIT + codegen + file-footer caches
    ordered.foreach { case (name, fn) =>
      try fn(spark, sfDir).count()
      catch { case e: Throwable => errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200) }
    }
    val results = ordered.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
      catch { case e: Throwable =>
        errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200); false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    val qs = results.map { case (k, v) => jstr(k) + ":" + v }.mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => jstr(k) + ":" + jstr(v) }.mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"n_failed":${errors.size},"sf":"$sfDir"}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(3)
  }
}
