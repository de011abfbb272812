package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.math.BigDecimal.RoundingMode
import scala.util.Random

/** Randomized equivalence sweep for the fused [[Bm25MergeTopK]] node:
  * the O(n) hash merge + bounded top-k must equal a plain-Scala
  * reference (group by doc, decimal(18,6)-exact sum, sort by (score
  * DESC, doc_id ASC), take k) across random member arrays — duplicate
  * docs, negative addends, score ties (doc_id break), k overshoot,
  * empty arrays — in any element order (the decimal sum is
  * order-free).
  */
class Bm25MergeTopKSpec extends SparkSpec {
  import spark.implicits._

  private def ref(members: Seq[(Long, Double)],
      k: Int): Seq[(Long, Double)] =
    members.groupBy(_._1).view.mapValues { xs =>
      xs.map(x => BigDecimal(x._2).setScale(6, RoundingMode.HALF_UP))
        .sum.toDouble
    }.toSeq
      .sortBy { case (doc, score) => (-score, doc) }
      .take(k)

  private def run(members: Seq[(Long, Double)],
      k: Int): Seq[(Long, Double)] = {
    GraftFunctions.register(spark)
    val df = Seq(Tuple1(members)).toDF("members")
      .select(GraftFunctions.bm25MergeTopK(
        col("members").cast("array<struct<doc_id:bigint,addend:double>>"),
        k).as("top"))
    df.select(explode(col("top")).as("e"))
      .select(col("e.doc_id"), col("e.score"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
  }

  test("fused merge equals the Scala reference over 60 random shapes") {
    val rnd = new Random(4242)
    for (trial <- 1 to 60) {
      val nDocs = 1 + rnd.nextInt(12)
      val n = rnd.nextInt(40)
      val members = Seq.fill(n)((rnd.nextInt(nDocs).toLong,
        // mix magnitudes incl. values that collide after scale-6
        // rounding (tie-break coverage) and negatives
        (rnd.nextInt(2000) - 1000) / 7.0))
      val k = 1 + rnd.nextInt(6)
      val got = run(members, k)
      val want = ref(members, k)
      assert(got == want, s"trial $trial members=$members k=$k " +
        s"got=$got want=$want")
    }
  }

  test("ordered output: ranks are the array positions, ties break on " +
    "doc_id, k overshoot returns all docs") {
    // two docs with EXACTLY equal sums → lower doc_id first
    val members = Seq((7L, 1.5), (3L, 1.0), (3L, 0.5))
    assert(run(members, 5) == Seq((3L, 1.5), (7L, 1.5)))
    assert(run(Seq.empty, 3).isEmpty)
  }

  test("k is validated; NULL members array yields an empty result") {
    val e = intercept[Exception] { run(Seq((1L, 1.0)), 0) }
    assert(e.getMessage.contains("k must be"))
    GraftFunctions.register(spark)
    val out = Seq(Tuple1(Option.empty[Seq[(Long, Double)]]))
      .toDF("members")
      .select(GraftFunctions.bm25MergeTopK(
        col("members").cast("array<struct<doc_id:bigint,addend:double>>"),
        3).as("top"))
      .select(size(col("top"))).collect().head.getInt(0)
    assert(out == 0)
  }
}
