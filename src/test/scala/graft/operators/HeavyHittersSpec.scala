package graft.operators

import scala.util.Random

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{GraftFunctions, MgSummary}

/** The Misra-Gries summary's guarantee and the exact-top-k operator
  * built on it. Property style: the sketch invariants are checked
  * against brute-force counts on seeded random streams, including
  * arbitrary partition splits re-merged in arbitrary order (the shape
  * Spark's partial/final aggregation produces).
  */
class HeavyHittersSpec extends SparkSpec {

  private def brute(xs: Seq[Long]): Map[Long, Long] =
    xs.groupBy(identity).map { case (k, v) => k -> v.length.toLong }

  test("MG invariant: est <= true <= est + dropped, missed <= dropped") {
    val rnd = new Random(42)
    for (trial <- 1 to 20) {
      val universe = 1 + rnd.nextInt(400)
      val n = 500 + rnd.nextInt(5000)
      // Zipf-ish skew: square a uniform draw
      val xs = Seq.fill(n) {
        val u = rnd.nextDouble(); (u * u * universe).toLong
      }
      val cap = 1 + rnd.nextInt(64)
      val mg = new MgSummary(cap)
      xs.foreach(x => mg.add(x))
      val exact = brute(xs)
      assert(mg.counts.size <= cap)
      assert(mg.dropped <= n / (cap + 1), s"trial $trial")
      mg.counts.foreach { case (k, est) =>
        val t = exact(k.asInstanceOf[Long])
        assert(est <= t && t <= est + mg.dropped, s"trial $trial key $k")
      }
      exact.foreach { case (k, t) =>
        if (!mg.counts.contains(k))
          assert(t <= mg.dropped, s"trial $trial missed key $k count $t")
      }
    }
  }

  test("MG merge preserves the invariant under arbitrary splits") {
    val rnd = new Random(7)
    for (trial <- 1 to 15) {
      val xs = Seq.fill(3000)((rnd.nextDouble() * rnd.nextDouble() * 200).toLong)
      val cap = 2 + rnd.nextInt(48)
      val nSplits = 1 + rnd.nextInt(8)
      val parts = xs.grouped(math.max(1, xs.size / nSplits)).toSeq
      val summaries = parts.map { p =>
        val m = new MgSummary(cap); p.foreach(m.add); m
      }
      val merged = new MgSummary(cap)
      rnd.shuffle(summaries).foreach(merged.mergeIn)
      val exact = brute(xs)
      assert(merged.counts.size <= cap)
      assert(merged.dropped <= xs.size / (cap + 1), s"trial $trial")
      merged.counts.foreach { case (k, est) =>
        val t = exact(k.asInstanceOf[Long])
        assert(est <= t && t <= est + merged.dropped, s"trial $trial")
      }
      exact.foreach { case (k, t) =>
        if (!merged.counts.contains(k)) assert(t <= merged.dropped)
      }
    }
  }

  test("heavy_hitters aggregate matches the plain-Scala summary semantics") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val xs = (1 to 2000).map(i => (i * i) % 37L) // deterministic skew
    // any partitioning must yield a VALID summary (entries, bounds);
    // the exact operator on top is what must be partition-invariant
    for (parts <- Seq(1, 3, 17)) {
      val df = xs.toDF("k").repartition(parts)
      val row = df.agg(GraftFunctions.heavyHitters($"k", 16).as("sk")).head()
      val entries = row.getSeq[Row](0)
      assert(entries.nonEmpty && entries.size <= 16)
      val dropped = entries.head.getLong(2)
      assert(dropped <= xs.size / 17)
      val exact = brute(xs.map(_.toLong))
      entries.foreach { e =>
        val (k, est) = (e.getLong(0), e.getLong(1))
        assert(est <= exact(k) && exact(k) <= est + dropped)
      }
      // sorted est desc, key asc
      val ests = entries.map(e => (-e.getLong(1), e.getLong(0)))
      assert(ests == ests.sorted)
    }
  }

  test("heavy_hitters supports string keys and skips nulls") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq("a", "b", "a", null, "c", "a", "b").toDF("k")
    val entries = df.agg(GraftFunctions.heavyHitters($"k", 8).as("sk"))
      .head().getSeq[Row](0)
    assert(entries.map(e => (e.getString(0), e.getLong(1))) ==
      Seq(("a", 3L), ("b", 2L), ("c", 1L)))
  }

  test("exactTopK equals full groupBy on skewed AND near-uniform data") {
    import spark.implicits._
    val rnd = new Random(11)
    val skewed = Seq.fill(4000)(
      if (rnd.nextDouble() < 0.7) rnd.nextInt(3).toLong
      else 100L + rnd.nextInt(500))
    val uniform = Seq.fill(4000)(rnd.nextInt(300).toLong) // forces fallback
    for ((data, label) <- Seq((skewed, "skewed"), (uniform, "uniform"))) {
      val df = data.toDF("k").repartition(8)
      val got = HeavyHitters.exactTopK(df, "k", k = 5, capacity = 32)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val want = df.groupBy($"k").agg(count(lit(1)).as("cnt"))
        .orderBy($"cnt".desc, $"k").limit(5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got == want, label)
    }
  }

  test("large candidate sets route through the broadcast semi-join, " +
    "not a planner-stalling In-list") {
    import spark.implicits._
    // > 1024 candidates forces the join path; the answer must still be
    // the exact top-k (the summary here nominates EVERY key, dropped=0)
    val data = Seq.tabulate(6000)(i => (i % 1500).toLong) ++
      Seq.fill(50)(3L) ++ Seq.fill(30)(7L)
    val df = data.toDF("k").repartition(8)
    val cands: Seq[Any] = (0L until 1500L)
    val got = HeavyHitters.exactTopKFromSummary(df, "k", 4, cands, 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = df.groupBy($"k").agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"k").limit(4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want)
    // string keys take the same path (type-generic candidate frame)
    val sdf = (data.map(v => s"k$v") ++ Seq("z", "z", "z")).toDF("k")
    val sGot = HeavyHitters.exactTopKFromSummary(
      sdf, "k", 3, (0L until 1500L).map(v => s"k$v") :+ "z", 0L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val sWant = sdf.groupBy($"k").agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"k").limit(3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(sGot == sWant)
  }

  test("exactTopK is partition-invariant and handles tiny inputs") {
    import spark.implicits._
    val df1 = Seq(1L, 1L, 2L).toDF("k")
    val top = HeavyHitters.exactTopK(df1, "k", k = 5, capacity = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(top == Seq((1L, 2L), (2L, 1L)))
    val empty = HeavyHitters.exactTopK(df1.limit(0), "k", 3, 8)
    assert(empty.count() == 0)
    val a = HeavyHitters.exactTopK(
      Seq.tabulate(1000)(i => (i % 7).toLong).toDF("k").repartition(2),
      "k", 3, 16).collect().toSeq
    val b = HeavyHitters.exactTopK(
      Seq.tabulate(1000)(i => (i % 7).toLong).toDF("k").repartition(13),
      "k", 3, 16).collect().toSeq
    assert(a == b)
  }
}
