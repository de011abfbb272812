package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Scaled-integer PageRank ([[PageRank]]): hand-computed ranks on small
  * graphs pin the exact arithmetic the DuckDB oracle replays (two
  * truncating divisions per iteration), multiplicity and dangling-mass
  * semantics, and the floor every node keeps.
  */
class PageRankSpec extends SparkSpec {

  private val Scale = 1000000L
  private val Base = Scale * 15 / 100 // 150000

  private def ranks(edges: Seq[(String, String)], iters: Int)
      : Map[String, Long] = {
    import spark.implicits._
    PageRank(edges.toDF("src", "dst"), iters, scale = Scale)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("two iterations on a → b, a → c, b → c match hand arithmetic") {
    // iter1: contrib(b) = 1e6 div 2 = 500000; contrib(c) = 500000 + 1e6
    // r1: a = 150000; b = 150000 + 85*500000 div 100 = 575000;
    //     c = 150000 + 85*1500000 div 100 = 1425000
    // iter2: contrib(b) = 150000 div 2 = 75000;
    //        contrib(c) = 75000 + 575000 = 650000
    // r2: b = 150000 + 85*75000 div 100 = 213750;
    //     c = 150000 + 85*650000 div 100 = 702500
    val r = ranks(Seq("a" -> "b", "a" -> "c", "b" -> "c"), 2)
    assert(r === Map("a" -> Base, "b" -> 213750L, "c" -> 702500L))
  }

  test("duplicate edges are multiplicity: outdeg counts them and the " +
    "contribution multiplies") {
    // a → b twice, a → c once: outdeg(a) = 3, each unit share is
    // 1e6 div 3 = 333333 (truncated), b receives 2 shares
    val r = ranks(Seq("a" -> "b", "a" -> "b", "a" -> "c"), 1)
    assert(r("b") === Base + 85L * (2 * 333333L) / 100)
    assert(r("c") === Base + 85L * 333333L / 100)
  }

  test("dangling nodes drop their mass; sourceless nodes keep the floor") {
    // b is a sink (dangling) and a has no in-edges: after one round a
    // holds exactly the damping floor, and b's rank reflects only a's
    // outflow — b's own mass vanished rather than redistributing
    val r = ranks(Seq("a" -> "b"), 1)
    assert(r("a") === Base)
    assert(r("b") === Base + 85L * Scale / 100)
  }

  test("every node keeps at least the damping floor and a cycle conserves " +
    "order under more iterations") {
    // ring a → b → c → a plus a chord a → c: c must outrank b (two
    // in-edges vs one), b must outrank nothing below the floor
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "a", "a" -> "c")
    val r = ranks(edges, 5)
    assert(r.values.forall(_ >= Base))
    assert(r("c") > r("b"))
  }

  test("NULL-endpoint edges are dropped entirely — from flow AND from " +
    "the node set (the oracle SQL filters identically)") {
    import spark.implicits._
    val edges = Seq[(String, String)](("a", "b"), (null, "c"), ("d", null))
      .toDF("src", "dst")
    val r = PageRank(edges, 1, scale = Scale)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    // c (null src) and d (null dst) vanish with their edges; a → b stands
    assert(r.keySet === Set("a", "b"))
    assert(r("a") === Base && r("b") === Base + 85L * Scale / 100)
  }

  test("node set is src ∪ dst and ranks are deterministic across runs") {
    val edges = Seq("x" -> "y", "y" -> "z", "q" -> "z")
    val r1 = ranks(edges, 3)
    val r2 = ranks(edges, 3)
    assert(r1.keySet === Set("x", "y", "z", "q"))
    assert(r1 === r2)
  }
}
