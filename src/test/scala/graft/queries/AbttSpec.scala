package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[Similarity.allButTop]] (all-but-the-top embedding cleanup)
  * two ways: the distributed pipeline must replay a plain-Scala
  * implementation of the SAME integer contract bit-exactly (the five
  * truncating divisions at their fixed points), and — the semantic
  * point of the operator — the fitted direction must actually be the
  * dominant one on a corpus with a planted dominant component, with the
  * residuals' projection onto it collapsing relative to the centered
  * inputs'.
  */
class AbttSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 64

  /** Deterministic corpus with a PLANTED dominant direction w: row i is
    * a_i·w + small per-dim noise, floats in the embeddings table's
    * value range.
    */
  private def planted(n: Int): Seq[(Long, Array[Float])] = {
    val w = Array.tabulate(Dim)(j => math.sin(j * 0.7).toFloat)
    (0 until n).map { i =>
      val a = ((i % 11) - 5) * 0.08f // spread of coefficients, mean ~0
      val vec = Array.tabulate(Dim) { j =>
        a * w(j) + (((i * 31 + j * 17) % 13) - 6) * 0.003f
      }
      (i.toLong, vec)
    }
  }

  /** The allButTop contract in plain Scala over the quantized rows —
    * an independent spelling of the exact integer arithmetic.
    */
  private def reference(rows: Seq[(Long, Array[Long])], rounds: Int)
      : (Array[Long], Map[Long, (Long, Array[Long])]) = {
    val n = rows.size.toLong
    val dim = rows.head._2.length
    val mu = Array.tabulate(dim)(j => rows.map(_._2(j)).sum / n)
    var v = Array.fill(dim)(1000000L)
    def dOf(qe: Array[Long]): Long =
      (0 until dim).map(j => qe(j) * v(j)).sum -
        (0 until dim).map(j => mu(j) * v(j)).sum
    for (_ <- 1 to rounds) {
      val ds = rows.map { case (_, qe) => dOf(qe) / 1073741824L }
      val sds = ds.sum
      val u = Array.tabulate(dim) { j =>
        rows.zip(ds).map { case ((_, qe), d) => qe(j) * d }.sum -
          mu(j) * sds
      }
      val m = u.map(math.abs).max
      v = u.map(_ / (m / 1000000L + 1L))
    }
    val vv = v.map(x => x * x).sum
    val denom = vv / 1024L + 1L
    val out = rows.map { case (id, qe) =>
      val d = dOf(qe)
      val p = d / 1024L
      id -> (d, Array.tabulate(dim)(j =>
        (qe(j) - mu(j)) - (p * v(j)) / denom))
    }.toMap
    (v, out)
  }

  test("distributed allButTop replays the plain-Scala integer contract " +
    "bit-exactly") {
    val emb = planted(120).toDF("vec_id", "embedding")
    val got = Similarity.allButTop(emb, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    val qRows = emb.select($"vec_id", Vec.quant($"embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toSeq
    val (_, exp) = reference(qRows, rounds = 2)
    assert(got.keySet == exp.keySet)
    exp.foreach { case (id, (d, res)) =>
      assert(got(id)._1 == d, s"vec $id proj")
      assert(got(id)._2 == res.mkString(","), s"vec $id residual")
    }
  }

  test("the fitted direction is the planted one, and residual " +
    "projections collapse") {
    val emb = planted(200).toDF("vec_id", "embedding")
    val qRows = emb.select($"vec_id", Vec.quant($"embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toSeq
    val (v, out) = reference(qRows, rounds = 2)
    // cosine of the fitted v against the planted w must be ~±1
    val w = Array.tabulate(Dim)(j => math.sin(j * 0.7))
    val cos = math.abs(
      (0 until Dim).map(j => v(j).toDouble * w(j)).sum /
        (math.sqrt(v.map(x => x.toDouble * x).sum) *
          math.sqrt(w.map(x => x * x).sum)))
    assert(cos > 0.98, s"fitted direction should match planted, cos=$cos")
    // residual projection onto v is tiny vs the centered projection
    val n = qRows.size.toLong
    val mu = Array.tabulate(Dim)(j => qRows.map(_._2(j)).sum / n)
    val before = qRows.map { case (_, qe) =>
      math.abs((0 until Dim).map(j => (qe(j) - mu(j)) * v(j)).sum.toDouble)
    }.max
    val after = out.values.map { case (_, res) =>
      math.abs((0 until Dim).map(j => res(j) * v(j)).sum.toDouble)
    }.max
    assert(after < before / 100.0,
      s"projection should collapse: before=$before after=$after")
  }

  test("deterministic across partitionings") {
    val emb = planted(97).toDF("vec_id", "embedding")
    val a = Similarity.allButTop(emb, "vec_id", "embedding")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val b = Similarity.allButTop(emb.repartition(7), "vec_id", "embedding")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(a == b)
  }
}
