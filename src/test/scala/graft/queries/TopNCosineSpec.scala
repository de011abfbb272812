package graft.queries

import graft.SparkSpec

import org.apache.spark.sql.functions._
import scala.util.Random

/** [[graft.functions.TopNCosine]] against the composed struct-array spelling it
  * replaced in the streaming IVF+PQ probe: `array_sort` by (cosine
  * DESC NULLS LAST, cid ASC) then `slice(_, 1, n)` — the fused node
  * must reproduce that ordering bit-for-bit on random vectors,
  * zero-norm cells, NULL vectors, and n larger than the cell count.
  */
class TopNCosineSpec extends SparkSpec {

  private def composedRef(df: org.apache.spark.sql.DataFrame,
      cents: Seq[(Long, Seq[Long], Long)], n: Int) = {
    // the pre-r14 spelling, kept here as the executable reference
    val scoredCells = array(cents.map { case (cid, ce, cnrm) =>
      struct(
        Vec.cosineQ(col("qe"), lit(ce.toArray), col("nrm"), lit(cnrm))
          .as("ccos"),
        lit(cid).as("cid"))
    }: _*)
    val cmp = (l: org.apache.spark.sql.Column,
        r: org.apache.spark.sql.Column) => {
      val (lc, rc) = (l.getField("ccos"), r.getField("ccos"))
      val (ln, rn) = (l.getField("cid"), r.getField("cid"))
      val byId = when(ln < rn, -1).when(ln > rn, 1).otherwise(0)
      when(lc.isNull && rc.isNull, byId)
        .when(lc.isNull, 1).when(rc.isNull, -1)
        .when(lc > rc, -1).when(lc < rc, 1)
        .otherwise(byId)
    }
    df.select(col("vec_id"),
      transform(slice(array_sort(scoredCells, cmp), 1, n),
        e => e.getField("cid")).as("probes"))
  }

  private def fused(df: org.apache.spark.sql.DataFrame,
      cents: Seq[(Long, Seq[Long], Long)], n: Int) = {
    val s = cents.sortBy(_._1)
    df.select(col("vec_id"),
      graft.functions.GraftFunctions.topnCos(col("qe"), col("nrm"),
        s.map(_._1).toArray, s.flatMap(_._2).toArray,
        s.map(_._3).toArray, n).as("probes"))
  }

  private def collectProbes(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getLong(0), r.getSeq[Long](1).toList)).toMap

  test("fused top-n equals the composed sort+slice spelling on random " +
    "vectors, zero-norm cells, ties, NULL vectors, and n > cells") {
    import spark.implicits._
    Vec.ensureRegistered(spark)
    val rnd = new Random(42)
    val d = 6
    for (round <- 1 to 10) {
      val c = 1 + rnd.nextInt(7)
      val cents = (0L until c.toLong).map { cid =>
        // some zero-norm centroids (all-zero vector) to exercise the
        // NULL-cosine path; duplicated centroids to exercise ties
        if (rnd.nextInt(5) == 0) Seq.fill(d)(0L)
        else if (cid > 0 && rnd.nextInt(4) == 0) null
        else Seq.fill(d)(rnd.nextInt(2000).toLong - 1000)
      }.toIndexedSeq
      // null marks "duplicate the previous centroid" (tie exercise);
      // resolve left-to-right so runs of nulls copy the last real one
      val resolved = cents.zipWithIndex
        .foldLeft(Vector.empty[(Long, Seq[Long], Long)]) {
          case (acc, (ce, i)) =>
            val v = if (ce == null) acc.last._2 else ce
            acc :+ ((i.toLong, v, v.map(x => x * x).sum))
        }
      val rows = (0L until 12L).map { id =>
        val qe =
          if (id == 11L) null // NULL vector → first n cids
          else Seq.fill(d)(rnd.nextInt(2000).toLong - 1000)
        (id, qe)
      }
      val df = rows.toDF("vec_id", "qe")
        .withColumn("nrm", coalesce(Vec.dotQ(col("qe"), col("qe")),
          lit(0L)))
      val n = 1 + rnd.nextInt(c + 2) // sometimes > cells
      val want = collectProbes(composedRef(df, resolved, n))
      val got = collectProbes(fused(df, resolved, n))
      assert(got == want,
        s"round $round diverged (c=$c n=$n): got=$got want=$want " +
          s"cents=$resolved")
    }
  }
}
