package graft.queries

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The prefix-filtered exact Jaccard join must produce EXACTLY the
  * cross-join result — the whole point of the operator is "same answer,
  * no quadratic stage". Checked on seeded random set collections
  * (including adversarial shapes: identical sets, subsets, singletons,
  * shared boilerplate tokens) and on the real documents table.
  */
class DedupPpjoinSpec extends SparkSpec {

  private def bruteForce(sets: Seq[(Long, Seq[String])], theta: Double)
      : Set[(Long, Long)] = {
    val pairs = for {
      (ida, sa) <- sets; (idb, sb) <- sets
      if ida < idb
      inter = sa.toSet.intersect(sb.toSet).size
      union = sa.toSet.union(sb.toSet).size
      if union > 0 && inter.toDouble / union >= theta
    } yield (ida, idb)
    pairs.toSet
  }

  test("prefix-filtered join equals brute force on random set collections") {
    import spark.implicits._
    graft.queries.Vec.ensureRegistered(spark)
    val rnd = new Random(99)
    for (trial <- 1 to 8) {
      val vocab = (0 until (4 + rnd.nextInt(40))).map(i => s"t$i")
      val nDocs = 20 + rnd.nextInt(60)
      val base = (0L until nDocs).map { id =>
        val sz = 1 + rnd.nextInt(12)
        id -> rnd.shuffle(vocab).take(sz).sorted
      }
      // adversarial additions: exact duplicates and near-subsets
      val extra = base.take(5).zipWithIndex.map { case ((_, s), i) =>
        (1000L + i) -> (if (i % 2 == 0) s else s.drop(1))
      }
      val all = base ++ extra
      val df = all.toDF("doc_id", "ss")
      val got = Dedup.jaccardJoin(df)
        .select($"ida", $"idb").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = bruteForce(all, 3.0 / 5)
      assert(got == want,
        s"trial $trial: missing=${want -- got} extra=${got -- want}")
    }
  }

  test("non-default threshold (4/5) also matches brute force") {
    import spark.implicits._
    graft.queries.Vec.ensureRegistered(spark)
    val rnd = new Random(5)
    val vocab = (0 until 15).map(i => s"w$i")
    val all = (0L until 60).map { id =>
      id -> rnd.shuffle(vocab).take(1 + rnd.nextInt(8)).sorted
    }
    val got = Dedup.jaccardJoin(all.toDF("doc_id", "ss"), num = 4, den = 5)
      .select($"ida", $"idb").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == bruteForce(all, 4.0 / 5))
  }

  test("q_dedup_ppjoin matches an O(n²) cross join on the real corpus") {
    import spark.implicits._
    graft.queries.Vec.ensureRegistered(spark)
    val pp = graft.SparkEntry.queries("q_dedup_ppjoin")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    // brute-force twin with the SAME 3-word shingling, quadratic on
    // purpose (sf0.001 = 500 docs)
    val sets = Dedup.jaccardSets(
      graft.Tables.load(spark, sf, "documents"), "doc_id", "text", 3)
    val ng = sets.as("a").join(sets.as("b"), $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("ida"), $"b.doc_id".as("idb"),
        graft.functions.GraftFunctions
          .jaccardDistinct($"a.ss", $"b.ss").as("jacc"))
      .filter($"jacc" >= 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(pp == ng)
  }

  test("plan has no cartesian product — the quadratic stage is gone") {
    val df = graft.SparkEntry.queries("q_dedup_ppjoin")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }
}
