package graft.queries

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Cross-corpus exact Jaccard join: batch kernel vs brute force on
  * random corpora, and the streaming (frozen prefix index) route vs the
  * batch kernel on the real documents table — the same "one kernel, one
  * answer" contract as the self-join spec.
  */
class DedupJaccardCrossSpec extends SparkSpec {

  private def brute(as: Seq[(Long, Seq[String])], bs: Seq[(Long, Seq[String])],
      theta: Double): Set[(Long, Long)] = {
    val pairs = for {
      (ida, sa) <- as; (idb, sb) <- bs
      inter = sa.toSet.intersect(sb.toSet).size
      union = sa.toSet.union(sb.toSet).size
      if union > 0 && inter.toDouble / union >= theta
    } yield (ida, idb)
    pairs.toSet
  }

  test("cross join equals brute force on random corpora (incl. ties/dups)") {
    import spark.implicits._
    graft.queries.Vec.ensureRegistered(spark)
    val rnd = new Random(21)
    for (trial <- 1 to 6) {
      val vocab = (0 until (5 + rnd.nextInt(30))).map(i => s"t$i")
      def mk(n: Int, base: Long) = (0 until n).map { i =>
        (base + i) -> rnd.shuffle(vocab).take(1 + rnd.nextInt(10)).sorted
      }
      val as = mk(25 + rnd.nextInt(30), 0L)
      val bs = mk(25 + rnd.nextInt(30), 1000L) ++
        as.take(4).map { case (id, s) => (2000L + id) -> s } // exact dups
      val got = Dedup.jaccardJoinCrossSets(
          as.toDF("doc_id", "ss"), bs.toDF("doc_id", "ss"))
        .select($"ida", $"idb").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = brute(as, bs, 3.0 / 5)
      assert(got == want,
        s"trial $trial: missing=${want -- got} extra=${got -- want}")
    }
  }

  test("non-default threshold (4/5) matches brute force") {
    import spark.implicits._
    graft.queries.Vec.ensureRegistered(spark)
    val rnd = new Random(3)
    val vocab = (0 until 12).map(i => s"w$i")
    def mk(n: Int, base: Long) = (0 until n).map { i =>
      (base + i) -> rnd.shuffle(vocab).take(1 + rnd.nextInt(7)).sorted
    }
    val (as, bs) = (mk(40, 0L), mk(40, 500L))
    val got = Dedup.jaccardJoinCrossSets(
        as.toDF("doc_id", "ss"), bs.toDF("doc_id", "ss"), num = 4, den = 5)
      .select($"ida", $"idb").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute(as, bs, 4.0 / 5))
  }

  test("streaming frozen-index route is row-identical to the batch kernel") {
    import spark.implicits._
    val docs = graft.Tables.load(spark, sf, "documents")
    val incomingB = docs.filter($"doc_id" % 10 >= 8)
    val corpus = docs.filter($"doc_id" % 10 < 8)
    val want = Dedup.jaccardJoinCross(incomingB, corpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val schema = docs.schema
    val stagedDir = java.nio.file.Files
      .createTempDirectory("jx_stream").toString
    incomingB.write.mode("overwrite").parquet(stagedDir)
    val incomingS = spark.readStream.schema(
        spark.read.parquet(stagedDir).schema).parquet(stagedDir)
      .select(schema.fieldNames.map(col).toIndexedSeq: _*)
    val out = Dedup.jaccardJoinCrossStream(
      incomingS, corpus, "doc_id", "text")
    val q = out.writeStream.format("memory").queryName("jx_stream_spec")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(300000))
    q.stop()
    val got = spark.table("jx_stream_spec").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want)
  }

  test("streaming prefix explode stays exact on long documents") {
    // the r18 doc-length escape hatch: the stream side explodes only
    // |ss| − ceil(theta·|ss|) + 1 prefix tokens. Long docs (hundreds of
    // distinct shingles) with planted near-dups at 0.6−ε and 0.6+ε are
    // exactly where a completeness bug would bite: a qualifying pair
    // whose shared tokens all sit outside one side's prefix would
    // silently vanish. Brute force is the referee.
    import spark.implicits._
    val rnd = new Random(47)
    val vocab = (0 until 900).map(i => f"tok$i%04d")
    def mkDoc(n: Int): Seq[String] = rnd.shuffle(vocab).take(n).sorted
    // corpus docs ~200-400 tokens; incoming = perturbed copies at
    // graded overlap plus unrelated docs
    val corpus = (0 until 15).map(i => (i.toLong, mkDoc(200 + rnd.nextInt(200))))
    val incoming = corpus.take(8).zipWithIndex.map { case ((_, sb), i) =>
      val keep = (sb.size * (0.55 + 0.08 * (i % 4))).toInt
      val doc = (rnd.shuffle(sb).take(keep) ++
        mkDoc(sb.size - keep)).distinct.sorted
      (1000L + i, doc)
    } ++ (0 until 5).map(i => (2000L + i, mkDoc(250)))
    val got = Dedup.jaccardJoinCrossSets(
        incoming.toDF("doc_id", "ss"), corpus.toDF("doc_id", "ss"))
      .select($"ida", $"idb").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute(incoming, corpus, 3.0 / 5))
    // ...and the STREAMING route (the prefix-exploded drain) agrees
    // with the batch kernel on the same long docs end-to-end
    val asText = (corpus.map { case (id, ss) => (id, ss.mkString(" ")) } ++
      incoming.map { case (id, ss) => (id, ss.mkString(" ")) })
      .toDF("doc_id", "text")
    val corpusDf = asText.filter($"doc_id" < 1000)
    val incDf = asText.filter($"doc_id" >= 1000)
    val want = Dedup.jaccardJoinCross(incDf, corpusDf, "doc_id", "text",
        shingleN = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val dir = java.nio.file.Files
      .createTempDirectory("jx_longdoc").toString
    incDf.write.mode("overwrite").parquet(dir)
    val incS = spark.readStream
      .schema(spark.read.parquet(dir).schema).parquet(dir)
    val out = Dedup.jaccardJoinCrossStream(incS, corpusDf,
      "doc_id", "text", shingleN = 1)
    val q = out.writeStream.format("memory").queryName("jx_longdoc_sink")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(300000))
    q.stop()
    val gotS = spark.table("jx_longdoc_sink").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotS == want)
  }

  test("streaming route rejects a streaming corpus loudly") {
    import spark.implicits._
    val docs = graft.Tables.load(spark, sf, "documents")
    val stagedDir = java.nio.file.Files
      .createTempDirectory("jx_badcorpus").toString
    docs.write.mode("overwrite").parquet(stagedDir)
    val stream = spark.readStream.schema(
      spark.read.parquet(stagedDir).schema).parquet(stagedDir)
    val e = intercept[IllegalArgumentException] {
      Dedup.jaccardJoinCrossStream(stream, stream, "doc_id", "text")
    }
    assert(e.getMessage.contains("BOUNDED"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Dedup.jaccardJoinCrossStream(docs, docs, "doc_id", "text")
    }
    assert(e2.getMessage.contains("streaming incoming"), e2.getMessage)
  }
}
