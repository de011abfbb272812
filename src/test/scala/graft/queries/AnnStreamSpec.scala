package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming ANN_TOPK_LSH kernel ([[Similarity.annLshTopkStream]]): the
  * stateless bucket-array scan must emit rows IDENTICAL to the batch
  * [[Similarity.annLshTopkOn]] over the same data — same candidates,
  * same quantized cosines, same (cosine DESC, nid) order, same k cut.
  */
class AnnStreamSpec extends SparkSpec {

  private def stagedEmb(): String =
    StreamingGate.stagedTableDir(sf, "embeddings")

  private def drain(df: DataFrame, name: String): DataFrame = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(300000), s"$name drain timed out")
    q.stop()
    spark.table(name)
  }

  private def rows(df: DataFrame): Set[(Long, Long, Double, Int)] =
    df.collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"),
      r.getAs[Double]("cosine"), r.getAs[Int]("rank"))).toSet

  test("streaming bucket-array scan equals the batch LSH kernel") {
    val staged = stagedEmb()
    val schema = spark.read.parquet(staged).schema
    val corpus = spark.read.parquet(staged).filter(col("vec_id") >= 8)
    val batchQ = spark.read.parquet(staged).filter(col("vec_id") < 8)
    val streamQ = spark.readStream.schema(schema).parquet(staged)
      .filter(col("vec_id") < 8)
    val batch = rows(Similarity.annLshTopkOn(
      corpus, batchQ, "vec_id", "embedding", k = 4))
    val streamed = rows(drain(Similarity.annLshTopkStream(
      corpus, streamQ, "vec_id", "embedding", k = 4), "ann_lsh_eq"))
    assert(batch.nonEmpty)
    assert(streamed == batch,
      s"stream-batch divergence: only-stream=${streamed -- batch} " +
        s"only-batch=${batch -- streamed}")
  }

  test("non-default plane count routes through both kernels identically") {
    val staged = stagedEmb()
    val schema = spark.read.parquet(staged).schema
    val corpus = spark.read.parquet(staged).filter(col("vec_id") >= 8)
    val batchQ = spark.read.parquet(staged).filter(col("vec_id") < 8)
    val streamQ = spark.readStream.schema(schema).parquet(staged)
      .filter(col("vec_id") < 8)
    val batch = rows(Similarity.annLshTopkOn(
      corpus, batchQ, "vec_id", "embedding", k = 3, nPlanes = 5))
    val streamed = rows(drain(Similarity.annLshTopkStream(
      corpus, streamQ, "vec_id", "embedding", k = 3, nPlanes = 5),
      "ann_lsh_eq5"))
    assert(streamed == batch)
    // wider buckets (fewer planes) → at least as many hits as 8 planes
    val batch8 = rows(Similarity.annLshTopkOn(
      corpus, batchQ, "vec_id", "embedding", k = 3))
    assert(batch.size >= batch8.size)
  }

  test("a streaming corpus is rejected loudly") {
    val staged = stagedEmb()
    val schema = spark.read.parquet(staged).schema
    val streaming = spark.readStream.schema(schema).parquet(staged)
    val e = intercept[IllegalArgumentException] {
      Similarity.annLshTopkStream(streaming, streaming, "vec_id",
        "embedding", k = 3)
    }
    assert(e.getMessage.contains("BOUNDED"))
    // and a batch query side must use the batch kernel
    val batch = spark.read.parquet(staged)
    val e2 = intercept[IllegalArgumentException] {
      Similarity.annLshTopkStream(batch, batch, "vec_id", "embedding", 3)
    }
    assert(e2.getMessage.contains("streaming query side"))
  }

  test("streaming IVF+PQ probe equals the batch composed tier row-for-row") {
    val staged = stagedEmb()
    val schema = spark.read.parquet(staged).schema
    val corpus = spark.read.parquet(staged).filter(col("vec_id") >= 8)
      .select(col("vec_id"), col("embedding"))
    val batchQ = spark.read.parquet(staged).filter(col("vec_id") < 8)
      .select(col("vec_id"), col("embedding"))
    val streamQ = spark.readStream.schema(schema).parquet(staged)
      .filter(col("vec_id") < 8)
      .select(col("vec_id"), col("embedding"))
    def rows4(df: DataFrame): Set[(Long, Long, Double, Int)] =
      df.collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"),
        r.getAs[Double]("cosine"), r.getAs[Int]("rank"))).toSet
    val batch = rows4(Similarity.ivfPqTopkOn(
      corpus, batchQ, "vec_id", "embedding"))
    assert(batch.nonEmpty)
    val streamed = rows4(drain(Similarity.ivfPqTopkStream(
      corpus, streamQ, "vec_id", "embedding"), "ivfpq_stream_eq"))
    assert(streamed == batch,
      s"stream-batch divergence: only-stream=${streamed -- batch} " +
        s"only-batch=${batch -- streamed}")
    // the codes-only measurement variant (SCALE.md r15 comparison)
    // must emit the SAME rows: same ADC candidate cut, same exact
    // cosine re-rank, same (cosine DESC, nid) order — only the index
    // payload and the survivor-vector fetch path differ
    val codesOnly = rows4(drain(Similarity.ivfPqTopkStreamCodesOnly(
      corpus, streamQ, "vec_id", "embedding"), "ivfpq_codes_eq"))
    assert(codesOnly == batch,
      s"codes-only divergence: only-codes=${codesOnly -- batch} " +
        s"only-batch=${batch -- codesOnly}")
  }

  test("streaming IVF+PQ: per-batch plan reads ONLY the frozen index — " +
    "no corpus re-encode, and batch/streaming guards fire") {
    val staged = stagedEmb()
    val schema = spark.read.parquet(staged).schema
    val corpus = spark.read.parquet(staged).filter(col("vec_id") >= 8)
      .select(col("vec_id"), col("embedding"))
    val streamQ = spark.readStream.schema(schema).parquet(staged)
      .filter(col("vec_id") < 8)
      .select(col("vec_id"), col("embedding"))
    val out = Similarity.ivfPqTopkStream(
      corpus, streamQ, "vec_id", "embedding")
    // the only batch relations in the per-micro-batch plan are the
    // frozen index parquet files; pq_encode (the corpus encode pass)
    // must be absent — it ran once at index build
    val plan = out.queryExecution.analyzed
    val fileRels = plan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case f: org.apache.spark.sql.execution.datasources
              .HadoopFsRelation => f.location.rootPaths.mkString(",")
          case _ => ""
        }
    }
    assert(fileRels.nonEmpty &&
      fileRels.forall(_.contains("graft_ivfpq_idx")),
      s"unexpected batch relations in the streaming plan: $fileRels")
    assert(!plan.toString.contains("pq_encode"),
      "corpus re-encode leaked into the per-batch plan")
    // guards
    val streaming = spark.readStream.schema(schema).parquet(staged)
    val e = intercept[IllegalArgumentException] {
      Similarity.ivfPqTopkStream(streaming, streaming, "vec_id",
        "embedding")
    }
    assert(e.getMessage.contains("BOUNDED"))
    val batch = spark.read.parquet(staged)
    val e2 = intercept[IllegalArgumentException] {
      Similarity.ivfPqTopkStream(batch, batch, "vec_id", "embedding")
    }
    assert(e2.getMessage.contains("streaming query side"))
  }

  test("repeated invocations reuse ONE frozen bucket index") {
    // the per-call tmp-parquet leak fix: same (corpus, params) → same
    // cached index; a different plane count is a distinct index
    val staged = stagedEmb()
    val schema = spark.read.parquet(staged).schema
    val corpus = spark.read.parquet(staged).filter(col("vec_id") >= 8)
    def streamQ = spark.readStream.schema(schema).parquet(staged)
      .filter(col("vec_id") < 8)
    StaticIndexCache.clear()
    val first = rows(drain(Similarity.annLshTopkStream(
      corpus, streamQ, "vec_id", "embedding", k = 3), "ann_reuse_1"))
    val afterFirst = StaticIndexCache.size
    val second = rows(drain(Similarity.annLshTopkStream(
      corpus, streamQ, "vec_id", "embedding", k = 3), "ann_reuse_2"))
    assert(StaticIndexCache.size == afterFirst,
      "second invocation built a second index for the same corpus")
    assert(second == first)
    drain(Similarity.annLshTopkStream(
      corpus, streamQ, "vec_id", "embedding", k = 3, nPlanes = 5),
      "ann_reuse_3")
    assert(StaticIndexCache.size == afterFirst + 1,
      "a different plane count must be a distinct cached index")
  }

  test("NULL vectors reach the loud ANN guard, not an NPE") {
    import spark.implicits._
    val staged = stagedEmb()
    val q = spark.read.parquet(staged).filter(col("vec_id") < 3)
      .select(col("vec_id"), col("embedding"))
    // an all-NULL corpus fails the dimension probe with the
    // operator-prefixed message (it used to NPE on size(NULL))
    val allNull = Seq((1L, null.asInstanceOf[Seq[Float]]))
      .toDF("vec_id", "embedding")
    val err = intercept[IllegalArgumentException] {
      Similarity.annLshTopkOn(allNull, q, "vec_id", "embedding", 2)
    }
    assert(err.getMessage.contains("non-NULL"))
    // a corpus whose FIRST row is NULL probes the dim from the first
    // non-null row, then the per-row guard names the NULL vector
    val mixed = Seq((999L, null.asInstanceOf[Seq[Float]]))
      .toDF("vec_id", "embedding")
      .unionAll(spark.read.parquet(staged).filter(col("vec_id") >= 8)
        .select(col("vec_id"), col("embedding")))
      .coalesce(1)
    val guardErr = intercept[Exception] {
      Similarity.annLshTopkOn(mixed, q, "vec_id", "embedding", 2).collect()
    }
    def chain(t: Throwable): String =
      if (t == null) "" else t.toString + chain(t.getCause)
    assert(chain(guardErr).contains("ANN_TOPK_LSH"),
      s"expected the per-row guard, got: ${chain(guardErr)}")
  }

  test("dimension-skewed vectors fail loudly instead of bucketing wrong") {
    import spark.implicits._
    val staged = stagedEmb()
    val corpus = spark.read.parquet(staged).filter(col("vec_id") >= 8)
    // a 3-dim query against the 64-dim corpus: the hyperplane dots
    // would silently collapse it into one bucket — must throw instead
    val badQ = Seq((1L, Seq(1.0f, 2.0f, 3.0f))).toDF("vec_id", "embedding")
    val err = intercept[Exception] {
      Similarity.annLshTopkOn(corpus, badQ, "vec_id", "embedding", 3)
        .collect()
    }
    def chain(t: Throwable): String =
      if (t == null) "" else t.toString + chain(t.getCause)
    assert(chain(err).contains("ANN_TOPK_LSH"),
      s"expected the dim guard, got: ${chain(err)}")
  }
}
