package graft.sqlgate

import graft.SparkSpec
import java.nio.file.Files

/** Fused statement set: one streaming read fanned to all sinks in a
  * single foreachBatch (the reference's single-DAG StatementSet
  * semantics), with exactly-once resumption through the one shared
  * checkpoint, and a conservative fallback to independent queries for
  * stateful shapes.
  */
class FusedSetSpec extends SparkSpec {
  import spark.implicits._

  private def script(src: String, outA: String, outB: String,
      fuse: Boolean) =
    s"""${if (fuse) "SET 'graft.exec.statement-set.fuse' = 'true';" else ""}
       |CREATE TABLE src (id BIGINT) WITH (
       |  'connector' = 'filesystem', 'path' = '$src',
       |  'format' = 'parquet');
       |CREATE TABLE snk_a (id BIGINT) WITH (
       |  'connector' = 'filesystem', 'path' = '$outA',
       |  'format' = 'parquet');
       |CREATE TABLE snk_b (id BIGINT) WITH (
       |  'connector' = 'filesystem', 'path' = '$outB',
       |  'format' = 'parquet');
       |INSERT INTO snk_a SELECT id FROM src WHERE id % 2 = 0;
       |INSERT INTO snk_b SELECT id FROM src WHERE id % 2 = 1;
       |""".stripMargin

  private def ids(dir: String): Seq[Long] =
    spark.read.parquet(dir).as[Long].collect().sorted.toSeq

  test("fused: one query, two sinks, exactly-once across a restart") {
    val src = Files.createTempDirectory("fs_src").toString
    val outA = Files.createTempDirectory("fs_a").toString
    val outB = Files.createTempDirectory("fs_b").toString
    val ckpt = Files.createTempDirectory("fs_ck").toString
    spark.range(0, 6).toDF("id").coalesce(1).write.mode("append").parquet(src)

    val r1 = new ScriptRunner(spark, Some(ckpt))
      .run(script(src, outA, outB, fuse = true))
    // the WHOLE set is one streaming query — one source read per batch
    assert(r1.queries.size == 1)
    r1.queries.foreach(_.processAllAvailable())
    r1.queries.foreach(_.stop())
    assert(ids(outA) == Seq(0L, 2L, 4L))
    assert(ids(outB) == Seq(1L, 3L, 5L))

    // resume from the shared checkpoint: only the new file is processed
    spark.range(6, 10).toDF("id").coalesce(1).write.mode("append").parquet(src)
    val r2 = new ScriptRunner(spark, Some(ckpt))
      .run(script(src, outA, outB, fuse = true))
    r2.queries.foreach(_.processAllAvailable())
    r2.queries.foreach(_.stop())
    assert(ids(outA) == Seq(0L, 2L, 4L, 6L, 8L))
    assert(ids(outB) == Seq(1L, 3L, 5L, 7L, 9L))
  }

  test("without the flag the same script runs as independent queries") {
    val src = Files.createTempDirectory("fs_src2").toString
    spark.range(0, 4).toDF("id").coalesce(1).write.mode("append").parquet(src)
    val r = new ScriptRunner(spark,
      Some(Files.createTempDirectory("fs_ck2").toString))
      .run(script(src, Files.createTempDirectory("fs_a2").toString,
        Files.createTempDirectory("fs_b2").toString, fuse = false))
    assert(r.queries.size == 2)
    r.queries.foreach(_.processAllAvailable())
    r.queries.foreach(_.stop())
  }

  test("stateful inserts fall back to independent queries under the flag") {
    val src = Files.createTempDirectory("fs_src3").toString
    val out = Files.createTempDirectory("fs_o3").toString
    spark.range(0, 4).toDF("id").coalesce(1).write.mode("append").parquet(src)
    // an aggregate would lose cross-batch state under per-batch
    // re-planning — the fusion gate must refuse and start N queries
    val s =
      s"""SET 'graft.exec.statement-set.fuse' = 'true';
         |CREATE TABLE src (id BIGINT) WITH (
         |  'connector' = 'filesystem', 'path' = '$src',
         |  'format' = 'parquet');
         |CREATE TABLE snk_c (id BIGINT) WITH (
         |  'connector' = 'filesystem', 'path' = '$out',
         |  'format' = 'parquet');
         |CREATE TABLE agg_snk (n BIGINT, PRIMARY KEY (n) NOT ENFORCED)
         |  WITH ('connector' = 'memory');
         |INSERT INTO snk_c SELECT id FROM src;
         |INSERT INTO agg_snk SELECT COUNT(*) FROM src;
         |""".stripMargin
    val r = new ScriptRunner(spark,
      Some(Files.createTempDirectory("fs_ck3").toString)).run(s)
    assert(r.queries.size == 2)
    r.queries.foreach(_.processAllAvailable())
    r.queries.foreach(_.stop())
  }

  test("DISTINCT (surface form of stateful agg) also refuses fusion") {
    val src = Files.createTempDirectory("fs_src4").toString
    spark.range(0, 4).toDF("id").coalesce(1).write.mode("append").parquet(src)
    // Distinct only lowers to Aggregate in the optimizer; the gate must
    // still see it as stateful or fusion would silently swap Spark's
    // unsupported-operation failure for per-micro-batch distinct.
    val s =
      s"""SET 'graft.exec.statement-set.fuse' = 'true';
         |CREATE TABLE src (id BIGINT) WITH (
         |  'connector' = 'filesystem', 'path' = '$src',
         |  'format' = 'parquet');
         |CREATE TABLE snk_d (id BIGINT) WITH (
         |  'connector' = 'filesystem',
         |  'path' = '${Files.createTempDirectory("fs_o4a").toString}',
         |  'format' = 'parquet');
         |CREATE TABLE snk_e (id BIGINT) WITH (
         |  'connector' = 'filesystem',
         |  'path' = '${Files.createTempDirectory("fs_o4b").toString}',
         |  'format' = 'parquet');
         |INSERT INTO snk_d SELECT id FROM src;
         |INSERT INTO snk_e SELECT DISTINCT id FROM src;
         |""".stripMargin
    // The unfused path surfaces Spark's real unsupported-operation error
    // (streaming aggregation in append mode without watermark) at query
    // start. A wrong fusion would instead start ONE query and "succeed"
    // with per-micro-batch distinct — so success here is the failure.
    val outcome: Either[Throwable, Int] =
      try {
        val r = new ScriptRunner(spark,
          Some(Files.createTempDirectory("fs_ck4").toString)).run(s)
        try { r.queries.foreach(_.processAllAvailable()) }
        finally r.queries.foreach(_.stop())
        Right(r.queries.size)
      } catch { case e: org.apache.spark.sql.AnalysisException => Left(e) }
    assert(outcome.isLeft,
      s"streaming DISTINCT fused into $outcome instead of failing")
  }

  test("set-op surface forms (EXCEPT / INTERSECT) also refuse fusion") {
    // Except/Intersect are stateful in streaming for the same reason as
    // Distinct: they only lower to Aggregate/Join shapes downstream of
    // the analyzer, so the whitelist gate must reject the logical nodes
    // themselves. Unfused, Spark raises its real unsupported-operation
    // error; a wrong fusion would "succeed" with per-batch set semantics.
    for (op <- Seq("EXCEPT", "INTERSECT")) {
      val src = Files.createTempDirectory("fs_src6").toString
      spark.range(0, 4).toDF("id").coalesce(1).write.mode("append")
        .parquet(src)
      val s =
        s"""SET 'graft.exec.statement-set.fuse' = 'true';
           |CREATE TABLE src (id BIGINT) WITH (
           |  'connector' = 'filesystem', 'path' = '$src',
           |  'format' = 'parquet');
           |CREATE TABLE snk_h (id BIGINT) WITH (
           |  'connector' = 'filesystem',
           |  'path' = '${Files.createTempDirectory("fs_o6a").toString}',
           |  'format' = 'parquet');
           |CREATE TABLE snk_i (id BIGINT) WITH (
           |  'connector' = 'filesystem',
           |  'path' = '${Files.createTempDirectory("fs_o6b").toString}',
           |  'format' = 'parquet');
           |INSERT INTO snk_h SELECT id FROM src;
           |INSERT INTO snk_i SELECT id FROM src $op
           |  SELECT id FROM src WHERE id > 1;
           |""".stripMargin
      val outcome: Either[Throwable, Int] =
        try {
          val r = new ScriptRunner(spark,
            Some(Files.createTempDirectory("fs_ck6").toString)).run(s)
          try { r.queries.foreach(_.processAllAvailable()) }
          finally r.queries.foreach(_.stop())
          Right(r.queries.size)
        } catch { case e: org.apache.spark.sql.AnalysisException => Left(e) }
      assert(outcome.isLeft,
        s"streaming $op fused into $outcome instead of failing")
    }
  }

  test("LIMIT (global-limit surface form) also refuses fusion") {
    val src = Files.createTempDirectory("fs_src5").toString
    val outA = Files.createTempDirectory("fs_o5a").toString
    val outB = Files.createTempDirectory("fs_o5b").toString
    spark.range(0, 8).toDF("id").coalesce(1).write.mode("append").parquet(src)
    // unfused, Spark runs a stateful StreamingGlobalLimit (5 rows TOTAL
    // across batches); a fused re-plan would emit 5 rows PER BATCH
    val s =
      s"""SET 'graft.exec.statement-set.fuse' = 'true';
         |CREATE TABLE src (id BIGINT) WITH (
         |  'connector' = 'filesystem', 'path' = '$src',
         |  'format' = 'parquet');
         |CREATE TABLE snk_f (id BIGINT) WITH (
         |  'connector' = 'filesystem', 'path' = '$outA',
         |  'format' = 'parquet');
         |CREATE TABLE snk_g (id BIGINT) WITH (
         |  'connector' = 'filesystem', 'path' = '$outB',
         |  'format' = 'parquet');
         |INSERT INTO snk_f SELECT id FROM src;
         |INSERT INTO snk_g SELECT id FROM src LIMIT 5;
         |""".stripMargin
    val r = new ScriptRunner(spark,
      Some(Files.createTempDirectory("fs_ck5").toString)).run(s)
    try {
      assert(r.queries.size == 2, "LIMIT must not fuse") // unfused path
      r.queries.foreach(_.processAllAvailable())
    } finally r.queries.foreach(_.stop())
    assert(spark.read.parquet(outB).count() == 5)
  }

  test("algebraic aggregate fuses statefully: one query, merged keyed " +
    "state, exactly-once across a restart") {
    val src = Files.createTempDirectory("fs_src7").toString
    val out = Files.createTempDirectory("fs_o7").toString
    val ckpt = Files.createTempDirectory("fs_ck7").toString
    val url = "jdbc:derby:memory:fusedagg;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try conn.createStatement().execute(
      "CREATE TABLE agg_fused (k VARCHAR(16) PRIMARY KEY, s BIGINT, " +
        "c BIGINT, mn INT, mx INT)")
    finally conn.close()

    val s =
      s"""SET 'graft.exec.statement-set.fuse' = 'true';
         |CREATE TABLE src (k VARCHAR, v INT) WITH (
         |  'connector' = 'filesystem', 'path' = '$src',
         |  'format' = 'parquet');
         |CREATE TABLE raw_snk (k VARCHAR, v INT) WITH (
         |  'connector' = 'filesystem', 'path' = '$out',
         |  'format' = 'parquet');
         |CREATE TABLE agg_fused (k VARCHAR, s BIGINT, c BIGINT,
         |  mn INT, mx INT, PRIMARY KEY (k) NOT ENFORCED) WITH (
         |  'connector' = 'jdbc', 'url' = '$url',
         |  'table-name' = 'agg_fused', 'dialect' = 'two-step');
         |INSERT INTO raw_snk SELECT k, v FROM src;
         |INSERT INTO agg_fused SELECT k, SUM(v) AS s, COUNT(*) AS c,
         |  MIN(v) AS mn, MAX(v) AS mx FROM src GROUP BY k;
         |""".stripMargin

    def aggRows(): Map[String, (Long, Long, Int, Int)] = {
      val c = java.sql.DriverManager.getConnection(url)
      try {
        val rs = c.createStatement()
          .executeQuery("SELECT k, s, c, mn, mx FROM agg_fused")
        Iterator.continually(rs).takeWhile(_.next()).map(r =>
          r.getString(1) -> ((r.getLong(2), r.getLong(3),
            r.getInt(4), r.getInt(5)))).toMap
      } finally c.close()
    }

    import spark.implicits._
    Seq(("a", 1), ("a", 2), ("b", 3)).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(src)
    val r1 = new ScriptRunner(spark, Some(ckpt)).run(s)
    // stateless + mergeable aggregate fan-out = still ONE fused query
    assert(r1.queries.size == 1, "mergeable aggregate should fuse")
    r1.queries.foreach(_.processAllAvailable())
    r1.queries.foreach(_.stop())
    assert(aggRows() == Map("a" -> ((3L, 2L, 1, 2)), "b" -> ((3L, 1L, 3, 3))))
    assert(spark.read.parquet(out).count() == 3)

    // restart from the shared checkpoint: new batch merges into the
    // durable state — cross-restart sums/counts/min/max stay exact
    Seq(("a", 10), ("c", 5)).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(src)
    val r2 = new ScriptRunner(spark, Some(ckpt)).run(s)
    assert(r2.queries.size == 1)
    r2.queries.foreach(_.processAllAvailable())
    r2.queries.foreach(_.stop())
    assert(aggRows() == Map(
      "a" -> ((13L, 3L, 1, 10)),
      "b" -> ((3L, 1L, 3, 3)),
      "c" -> ((5L, 1L, 5, 5))))
    assert(spark.read.parquet(out).count() == 5)
  }

  test("non-mergeable aggregate (AVG) still refuses fusion") {
    val src = Files.createTempDirectory("fs_src8").toString
    import spark.implicits._
    Seq(("a", 1)).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(src)
    val url = "jdbc:derby:memory:avgagg;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try conn.createStatement().execute(
      "CREATE TABLE avg_snk (k VARCHAR(16) PRIMARY KEY, a DOUBLE)")
    finally conn.close()
    // AVG's output is not mergeable from itself — fusing it would
    // silently average per batch; it must run unfused (stateful
    // streaming agg path)
    val s =
      s"""SET 'graft.exec.statement-set.fuse' = 'true';
         |CREATE TABLE src (k VARCHAR, v INT) WITH (
         |  'connector' = 'filesystem', 'path' = '$src',
         |  'format' = 'parquet');
         |CREATE TABLE raw_snk2 (k VARCHAR, v INT) WITH (
         |  'connector' = 'filesystem',
         |  'path' = '${Files.createTempDirectory("fs_o8").toString}',
         |  'format' = 'parquet');
         |CREATE TABLE avg_snk (k VARCHAR, a DOUBLE,
         |  PRIMARY KEY (k) NOT ENFORCED) WITH (
         |  'connector' = 'jdbc', 'url' = '$url',
         |  'table-name' = 'avg_snk', 'dialect' = 'two-step');
         |INSERT INTO raw_snk2 SELECT k, v FROM src;
         |INSERT INTO avg_snk SELECT k, AVG(v) AS a FROM src GROUP BY k;
         |""".stripMargin
    val r = new ScriptRunner(spark,
      Some(Files.createTempDirectory("fs_ck8").toString)).run(s)
    try {
      assert(r.queries.size == 2, "AVG must not fuse")
      r.queries.foreach(_.processAllAvailable())
    } finally r.queries.foreach(_.stop())
  }
}
