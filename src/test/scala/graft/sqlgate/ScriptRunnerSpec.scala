package graft.sqlgate

import graft.SparkSpec

/** End-to-end gate tests: scripts in the reference's dialect run through
  * split → classify → validate → route → execute, sinks checked. Mirrors
  * the reference's de-facto E2E corpus (docs/sql_demo/demo_1 shape on
  * local resources, SURVEY §7.2).
  */
class ScriptRunnerSpec extends SparkSpec {

  test("validator: accepts reference demo script (4-statement shape)") {
    val script =
      """-- demo (TestSqlValidation.java shape)
        |CREATE TABLE source_table (
        |  f0 INT,
        |  f1 INT,
        |  f2 VARCHAR
        |) WITH (
        |  'connector' = 'datagen',
        |  'rows-per-second' = '5'
        |);
        |CREATE TABLE print_table (
        |  f0 INT, f1 INT, f2 VARCHAR
        |) WITH ('connector' = 'print');
        |CREATE VIEW v AS SELECT f0, f1, f2 FROM source_table;
        |INSERT INTO print_table SELECT f0, f1, f2 FROM v;
        |""".stripMargin
    val v = SqlValidator.validate(spark, script)
    assert(v.ok, v.errors.mkString("; "))
  }

  test("validator: accepts the Flink windowing/temporal-join dialect") {
    val v = SqlValidator.validate(spark,
      """CREATE TABLE s (id BIGINT, ts TIMESTAMP) WITH ('connector'='datagen');
        |CREATE TABLE d (id BIGINT, v BIGINT) WITH ('connector'='print');
        |INSERT INTO d
        |SELECT HOP_START(ts, INTERVAL '30' SECOND, INTERVAL '1' MINUTE), COUNT(*)
        |FROM (SELECT a.id AS id, a.ts AS ts FROM s AS a
        |      LEFT JOIN dim FOR SYSTEM_TIME AS OF a.proctime AS b ON b.id = a.id)
        |GROUP BY HOP(ts, INTERVAL '30' SECOND, INTERVAL '1' MINUTE);
        |""".stripMargin)
    assert(v.ok, v.errors.mkString("; "))
  }

  test("validator: MESSAGE_010 — script without INSERT rejected") {
    val v = SqlValidator.validate(spark,
      "CREATE TABLE t (a INT) WITH ('connector'='print');")
    assert(!v.ok && v.errors.contains(SqlValidator.Message010))
  }

  test("validator: MESSAGE_011 — top-level SELECT rejected") {
    val v = SqlValidator.validate(spark,
      """CREATE TABLE t (a INT) WITH ('connector'='print');
        |SELECT * FROM t;
        |INSERT INTO t SELECT 1;""".stripMargin)
    assert(!v.ok && v.errors.contains(SqlValidator.Message011))
  }

  test("validator: syntax errors surface per statement") {
    val v = SqlValidator.validate(spark,
      """CREATE VIEW v AS SELECTT 1;
        |INSERT INTO t SELECT 1;""".stripMargin)
    assert(!v.ok && v.errors.exists(_.startsWith("syntax error")))
  }

  test("batch script: datagen sequence → SQL agg → memory sink") {
    val runner = new ScriptRunner(spark, batchMode = true)
    val res = runner.run(
      """SET table.exec.mini-batch.enabled = true;
        |CREATE TABLE src (
        |  id BIGINT,
        |  grp BIGINT
        |) WITH (
        |  'connector' = 'datagen',
        |  'number-of-rows' = '100',
        |  'fields.id.kind' = 'sequence',
        |  'fields.id.start' = '0',
        |  'fields.grp.kind' = 'sequence',
        |  'fields.grp.start' = '0'
        |);
        |CREATE TABLE snk (
        |  g BIGINT, n BIGINT, total BIGINT
        |) WITH ('connector' = 'memory');
        |BEGIN STATEMENT SET;
        |INSERT INTO snk SELECT grp % 10 AS g, COUNT(*) AS n, SUM(id) AS total
        |FROM src GROUP BY grp % 10;
        |END;
        |""".stripMargin)
    assert(res.queries.isEmpty) // batch: executed eagerly
    assert(res.configsSet.contains("table.exec.mini-batch.enabled"))
    val out = spark.table("snk_out").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(out.length == 10)
    assert(out.forall(_._2 == 10))
    // group g holds ids g, g+10, ..., g+90 → sum = 10g + 450
    assert(out.forall { case (g, _, total) => total == 10 * g + 450 })
  }

  test("streaming script: filesystem source → windowless agg → memory upsert sink") {
    // file stream sources read directories; stage the table as one
    val dir = java.nio.file.Files.createTempDirectory("gate_events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("part-0.parquet"))
    val runner = new ScriptRunner(spark,
      checkpointRoot = Some(java.nio.file.Files
        .createTempDirectory("gate_ckpt").toString))
    val res = runner.run(
      s"""CREATE TABLE ev (
         |  event_id BIGINT,
         |  user_id BIGINT,
         |  event_type VARCHAR,
         |  value DOUBLE
         |) WITH (
         |  'connector' = 'filesystem',
         |  'path' = '$dir',
         |  'format' = 'parquet'
         |);
         |CREATE TABLE agg_out (
         |  event_type VARCHAR,
         |  n BIGINT,
         |  PRIMARY KEY (event_type) NOT ENFORCED
         |) WITH ('connector' = 'memory');
         |INSERT INTO agg_out SELECT event_type, COUNT(*) AS n
         |FROM ev GROUP BY event_type;
         |""".stripMargin)
    assert(res.queries.size == 1)
    res.queries.foreach(_.awaitTermination(60000))
    val got = spark.table("agg_out").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exp = spark.read.parquet(s"$sf/events.parquet")
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exp)
  }

  test("statement set: two INSERTs from one source, both sinks served") {
    val runner = new ScriptRunner(spark, batchMode = true)
    runner.run(
      """CREATE TABLE ms_src (id BIGINT) WITH (
        |  'connector' = 'datagen', 'number-of-rows' = '50',
        |  'fields.id.kind' = 'sequence', 'fields.id.start' = '0');
        |CREATE TABLE ms_a (n BIGINT) WITH ('connector' = 'memory');
        |CREATE TABLE ms_b (total BIGINT) WITH ('connector' = 'memory');
        |BEGIN STATEMENT SET;
        |INSERT INTO ms_a SELECT COUNT(*) AS n FROM ms_src;
        |INSERT INTO ms_b SELECT SUM(id) AS total FROM ms_src;
        |END;
        |""".stripMargin)
    assert(spark.table("ms_a_out").collect().head.getLong(0) == 50L)
    assert(spark.table("ms_b_out").collect().head.getLong(0) == 1225L)
  }

  test("streaming datagen (rate-micro-batch) with PROCTIME computed column") {
    import org.apache.spark.sql.functions.col
    val runner = new ScriptRunner(spark,
      checkpointRoot = Some(java.nio.file.Files
        .createTempDirectory("dg_ckpt").toString))
    val res = runner.run(
      """CREATE TABLE dg (
        |  id BIGINT,
        |  proctime AS PROCTIME()
        |) WITH (
        |  'connector' = 'datagen',
        |  'rows-per-batch' = '10',
        |  'fields.id.kind' = 'sequence',
        |  'fields.id.start' = '100'
        |);
        |CREATE TABLE dg_out (id BIGINT, PRIMARY KEY (id) NOT ENFORCED)
        |  WITH ('connector' = 'memory');
        |INSERT INTO dg_out SELECT id FROM dg WHERE proctime IS NOT NULL;
        |""".stripMargin)
    assert(res.queries.size == 1)
    res.queries.head.awaitTermination(60000)
    val ids = spark.table("dg_out").select(col("id"))
      .collect().map(_.getLong(0)).sorted
    assert(ids.nonEmpty && ids.head == 100L) // sequence starts at fields.id.start
    assert(ids.toSeq == (100L until 100L + ids.length)) // contiguous sequence
  }

  test("INSERT OVERWRITE replaces a filesystem sink; INTO appends") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("ow_sink").toString
    def script(verb: String, lo: Int, hi: Int) =
      s"""CREATE TABLE ow_src (id BIGINT) WITH (
         |  'connector' = 'datagen', 'number-of-rows' = '${hi - lo}',
         |  'fields.id.kind' = 'sequence', 'fields.id.start' = '$lo');
         |CREATE TABLE ow_snk (id BIGINT) WITH (
         |  'connector' = 'filesystem', 'path' = '$out',
         |  'format' = 'parquet');
         |INSERT $verb ow_snk SELECT id FROM ow_src;
         |""".stripMargin
    new ScriptRunner(spark, batchMode = true).run(script("INTO", 0, 5))
    new ScriptRunner(spark, batchMode = true).run(script("INTO", 5, 10))
    assert(spark.read.parquet(out).count() == 10) // INTO appends
    new ScriptRunner(spark, batchMode = true).run(script("OVERWRITE", 100, 103))
    assert(spark.read.parquet(out).as[Long].collect().sorted.toSeq ==
      Seq(100L, 101L, 102L)) // OVERWRITE replaces
  }

  test("INSERT with explicit column list renames positionally") {
    val runner = new ScriptRunner(spark, batchMode = true)
    runner.run(
      """CREATE TABLE cl_src (id BIGINT) WITH (
        |  'connector' = 'datagen', 'number-of-rows' = '3',
        |  'fields.id.kind' = 'sequence', 'fields.id.start' = '7');
        |CREATE TABLE cl_snk (renamed BIGINT) WITH ('connector' = 'memory');
        |INSERT INTO cl_snk (renamed) SELECT id FROM cl_src;
        |""".stripMargin)
    assert(spark.table("cl_snk_out").columns.toSeq == Seq("renamed"))
    assert(spark.table("cl_snk_out").count() == 3)
  }

  test("SET with quoted key (sql-client form) still maps the trigger") {
    import org.apache.spark.sql.streaming.Trigger
    val runner = new ScriptRunner(spark, batchMode = true)
    runner.run(
      """SET 'table.exec.mini-batch.allow-latency' = '2 s';
        |CREATE TABLE qk (a INT) WITH ('connector'='print');
        |INSERT INTO qk SELECT 1;
        |""".stripMargin)
    assert(runner.trigger == Trigger.ProcessingTime(2000))
  }

  test("two INSERTs into the same memory sink coexist (unique query tags)") {
    val runner = new ScriptRunner(spark,
      checkpointRoot = Some(java.nio.file.Files
        .createTempDirectory("same_sink").toString))
    val res = runner.run(
      s"""CREATE TABLE ss_src (id BIGINT) WITH (
         |  'connector' = 'datagen', 'rows-per-batch' = '5',
         |  'fields.id.kind' = 'sequence', 'fields.id.start' = '0');
         |CREATE TABLE ss_snk (v BIGINT) WITH ('connector' = 'memory');
         |INSERT INTO ss_snk SELECT id FROM ss_src;
         |INSERT INTO ss_snk SELECT id * 10 AS id FROM ss_src;
         |""".stripMargin)
    assert(res.queries.size == 2)
    res.queries.foreach(_.awaitTermination(60000))
    // both queries started and produced distinct memory tables
    assert(spark.table("ss_snk").count() >= 5)
    assert(spark.table("ss_snk_1").count() >= 5)
  }

  test("streaming aggregation into a PK-less console-style sink starts (update mode)") {
    val runner = new ScriptRunner(spark,
      checkpointRoot = Some(java.nio.file.Files
        .createTempDirectory("agg_nopk").toString))
    val res = runner.run(
      s"""CREATE TABLE an_src (id BIGINT) WITH (
         |  'connector' = 'datagen', 'rows-per-batch' = '8',
         |  'fields.id.kind' = 'sequence', 'fields.id.start' = '0');
         |CREATE TABLE an_snk (g BIGINT, n BIGINT) WITH ('connector' = 'memory');
         |INSERT INTO an_snk SELECT id % 2 AS g, COUNT(*) AS n
         |FROM an_src GROUP BY id % 2;
         |""".stripMargin)
    assert(res.queries.size == 1) // would throw in append mode pre-fix
    res.queries.foreach(_.awaitTermination(60000))
    assert(spark.table("an_snk").count() >= 2)
  }

  test("SELECT rejected at runtime (LogPrint parity)") {
    val runner = new ScriptRunner(spark, batchMode = true)
    val e = intercept[IllegalArgumentException] {
      runner.run(
        """CREATE TABLE t (a INT) WITH ('connector'='print');
          |SELECT 1;""".stripMargin)
    }
    assert(e.getMessage.contains("SELECT"))
  }

  test("source resolution is exact: a table name inside a string literal is not a reference") {
    val runner = new ScriptRunner(spark, batchMode = true)
    // 'lit_ghost' is registered but only appears inside a string literal —
    // the parse-based resolver must NOT instantiate it (the old
    // word-boundary regex did, and its bogus path would explode here)
    runner.run(
      """CREATE TABLE lit_ghost (x INT) WITH (
        |  'connector' = 'filesystem', 'path' = '/nonexistent/path/zzz',
        |  'format' = 'parquet');
        |CREATE TABLE lit_src (id BIGINT) WITH (
        |  'connector' = 'datagen', 'number-of-rows' = '2',
        |  'fields.id.kind' = 'sequence', 'fields.id.start' = '0');
        |CREATE TABLE lit_snk (tag VARCHAR, id BIGINT) WITH ('connector' = 'memory');
        |INSERT INTO lit_snk SELECT 'lit_ghost rocks' AS tag, id FROM lit_src;
        |""".stripMargin)
    assert(spark.table("lit_snk_out").count() == 2)
  }

  test("CREATE VIEW bodies run through the Flink dialect rewrite") {
    import spark.implicits._
    Seq((1L, java.sql.Timestamp.valueOf("2020-01-05 11:00:10")),
      (2L, java.sql.Timestamp.valueOf("2020-01-05 11:00:50")),
      (3L, java.sql.Timestamp.valueOf("2020-01-05 12:30:00")))
      .toDF("id", "ts").createOrReplaceTempView("vw_src")
    val runner = new ScriptRunner(spark, batchMode = true)
    runner.run(
      """CREATE OR REPLACE TEMPORARY VIEW vw_hourly AS
        |SELECT DATE_FORMAT(TUMBLE_START(ts, INTERVAL '1' HOUR),
        |    'yyyy-MM-dd HH:mm:ss') AS wstart, COUNT(*) AS n
        |FROM vw_src GROUP BY TUMBLE(ts, INTERVAL '1' HOUR);
        |CREATE TABLE vw_snk (wstart VARCHAR, n BIGINT)
        |  WITH ('connector' = 'memory');
        |INSERT INTO vw_snk SELECT wstart, n FROM vw_hourly;
        |""".stripMargin)
    val out = spark.table("vw_snk_out").as[(String, Long)].collect().sorted
    assert(out.toSeq == Seq(("2020-01-05 11:00:00", 2L),
      ("2020-01-05 12:00:00", 1L)))
  }

  test("SHOW statements route through spark.sql; SHOW MODULES lists registry") {
    val runner = new ScriptRunner(spark, batchMode = true)
    val res = runner.run(
      """CREATE TABLE reg1 (a INT) WITH ('connector'='print');
        |SHOW DATABASES;
        |SHOW MODULES;
        |INSERT INTO reg1 SELECT 1;
        |""".stripMargin)
    assert(res.shown.exists(_.contains("default")))
    assert(res.shown.exists(_.contains("reg1")))
  }
}
