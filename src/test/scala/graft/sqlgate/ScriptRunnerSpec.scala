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

  test("SELECT rejected at runtime (LogPrint parity)") {
    val runner = new ScriptRunner(spark, batchMode = true)
    val e = intercept[IllegalArgumentException] {
      runner.run(
        """CREATE TABLE t (a INT) WITH ('connector'='print');
          |SELECT 1;""".stripMargin)
    }
    assert(e.getMessage.contains("SELECT"))
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
