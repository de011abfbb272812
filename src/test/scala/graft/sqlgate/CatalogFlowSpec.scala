package graft.sqlgate

import graft.SparkSpec
import org.apache.spark.sql.streaming.Trigger

/** Catalog/database DDL routed through the gate (demo_batch / catalog.md
  * shapes: CREATE DATABASE, USE, managed tables, DROP) and the
  * mini-batch-latency → trigger mapping.
  */
class CatalogFlowSpec extends SparkSpec {

  test("CREATE DATABASE / USE / managed table / SHOW TABLES / DROP flow") {
    import spark.implicits._
    val runner = new ScriptRunner(spark, batchMode = true)
    val res = runner.run(
      """CREATE DATABASE IF NOT EXISTS graft_db;
        |USE graft_db;
        |CREATE TABLE managed_t (k INT, v STRING) USING parquet;
        |INSERT INTO managed_t SELECT 1, 'a';
        |INSERT INTO managed_t SELECT 2, 'b';
        |SHOW TABLES;
        |""".stripMargin)
    assert(res.shown.exists(_.contains("managed_t")))
    assert(spark.table("graft_db.managed_t").as[(Int, String)]
      .collect().sortBy(_._1).toSeq == Seq((1, "a"), (2, "b")))
    new ScriptRunner(spark, batchMode = true).run(
      """DROP TABLE graft_db.managed_t;
        |USE default;
        |CREATE TABLE d (a INT) WITH ('connector'='print');
        |INSERT INTO d SELECT 1;""".stripMargin)
    assert(!spark.catalog.tableExists("graft_db.managed_t"))
  }

  test("ALTER TABLE routed through the gate (rename + add column)") {
    import spark.implicits._
    val runner = new ScriptRunner(spark, batchMode = true)
    runner.run(
      """CREATE DATABASE IF NOT EXISTS alter_db;
        |USE alter_db;
        |CREATE TABLE alt_t (k INT) USING parquet;
        |INSERT INTO alt_t SELECT 5;
        |ALTER TABLE alt_t ADD COLUMNS (note STRING);
        |ALTER TABLE alt_t RENAME TO alt_t2;
        |USE default;
        |CREATE TABLE p0 (a INT) WITH ('connector'='print');
        |INSERT INTO p0 SELECT 1;
        |""".stripMargin)
    assert(!spark.catalog.tableExists("alter_db.alt_t"))
    val t2 = spark.table("alter_db.alt_t2")
    assert(t2.columns.toSeq == Seq("k", "note"))
    assert(t2.select($"k").as[Int].collect().toSeq == Seq(5))
    spark.sql("DROP TABLE alter_db.alt_t2")
  }

  test("SET table.exec.mini-batch.allow-latency maps to ProcessingTime trigger") {
    val runner = new ScriptRunner(spark, batchMode = true)
    runner.run(
      """SET table.exec.mini-batch.allow-latency = 5 s;
        |CREATE TABLE tt (a INT) WITH ('connector'='print');
        |INSERT INTO tt SELECT 1;
        |""".stripMargin)
    assert(runner.trigger == Trigger.ProcessingTime(5000))
  }

  test("catalog.md flow: STREAMING insert into a hive-dialect managed table") {
    import spark.implicits._
    // the catalog.md script shape: kafka json source streaming into a
    // TBLPROPERTIES managed table — a continuous writeStream.toTable,
    // not the eager batch INSERT (which cannot read a streaming view)
    val broker = new graft.sources.StubBroker("cat_t", 1)
    try {
      broker.append(0, "null", """{"itemId":1,"price":100}""")
      broker.append(0, "null", """{"itemId":2,"price":250}""")
      val runner = new ScriptRunner(spark,
        checkpointRoot = Some(java.nio.file.Files
          .createTempDirectory("cat_ckpt").toString))
      val res = runner.run(
        s"""SET table.exec.mini-batch.allow-latency = 100 ms;
           |SET table.sql-dialect=hive;
           |CREATE TABLE hive_flink_table (
           |  itemId BIGINT, price BIGINT, ups STRING
           |) USING parquet TBLPROPERTIES (
           |  'sink.partition-commit.trigger'='process-time'
           |);
           |SET table.sql-dialect=default;
           |create table item_test (itemId BIGINT, price BIGINT) with (
           |  'connector' = 'kafka', 'topic' = 'cat_t',
           |  'rest.endpoint' = '${broker.endpoint}',
           |  'scan.startup.mode' = 'earliest-offset', 'format' = 'json'
           |);
           |insert into hive_flink_table
           |select itemId, price, 'XXXXaaa' as ups from item_test;
           |""".stripMargin)
      assert(res.queries.size == 1)
      val q = res.queries.head
      try {
        q.processAllAvailable()
        def rows = spark.table("hive_flink_table")
          .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
        assert(rows == Seq((1L, 100L, "XXXXaaa"), (2L, 250L, "XXXXaaa")))
        // live: a record produced while the job runs lands in the table
        broker.append(0, "null", """{"itemId":3,"price":7}""")
        q.processAllAvailable()
        assert(rows.size == 3 && rows.last == ((3L, 7L, "XXXXaaa")))
      } finally q.stop()
    } finally {
      broker.stop()
      spark.sql("DROP TABLE IF EXISTS hive_flink_table")
    }
  }

  test("managed-table INSERT routed to Spark SQL (not the registry)") {
    import spark.implicits._
    val runner = new ScriptRunner(spark, batchMode = true)
    // INSERT whose target is NOT a registry table must raise the gate's
    // unknown-sink error (the reference likewise fails fast on missing
    // sink tables rather than silently passing through)
    val e = intercept[IllegalArgumentException] {
      runner.run("INSERT INTO missing_sink SELECT 1;")
    }
    assert(e.getMessage.contains("unknown sink table"))
  }
}
