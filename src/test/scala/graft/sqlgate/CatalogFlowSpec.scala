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
