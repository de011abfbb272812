package graft.queries

import graft.{Num, QueryPack}
import graft.sqlgate.ScriptRunner
import org.apache.spark.sql.{DataFrame, SparkSession}

/** End-to-end exercise of the SQL gate (SURVEY §2.1 items 1-3, 4, 9):
  * a script in the reference's dialect — SET, connector DDL with
  * WITH-options, CREATE VIEW, statement-set INSERT — runs through
  * split → classify → route → execute, and the sink contents are the
  * query result checked against the DuckDB oracle.
  */
object Gate extends QueryPack {
  import Num._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_gate_script" -> ((s, dir) => {
      val runner = new ScriptRunner(s, batchMode = true)
      runner.run(
        s"""-- reference-dialect job script (demo_1 shape, batch -type 2)
           |SET table.exec.mini-batch.enabled = true;
           |CREATE TABLE orders_src (
           |  o_orderkey BIGINT,
           |  o_custkey BIGINT,
           |  o_orderstatus VARCHAR,
           |  o_totalprice DOUBLE,
           |  o_orderpriority VARCHAR
           |) WITH (
           |  'connector' = 'filesystem',
           |  'path' = '$dir/orders.parquet',
           |  'format' = 'parquet'
           |);
           |CREATE TABLE gate_sink (
           |  o_orderstatus VARCHAR,
           |  n BIGINT,
           |  sum_price DOUBLE,
           |  PRIMARY KEY (o_orderstatus) NOT ENFORCED
           |) WITH ('connector' = 'memory');
           |BEGIN STATEMENT SET;
           |INSERT INTO gate_sink
           |SELECT o_orderstatus, COUNT(*) AS n,
           |  ${oSum2("o_totalprice")} AS sum_price
           |FROM orders_src
           |WHERE o_orderpriority = '1-URGENT'
           |GROUP BY o_orderstatus;
           |END;
           |""".stripMargin)
      s.table("gate_sink_out")
    }))

  def oracleSql: Map[String, String] = Map(
    "q_gate_script" ->
      s"""SELECT o_orderstatus, COUNT(*) AS n,
         |  ${oSum2("o_totalprice")} AS sum_price
         |FROM orders WHERE o_orderpriority = '1-URGENT'
         |GROUP BY o_orderstatus""".stripMargin)
}
