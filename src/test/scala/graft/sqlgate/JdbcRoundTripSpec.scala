package graft.sqlgate

import graft.SparkSpec
import java.sql.DriverManager

/** Real-database round trip on embedded Derby: the gate's jdbc source
  * connector scans a live table, and the PK upsert sink MERGEs batches
  * with last-write-wins — the demo_1/demo_3 JDBC surface executing, not
  * just generating SQL.
  */
class JdbcRoundTripSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftdb;create=true"

  test("jdbc source connector scans a live table") {
    val conn = DriverManager.getConnection(url)
    try {
      conn.createStatement().execute(
        "CREATE TABLE dim_city (id INT PRIMARY KEY, name VARCHAR(64))")
      val ps = conn.prepareStatement("INSERT INTO dim_city VALUES (?, ?)")
      Seq((1, "berlin"), (2, "tokyo")).foreach { case (i, n) =>
        ps.setInt(1, i); ps.setString(2, n); ps.addBatch()
      }
      ps.executeBatch()
    } finally conn.close()

    val spec = TableSpec.parse(
      s"""CREATE TABLE dim_city (id INT, name VARCHAR) WITH (
         |  'connector' = 'jdbc', 'url' = '$url',
         |  'table-name' = 'dim_city')""".stripMargin)
    val df = Connectors.source(spark, spec, streaming = false)
    assert(df.collect().map(r => (r.getInt(0), r.getString(1))).toSet ==
      Set((1, "berlin"), (2, "tokyo")))
  }

  test("PK upsert sink MERGEs into Derby: insert then update per key") {
    import spark.implicits._
    val conn = DriverManager.getConnection(url)
    try conn.createStatement().execute(
      "CREATE TABLE sync_gmv (day_time VARCHAR(32) PRIMARY KEY, total DOUBLE)")
    finally conn.close()

    val spec = TableSpec.parse(
      s"""CREATE TABLE sync_gmv (day_time VARCHAR, total DOUBLE,
         |  PRIMARY KEY (day_time) NOT ENFORCED) WITH (
         |  'connector' = 'jdbc', 'url' = '$url',
         |  'table-name' = 'sync_gmv', 'dialect' = 'two-step')""".stripMargin)

    JdbcUpsert.upsert(
      Seq(("2024-01-01", 10.5), ("2024-01-02", 7.0))
        .toDF("day_time", "total"), spec)
    JdbcUpsert.upsert( // second batch updates day 1, inserts day 3
      Seq(("2024-01-01", 99.5), ("2024-01-03", 1.0))
        .toDF("day_time", "total"), spec)

    val conn2 = DriverManager.getConnection(url)
    try {
      val rs = conn2.createStatement()
        .executeQuery("SELECT day_time, total FROM sync_gmv ORDER BY day_time")
      val rows = Iterator.continually(rs)
        .takeWhile(_.next()).map(r => (r.getString(1), r.getDouble(2))).toList
      assert(rows == List(("2024-01-01", 99.5), ("2024-01-02", 7.0),
        ("2024-01-03", 1.0)))
    } finally conn2.close()
  }

  test("batch INSERT OVERWRITE replaces JDBC sink contents; INTO upserts") {
    val conn = DriverManager.getConnection(url)
    try conn.createStatement().execute(
      "CREATE TABLE ow_jdbc (k VARCHAR(16) PRIMARY KEY, v INT)")
    finally conn.close()
    def script(verb: String, k: String, v: Int) =
      s"""CREATE TABLE ow_jdbc (k VARCHAR, v INT,
         |  PRIMARY KEY (k) NOT ENFORCED) WITH (
         |  'connector' = 'jdbc', 'url' = '$url',
         |  'table-name' = 'ow_jdbc', 'dialect' = 'two-step');
         |INSERT $verb ow_jdbc SELECT '$k' AS k, $v AS v;
         |""".stripMargin
    def rows(): List[(String, Int)] = {
      val c = DriverManager.getConnection(url)
      try {
        val rs = c.createStatement()
          .executeQuery("SELECT k, v FROM ow_jdbc ORDER BY k")
        Iterator.continually(rs).takeWhile(_.next())
          .map(r => (r.getString(1), r.getInt(2))).toList
      } finally c.close()
    }
    new ScriptRunner(spark, batchMode = true).run(script("INTO", "a", 1))
    new ScriptRunner(spark, batchMode = true).run(script("INTO", "b", 2))
    assert(rows() == List(("a", 1), ("b", 2))) // INTO upserts/appends
    new ScriptRunner(spark, batchMode = true).run(script("OVERWRITE", "z", 9))
    assert(rows() == List(("z", 9))) // OVERWRITE replaced everything
  }
}
