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

  test("chaos: query crashes mid-upsert batch; checkpoint restart replays " +
    "the batch exactly-once into the keyed sink") {
    import spark.implicits._
    // fresh database so the aggressive lock timeout doesn't leak into the
    // other round-trip tests
    val curl = "jdbc:derby:memory:chaosdb;create=true"
    val conn = DriverManager.getConnection(curl)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE chaos_snk (k INT PRIMARY KEY, v INT)")
      // audit trail: one row per physical write — lets the spec PROVE the
      // crash landed mid-batch and the restart re-delivered rows (the
      // keyed sink itself hides the replay, which is the point)
      st.execute("CREATE TABLE chaos_audit (k INT, v INT)")
      st.execute("CREATE TRIGGER chaos_tr_ins AFTER INSERT ON chaos_snk " +
        "REFERENCING NEW AS n FOR EACH ROW " +
        "INSERT INTO chaos_audit VALUES (n.k, n.v)")
      st.execute("CREATE TRIGGER chaos_tr_upd AFTER UPDATE ON chaos_snk " +
        "REFERENCING NEW AS n FOR EACH ROW " +
        "INSERT INTO chaos_audit VALUES (n.k, n.v)")
      // wedged writers die after 2s instead of Derby's default 60s
      st.execute("CALL SYSCS_UTIL.SYSCS_SET_DATABASE_PROPERTY(" +
        "'derby.locks.waitTimeout', '2')")
    } finally conn.close()

    val srcDir = java.nio.file.Files.createTempDirectory("chaos_src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("chaos_ckpt").toString
    val script = // continuous trigger: the query must be mid-flight when
      // the wedge lands, not drained-and-stopped by AvailableNow
      s"""SET table.exec.mini-batch.allow-latency = 200 ms;
         |CREATE TABLE chaos_src (k INT, v INT) WITH (
         |  'connector' = 'filesystem', 'path' = '$srcDir',
         |  'format' = 'parquet');
         |CREATE TABLE chaos_snk (k INT, v INT,
         |  PRIMARY KEY (k) NOT ENFORCED) WITH (
         |  'connector' = 'jdbc', 'url' = '$curl',
         |  'table-name' = 'chaos_snk', 'dialect' = 'two-step');
         |INSERT INTO chaos_snk SELECT k, v FROM chaos_src;
         |""".stripMargin
    def query(c: java.sql.Connection, sql: String): List[(Int, Int)] = {
      val rs = c.createStatement().executeQuery(sql)
      Iterator.continually(rs).takeWhile(_.next())
        .map(r => (r.getInt(1), r.getInt(2))).toList
    }
    def snapshot(): List[(Int, Int)] = {
      val c = DriverManager.getConnection(curl)
      try query(c, "SELECT k, v FROM chaos_snk ORDER BY k") finally c.close()
    }
    def await(timeoutMs: Long)(cond: => Boolean): Boolean = {
      val end = System.currentTimeMillis() + timeoutMs
      while (System.currentTimeMillis() < end) {
        if (cond) return true
        Thread.sleep(100)
      }
      cond
    }

    // batch 1: keys 0-9 flow through and commit
    (0 to 9).map(k => (k, 1)).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(srcDir)
    val run1 = new ScriptRunner(spark, Some(ckpt)).run(script)
    val q1 = run1.queries.head
    try {
      assert(await(60000) { snapshot().size == 10 }, "batch 1 never landed")

      // wedge key 7: an uncommitted UPDATE holds its row lock, so batch
      // 2's writer applies keys 5,6, blocks on 7, and dies on the lock
      // timeout — a real mid-batch crash with a partially applied batch
      val locker = DriverManager.getConnection(curl)
      locker.setAutoCommit(false)
      locker.createStatement().executeUpdate(
        "UPDATE chaos_snk SET v = v WHERE k = 7")
      try {
        (5 to 14).map(k => (k, 2)).toDF("k", "v")
          .coalesce(1).write.mode("append").parquet(srcDir)
        assert(await(60000) { !q1.isActive }, "query survived the wedge")
        assert(q1.exception.isDefined,
          "query should have FAILED mid-batch, not stopped cleanly")
      } finally { locker.rollback(); locker.close() }

      // restart from the same checkpoint: the uncommitted batch replays
      val run2 = new ScriptRunner(spark, Some(ckpt)).run(script)
      val q2 = run2.queries.head
      try {
        assert(await(60000) {
          snapshot() == (0 to 4).map(k => (k, 1)).toList ++
            (5 to 14).map(k => (k, 2)).toList
        }, s"exactly-once state mismatch: ${snapshot()}")
      } finally q2.stop()

      // replay evidence: a clean run writes exactly 20 audit rows (10
      // batch-1 inserts + 5 updates + 5 inserts); the partial pre-crash
      // writes push the total beyond that, proving rows were delivered
      // twice and absorbed idempotently
      val c = DriverManager.getConnection(curl)
      val audit =
        try query(c, "SELECT k, v FROM chaos_audit") finally c.close()
      assert(audit.size > 20,
        s"no overlapping delivery observed (audit=${audit.size}); " +
          "the chaos case did not exercise replay")
    } finally if (q1.isActive) q1.stop()
  }
}
