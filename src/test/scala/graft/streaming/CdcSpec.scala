package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

final case class CdcRaw(value: String)

/** CDC changelog semantics (demo_6 pipeline): debezium decode, keyed
  * MERGE with in-batch last-wins, delete handling, retraction-aware
  * aggregation over materialized state.
  */
class CdcSpec extends SparkSpec {

  private val productSchema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("price", DoubleType)))

  private def dz(op: String, ts: Long, before: String, after: String) =
    CdcRaw(s"""{"op":"$op","ts_ms":$ts,"before":$before,"after":$after}""")

  test("debezium decode → keyed merge → retraction-aware aggregate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    CdcOps.StateStore.clear("products")
    val in = MemoryStream[CdcRaw]
    val decoded = CdcOps.decodeDebezium(in.toDF(), productSchema)
    val q = decoded.writeStream
      .foreachBatch(CdcOps.applyChangelog("products", Seq("id")) _)
      .outputMode("append").start()
    try {
      // batch 1: two inserts + an update of id=1 in the same batch
      in.addData(
        dz("c", 1000, "null", """{"id":1,"name":"scooter","price":3.25}"""),
        dz("c", 1001, "null", """{"id":2,"name":"hammer","price":11.0}"""),
        dz("u", 1002, """{"id":1,"name":"scooter","price":3.25}""",
          """{"id":1,"name":"scooter","price":5.0}"""))
      q.processAllAvailable()
      val t = CdcOps.StateStore.table("products")
      assert(t.size == 2)
      assert(t(StreamOps.encodeKey(Seq(1))).getDouble(2) == 5.0) // last event per key won
      // batch 2: delete id=2, insert id=3
      in.addData(
        dz("d", 2000, """{"id":2,"name":"hammer","price":11.0}""", "null"),
        dz("c", 2001, "null", """{"id":3,"name":"wrench","price":7.5}"""))
      q.processAllAvailable()
      assert(t.size == 2 &&
        !t.contains(StreamOps.encodeKey(Seq(2))) &&
        t.contains(StreamOps.encodeKey(Seq(3))))
      // retraction-aware SUM over state: 5.0 + 7.5, not the event history
      val agg = CdcOps.aggregateState(spark, "products", productSchema)
        .agg(sum($"price")).collect().head.getDouble(0)
      assert(agg == 12.5)
    } finally q.stop()
  }

  test("tombstones and undecodable values are dropped, not stored") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    CdcOps.StateStore.clear("p3")
    val in = MemoryStream[CdcRaw]
    val q = CdcOps.decodeDebezium(in.toDF(), productSchema).writeStream
      .foreachBatch(CdcOps.applyChangelog("p3", Seq("id")) _)
      .outputMode("append").start()
    try {
      in.addData(
        dz("c", 1, "null", """{"id":1,"name":"a","price":1.0}"""),
        CdcRaw("not json at all"), // undecodable → dropped
        CdcRaw("null"))            // kafka tombstone → dropped
      q.processAllAvailable()
      val t = CdcOps.StateStore.table("p3")
      assert(t.size == 1 && t.contains(StreamOps.encodeKey(Seq(1))))
      // retraction-aware aggregate survives (no null rows in state)
      val agg = CdcOps.aggregateState(spark, "p3", productSchema)
        .count()
      assert(agg == 1)
    } finally q.stop()
  }

  test("debezium encode round-trips through decode (changelog-out side)") {
    import spark.implicits._
    val rows = Seq(
      ("c", 100L, 1L, "scooter", 3.25),
      ("d", 200L, 2L, "hammer", 11.0))
      .toDF("op", "ts_ms", "id", "name", "price")
    val encoded = CdcOps.encodeDebezium(rows, Seq("id", "name", "price"))
    val decoded = CdcOps.decodeDebezium(encoded, productSchema)
      .collect().sortBy(_.getLong(1))
    assert(decoded.length == 2)
    val c = decoded.head
    assert(c.getString(0) == "c" && c.isNullAt(2)) // create: before null
    assert(c.getStruct(3).getString(1) == "scooter")
    val d = decoded(1)
    assert(d.getString(0) == "d" && d.isNullAt(3)) // delete: after null
    assert(d.getStruct(2).getDouble(2) == 11.0)
  }

  test("applyChangelogJdbc materializes c/u/d into a live Derby keyed table") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val url = "jdbc:derby:memory:cdcdb;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try conn.createStatement().execute(
      "CREATE TABLE products_cdc (id BIGINT PRIMARY KEY, " +
        "name VARCHAR(64), price DOUBLE)")
    finally conn.close()
    val spec = graft.sqlgate.TableSpec.parse(
      s"""CREATE TABLE products_cdc (id BIGINT, name VARCHAR, price DOUBLE,
         |  PRIMARY KEY (id) NOT ENFORCED) WITH (
         |  'connector' = 'jdbc', 'url' = '$url',
         |  'table-name' = 'products_cdc', 'dialect' = 'two-step')""".stripMargin)

    def scan() = graft.sqlgate.Connectors
      .source(spark, spec, streaming = false)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .sortBy(_._1)

    val in = MemoryStream[CdcRaw]
    val q = CdcOps.decodeDebezium(in.toDF(), productSchema).writeStream
      .foreachBatch(CdcOps.applyChangelogJdbc(spec, Seq("id")) _)
      .outputMode("append").start()
    try {
      // batch 1: two inserts + an in-batch update of id=1 (last-wins)
      in.addData(
        dz("c", 1000, "null", """{"id":1,"name":"scooter","price":3.25}"""),
        dz("c", 1001, "null", """{"id":2,"name":"hammer","price":11.0}"""),
        dz("u", 1002, """{"id":1,"name":"scooter","price":3.25}""",
          """{"id":1,"name":"scooter","price":5.0}"""))
      q.processAllAvailable()
      assert(scan().toSeq == Seq(
        (1L, "scooter", 5.0), (2L, "hammer", 11.0)))
      // batch 2: delete id=2 (before-image key), insert id=3
      in.addData(
        dz("d", 2000, """{"id":2,"name":"hammer","price":11.0}""", "null"),
        dz("c", 2001, "null", """{"id":3,"name":"wrench","price":7.5}"""))
      q.processAllAvailable()
      assert(scan().toSeq == Seq(
        (1L, "scooter", 5.0), (3L, "wrench", 7.5)))
      // retraction-aware aggregate = aggregate over the materialized
      // table (demo_6's SUM survives the update and the delete)
      val total = graft.sqlgate.Connectors
        .source(spark, spec, streaming = false)
        .agg(sum($"price")).collect().head.getDouble(0)
      assert(total == 12.5)
    } finally q.stop()
  }

  test("JDBC keyed delete predicate is null-safe") {
    import spark.implicits._
    val url = "jdbc:derby:memory:cdcnull;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE kv_nullkey (k VARCHAR(16), v INT)")
      st.execute("INSERT INTO kv_nullkey VALUES ('a', 1)")
      st.execute("INSERT INTO kv_nullkey VALUES (NULL, 2)")
      st.execute("INSERT INTO kv_nullkey VALUES ('b', 3)")
    } finally conn.close()
    val spec = graft.sqlgate.TableSpec.parse(
      s"""CREATE TABLE kv_nullkey (k VARCHAR, v INT) WITH (
         |  'connector' = 'jdbc', 'url' = '$url',
         |  'table-name' = 'kv_nullkey')""".stripMargin)
    // delete by a NULL key: plain `k = ?` would never match (SQL NULL)
    graft.sqlgate.JdbcUpsert.delete(
      Seq(Option.empty[String], Some("a")).toDF("k"), spec)
    val left = graft.sqlgate.Connectors.source(spark, spec, streaming = false)
      .collect().map(_.getInt(1)).sorted.toSeq
    assert(left == Seq(3)) // NULL-keyed and 'a' rows deleted, 'b' kept
  }

  test("delete of an absent key and reinsert after delete are safe") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    CdcOps.StateStore.clear("p2")
    val in = MemoryStream[CdcRaw]
    val q = CdcOps.decodeDebezium(in.toDF(), productSchema).writeStream
      .foreachBatch(CdcOps.applyChangelog("p2", Seq("id")) _)
      .outputMode("append").start()
    try {
      in.addData(dz("d", 1, """{"id":9,"name":"ghost","price":1.0}""", "null"))
      q.processAllAvailable()
      assert(CdcOps.StateStore.table("p2").isEmpty)
      in.addData(
        dz("c", 2, "null", """{"id":9,"name":"back","price":2.0}"""),
        dz("d", 3, """{"id":9,"name":"back","price":2.0}""", "null"),
        dz("c", 4, "null", """{"id":9,"name":"again","price":3.0}"""))
      q.processAllAvailable()
      val t = CdcOps.StateStore.table("p2")
      assert(t.size == 1 && t(StreamOps.encodeKey(Seq(9))).getString(1) == "again")
    } finally q.stop()
  }
}
