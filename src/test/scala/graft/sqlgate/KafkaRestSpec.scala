package graft.sqlgate

import graft.SparkSpec
import scala.collection.mutable

/** upsert-kafka sink: debezium-json record shape, PK key objects, delete
  * tombstone routing, and the demo_6 GMV pipeline delivering changelog
  * bytes over a REAL socket to a Kafka-REST-proxy-shaped endpoint.
  */
class KafkaRestSpec extends SparkSpec {
  import spark.implicits._

  test("recordsBody: PK key object, upsert envelope, op column routing") {
    val cols = Seq("day_str", "gmv")
    val body = KafkaRest.recordsBody(cols, Seq("day_str"), Iterator(
      org.apache.spark.sql.Row("2024-01-01", 12.5)))
    assert(body ==
      """{"records":[{"key":{"day_str":"2024-01-01"},""" +
        """"value":{"op":"u","before":null,""" +
        """"after":{"day_str":"2024-01-01","gmv":12.5}}}]}""")
    // an op column routes deletes to a before-image envelope and is
    // excluded from the row payload
    val withOp = KafkaRest.recordsBody(Seq("op", "k", "v"), Seq("k"),
      Iterator(org.apache.spark.sql.Row("d", 7L, "x")))
    assert(withOp.contains(""""op":"d""""))
    assert(withOp.contains(""""before":{"k":7,"v":"x"}"""))
    assert(withOp.contains(""""after":null"""))
  }

  test("recordsBody: delete-op spellings normalize; duplicate columns fail") {
    // RowKind-style "-D" and padded/uppercased forms must route as
    // deletes, not silently encode as upserts
    for (spelling <- Seq("D", "-D", " d ", "DELETE")) {
      val b = KafkaRest.recordsBody(Seq("op", "k"), Seq("k"),
        Iterator(org.apache.spark.sql.Row(spelling, 1L)))
      assert(b.contains(""""op":"d""""), s"spelling '$spelling'")
      assert(b.contains(""""after":null"""), s"spelling '$spelling'")
    }
    // non-delete ops pass through as upsert-side envelopes
    val ins = KafkaRest.recordsBody(Seq("op", "k"), Seq("k"),
      Iterator(org.apache.spark.sql.Row("c", 1L)))
    assert(ins.contains(""""op":"c"""") && ins.contains(""""before":null"""))
    // duplicate column names can no longer alias to the first occurrence
    intercept[IllegalArgumentException] {
      KafkaRest.recordsBody(Seq("k", "k"), Seq("k"),
        Iterator(org.apache.spark.sql.Row(1L, 2L)))
    }
  }

  /** REST-proxy-shaped produce stub over a real socket. */
  private def kafkaStub(topic: String, response: String)
      : (com.sun.net.httpserver.HttpServer, mutable.Buffer[String]) = {
    val received = mutable.Buffer[String]()
    val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext(s"/topics/$topic",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        received.synchronized {
          received += new String(ex.getRequestBody.readAllBytes(), "UTF-8")
        }
        val res = response.getBytes("UTF-8")
        ex.getResponseHeaders.set("Content-Type",
          "application/vnd.kafka.v2+json")
        ex.sendResponseHeaders(200, res.length)
        ex.getResponseBody.write(res)
        ex.close()
      })
    srv.start()
    (srv, received)
  }

  private val okResponse =
    """{"offsets":[{"partition":0,"offset":0,"error_code":null,"error":null}]}"""

  test("gate: demo_6 upsert-kafka sink delivers debezium records over a live socket") {
    val (srv, received) = kafkaStub("flink_test_6", okResponse)
    val src = java.nio.file.Files.createTempDirectory("uk_src").toString
    Seq(("2024-01-01", 10.0, true), ("2024-01-01", 2.5, true),
      ("2024-01-02", 7.0, true), ("2024-01-02", 99.0, false))
      .toDF("day_str", "price", "order_status")
      .coalesce(1).write.mode("append").parquet(src)
    val ckpt = java.nio.file.Files.createTempDirectory("uk_ckpt").toString
    try {
      // demo_6.md:206-226 shape: keyed GMV aggregate into a compacted
      // topic as debezium-json
      val script =
        s"""CREATE TABLE orders_src (
           |  day_str STRING, price DOUBLE, order_status BOOLEAN
           |) WITH ('connector' = 'filesystem', 'path' = '$src',
           |  'format' = 'parquet');
           |CREATE TABLE kafka_gmv (
           |  day_str STRING, gmv DOUBLE,
           |  PRIMARY KEY (day_str) NOT ENFORCED
           |) WITH ('connector' = 'upsert-kafka',
           |  'topic' = 'flink_test_6',
           |  'rest.endpoint' = 'http://127.0.0.1:${srv.getAddress.getPort}');
           |INSERT INTO kafka_gmv
           |SELECT day_str, SUM(price) AS gmv FROM orders_src
           |WHERE order_status = true GROUP BY day_str;
           |""".stripMargin
      val res = new ScriptRunner(spark, Some(ckpt)).run(script)
      res.queries.foreach(_.processAllAvailable())
      res.queries.foreach(_.stop())
      val all = received.synchronized(received.mkString)
      assert(all.contains(""""key":{"day_str":"2024-01-01"}"""), all)
      assert(all.contains(""""after":{"day_str":"2024-01-01","gmv":12.5}"""),
        all)
      assert(all.contains(""""after":{"day_str":"2024-01-02","gmv":7.0}"""),
        all)
      assert(!all.contains("99.0"), s"status=false row must be filtered: $all")
    } finally srv.stop(0)
  }

  test("a produce response with a record error fails the micro-batch") {
    val (srv, _) = kafkaStub("t_err",
      """{"offsets":[{"partition":null,"offset":null,"error_code":50003,"error":"timed out"}]}""")
    try {
      val df = Seq(("k1", 1.0)).toDF("k", "v")
      val e = intercept[Exception] {
        KafkaRest.writer(Seq("k"), KafkaRest.httpPost(
          s"http://127.0.0.1:${srv.getAddress.getPort}", "t_err"))(df, 0L)
      }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x =>
          Option(x.getMessage).toSeq ++ messages(x.getCause))
      assert(messages(e).exists(_.contains("record failures")), e.toString)
    } finally srv.stop(0)
  }

  test("recordsBody: NULL op is an upsert; missing PK column fails loudly") {
    val nullOp = KafkaRest.recordsBody(Seq("op", "k"), Seq("k"),
      Iterator(org.apache.spark.sql.Row(null, 1L)))
    assert(nullOp.contains(""""op":"u"""") && nullOp.contains(""""after":{"k":1}"""))
    val e = intercept[IllegalArgumentException] {
      KafkaRest.recordsBody(Seq("a", "b"), Seq("missing"),
        Iterator(org.apache.spark.sql.Row("x", "y")))
    }
    assert(e.getMessage.contains("missing"))
  }

  test("native-producer encoding matches the REST envelope, op routing included") {
    // the broker path must produce the SAME bytes as KafkaRest: deletes
    // as before-images, op excluded from the row payload, NULL op = upsert
    val df = Seq(("d", 1L, "x"), ("u", 2L, "y"), (null, 3L, "z"))
      .toDF("op", "k", "v")
    val recs = Connectors.upsertKafkaRecords(df, Seq("k"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(recs.contains(
      ("""{"k":1}""", """{"op":"d","before":{"k":1,"v":"x"}}""")))
    assert(recs.contains(
      ("""{"k":2}""", """{"op":"u","after":{"k":2,"v":"y"}}""")))
    assert(recs.contains(
      ("""{"k":3}""", """{"op":"u","after":{"k":3,"v":"z"}}""")))
  }

  test("upsert-kafka without a PRIMARY KEY is rejected") {
    val df = Seq(("a", 1.0)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      KafkaRest.writer(Seq.empty, _ => ())(df, 0L)
    }
  }

  test("StubBroker answers a malformed produce body with 422, not a hang") {
    // a parse failure inside the handler must fail the producer fast
    // with the status named — not leave the exchange unanswered until
    // the client's 15 s read timeout — and the broker must survive it
    val broker = new graft.sources.StubBroker("bad_prod", 1)
    try {
      val e = intercept[RuntimeException] {
        graft.Http.post(s"${broker.endpoint}/topics/bad_prod",
          "application/vnd.kafka.json.v2+json", "not json")
      }
      assert(e.getMessage.contains("422"), e.getMessage)
      // a well-formed produce afterwards still lands
      val ok = graft.Http.post(s"${broker.endpoint}/topics/bad_prod",
        "application/vnd.kafka.json.v2+json",
        """{"records":[{"key":1,"value":{"a":2}}]}""")
      assert(ok.contains(""""offset":0"""), ok)
    } finally broker.stop()
  }

  test("produce route partitions BY KEY on an N-partition topic: same " +
    "key always same partition, per-key order survives interleaving") {
    val broker = new graft.sources.StubBroker("part_route", 3)
    try {
      def rec(k: Int, v: Int) =
        s"""{"key":{"k":$k},"value":{"k":$k,"v":$v}}"""
      // two produce REQUESTS with the same keys interleaved differently —
      // the per-key sequence (v: 1 then 2) must survive on whatever
      // partition each key routes to
      graft.Http.post(s"${broker.endpoint}/topics/part_route",
        "application/vnd.kafka.json.v2+json",
        (0 until 8).map(k => rec(k, 1))
          .mkString("""{"records":[""", ",", "]}"))
      graft.Http.post(s"${broker.endpoint}/topics/part_route",
        "application/vnd.kafka.json.v2+json",
        (7 to 0 by -1).map(k => rec(k, 2))
          .mkString("""{"records":[""", ",", "]}"))
      val byPart = (0 until 3).map(broker.partitionLog)
      // every key's records live on exactly ONE partition, in produce
      // order; the routing is the partitionFor function
      (0 until 8).foreach { k =>
        val owners = byPart.zipWithIndex.filter(_._1.exists(
          _._1 == s"""{"k":$k}"""))
        assert(owners.size == 1, s"key $k on ${owners.size} partitions")
        assert(owners.head._2 == broker.partitionFor(s"""{"k":$k}"""))
        val vs = owners.head._1.filter(_._1 == s"""{"k":$k}""")
          .map(_._2)
        assert(vs == Seq(s"""{"k":$k,"v":1}""", s"""{"k":$k,"v":2}"""),
          s"key $k order: $vs")
      }
      // the routing actually spreads keys (murmur2 is not degenerate
      // on these key strings) — more than one partition is populated
      assert(byPart.count(_.nonEmpty) > 1,
        byPart.map(_.size).mkString(","))
      // null-key policy: pinned to partition 0, deterministically
      assert(broker.partitionFor("null") == 0 &&
        broker.partitionFor(null) == 0)
    } finally broker.stop()
  }
}
