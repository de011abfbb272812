package graft.sqlgate

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import scala.collection.mutable

final case class EsDoc(id: Long, name: String, price: Double)

/** Executor-side collector: `EsBulk.writer` runs `post` inside
  * foreachPartition tasks, whose closures are serialized — a driver-local
  * buffer captured in the closure would mutate a deserialized copy. A
  * JVM-static object survives in local mode and observes the posts.
  */
object EsBulkProbe {
  val posted = mutable.Buffer[String]()
  def post(body: String): Unit = posted.synchronized { posted += body }
  def reset(): Unit = posted.synchronized { posted.clear() }
  def all: Seq[String] = posted.synchronized { posted.toList }
}

/** ES bulk sink: NDJSON payload shape, _id from PK (idempotent upsert),
  * JSON escaping, the streaming foreachBatch path, and the executor-side
  * per-partition POST path (no driver materialization).
  */
class EsBulkSpec extends SparkSpec {
  import spark.implicits._

  test("bulkBody: action+document lines, _id from PK, escaping") {
    val rows = Seq(
      org.apache.spark.sql.Row(1L, "plain", 2.5),
      org.apache.spark.sql.Row(2L, "quote\"pipe|tab\t", 0.0))
    val body = EsBulk.bulkBody("products", Seq("id", "name", "price"),
      Seq("id"), rows.iterator)
    val lines = body.split("\n")
    assert(lines.length == 4)
    assert(lines(0) == """{"index":{"_index":"products","_id":"1"}}""")
    assert(lines(1) == """{"id":1,"name":"plain","price":2.5}""")
    assert(lines(2) == """{"index":{"_index":"products","_id":"2"}}""")
    assert(lines(3) == """{"id":2,"name":"quote\"pipe|tab\t","price":0.0}""")
  }

  test("bulkBody: composite-PK _ids are delimiter-safe") {
    val cols = Seq("a", "b")
    def idOf(a: String, b: String): String = {
      val body = EsBulk.bulkBody("idx", cols, cols,
        Iterator(org.apache.spark.sql.Row(a, b)))
      body.split("\n")(0)
    }
    // ("a|b","c") and ("a","b|c") must not collide on _id
    assert(idOf("a|b", "c") != idOf("a", "b|c"))
  }

  test("streaming foreachBatch bulk writer posts batched payloads") {
    implicit val sqlCtx = spark.sqlContext
    EsBulkProbe.reset()
    val in = MemoryStream[EsDoc]
    val q = in.toDF().writeStream
      .foreachBatch(EsBulk.writer("idx", Seq("id"), EsBulkProbe.post _) _)
      .outputMode("append").start()
    try {
      in.addData(EsDoc(1, "a", 1.0), EsDoc(2, "b", 2.0))
      q.processAllAvailable()
      in.addData(EsDoc(1, "a2", 9.0)) // same _id → idempotent upsert
      q.processAllAvailable()
      val all = EsBulkProbe.all.mkString
      assert(all.count(_ == '\n') == 6) // 3 docs × 2 lines
      assert(all.contains(""""_id":"1"""") && all.contains(""""a2""""))
    } finally q.stop()
  }

  test("writer posts per partition on executors, never via the driver") {
    EsBulkProbe.reset()
    val df = (1 to 40).map(i => EsDoc(i.toLong, s"n$i", i.toDouble))
      .toDF().repartition(4)
    EsBulk.writer("idx", Seq("id"), EsBulkProbe.post _)(df, 0L)
    val posts = EsBulkProbe.all
    // one post per non-empty partition (40 docs << MaxDocsPerRequest)
    assert(posts.size > 1 && posts.size <= 4)
    val ids = posts.mkString.split("\n").filter(_.contains("_id"))
    assert(ids.length == 40)
  }

  test("writer chunks oversized partitions at MaxDocsPerRequest") {
    EsBulkProbe.reset()
    val n = EsBulk.MaxDocsPerRequest + 7
    val df = (1 to n).map(i => EsDoc(i.toLong, s"n$i", 0.0))
      .toDF().coalesce(1)
    EsBulk.writer("idx", Seq("id"), EsBulkProbe.post _)(df, 0L)
    val posts = EsBulkProbe.all
    assert(posts.size == 2)
    assert(posts.map(_.count(_ == '\n')).sum == n * 2)
  }

  /** ES-shaped bulk stub over a real socket: records NDJSON bodies,
    * answers the canned response.
    */
  private def esStub(response: String): (com.sun.net.httpserver.HttpServer,
      scala.collection.mutable.Buffer[String]) = {
    val received = mutable.Buffer[String]()
    val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/_bulk", (ex: com.sun.net.httpserver.HttpExchange) => {
      received.synchronized {
        received += new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      }
      val res = response.getBytes("UTF-8")
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(200, res.length)
      ex.getResponseBody.write(res)
      ex.close()
    })
    srv.start()
    (srv, received)
  }

  test("gate: elasticsearch-7 sink delivers _bulk over a live endpoint") {
    val (srv, received) = esStub("""{"took":1,"errors":false,"items":[]}""")
    val src = java.nio.file.Files.createTempDirectory("es_src").toString
    spark.range(0, 3).toDF("id").coalesce(1).write.mode("append").parquet(src)
    val ckpt = java.nio.file.Files.createTempDirectory("es_ckpt").toString
    try {
      val script =
        s"""CREATE TABLE src (id BIGINT) WITH (
           |  'connector' = 'filesystem', 'path' = '$src',
           |  'format' = 'parquet');
           |CREATE TABLE es_snk (id BIGINT, PRIMARY KEY (id) NOT ENFORCED)
           |  WITH ('connector' = 'elasticsearch-7',
           |    'hosts' = 'http://127.0.0.1:${srv.getAddress.getPort}',
           |    'index' = 'products');
           |INSERT INTO es_snk SELECT id FROM src;
           |""".stripMargin
      val res = new ScriptRunner(spark, Some(ckpt)).run(script)
      res.queries.foreach(_.processAllAvailable())
      res.queries.foreach(_.stop())
      val all = received.synchronized(received.mkString)
      assert(all.contains(""""_index":"products""""), all)
      assert((0 to 2).forall(i => all.contains(s""""_id":"$i"""")), all)
    } finally srv.stop(0)
  }

  test("a bulk response with item failures fails the micro-batch") {
    val (srv, _) = esStub(
      """{"took":1,"errors":true,"items":[{"index":{"status":429}}]}""")
    try {
      import spark.implicits._
      val df = Seq(EsDoc(1, "a", 1.0)).toDF()
      val e = intercept[Exception] {
        EsBulk.writer("idx", Seq("id"),
          EsBulk.httpPost(s"http://127.0.0.1:${srv.getAddress.getPort}"))(df, 0L)
      }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x =>
          Option(x.getMessage).toSeq ++ messages(x.getCause))
      assert(messages(e).exists(_.contains("item failures")), e.toString)
    } finally srv.stop(0)
  }

  test("StubEs keyed store: _id overwrite wins, indices are separate, " +
    "anonymous actions append") {
    val es = new graft.sources.StubEs()
    try {
      def post(body: String): Unit =
        graft.Http.post(s"${es.endpoint}/_bulk", "application/x-ndjson",
          body)
      post(
        """{"index":{"_index":"a","_id":"k1"}}
          |{"v":1}
          |{"index":{"_index":"a","_id":"k2"}}
          |{"v":2}
          |{"index":{"_index":"b","_id":"k1"}}
          |{"v":9}
          |""".stripMargin)
      post(
        """{"index":{"_index":"a","_id":"k1"}}
          |{"v":10}
          |{"index":{"_index":"a"}}
          |{"v":3}
          |{"index":{"_index":"a"}}
          |{"v":4}
          |""".stripMargin)
      val a = es.docs("a")
      assert(a("k1") == """{"v":10}""", a.toString) // overwrite wins
      assert(a("k2") == """{"v":2}""")
      assert(a.size == 2, a.toString) // anonymous appends live apart
      assert(es.allDocs("a").size == 4) // 2 keyed + 2 anonymous
      assert(es.docs("b") == Map("k1" -> """{"v":9}""")) // index-scoped
      // a doc-less action (delete) must fail loudly, not silently
      // misalign the following action/document pairs
      val del = intercept[RuntimeException] {
        post(
          """{"delete":{"_index":"a","_id":"k1"}}
            |{"index":{"_index":"a","_id":"k9"}}
            |{"v":99}
            |""".stripMargin)
      }
      assert(del.getMessage.contains("400"), del.getMessage)
      assert(!es.docs("a").contains("k9"), "partial bulk must not apply")
      // atomicity with the failure MID-bulk: pairs BEFORE the malformed
      // action must not land either — a sink retrying the failed
      // micro-batch would otherwise double-apply them (and re-append
      // anonymous documents)
      val mid = intercept[RuntimeException] {
        post(
          """{"index":{"_index":"a","_id":"k8"}}
            |{"v":88}
            |{"index":{"_index":"a"}}
            |{"v":87}
            |{"delete":{"_index":"a","_id":"k1"}}
            |{"index":{"_index":"a","_id":"k7"}}
            |{"v":77}
            |""".stripMargin)
      }
      assert(mid.getMessage.contains("400"), mid.getMessage)
      assert(!es.docs("a").contains("k8") && !es.docs("a").contains("k7"),
        "failed bulk partially applied keyed pairs before the bad action")
      assert(es.allDocs("a").size == 4,
        "failed bulk appended anonymous documents")
      // a non-bulk path 404s loudly
      val e = intercept[RuntimeException] {
        graft.Http.post(s"${es.endpoint}/nope", "application/json", "{}")
      }
      assert(e.getMessage.contains("404"), e.getMessage)
    } finally es.stop()
  }
}
