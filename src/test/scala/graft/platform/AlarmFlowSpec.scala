package graft.platform

import graft.SparkSpec
import graft.platform.JobManager.AlarmEvent
import java.nio.file.Files

/** The full alarm chain end-to-end: system-config store (Derby +
  * in-memory), config-driven composite handler reading URLs at fire
  * time, real wire delivery through the JDK transport to live HTTP
  * stubs, delivery log, and the facade's test-fire + savepoint-list
  * verbs.
  */
class AlarmFlowSpec extends SparkSpec {

  private def formPost(url: String, params: (String, String)*): (Int, String) = {
    val conn = new java.net.URL(url)
      .openConnection().asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    conn.setRequestProperty("Content-Type", "application/x-www-form-urlencoded")
    conn.getOutputStream.write(params.map { case (k, v) =>
      k + "=" + java.net.URLEncoder.encode(v, "UTF-8")
    }.mkString("&").getBytes("UTF-8"))
    val st = conn.getResponseCode
    val in = if (st < 400) conn.getInputStream else conn.getErrorStream
    val body = new String(in.readAllBytes(), "UTF-8")
    conn.disconnect(); (st, body)
  }

  /** A DingDing-shaped webhook stub: records bodies, answers errcode 0. */
  private def dingStub(): (com.sun.net.httpserver.HttpServer,
      scala.collection.mutable.Buffer[String]) = {
    val received = scala.collection.mutable.Buffer[String]()
    val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/robot/send", (ex: com.sun.net.httpserver.HttpExchange) => {
      received.synchronized {
        received += new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      }
      val res = """{"errcode":0,"errmsg":"ok"}""".getBytes("UTF-8")
      ex.sendResponseHeaders(200, res.length)
      ex.getResponseBody.write(res)
      ex.close()
    })
    srv.start()
    (srv, received)
  }

  test("system config round-trips through Derby and in-memory stores") {
    for (cfg <- Seq(new InMemorySystemConfig,
      new JdbcSystemConfig("jdbc:derby:memory:syscfg;create=true"))) {
      cfg.upsert(SystemConfig.DingDingAlarmUrl, "http://a")
      cfg.upsert(SystemConfig.DingDingAlarmUrl, "http://b") // upsert wins
      cfg.upsert(SystemConfig.CallbackAlarmUrl, "http://c")
      assert(cfg.get(SystemConfig.DingDingAlarmUrl).contains("http://b"))
      assert(cfg.all().map(_._1) ==
        Seq(SystemConfig.CallbackAlarmUrl, SystemConfig.DingDingAlarmUrl))
      cfg.delete(SystemConfig.CallbackAlarmUrl)
      assert(cfg.get(SystemConfig.CallbackAlarmUrl).isEmpty)
    }
  }

  test("configured handler reads URLs at fire time and logs deliveries") {
    val cfg = new InMemorySystemConfig
    val alarmLog = new AlarmTransports.AlarmLog(capacity = 3)
    val sent = scala.collection.mutable.Buffer[(String, String)]()
    val handler = AlarmTransports.configuredHandler(cfg, alarmLog,
      post = (u, _, b) => { sent += ((u, b)); """{"errcode":0}""" },
      clock = () => java.time.Instant.parse("2026-08-12T10:30:00Z"))
    val e = AlarmEvent("j1", "etl", "JOB_FAILED", "boom")

    handler(e) // nothing configured → nothing sent, nothing logged
    assert(sent.isEmpty && alarmLog.list().isEmpty)

    cfg.upsert(SystemConfig.CallbackAlarmUrl, "http://cb")
    handler(e) // config edit applies to the NEXT alarm, no restart
    assert(sent.map(_._1) == Seq("http://cb"))
    assert(alarmLog.list().map(d => (d.transport, d.success)) ==
      Seq(("CALLBACK_URL", true)))

    cfg.upsert(SystemConfig.DingDingAlarmUrl, "http://dd")
    handler(e)
    assert(sent.size == 3)
    // newest first; capacity bound evicts the oldest beyond 3
    handler(e)
    assert(alarmLog.list().size == 3)

    // webhook rejection (errcode != 0) is recorded as a failed delivery
    val rejectLog = new AlarmTransports.AlarmLog()
    val reject = AlarmTransports.configuredHandler(cfg, rejectLog,
      post = (_, _, _) => """{"errcode":310000,"errmsg":"keyword"}""")
    reject(e)
    val ding = rejectLog.list().find(_.transport == "DINGDING").get
    assert(!ding.success && ding.detail.contains("310000"))
  }

  test("monitor → configured alarms → real wire delivery to live endpoints") {
    val (stub, received) = dingStub()
    val mgr = new JobManager(spark,
      Files.createTempDirectory("af_ckpt").toString,
      Files.createTempDirectory("af_sp").toString)
    val cfg = new InMemorySystemConfig
    val alarmLog = new AlarmTransports.AlarmLog()
    val api = new HttpApi(mgr, spark, users = None, config = Some(cfg),
      alarmLog = Some(alarmLog))
    try {
      cfg.upsert(SystemConfig.DingDingAlarmUrl,
        s"http://127.0.0.1:${stub.getAddress.getPort}/robot/send")
      cfg.upsert(SystemConfig.CallbackAlarmUrl,
        s"http://127.0.0.1:${api.port}/alarmCallback")
      mgr.addAlarmHandler(AlarmTransports.configuredHandler(cfg, alarmLog))

      // a real running job fails → both transports deliver over sockets
      import spark.implicits._
      val src = Files.createTempDirectory("af_src").toString
      val out = Files.createTempDirectory("af_out").toString
      spark.range(0, 2).toDF("id").coalesce(1).write.mode("append").parquet(src)
      val id = mgr.start("alarm_job",
        s"""CREATE TABLE src (id BIGINT) WITH (
           |  'connector' = 'filesystem', 'path' = '$src',
           |  'format' = 'parquet');
           |CREATE TABLE snk (id BIGINT) WITH (
           |  'connector' = 'filesystem', 'path' = '$out',
           |  'format' = 'parquet');
           |INSERT INTO snk SELECT id FROM src;
           |""".stripMargin)
      mgr.info(id).queries.foreach(_.processAllAvailable())
      mgr.onJobFailure(id, "simulated failure")
      assert(received.synchronized(received.size) == 1)
      assert(received.head.contains("detected job stopped running"))
      val logged = alarmLog.list()
      assert(logged.count(_.success) == 2, logged)
      assert(logged.map(_.transport).toSet == Set("DINGDING", "CALLBACK_URL"))

      // the facade's test-fire endpoints use the same config + transports
      val (tds, tdb) = formPost(s"http://127.0.0.1:${api.port}/api/testDingdingAlert")
      assert(tds == 200 && tdb.contains("\"success\":true"), tdb)
      assert(received.synchronized(received.size) == 2)
      val (ths, thb) = formPost(s"http://127.0.0.1:${api.port}/api/testHttpAlert")
      assert(ths == 200 && thb.contains("\"success\":true"), thb)
      // sysConfig/alartLogList round-trip over HTTP
      val (_, cfgList) = formPost(s"http://127.0.0.1:${api.port}/api/sysConfig")
      assert(cfgList.contains(SystemConfig.DingDingAlarmUrl))
      val (_, logList) = formPost(s"http://127.0.0.1:${api.port}/api/alartLogList")
      assert(logList.contains("\"transport\":\"DINGDING\""), logList)
    } finally { api.close(); stub.stop(0) }
  }

  test("savepoint registration and list over HTTP (registry-backed)") {
    val reg = new JdbcJobRegistry("jdbc:derby:memory:afreg;create=true")
    val mgr = new JobManager(spark,
      Files.createTempDirectory("af2_ckpt").toString,
      Files.createTempDirectory("af2_sp").toString, registry = Some(reg))
    val api = new HttpApi(mgr, spark)
    try {
      val base = s"http://127.0.0.1:${api.port}/api"
      val (_, added) = formPost(s"$base/addConfig", "name" -> "sp_job",
        "script" -> "INSERT INTO t SELECT 1;")
      val id = "\"data\":\"([^\"]*)\"".r.findFirstMatchIn(added).get.group(1)
      assert(formPost(s"$base/addSavepoint", "id" -> id,
        "savepointPath" -> "/sp/one")._1 == 200)
      assert(formPost(s"$base/addSavepoint", "id" -> id,
        "savepointPath" -> "/sp/two")._1 == 200)
      val (ls, lb) = formPost(s"$base/querySavePointList10", "id" -> id)
      assert(ls == 200 && lb.contains("""["/sp/two","/sp/one"]"""), lb)
      assert(mgr.info(id).lastSavepoint.contains("/sp/two"))
    } finally api.close()
  }
}
