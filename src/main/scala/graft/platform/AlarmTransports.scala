package graft.platform

import graft.JsonUtil
import graft.platform.JobManager.AlarmEvent

/** Alarm transports mirroring the reference's web-alarm module: a
  * DingDing text-message webhook (`DingDingAlarmImpl.java:25-70`) and a
  * generic HTTP form callback (`HttpAlarmImpl.java:31-62`), fanned out of
  * `JobManager.addAlarmHandler`. As with [[graft.sqlgate.EsBulk]], the
  * container ships no HTTP client, so the wire POST is a pluggable
  * `post(url, contentType, body) => responseBody` function; payload
  * construction and response interpretation — the actual alarm logic —
  * are real and spec'd.
  */
object AlarmTransports {

  /** Alarm text for an event — the reference's monitor message shape
    * (`TaskServiceAOImpl.java:223` "detected job [id] stopped, name: …"
    * prefixed by `SystemConstants.buildDingdingMessage`'s banner).
    */
  def message(e: AlarmEvent): String = {
    val what = e.kind match {
      case "JOB_FAILED"     => "detected job stopped running"
      case "AUTO_RESTARTED" => "job auto-restarted after failure"
      case "RESTART_FAILED" => "job auto-restart FAILED"
      case "RECONCILED"     => "job status reconciled to STOPPED"
      case other            => other
    }
    val detail = if (e.detail.isEmpty) "" else s" — ${e.detail}"
    s"Spark job alarm: $what, job[${e.jobId}] name: ${e.jobName}$detail"
  }

  private val TsFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss")
    .withZone(java.time.ZoneOffset.UTC)

  /** DingDing webhook payload (`DingDingAlarmImpl.java:63-69`): a
    * `msgtype: text` JSON body whose content is the timestamped alarm
    * message. The timestamp is an argument so specs are deterministic.
    */
  def dingTalkPayload(e: AlarmEvent, at: java.time.Instant): String =
    s"""{"msgtype": "text", "text": { "content": ${
      JsonUtil.str(s"${TsFmt.format(at)} ${message(e)}")} } }"""

  /** DingDing accepts a webhook iff the response JSON carries
    * `errcode: 0` (or no errcode at all) — `DingDingAlarmImpl.java:44-48`.
    */
  def dingTalkAccepted(responseBody: String): Boolean =
    responseBody != null && responseBody.nonEmpty &&
      ("\"errcode\"\\s*:\\s*\"?(-?\\d+)".r.findFirstMatchIn(responseBody)
        match {
          case Some(m) => m.group(1) == "0"
          case None => true
        })

  /** HTTP-callback form body (`HttpAlarmImpl.java:40-47`): url-encoded
    * `appId`/`deployMode`/`jobName` — the CallbackDTO fields the
    * reference posts; the job id plays appId (our in-process equivalent
    * of the cluster application id).
    */
  def httpCallbackBody(e: AlarmEvent, deployMode: String): String =
    Seq("appId" -> e.jobId, "deployMode" -> deployMode,
      "jobName" -> e.jobName)
      .map { case (k, v) =>
        k + "=" + java.net.URLEncoder.encode(v, "UTF-8")
      }.mkString("&")

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** An `addAlarmHandler`-ready DingDing sender. Transport failures and
    * webhook rejections are logged, never thrown — alarm failure must not
    * become job failure (JobManager.fireAlarm guards this too, but a
    * handler shouldn't rely on it).
    */
  def dingTalkHandler(url: String,
      post: (String, String, String) => String,
      kinds: Set[String] = DefaultKinds,
      clock: () => java.time.Instant = () => java.time.Instant.now())
      : AlarmEvent => Unit = e =>
    if (kinds(e.kind)) {
      try {
        val res = post(url, "application/json", dingTalkPayload(e, clock()))
        if (!dingTalkAccepted(res))
          log.warn(s"DingDing webhook rejected alarm for job ${e.jobId}: $res")
      } catch {
        case ex: Throwable =>
          log.warn(s"DingDing alarm send failed for job ${e.jobId}: $ex")
      }
    }

  /** An `addAlarmHandler`-ready HTTP-callback sender; the pluggable post
    * returns the response status line/body, any exception counts as
    * delivery failure (the reference treats non-2xx the same way).
    */
  def httpCallbackHandler(url: String, deployMode: String,
      post: (String, String, String) => String,
      kinds: Set[String] = DefaultKinds): AlarmEvent => Unit = e =>
    if (kinds(e.kind)) {
      try post(url, "application/x-www-form-urlencoded",
        httpCallbackBody(e, deployMode))
      catch {
        case ex: Throwable =>
          log.warn(s"HTTP callback alarm failed for job ${e.jobId}: $ex")
      }
    }

  /** Every kind JobManager fires today. */
  val DefaultKinds: Set[String] =
    Set("JOB_FAILED", "AUTO_RESTARTED", "RESTART_FAILED", "RECONCILED")

  /** Default wire transport: the shared JDK POST helper ([[graft.Http]])
    * with the reference's 15 s timeouts (`HttpUtil.TIME_OUT_15_S`). No
    * extra dependency needed — the pluggable-post seam stays for tests
    * and for environments that route alarms differently.
    */
  val jdkPost: (String, String, String) => String =
    (url, contentType, body) => graft.Http.post(url, contentType, body)

  /** One delivered (or failed) alarm — the reference's `alart_log` row
    * (`AlarmServiceAOImpl.insertLog`).
    */
  final case class Delivery(jobId: String, jobName: String, kind: String,
      transport: String, success: Boolean, detail: String)

  /** Bounded in-memory alarm delivery log (newest first), the queryable
    * backing of `/api/alartLogList`.
    */
  final class AlarmLog(capacity: Int = 1000) {
    private val buf = scala.collection.mutable.ArrayDeque[Delivery]()
    def add(d: Delivery): Unit = synchronized {
      buf.prepend(d)
      while (buf.size > capacity) { buf.removeLast(); () }
    }
    def list(limit: Int = 100): Seq[Delivery] =
      synchronized(buf.take(limit).toSeq)
  }

  /** Config-driven composite sender: reads the webhook URLs from
    * [[SystemConfig]] AT FIRE TIME (edits apply to the next alarm, no
    * restart — the reference looks config up per send,
    * `TaskServiceAOImpl.java:304-310`), sends over both configured
    * transports, and records every attempt in the [[AlarmLog]].
    */
  def configuredHandler(cfg: SystemConfig, alarmLog: AlarmLog,
      post: (String, String, String) => String = jdkPost,
      deployMode: String = "SPARK_LOCAL",
      kinds: Set[String] = DefaultKinds,
      clock: () => java.time.Instant = () => java.time.Instant.now())
      : AlarmEvent => Unit = e =>
    if (kinds(e.kind)) {
      cfg.get(SystemConfig.DingDingAlarmUrl).filter(_.nonEmpty).foreach { url =>
        val (ok, detail) =
          try {
            val res = post(url, "application/json", dingTalkPayload(e, clock()))
            (dingTalkAccepted(res), res.take(200))
          } catch { case ex: Throwable => (false, String.valueOf(ex.getMessage)) }
        alarmLog.add(Delivery(e.jobId, e.jobName, e.kind, "DINGDING", ok, detail))
        if (!ok) log.warn(s"DingDing alarm delivery failed for ${e.jobId}: $detail")
      }
      cfg.get(SystemConfig.CallbackAlarmUrl).filter(_.nonEmpty).foreach { url =>
        val (ok, detail) =
          try { (true, post(url, "application/x-www-form-urlencoded",
            httpCallbackBody(e, deployMode)).take(200)) }
          catch { case ex: Throwable => (false, String.valueOf(ex.getMessage)) }
        alarmLog.add(Delivery(e.jobId, e.jobName, e.kind, "CALLBACK_URL", ok, detail))
        if (!ok) log.warn(s"HTTP callback alarm delivery failed for ${e.jobId}: $detail")
      }
    }
}
