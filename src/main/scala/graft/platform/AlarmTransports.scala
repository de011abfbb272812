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
}
