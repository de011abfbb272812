package graft.platform

import graft.platform.JobManager.AlarmEvent
import org.scalatest.funsuite.AnyFunSuite

/** Alarm payload formats (DingDing webhook + HTTP form callback) and the
  * never-throw delivery contract of the addAlarmHandler-ready senders.
  */
class AlarmTransportsSpec extends AnyFunSuite {

  private val failed = AlarmEvent("ab12cd34", "orders_etl", "JOB_FAILED",
    "source exhausted")
  private val restarted = AlarmEvent("ef56ab78", "orders_etl",
    "AUTO_RESTARTED", "restarted after: source exhausted")
  private val at = java.time.Instant.parse("2026-08-12T10:30:00Z")

  test("DingDing payload is the reference msgtype-text JSON with timestamp") {
    val p = AlarmTransports.dingTalkPayload(failed, at)
    assert(p ==
      """{"msgtype": "text", "text": { "content": "2026-08-12 10:30:00 """ +
        """Spark job alarm: detected job stopped running, job[ab12cd34] """ +
        """name: orders_etl — source exhausted" } }""")
    // payload must stay parseable JSON even with quotes/newlines in the
    // failure detail
    val nasty = AlarmTransports.dingTalkPayload(
      failed.copy(detail = "he said \"boom\"\nline2"), at)
    assert(nasty.contains("\\\"boom\\\"") && nasty.contains("\\n"))

    val r = AlarmTransports.dingTalkPayload(restarted, at)
    assert(r.contains("job auto-restarted after failure") &&
      r.contains("job[ef56ab78]"))
  }

  test("DingDing response accepted iff errcode is 0 or absent") {
    assert(AlarmTransports.dingTalkAccepted("""{"errcode":0,"errmsg":"ok"}"""))
    assert(AlarmTransports.dingTalkAccepted("""{"errcode": "0"}"""))
    assert(AlarmTransports.dingTalkAccepted("""{"ok":true}"""))
    assert(!AlarmTransports.dingTalkAccepted("""{"errcode":310000,"errmsg":"keyword missing"}"""))
    assert(!AlarmTransports.dingTalkAccepted(""))
    assert(!AlarmTransports.dingTalkAccepted(null))
  }

  test("HTTP callback posts url-encoded appId/deployMode/jobName form") {
    val body = AlarmTransports.httpCallbackBody(
      failed.copy(jobName = "orders etl+v2"), "SPARK_LOCAL")
    assert(body == "appId=ab12cd34&deployMode=SPARK_LOCAL&jobName=orders+etl%2Bv2")
  }

  test("handlers post through the pluggable transport and never throw") {
    val sent = scala.collection.mutable.Buffer[(String, String, String)]()
    val capture = (u: String, ct: String, b: String) => {
      sent += ((u, ct, b)); """{"errcode":0}"""
    }
    val ding = AlarmTransports.dingTalkHandler(
      "https://oapi.example/robot/send", capture, clock = () => at)
    val http = AlarmTransports.httpCallbackHandler(
      "https://cb.example/hook", "SPARK_LOCAL", capture)
    ding(failed); http(restarted)
    assert(sent.size == 2)
    assert(sent(0)._1 == "https://oapi.example/robot/send" &&
      sent(0)._2 == "application/json" &&
      sent(0)._3 == AlarmTransports.dingTalkPayload(failed, at))
    assert(sent(1)._2 == "application/x-www-form-urlencoded" &&
      sent(1)._3 == AlarmTransports.httpCallbackBody(restarted, "SPARK_LOCAL"))

    // unknown kinds are filtered; transport blow-ups are contained
    ding(failed.copy(kind = "NOT_A_THING"))
    assert(sent.size == 2)
    val boom = AlarmTransports.dingTalkHandler("u",
      (_, _, _) => throw new RuntimeException("down"), clock = () => at)
    boom(failed) // must not propagate
  }
}
