package graft

/** Minimal JDK HTTP POST shared by the wire transports (ES `_bulk`,
  * alarm webhooks): timeouts, try/finally disconnect (no socket leak
  * when the write throws mid-exchange), error-stream drain, and a
  * throw on HTTP >= 400 carrying the response head. One copy of the
  * plumbing so a fix can't miss a transport.
  */
object Http {
  def post(url: String, contentType: String, body: String,
      timeoutMs: Int = 15000): String = {
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    try {
      conn.setConnectTimeout(timeoutMs)
      conn.setReadTimeout(timeoutMs)
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      conn.setRequestProperty("Content-Type", contentType)
      conn.getOutputStream.write(body.getBytes("UTF-8"))
      val status = conn.getResponseCode
      val in = if (status < 400) conn.getInputStream else conn.getErrorStream
      val res = new String(
        Option(in).map(_.readAllBytes()).getOrElse(Array.emptyByteArray),
        "UTF-8")
      if (status >= 400)
        throw new RuntimeException(
          s"POST ${redact(url)} failed: HTTP $status ${res.take(200)}")
      res
    } finally conn.disconnect()
  }

  /** GET with the same timeout/cleanup discipline as [[post]] — used by
    * the REST-shaped Kafka consume source (offset + record fetches).
    */
  def get(url: String, timeoutMs: Int = 15000): String = {
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    try {
      conn.setConnectTimeout(timeoutMs)
      conn.setReadTimeout(timeoutMs)
      conn.setRequestMethod("GET")
      val status = conn.getResponseCode
      val in = if (status < 400) conn.getInputStream else conn.getErrorStream
      val res = new String(
        Option(in).map(_.readAllBytes()).getOrElse(Array.emptyByteArray),
        "UTF-8")
      if (status >= 400)
        throw new RuntimeException(
          s"GET ${redact(url)} failed: HTTP $status ${res.take(200)}")
      res
    } finally conn.disconnect()
  }

  /** Error messages carry only scheme://host/path — query strings (e.g.
    * a webhook access_token) and userinfo are secrets, and these
    * messages flow into alarm-log rows and API responses.
    */
  private def redact(url: String): String =
    try {
      val u = new java.net.URL(url)
      s"${u.getProtocol}://${u.getHost}${Option(u.getPath).getOrElse("")}"
    } catch { case _: Throwable => "<invalid url>" }
}
