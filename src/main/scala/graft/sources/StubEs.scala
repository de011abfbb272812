package graft.sources

import scala.collection.mutable

/** In-process Elasticsearch-7 stand-in for the keyed bulk sink: accepts
  * the REST `_bulk` NDJSON wire on a live socket and materializes the
  * keyed document store (per index, `_id` → LAST document wins — the
  * idempotent-upsert semantics the sink's `_id`-from-PK actions rely
  * on). The container ships no ES, so this is the sandbox's ES the way
  * [[StubBroker]] is its Kafka: the sink's real wire bytes land in a
  * real keyed store that oracle queries can read back in-process.
  */
final class StubEs {
  // (index, _id as the RAW escaped text from the action line) → doc.
  // Raw-escaped keys stay unique because the sink's escaping is
  // deterministic; the store never needs the unescaped form.
  private val store = mutable.LinkedHashMap[(String, String), String]()
  private var anon = 0L
  private val IdxRe = """"_index"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
  private val IdRe = """"_id"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
  private val srv = com.sun.net.httpserver.HttpServer.create(
    new java.net.InetSocketAddress("127.0.0.1", 0), 0)

  srv.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
    val path = ex.getRequestURI.getPath
    val body =
      if (path == "/_bulk" && ex.getRequestMethod == "POST") {
        val req = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
        val lines = req.split("\n").filter(_.nonEmpty)
        store.synchronized {
          lines.grouped(2).foreach {
            case Array(action, doc) =>
              val idx = IdxRe.findFirstMatchIn(action)
                .map(_.group(1)).getOrElse("")
              val id = IdRe.findFirstMatchIn(action).map(_.group(1))
                .getOrElse { anon += 1; s"__anon_$anon" }
              store((idx, id)) = doc
            case _ => () // odd trailing line: the writer never emits one
          }
        }
        """{"took":1,"errors":false,"items":[]}"""
      } else {
        ex.sendResponseHeaders(404, -1); ex.close()
        throw new IllegalStateException(s"unexpected path $path")
      }
    val bytes = body.getBytes("UTF-8")
    ex.sendResponseHeaders(200, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
    ex.close()
  })
  srv.start()
  val endpoint = s"http://127.0.0.1:${srv.getAddress.getPort}"

  /** Keyed store snapshot for one index: `_id` → last document JSON. */
  def docs(index: String): Map[String, String] = store.synchronized {
    store.collect { case ((i, id), d) if i == index => id -> d }.toMap
  }

  def stop(): Unit = srv.stop(0)
}
