package graft.sources

import scala.collection.mutable

/** In-memory stub broker speaking the REST consume wire contract of
  * [[KafkaRestSource]] over a real socket — the sandbox's broker
  * stand-in. Lives in main (not test) so the oracle-checked
  * `q_gate_kafka_live` query can self-host the wire inside the driver's
  * Verify/Bench runs; also shared by the source spec and the demo_1
  * gate test.
  */
final class StubBroker(topic: String, nParts: Int) {
  private val logs = Array.fill(nParts)(mutable.Buffer[(String, String)]())
  private val srv = com.sun.net.httpserver.HttpServer.create(
    new java.net.InetSocketAddress("127.0.0.1", 0), 0)
  @volatile var fetches = 0

  def append(p: Int, key: String, value: String): Unit =
    logs(p).synchronized { logs(p) += ((key, value)); () }

  private val PartsRe = s"/topics/$topic/partitions".r
  private val OffsRe = s"/topics/$topic/partitions/(\\d+)/offsets".r
  private val MsgsRe = s"/topics/$topic/partitions/(\\d+)/messages".r

  srv.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
    val path = ex.getRequestURI.getPath
    val query = Option(ex.getRequestURI.getQuery).getOrElse("")
    val body = path match {
      case MsgsRe(p) =>
        fetches += 1
        val qs = query.split("&").filter(_.contains("="))
          .map { kv => val Array(k, v) = kv.split("=", 2); k -> v }.toMap
        val off = qs("offset").toInt
        val count = qs("count").toInt
        val log = logs(p.toInt)
        log.synchronized {
          log.zipWithIndex.slice(off, off + count).map {
            case ((k, v), i) => s"""{"key":$k,"value":$v,"offset":$i}"""
          }.mkString("[", ",", "]")
        }
      case OffsRe(p) =>
        val n = logs(p.toInt).synchronized(logs(p.toInt).size)
        s"""{"beginning_offset":0,"end_offset":$n}"""
      case _ if PartsRe.findFirstIn(path).isDefined =>
        (0 until nParts).map(p => s"""{"partition":$p}""")
          .mkString("[", ",", "]")
      // the REST-proxy PRODUCE route (the upsert-kafka sink's wire):
      // records append to partition 0 in body order — real proxies
      // route by key hash, but a single-writer single-partition append
      // is exactly the ordered-log contract the tests need
      case _ if path == s"/topics/$topic" &&
          ex.getRequestMethod == "POST" =>
        val req = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
        // a malformed body must answer 422, not leave the exchange
        // hanging until the client's read timeout with the real cause
        // buried in a server-side stack trace
        val recs =
          try MiniJson.produceRecords(req)
          catch {
            case e: Exception =>
              val msg = """{"error_code":42201,""" +
                """"message":"malformed produce body"}"""
              val b = msg.getBytes("UTF-8")
              ex.sendResponseHeaders(422, b.length.toLong)
              ex.getResponseBody.write(b)
              ex.close()
              throw new IllegalStateException(
                s"malformed produce body: ${e.getMessage}")
          }
        val offs = logs(0).synchronized {
          recs.map { case (k, v) =>
            logs(0) += ((k, v)); logs(0).size - 1
          }
        }
        offs.map(o =>
          s"""{"partition":0,"offset":$o,"error_code":null,"error":null}""")
          .mkString("""{"offsets":[""", ",", "]}")
      case other =>
        ex.sendResponseHeaders(404, -1); ex.close()
        throw new IllegalStateException(s"unexpected path $other")
    }
    val bytes = body.getBytes("UTF-8")
    ex.sendResponseHeaders(200, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
    ex.close()
  })
  srv.start()
  val endpoint = s"http://127.0.0.1:${srv.getAddress.getPort}"
  def stop(): Unit = srv.stop(0)
}
