package graft.sqlgate

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import scala.collection.mutable

final case class EsDoc(id: Long, name: String, price: Double)

/** ES bulk sink: NDJSON payload shape, _id from PK (idempotent upsert),
  * JSON escaping, and the streaming foreachBatch path with a captured
  * transport.
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

  test("streaming foreachBatch bulk writer posts batched payloads") {
    implicit val sqlCtx = spark.sqlContext
    val posted = mutable.Buffer[String]()
    val in = MemoryStream[EsDoc]
    val q = in.toDF().writeStream
      .foreachBatch(EsBulk.writer("idx", Seq("id"),
        body => posted.synchronized { posted += body }) _)
      .outputMode("append").start()
    try {
      in.addData(EsDoc(1, "a", 1.0), EsDoc(2, "b", 2.0))
      q.processAllAvailable()
      in.addData(EsDoc(1, "a2", 9.0)) // same _id → idempotent upsert
      q.processAllAvailable()
      val all = posted.mkString
      assert(all.count(_ == '\n') == 6) // 3 docs × 2 lines
      assert(all.contains(""""_id":"1"""") && all.contains(""""a2""""))
    } finally q.stop()
  }
}
