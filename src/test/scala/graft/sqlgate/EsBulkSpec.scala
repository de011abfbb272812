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
}
