package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Plumbing tests for the multimodal operators: schema, narrow-map
  * partition behavior, determinism, degenerate payloads.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Seq(
    (1L, "hello world".getBytes("UTF-8")),
    (2L, "".getBytes("UTF-8")),
    (3L, ("x" * 1000).getBytes("UTF-8")))
    .toDF("id", "media")

  test("features: deterministic stub decode, payload dropped from output") {
    val out = MediaOps.features(media).collect().sortBy(_.id)
    assert(out.map(_.id).toSeq == Seq(1L, 2L, 3L))
    val h = out.head
    assert(h.n_bytes == 11)
    assert(h.digest == "5eb63bbbe01eeed093cb22bb8f5acdc3") // md5("hello world")
    assert(h.byte_sum == "hello world".getBytes.map(_ & 0xff).sum)
    assert(h.fake_width == (h.byte_sum % 640).toInt)
    // empty payload is safe
    assert(out(1).n_bytes == 0 && out(1).byte_sum == 0L)
    // schema carries no binary column
    assert(!MediaOps.features(media).schema.fields.exists(
      _.dataType.typeName == "binary"))
  }

  test("features: narrow map — partitioning preserved, no shuffle") {
    val parted = media.repartition(3)
    val ds = MediaOps.features(parted)
    assert(ds.rdd.getNumPartitions == 3)
    // the only Exchange is the explicit repartition above — the feature
    // op itself must not add one (narrow map)
    val plan = ds.queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1,
      s"feature extraction must stay a narrow map, got:\n$plan")
  }

  test("frameSample: k chunks per payload, chunk sums reassemble") {
    val frames = MediaOps.frameSample(media, 4).collect()
    assert(frames.count(_.id == 1L) == 4)
    val total = frames.filter(_.id == 1L).map(_.chunk_sum).sum
    assert(total == "hello world".getBytes.map(_ & 0xff).sum)
    // empty payload yields k empty frames, not a crash
    assert(frames.filter(_.id == 2L).forall(_.chunk_sum == 0L))
  }

  test("histogram: buckets partition the byte range, counts total length") {
    val h = MediaOps.histogram(media).collect().find(_.id == 3L).get
    assert(h.hist.sum == 1000)
    assert(h.hist(3) == 1000) // 'x' = 120 → bucket 120/32 = 3
  }

  test("determinism: same payload → identical features across runs") {
    val a = MediaOps.features(media).collect().sortBy(_.id).toSeq
    val b = MediaOps.features(media.repartition(5)).collect().sortBy(_.id).toSeq
    assert(a == b)
  }
}
