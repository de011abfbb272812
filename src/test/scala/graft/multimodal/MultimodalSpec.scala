package graft.multimodal

import graft.SparkSpec

/** Tests for the multimodal operators: REAL codec round-trips (encode →
  * `ImageIO` decode, per-format), corrupt/truncated/garbage payload
  * handling (skip-and-count, never crash), narrow-map partition
  * behavior, determinism, degenerate payloads.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def byteMedia = Seq(
    (1L, "hello world".getBytes("UTF-8")),
    (2L, "".getBytes("UTF-8")),
    (3L, ("x" * 1000).getBytes("UTF-8")))
    .toDF("id", "media")

  // ids chosen to hit every fixture branch: 0/1 png, 2 bmp, 3 jpg,
  // 5 corrupt-png (5%13==5), 18 corrupt-bmp, 31 corrupt-jpg
  private val fixtureIds = Seq(0L, 1L, 2L, 3L, 5L, 18L, 31L)
  private def images = MediaFixture.mediaTable(fixtureIds.toDS())

  private def closedFormSums(id: Long): (Long, Long, Long) = {
    val n = MediaFixture.widthFor(id).toLong * MediaFixture.heightFor(id)
    var rs = 0L; var gs = 0L; var bs = 0L
    (0L until n).foreach { p =>
      rs += (id + 3 * p) % 256
      gs += (2 * id + 5 * p) % 256
      bs += (3 * id + 7 * p) % 256
    }
    (rs, gs, bs)
  }

  test("imageFeatures: real PNG/BMP decode is pixel-exact vs closed form") {
    val out = MediaOps.imageFeatures(images).collect()
      .map(f => f.id -> f).toMap
    for (id <- Seq(0L, 1L, 2L)) { // png, png, bmp
      val f = out(id)
      assert(f.ok, s"id=$id should decode")
      assert(f.fmt == MediaFixture.fmtFor(id))
      assert(f.width.contains(MediaFixture.widthFor(id)))
      assert(f.height.contains(MediaFixture.heightFor(id)))
      val (rs, gs, bs) = closedFormSums(id)
      assert(f.r_sum.contains(rs) && f.g_sum.contains(gs) &&
        f.b_sum.contains(bs), s"id=$id channel sums must be exact")
    }
  }

  test("imageFeatures: JPEG decodes real dims, channel sums NULLed (lossy)") {
    val f = MediaOps.imageFeatures(images).collect().find(_.id == 3L).get
    assert(f.ok && f.fmt == "jpg")
    assert(f.width.contains(MediaFixture.widthFor(3L)))
    assert(f.height.contains(MediaFixture.heightFor(3L)))
    assert(f.r_sum.isEmpty && f.g_sum.isEmpty && f.b_sum.isEmpty)
  }

  test("imageFeatures: truncated payloads sniff but fail decode — " +
    "skip-and-count, never crash") {
    val out = MediaOps.imageFeatures(images).collect()
    val corrupt = out.filter(!_.ok)
    assert(corrupt.map(_.id).sorted.toSeq == Seq(5L, 18L, 31L))
    // the magic bytes survive an 8-byte truncation, so the sniffed
    // format still routes correctly while every feature is NULL
    assert(corrupt.map(f => f.id -> f.fmt).toMap ==
      Map(5L -> "png", 18L -> "bmp", 31L -> "jpg"))
    assert(corrupt.forall(f => f.width.isEmpty && f.r_sum.isEmpty))
  }

  test("imageFeatures: garbage and empty payloads are ok=false rows") {
    val junk = Seq(
      (100L, Array.fill[Byte](64)(0x41)), // 'AAAA…' — not an image
      (101L, Array.emptyByteArray),
      (102L, Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a,
        0x1a, 0x0a, 1, 2, 3))) // PNG magic + garbage body
      .toDF("id", "media")
    val out = MediaOps.imageFeatures(junk).collect().sortBy(_.id)
    assert(out.length == 3 && out.forall(!_.ok))
    assert(out.map(_.fmt).toSeq == Seq("unknown", "unknown", "png"))
  }

  test("channelHistogram: exact red histogram, lossy+corrupt rows dropped") {
    val out = MediaOps.channelHistogram(images).collect()
      .map(h => h.id -> h.hist).toMap
    assert(out.keySet == Set(0L, 1L, 2L)) // jpg + corrupt excluded
    for ((id, hist) <- out) {
      val n = MediaFixture.widthFor(id).toLong * MediaFixture.heightFor(id)
      assert(hist.sum == n, s"id=$id histogram must count every pixel")
      val exp = new Array[Long](8)
      (0L until n).foreach(p => exp(((id + 3 * p) % 256).toInt / 32) += 1)
      assert(hist == exp.toSeq, s"id=$id histogram mismatch")
    }
  }

  test("resizeFeatures: nearest-neighbor ÷2 selects exact pixels; " +
    "lossy/corrupt dropped; factor validated") {
    val out = MediaOps.resizeFeatures(images, factor = 2).collect()
      .map(f => f.id -> f).toMap
    assert(out.keySet == Set(0L, 1L, 2L)) // jpg + corrupt excluded
    for ((id, f) <- out) {
      val (w, h) = (MediaFixture.widthFor(id), MediaFixture.heightFor(id))
      assert(f.width == w / 2 && f.height == h / 2)
      var rs = 0L; var gs = 0L; var bs = 0L
      for (y <- 0 until h / 2; x <- 0 until w / 2) {
        val p = (y * 2).toLong * w + x * 2
        rs += (id + 3 * p) % 256
        gs += (2 * id + 5 * p) % 256
        bs += (3 * id + 7 * p) % 256
      }
      assert((f.r_sum, f.g_sum, f.b_sum) == ((rs, gs, bs)),
        s"id=$id resized sums mismatch")
    }
    val e = intercept[IllegalArgumentException] {
      MediaOps.resizeFeatures(images, factor = 0)
    }
    assert(e.getMessage.contains("factor"))
  }

  test("audioFeatures: real WAV decode is sample-exact vs closed form") {
    import spark.implicits._
    // 0 mono, 1 stereo, 7 corrupt (7%11==7), 18 corrupt (18%11==7)
    val ids = Seq(0L, 1L, 2L, 7L, 18L)
    val out = MediaOps.audioFeatures(MediaFixture.audioTable(ids.toDS()))
      .collect().map(f => f.id -> f).toMap
    for (id <- Seq(0L, 1L, 2L)) {
      val f = out(id)
      val ch = MediaFixture.audioChannelsFor(id)
      val n = MediaFixture.audioFramesFor(id)
      assert(f.ok && f.fmt == "wav")
      assert(f.channels.contains(ch) && f.frames.contains(n.toLong) &&
        f.rate.contains(MediaFixture.AudioRate))
      def amp(s: Int, c: Int): Long = (5 * id + 11L * s + 17L * c) % 2048 - 1024
      assert(f.ch0_sum.contains((0 until n).map(amp(_, 0)).sum))
      if (ch == 2) assert(f.ch1_sum.contains((0 until n).map(amp(_, 1)).sum))
      else assert(f.ch1_sum.isEmpty)
      val peak = (for (s <- 0 until n; c <- 0 until ch)
        yield math.abs(amp(s, c))).max
      assert(f.peak.contains(peak), s"id=$id peak")
    }
    // truncated: 12-byte RIFF/WAVE magic survives, decode fails
    for (id <- Seq(7L, 18L)) {
      val f = out(id)
      assert(!f.ok && f.fmt == "wav" && f.channels.isEmpty &&
        f.ch0_sum.isEmpty)
    }
  }

  test("audioFeatures: garbage and image payloads are ok=false rows") {
    import spark.implicits._
    val junk = Seq(
      (50L, Array.fill[Byte](64)(0x41)),
      (51L, MediaFixture.encode(0L))) // a PNG is not audio
      .toDF("id", "media")
    val out = MediaOps.audioFeatures(junk).collect().sortBy(_.id)
    assert(out.forall(!_.ok))
    assert(out.map(_.fmt).toSeq == Seq("unknown", "unknown"))
  }

  test("payloadFeatures: digest + byte stats, payload dropped from output") {
    val out = MediaOps.payloadFeatures(byteMedia).collect().sortBy(_.id)
    assert(out.map(_.id).toSeq == Seq(1L, 2L, 3L))
    val h = out.head
    assert(h.n_bytes == 11)
    assert(h.digest == "5eb63bbbe01eeed093cb22bb8f5acdc3") // md5("hello world")
    assert(h.byte_sum == "hello world".getBytes.map(_ & 0xff).sum)
    // empty payload is safe
    assert(out(1).n_bytes == 0 && out(1).byte_sum == 0L)
    // schema carries no binary column
    assert(!MediaOps.payloadFeatures(byteMedia).schema.fields.exists(
      _.dataType.typeName == "binary"))
  }

  test("imageFeatures: narrow map — partitioning preserved, no shuffle") {
    val parted = images.repartition(3)
    val ds = MediaOps.imageFeatures(parted)
    assert(ds.rdd.getNumPartitions == 3)
    // the only Exchange is the explicit repartition above — the decode
    // op itself must not add one (narrow map)
    val plan = ds.queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1,
      s"image decode must stay a narrow map, got:\n$plan")
  }

  test("frameSample: k chunks per payload, chunk sums reassemble") {
    val frames = MediaOps.frameSample(byteMedia, 4).collect()
    assert(frames.count(_.id == 1L) == 4)
    val total = frames.filter(_.id == 1L).map(_.chunk_sum).sum
    assert(total == "hello world".getBytes.map(_ & 0xff).sum)
    // empty payload yields k empty frames, not a crash
    assert(frames.filter(_.id == 2L).forall(_.chunk_sum == 0L))
  }

  test("determinism: same ids → identical decode output across runs " +
    "and partitionings") {
    val a = MediaOps.imageFeatures(images).collect().sortBy(_.id).toSeq
    val b = MediaOps.imageFeatures(images.repartition(5)).collect()
      .sortBy(_.id).toSeq
    assert(a == b)
  }
}
