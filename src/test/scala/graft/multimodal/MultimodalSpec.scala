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

  // ---- video (GFV1) --------------------------------------------------------

  // 0 → n=3, 1 → n=4, 4 → n=7 (stride sampling skips frames),
  // 5 → container corrupt (5%13==5), 9 → frame-0 corrupt (9%17==9)
  private val videoIds = Seq(0L, 1L, 4L, 5L, 9L)
  private def videos = MediaFixture.videoTable(videoIds.toDS())

  private def videoFrameSums(id: Long, fi: Int): (Long, Long, Long) = {
    val n = (8 + (id + fi) % 9) * (8 + (id + fi) % 7)
    var rs = 0L; var gs = 0L; var bs = 0L
    (0L until n).foreach { p =>
      rs += (id + 19 * fi + 3 * p) % 256
      gs += (2 * id + 23 * fi + 5 * p) % 256
      bs += (3 * id + 29 * fi + 7 * p) % 256
    }
    (rs, gs, bs)
  }

  test("videoFrameFeatures: real per-frame PNG decode is pixel-exact; " +
    "only the k stride-sampled frames emit") {
    val out = MediaOps.videoFrameFeatures(videos, k = 3).collect()
    for (id <- Seq(0L, 1L, 4L)) {
      val n = MediaFixture.videoFramesFor(id)
      val rows = out.filter(_.id == id).sortBy(_.frame_idx)
      val expIdx = (0 until 3).map(j => (j.toLong * n / 3).toInt).distinct
      assert(rows.map(_.frame_idx.get).toSeq == expIdx,
        s"id=$id sampled indices")
      for (f <- rows) {
        val fi = f.frame_idx.get
        assert(f.ok && f.n_frames.contains(n))
        assert(f.width.contains((8 + (id + fi) % 9).toInt) &&
          f.height.contains((8 + (id + fi) % 7).toInt))
        val (rs, gs, bs) = videoFrameSums(id, fi)
        assert((f.r_sum, f.g_sum, f.b_sum) == ((Some(rs), Some(gs), Some(bs))),
          s"id=$id frame=$fi channel sums must be exact")
      }
    }
    // n=7, k=3 must sample frames 0, 2, 4 — never decode all seven
    assert(out.filter(_.id == 4L).map(_.frame_idx.get).sorted.toSeq ==
      Seq(0, 2, 4))
  }

  test("videoFrameFeatures: truncated container is ONE countable " +
    "ok=false row; a smashed frame fails alone while siblings decode") {
    val out = MediaOps.videoFrameFeatures(videos, k = 3).collect()
    // container-level: magic survives (sniff routes), parse fails
    val c = out.filter(_.id == 5L)
    assert(c.length == 1 && !c.head.ok && c.head.frame_idx.isEmpty &&
      c.head.n_frames.isEmpty && c.head.width.isEmpty)
    assert(MediaOps.sniffVideoFormat(MediaFixture.encodeVideo(5L)) == "gfv")
    // frame-level: frame 0's bytes are zeroed in place — it emits
    // ok=false with its index, the other sampled frames are exact
    val f9 = out.filter(_.id == 9L).sortBy(_.frame_idx)
    val n9 = MediaFixture.videoFramesFor(9L)
    assert(f9.length == 3 && f9.forall(_.n_frames.contains(n9)))
    assert(!f9.head.ok && f9.head.frame_idx.contains(0) &&
      f9.head.r_sum.isEmpty)
    assert(f9.tail.forall(_.ok))
    val fi1 = f9(1).frame_idx.get
    assert(f9(1).r_sum.contains(videoFrameSums(9L, fi1)._1))
  }

  test("videoFrameFeatures: garbage, empty and non-video payloads are " +
    "ok=false rows; hostile index fields cannot allocate") {
    val junk = Seq(
      (60L, Array.fill[Byte](64)(0x41)), // not a container
      (61L, Array.emptyByteArray),
      (62L, "GFV1".getBytes("UTF-8")), // magic only, no count
      (63L, MediaFixture.encode(0L))) // a bare PNG is not a clip
      .toDF("id", "media")
    val out = MediaOps.videoFrameFeatures(junk, k = 3).collect()
    assert(out.length == 4 && out.forall(f => !f.ok && f.frame_idx.isEmpty))
    // a count field of MaxInt must be rejected by the parse, not drive
    // a 16 GB index allocation on an executor
    val hostile = java.nio.ByteBuffer.allocate(12)
      .put("GFV1".getBytes).putInt(Int.MaxValue).putInt(8).array()
    assert(MediaOps.parseVideoIndex(hostile).isEmpty)
    // a frame length past the payload end is rejected
    val overrun = java.nio.ByteBuffer.allocate(16)
      .put("GFV1".getBytes).putInt(1).putInt(9999).putInt(0).array()
    assert(MediaOps.parseVideoIndex(overrun).isEmpty)
  }

  test("GFV1 parse property sweep: generated containers round-trip " +
    "exactly; truncations and byte-flips never crash") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[T](g: Gen[T], seed: Long): T =
      g.pureApply(Gen.Parameters.default, Seed(seed))
    val clipGen = for {
      n <- Gen.chooseNum(1, 9)
      frames <- Gen.listOfN(n, Gen.chooseNum(0, 40).flatMap(len =>
        Gen.listOfN(len, Gen.chooseNum(-128, 127).map(_.toByte))))
    } yield frames.map(_.toArray)
    (0 until 200).foreach { i =>
      val frames = sample(clipGen, 1000L + i)
      val out = new java.io.ByteArrayOutputStream()
      val o = new java.io.DataOutputStream(out)
      o.writeBytes("GFV1"); o.writeInt(frames.size)
      frames.foreach(f => o.writeInt(f.length))
      frames.foreach(o.write)
      val bytes = out.toByteArray
      // round trip: the index recovers every frame's exact bytes
      val idx = MediaOps.parseVideoIndex(bytes).getOrElse(
        fail(s"seed $i: valid container must parse"))
      assert(idx.length == frames.size)
      idx.zip(frames).foreach { case ((off, len), f) =>
        assert(bytes.slice(off, off + len).toSeq == f.toSeq,
          s"seed $i: frame bytes must round-trip")
      }
      // any strict truncation drops a frame or the index → parse must
      // reject (None), never crash and never return overrunning offsets
      val cut = sample(Gen.chooseNum(0, bytes.length - 1), 5000L + i)
      assert(MediaOps.parseVideoIndex(
        java.util.Arrays.copyOf(bytes, cut)).isEmpty)
      // a single byte-flip anywhere parses to None or to in-bounds
      // offsets — the operator's slices can then never throw
      val pos = sample(Gen.chooseNum(0, bytes.length - 1), 9000L + i)
      val mut = bytes.clone()
      mut(pos) = (mut(pos) ^ 0x5a).toByte
      MediaOps.parseVideoIndex(mut).foreach(_.foreach { case (off, len) =>
        assert(off >= 0 && len >= 0 && off.toLong + len <= mut.length)
      })
    }
  }

  test("videoFrameFeatures: byte-flipped REAL clips never crash the " +
    "operator — every row lands as decoded or countable ok=false") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[T](g: Gen[T], seed: Long): T =
      g.pureApply(Gen.Parameters.default, Seed(seed))
    val rows = (0 until 50).map { i =>
      val clip = MediaFixture.encodeVideo(i.toLong * 3 % 23)
      val pos = sample(Gen.chooseNum(0, clip.length - 1), 400L + i)
      val mut = clip.clone()
      mut(pos) = (mut(pos) ^ 0x5a).toByte
      (i.toLong, mut)
    }
    val out = MediaOps.videoFrameFeatures(
      rows.toDF("id", "media"), k = 3).collect()
    assert(out.nonEmpty && out.forall(f =>
      f.ok || (f.width.isEmpty && f.r_sum.isEmpty)))
  }

  test("videoFrameFeatures: narrow map, deterministic across " +
    "partitionings, k validated") {
    val parted = videos.repartition(3)
    val ds = MediaOps.videoFrameFeatures(parted, k = 3)
    assert(ds.rdd.getNumPartitions == 3)
    val plan = ds.queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1,
      s"video decode must stay a narrow map, got:\n$plan")
    val a = MediaOps.videoFrameFeatures(videos, k = 3).collect()
      .sortBy(f => (f.id, f.frame_idx.getOrElse(-1))).toSeq
    val b = MediaOps.videoFrameFeatures(videos.repartition(5), k = 3)
      .collect().sortBy(f => (f.id, f.frame_idx.getOrElse(-1))).toSeq
    assert(a == b)
    val e = intercept[IllegalArgumentException] {
      MediaOps.videoFrameFeatures(videos, k = 0)
    }
    assert(e.getMessage.contains("k must be"))
  }
}
