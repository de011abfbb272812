package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset}

/** Deterministic image-corpus generator for the multimodal oracles: the
  * container ships no real media, so the fixture derives every image
  * CLOSED-FORM from its id — dimensions, per-pixel RGB, container format,
  * and a corruption slice — and encodes REAL PNG/BMP/JPEG bytes with
  * `javax.imageio`. Because the ground truth is arithmetic on the id, the
  * DuckDB oracle recomputes the expected decode output (dims, exact
  * channel sums, histograms) without ever touching an image library: the
  * correctness gate then verifies the full encode → bytes → `ImageIO`
  * decode round trip end-to-end.
  *
  * The closed form (mirrored token-for-token by the oracle SQL in
  * [[graft.queries.Multimodal]]):
  *   - width  = 8 + id % 9, height = 8 + id % 7 (bounded so the DuckDB
  *     per-pixel list comprehensions stay cheap at oracle scale)
  *   - pixel p (row-major, 0-based): r = (id + 3p) % 256,
  *     g = (2·id + 5p) % 256, b = (3·id + 7p) % 256
  *   - format: id % 4 == 3 → jpg, == 2 → bmp, else png
  *   - corruption: id % 13 == 5 → payload truncated to its first 8 bytes
  *     (magic survives, decode cannot — the skip-and-count path)
  *
  * Encoding runs as a narrow `mapPartitions` (the same no-shuffle shape
  * as the decode operators); JPEG is encoded from TYPE_INT_RGB so the
  * writer never sees an alpha channel it would reject.
  */
object MediaFixture {

  // heap-backed ImageIO streams — see the MediaOps note (file-backed
  // caches cost a temp file per encoded image)
  ImageIO.setUseCache(false)

  /** Spread a sub-split id column across the cluster before the
    * CPU-heavy encode map (guide §2.5, input parallelism): a small
    * parquet file arrives as ONE scan split, which would serialize
    * every downstream `ImageIO` encode/decode on a single core no
    * matter how many the session has. The exchange moves only the
    * 8-byte ids. Scale-adaptive by construction: once the id source
    * carries >= defaultParallelism splits (any production-sized scan)
    * this is the identity. Streaming inputs pass through untouched —
    * micro-batch partitioning belongs to the drain, and `.rdd` is not
    * defined on an unstarted stream.
    */
  private def spreadIds(ids: Dataset[Long],
      streamSpread: Boolean = true): Dataset[Long] = {
    val p = ids.sparkSession.sparkContext.defaultParallelism
    // one-partition micro-batch: encode+decode would run single-core;
    // the exchange moves only 8-byte ids per batch. streamSpread=false
    // for the cheap-per-row corpora (small pHash stills) where the
    // per-batch exchange measured as pure overhead (r18), while the
    // decode-heavy image/video drains keep it.
    if (ids.isStreaming) { if (streamSpread) ids.repartition(p) else ids }
    else if (ids.rdd.getNumPartitions < p) ids.repartition(p)
    else ids
  }

  def fmtFor(id: Long): String =
    (id % 4) match { case 3 => "jpg"; case 2 => "bmp"; case _ => "png" }

  def isCorrupt(id: Long): Boolean = id % 13 == 5

  def widthFor(id: Long): Int = (8 + id % 9).toInt
  def heightFor(id: Long): Int = (8 + id % 7).toInt

  /** Encode one deterministic image; requires id >= 0 (the % closed form
    * and the oracle's mirror both assume nonnegative ids).
    */
  def encode(id: Long): Array[Byte] = {
    require(id >= 0, s"MediaFixture ids must be nonnegative, got $id")
    val w = widthFor(id)
    val h = heightFor(id)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var p = 0
    while (p < w * h) {
      val r = ((id + 3L * p) % 256).toInt
      val g = ((2L * id + 5L * p) % 256).toInt
      val b = ((3L * id + 7L * p) % 256).toInt
      img.setRGB(p % w, p / w, (r << 16) | (g << 8) | b)
      p += 1
    }
    val bytes = MediaCodec.encode(img, fmtFor(id))
    if (isCorrupt(id)) java.util.Arrays.copyOf(bytes, 8) else bytes
  }

  /** (id BIGINT, media BINARY) fixture frame from an id column — a
    * narrow map over the input, no shuffle.
    */
  def mediaTable(ids: Dataset[Long]): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    spreadIds(ids).mapPartitions(_.map(id => (id, encode(id))))
      .toDF("id", "media")
  }

  // ---- perceptual-hash fixture (planted near-duplicates) ------------------
  // Byte-digest dedup misses a re-encoded or resized duplicate; this
  // corpus plants exactly those shapes so the dHash pair oracle can
  // replay them closed-form. Every id derives a CONTENT id (cid) and a
  // variant kind from id % 5 (mirrored token-for-token by the
  // q_media_phash_pairs oracle):
  //   - kind 0/4: base — content(cid = id) encoded as PNG
  //   - kind 1:   re-encode — content(cid = id − 1), SAME pixels, BMP
  //     (the PNG↔BMP re-encoded duplicate: identical dHash)
  //   - kind 2:   upscale — content(cid = id − 2) pixel-doubled to
  //     2w×2h, PNG (the resized duplicate: nearest-neighbor 9×8
  //     sampling provably selects the same source pixels → identical
  //     dHash; derivation in [[graft.queries.Multimodal]])
  //   - kind 3:   perturb — content(cid = id − 3) with pixel 0 forced
  //     white, PNG (a small edit: flips ≤ 2 dHash bits — only grid
  //     cells that SAMPLE pixel 0 move, all in grid row 0)
  //   so ids {5m, 5m+1, 5m+2, 5m+3} form a planted near-dup cluster of
  //   content 5m; ids 5m+4 are singleton bases.
  //   - content(cid): width = 8 + cid % 9, height = 8 + cid % 7, pixel
  //     p (row-major):
  //     r = ((cid % 97 + 1)·p + (cid % 41 + 1)·p² + cid) % 256,
  //     g = ((cid % 89 + 2)·p + (cid % 43 + 1)·p² + 2·cid) % 256,
  //     b = ((cid % 83 + 3)·p + (cid % 47 + 1)·p² + 3·cid) % 256.
  //     Both the slope AND the curvature MUST vary with cid: dHash bits
  //     are adjacent-cell luma COMPARISONS, invariant under constant
  //     shifts (the first cut reused [[encode]]'s fixed slopes and
  //     measured near-QUADRATIC pair growth — 1,236 pairs at 500 docs →
  //     70,553 at 5,000 — because every cid family hashed within
  //     hamming 3 of its mod-63 siblings), and cid-dependent LINEAR
  //     slopes alone still left piecewise-monotone grids whose bit
  //     patterns collided measurably at 500 k docs (1.10 M pairs vs
  //     ~508 k planted). The quadratic term makes the luma sequence
  //     non-monotone per content, decorrelating the 64 comparison bits;
  //     accidental radius-3 collisions drop to the random-code regime
  //     and pair mass is the planted (linear) set.
  //   - corruption: id % 13 == 5 → payload truncated to 8 bytes
  //     (undecodable: dropped from hashing, countable upstream)
  // All variants are LOSSLESS formats, so the real decode → dHash path
  // is bit-replayable by integer arithmetic on (cid, kind).

  def phashKind(id: Long): Int = (id % 5).toInt
  def phashContentId(id: Long): Long = phashKind(id) match {
    case 1 => id - 1; case 2 => id - 2; case 3 => id - 3; case _ => id
  }
  def isPhashCorrupt(id: Long): Boolean = id % 13 == 5

  /** One deterministic pHash-corpus payload; requires id >= 0. */
  def encodePhash(id: Long): Array[Byte] =
    encodePhashSized(id, wideGrid = false)

  /** The WIDE pHash corpus: same kinds, planted-duplicate structure,
    * corruption rule, and pixel closed form as [[encodePhash]], but
    * content width 17 + cid % 9 (≥ 17 px) so a 17-column grid samples
    * 17 DISTINCT pixel columns and all 16 comparison bits per row of
    * the 128-bit code are informative (at the narrow corpus's 8-16 px
    * the wide grid resamples pixels and adjacent equal-luma cells
    * force comparison bits to zero). The upscale variant's invariance
    * proof carries over verbatim: floor(floor(x·2w/17)/2) =
    * floor(x·w/17), so the pixel-doubled duplicate selects the same
    * source pixels under the 17-grid too; the perturb variant touches
    * only grid cell (0,0) (x·w/17 = 0 ⇒ x = 0 once w ≥ 17), flipping
    * at most 1 bit.
    */
  def encodePhashWide(id: Long): Array[Byte] =
    encodePhashSized(id, wideGrid = true)

  def phashWideWidthFor(id: Long): Int = (17 + id % 9).toInt

  private def encodePhashSized(id: Long, wideGrid: Boolean): Array[Byte] = {
    require(id >= 0, s"MediaFixture ids must be nonnegative, got $id")
    val kind = phashKind(id)
    val cid = phashContentId(id)
    val w0 = if (wideGrid) phashWideWidthFor(cid) else widthFor(cid)
    val h0 = heightFor(cid)
    val scale = if (kind == 2) 2 else 1
    val img = new BufferedImage(w0 * scale, h0 * scale,
      BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h0 * scale) {
      var x = 0
      while (x < w0 * scale) {
        val p = (y / scale) * w0 + (x / scale)
        val rgb =
          if (kind == 3 && p == 0) 0xffffff
          else {
            val pp = p.toLong
            val r = (((cid % 97 + 1) * pp + (cid % 41 + 1) * pp * pp + cid)
              % 256).toInt
            val g = (((cid % 89 + 2) * pp + (cid % 43 + 1) * pp * pp
              + 2L * cid) % 256).toInt
            val b = (((cid % 83 + 3) * pp + (cid % 47 + 1) * pp * pp
              + 3L * cid) % 256).toInt
            (r << 16) | (g << 8) | b
          }
        img.setRGB(x, y, rgb)
        x += 1
      }
      y += 1
    }
    val bytes = MediaCodec.encode(img, if (kind == 1) "bmp" else "png")
    if (isPhashCorrupt(id)) java.util.Arrays.copyOf(bytes, 8) else bytes
  }

  /** (id BIGINT, media BINARY) pHash-corpus fixture frame — narrow map. */
  def phashTable(ids: Dataset[Long]): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    spreadIds(ids, streamSpread = false)
      .mapPartitions(_.map(id => (id, encodePhash(id)))).toDF("id", "media")
  }

  /** (id BIGINT, media BINARY) WIDE pHash-corpus frame — narrow map. */
  def phashWideTable(ids: Dataset[Long]): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    spreadIds(ids, streamSpread = false)
      .mapPartitions(_.map(id => (id, encodePhashWide(id))))
      .toDF("id", "media")
  }

  // ---- audio fixture (WAV/PCM s16le) --------------------------------------
  // Closed form mirrored by the q_media_audio oracle:
  //   channels = 1 + id % 2, frames = 64 + id % 37, rate = 8000
  //   sample s of channel c: ((5·id + 11·s + 17·c) % 2048) − 1024
  //   corruption: id % 11 == 7 → truncated to 16 bytes (the 12-byte
  //   RIFF/WAVE magic survives, the fmt chunk does not — sniff works,
  //   decode fails: the skip-and-count path)

  def audioChannelsFor(id: Long): Int = (1 + id % 2).toInt
  def audioFramesFor(id: Long): Int = (64 + id % 37).toInt
  def isAudioCorrupt(id: Long): Boolean = id % 11 == 7
  val AudioRate = 8000

  /** One deterministic WAV payload; requires id >= 0 (closed form). */
  def encodeWav(id: Long): Array[Byte] = {
    require(id >= 0, s"MediaFixture ids must be nonnegative, got $id")
    val channels = audioChannelsFor(id)
    val frames = audioFramesFor(id)
    val dataLen = frames * channels * 2
    val out = new ByteArrayOutputStream()
    val o = new java.io.DataOutputStream(out)
    def le32(v: Int): Unit = o.writeInt(Integer.reverseBytes(v))
    def le16(v: Int): Unit = o.writeShort(java.lang.Short.reverseBytes(v.toShort))
    o.writeBytes("RIFF"); le32(36 + dataLen); o.writeBytes("WAVE")
    o.writeBytes("fmt "); le32(16)
    le16(1); le16(channels); le32(AudioRate)
    le32(AudioRate * channels * 2); le16(channels * 2); le16(16)
    o.writeBytes("data"); le32(dataLen)
    var s = 0
    while (s < frames) {
      var c = 0
      while (c < channels) {
        le16((((5 * id + 11L * s + 17L * c) % 2048) - 1024).toInt)
        c += 1
      }
      s += 1
    }
    val bytes = out.toByteArray
    if (isAudioCorrupt(id)) java.util.Arrays.copyOf(bytes, 16) else bytes
  }

  /** (id BIGINT, media BINARY) WAV fixture frame — narrow map. */
  def audioTable(ids: Dataset[Long]): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    // NOT spread: the WAV encode is plain integer arithmetic (~µs/row,
    // no ImageIO) — measured r18, the exchange costs more than the
    // single-core encode it would parallelize
    ids.mapPartitions(_.map(id => (id, encodeWav(id)))).toDF("id", "media")
  }

  // ---- audio perceptual-hash fixture (planted near-duplicates) ------------
  // The audio analogue of the pHash corpus: byte-digest dedup misses a
  // GAIN-SCALED re-master of the same recording; the envelope dHash
  // ([[MediaOps.audioDhashFeatures]]) is provably invariant to uniform
  // positive gain (energy comparisons E(w) > E(w+1) are preserved under
  // scaling), so the fixture plants exactly that shape. Closed form
  // (mirrored by the q_media_audio_phash_pairs oracle):
  //   - kind = id % 4: 0/3 base; 1 → ×2 gain re-master of cid = id − 1
  //     (identical hash); 2 → first-sample perturb of cid = id − 2
  //     (sample 0 forced to 1023: only window 0's energy moves → ≤ 1
  //     dHash bit)
  //   - content(cid): MONO s16 at 8 kHz, n = 256 + 64·(cid % 8) frames
  //     (a MULTIPLE of 64, so the fixture's per-window amplitude levels
  //     align exactly with the operator's ⌊w·n/64⌋ window boundaries),
  //     sample s: v(s) = base(s) · m(w) with w = s·64/n,
  //       base(s) = ((5·cid + (cid % 37 + 3)·s) % 256) − 128,
  //       m(w) = 1 + ((cid % 97 + 1)·w + (cid % 89 + 2)·w²
  //                   + (cid % 83 + 3)·w³) % 97.
  //     The per-WINDOW modulation m is the entropy carrier: a bare
  //     sawtooth's window energies are all ≈ the same mean (measured:
  //     16,745 pairs at 5 k docs → 179.7 M at 500 k — the envelope bits
  //     collapsed into a handful of patterns), while m's three mixing
  //     constants span 97·89·83 ≈ 717 k distinct envelope shapes —
  //     more than any stressed corpus, so radius-3 collisions drop to
  //     the planted set. |v| ≤ 128·98 = 12,544; ×2 gain ≤ 25,088 —
  //     no s16 clipping, so the gain is EXACTLY linear.
  //   - corruption: id % 11 == 7 → truncated to 16 bytes (undecodable,
  //     dropped from hashing)

  def audioPhashKind(id: Long): Int = (id % 4).toInt
  def audioPhashContentId(id: Long): Long = audioPhashKind(id) match {
    case 1 => id - 1; case 2 => id - 2; case _ => id
  }
  def isAudioPhashCorrupt(id: Long): Boolean = id % 11 == 7
  def audioPhashFramesFor(cid: Long): Int = (256 + 64 * (cid % 8)).toInt

  /** One deterministic audio-pHash WAV payload; requires id >= 0. */
  def encodeAudioPhash(id: Long): Array[Byte] = {
    require(id >= 0, s"MediaFixture ids must be nonnegative, got $id")
    val kind = audioPhashKind(id)
    val cid = audioPhashContentId(id)
    val frames = audioPhashFramesFor(cid)
    val dataLen = frames * 2
    val out = new ByteArrayOutputStream()
    val o = new java.io.DataOutputStream(out)
    def le32(v: Int): Unit = o.writeInt(Integer.reverseBytes(v))
    def le16(v: Int): Unit =
      o.writeShort(java.lang.Short.reverseBytes(v.toShort))
    o.writeBytes("RIFF"); le32(36 + dataLen); o.writeBytes("WAVE")
    o.writeBytes("fmt "); le32(16)
    le16(1); le16(1); le32(AudioRate)
    le32(AudioRate * 2); le16(2); le16(16)
    o.writeBytes("data"); le32(dataLen)
    var s = 0
    while (s < frames) {
      val w = s.toLong * 64 / frames
      val m = 1 + ((cid % 97 + 1) * w + (cid % 89 + 2) * w * w
        + (cid % 83 + 3) * w * w * w) % 97
      val v =
        if (kind == 2 && s == 0) 1023L
        else (((5 * cid + (cid % 37 + 3) * s) % 256) - 128) * m
      le16((if (kind == 1) 2 * v else v).toInt)
      s += 1
    }
    val bytes = out.toByteArray
    if (isAudioPhashCorrupt(id)) java.util.Arrays.copyOf(bytes, 16)
    else bytes
  }

  /** (id BIGINT, media BINARY) audio-pHash fixture frame — narrow map. */
  def audioPhashTable(ids: Dataset[Long]): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    // NOT spread — same integer-arithmetic rationale as [[audioTable]]
    // (measured r18: +0.4 s at sf0.1 for the exchange, nothing gained)
    ids.mapPartitions(_.map(id => (id, encodeAudioPhash(id))))
      .toDF("id", "media")
  }

  // ---- video fixture (GFV1: indexed packed PNG frames) ---------------------
  // Closed form mirrored by the q_media_video oracle:
  //   n = 3 + id % 5 frames; frame fi has width = 8 + (id + fi) % 9,
  //   height = 8 + (id + fi) % 7; pixel p (row-major, 0-based) of frame
  //   fi: r = (id + 19·fi + 3·p) % 256, g = (2·id + 23·fi + 5·p) % 256,
  //   b = (3·id + 29·fi + 7·p) % 256. Every frame is PNG (lossless →
  //   sums oracle-exact).
  //   container corruption: id % 13 == 5 → payload truncated to 6 bytes
  //     (the 4-byte magic survives, the frame count does not — sniff
  //     works, parse fails)
  //   frame corruption: id % 17 == 9 → frame 0's first 8 bytes zeroed
  //     in place (the index stays valid, frame 0's PNG signature is
  //     destroyed — decode of THAT frame fails, the others still decode)

  def videoFramesFor(id: Long): Int = (3 + id % 5).toInt
  def isVideoCorrupt(id: Long): Boolean = id % 13 == 5
  def isVideoFrame0Corrupt(id: Long): Boolean = id % 17 == 9

  /** One deterministic GFV1 clip; requires id >= 0 (closed form). */
  def encodeVideo(id: Long): Array[Byte] = {
    require(id >= 0, s"MediaFixture ids must be nonnegative, got $id")
    val n = videoFramesFor(id)
    val frames = (0 until n).map { fi =>
      val w = (8 + (id + fi) % 9).toInt
      val h = (8 + (id + fi) % 7).toInt
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      var p = 0
      while (p < w * h) {
        val r = ((id + 19L * fi + 3L * p) % 256).toInt
        val g = ((2L * id + 23L * fi + 5L * p) % 256).toInt
        val b = ((3L * id + 29L * fi + 7L * p) % 256).toInt
        img.setRGB(p % w, p / w, (r << 16) | (g << 8) | b)
        p += 1
      }
      MediaCodec.encode(img, "png")
    }
    val out = new ByteArrayOutputStream()
    val o = new java.io.DataOutputStream(out) // writeInt is big-endian
    o.writeBytes("GFV1")
    o.writeInt(n)
    frames.foreach(f => o.writeInt(f.length))
    frames.foreach(o.write)
    val bytes = out.toByteArray
    if (isVideoFrame0Corrupt(id))
      java.util.Arrays.fill(bytes, 8 + 4 * n, 8 + 4 * n + 8, 0.toByte)
    if (isVideoCorrupt(id)) java.util.Arrays.copyOf(bytes, 6) else bytes
  }

  /** (id BIGINT, media BINARY) GFV1 fixture frame — narrow map. */
  def videoTable(ids: Dataset[Long]): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    spreadIds(ids).mapPartitions(_.map(id => (id, encodeVideo(id)))).toDF("id", "media")
  }

  // ---- video pHash fixture (planted near-duplicate clips) -----------------
  // The clip-level analogue of the image pHash corpus: byte-digest dedup
  // misses a RE-ENCODED or UPSCALED clip; this corpus plants exactly
  // those (mirrored token-for-token by the q_media_video_phash_pairs
  // oracle). kind = id % 5, content cid = id − kind for kinds 1..3:
  //   - kind 0/4: base — n PNG frames
  //   - kind 1:   re-encode — SAME frame pixels, BMP frames (identical
  //     per-frame dHash → matches at every sampled position)
  //   - kind 2:   upscale — every frame pixel-doubled (identical dHash
  //     by the same floor(floor(2wx/9)/2) = floor(wx/9) proof as the
  //     image fixture)
  //   - kind 3:   perturb — frame 0's pixel 0 forced white (≤ 2 dHash
  //     bits on frame 0 only; the other positions still match exactly,
  //     so the majority vote passes)
  //   - frame content: n = 3 + cid % 5 frames (the SAME count across a
  //     content's variants — position alignment needs it); frame fi
  //     derives a per-frame seed e = cid + 131·fi and reuses the image
  //     corpus's cid-QUADRATIC pixel form with cid → e (linear luma is
  //     the documented dHash-degenerate case — the original video
  //     fixture's linear ramps are fine for channel sums, useless as
  //     perceptual content): width 8 + e % 9, height 8 + e % 7, pixel
  //     p: r = ((e%97+1)·p + (e%41+1)·p² + e) % 256, g/b analogous.
  //   - corruption: id % 13 == 5 → container truncated to 6 bytes
  //     (parse fails → zero frames hashed → the clip never pairs); the
  //     per-FRAME decode-failure path is q_media_video's coverage.

  def videoPhashKind(id: Long): Int = (id % 5).toInt
  def videoPhashContentId(id: Long): Long = videoPhashKind(id) match {
    case 1 => id - 1; case 2 => id - 2; case 3 => id - 3; case _ => id
  }
  def isVideoPhashCorrupt(id: Long): Boolean = id % 13 == 5

  /** One deterministic pHash-corpus clip; requires id >= 0. */
  def encodeVideoPhash(id: Long): Array[Byte] = {
    require(id >= 0, s"MediaFixture ids must be nonnegative, got $id")
    val kind = videoPhashKind(id)
    val cid = videoPhashContentId(id)
    val n = (3 + cid % 5).toInt
    val scale = if (kind == 2) 2 else 1
    val frames = (0 until n).map { fi =>
      val e = cid + 131L * fi
      val w0 = (8 + e % 9).toInt
      val h0 = (8 + e % 7).toInt
      val img = new BufferedImage(w0 * scale, h0 * scale,
        BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h0 * scale) {
        var x = 0
        while (x < w0 * scale) {
          val p = (y / scale) * w0 + (x / scale)
          val rgb =
            if (kind == 3 && fi == 0 && p == 0) 0xffffff
            else {
              val pp = p.toLong
              val r = (((e % 97 + 1) * pp + (e % 41 + 1) * pp * pp + e)
                % 256).toInt
              val g = (((e % 89 + 2) * pp + (e % 43 + 1) * pp * pp
                + 2L * e) % 256).toInt
              val b = (((e % 83 + 3) * pp + (e % 47 + 1) * pp * pp
                + 3L * e) % 256).toInt
              (r << 16) | (g << 8) | b
            }
          img.setRGB(x, y, rgb)
          x += 1
        }
        y += 1
      }
      MediaCodec.encode(img, if (kind == 1) "bmp" else "png")
    }
    val out = new ByteArrayOutputStream()
    val o = new java.io.DataOutputStream(out)
    o.writeBytes("GFV1")
    o.writeInt(n)
    frames.foreach(f => o.writeInt(f.length))
    frames.foreach(o.write)
    val bytes = out.toByteArray
    if (isVideoPhashCorrupt(id)) java.util.Arrays.copyOf(bytes, 6)
    else bytes
  }

  /** (id BIGINT, media BINARY) video-pHash fixture frame — narrow map. */
  def videoPhashTable(ids: Dataset[Long]): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    spreadIds(ids).mapPartitions(_.map(id => (id, encodeVideoPhash(id))))
      .toDF("id", "media")
  }
}
