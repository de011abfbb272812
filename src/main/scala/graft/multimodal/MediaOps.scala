package graft.multimodal

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import scala.util.control.NonFatal

/** Multimodal column handling for a training-data pipeline: media payloads
  * as opaque `BINARY` columns + typed metadata, with decode / feature /
  * frame-sample operators running as `mapPartitions` over the binary
  * payloads. The image codec is REAL (`javax.imageio`, JDK built-in — no
  * external dependency): [[imageFeatures]] decodes actual PNG/BMP/JPEG
  * bytes into dimensions and exact per-channel sums, and
  * [[channelHistogram]] into exact integer channel histograms.
  *
  * Failure contract (the production rule for a crawled corpus): a payload
  * that does not decode — truncated, garbage, unsupported container —
  * NEVER crashes the job. [[imageFeatures]] emits the row with
  * `ok = false` and NULL features (so corruption is countable downstream);
  * the narrower operators ([[channelHistogram]]) drop undecodable rows.
  * An executor-side exception hours into a 100 TB job is the alternative.
  *
  * Scale notes: media processing is per-row CPU-bound work with large
  * payloads — exactly what `mapPartitions` + high partition counts are
  * for. No shuffle is introduced: every operator is a narrow map, so a
  * 100 TB corpus streams through executors at scan speed. Feature outputs
  * are small (drop the payload column as early as possible — done here by
  * selecting only derived columns).
  */
object MediaOps {

  /** ImageIO's stream wrappers default to FILE-backed caches
    * (`useCache=true`): every `ImageIO.read`/`write` over an in-memory
    * byte array creates and deletes a temp file. Measured at sf10
    * (462 k images): ~1 M temp-file churns made the per-row decode
    * read 2× per decade instead of linear. The payloads here are
    * in-memory byte arrays — a heap-backed cache is strictly right.
    * JVM-global, set once per executor at class load (idempotent).
    */
  ImageIO.setUseCache(false)

  /** Container sniffing from magic bytes — the cheap pre-decode routing
    * step (a real pipeline fans different containers to different
    * decoders). Deliberately independent of `ImageIO.read`: a truncated
    * PNG still sniffs as "png" (its 8-byte signature survives) while its
    * decode fails, and the two signals together distinguish "corrupt
    * image" from "not an image at all".
    */
  def sniffFormat(bytes: Array[Byte]): String = {
    def at(i: Int): Int = bytes(i) & 0xff
    if (bytes.length >= 8 && at(0) == 0x89 && at(1) == 'P' && at(2) == 'N' &&
      at(3) == 'G' && at(4) == 0x0d && at(5) == 0x0a && at(6) == 0x1a &&
      at(7) == 0x0a) "png"
    else if (bytes.length >= 2 && at(0) == 'B' && at(1) == 'M') "bmp"
    else if (bytes.length >= 3 && at(0) == 0xff && at(1) == 0xd8 &&
      at(2) == 0xff) "jpg"
    else "unknown"
  }

  /** Formats whose decode is bit-exact (lossless codec + no chroma
    * subsampling), i.e. whose per-channel sums are oracle-checkable
    * against the encoder's input. JPEG decodes REAL dimensions but
    * approximate pixels, so its channel features are NULLed rather
    * than emitted as almost-right numbers.
    */
  val LosslessFormats: Set[String] = Set("png", "bmp")

  // registry-free, finalizer-free decode (see [[MediaCodec]]: the
  // ImageIO convenience API's per-call registry scan convoyed 13/32
  // executor threads on one monitor at sf10); corrupt payload → null
  private def decode(bytes: Array[Byte]): java.awt.image.BufferedImage =
    MediaCodec.decode(bytes)

  /** Exact per-channel pixel sums of a decoded image — the shared
    * feature kernel of [[imageFeatures]] and [[videoFrameFeatures]].
    */
  private def rgbSums(img: java.awt.image.BufferedImage): (Long, Long, Long) = {
    var rs = 0L; var gs = 0L; var bs = 0L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        rs += (rgb >> 16) & 0xff
        gs += (rgb >> 8) & 0xff
        bs += rgb & 0xff
        x += 1
      }
      y += 1
    }
    (rs, gs, bs)
  }

  private[multimodal] def byteSum(bytes: Array[Byte]): Long = {
    var s = 0L
    var i = 0
    while (i < bytes.length) { s += (bytes(i) & 0xff); i += 1 }
    s
  }

  private def md5hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map("%02x".format(_)).mkString

  /** Rows with NULL payloads (failed fetches are normal in a crawled
    * corpus) are dropped by every operator — an executor-side NPE hours
    * into a 100 TB job is the alternative.
    */
  private def nonNullMedia(df: DataFrame): DataFrame =
    df.select(col("id"), col("media")).filter(col("media").isNotNull)

  /** REAL image decode + per-image features. Input df needs (id BIGINT,
    * media BINARY); output drops the payload immediately. Every input
    * row is emitted: decodable rows carry real dimensions (all
    * supported formats) and exact per-channel sums (lossless formats
    * only — see [[LosslessFormats]]); undecodable rows carry
    * `ok = false` and NULLs, so downstream can both filter and COUNT
    * corruption.
    */
  def imageFeatures(df: DataFrame): Dataset[ImageFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    nonNullMedia(df).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val fmt = sniffFormat(bytes)
          val img = decode(bytes)
          if (img == null)
            ImageFeatures(id, fmt, ok = false, None, None, None,
              None, None, None)
          else {
            val w = img.getWidth
            val h = img.getHeight
            val nPx = w.toLong * h
            if (LosslessFormats(fmt)) {
              val (rs, gs, bs) = rgbSums(img)
              ImageFeatures(id, fmt, ok = true, Some(w), Some(h), Some(nPx),
                Some(rs), Some(gs), Some(bs))
            } else
              ImageFeatures(id, fmt, ok = true, Some(w), Some(h), Some(nPx),
                None, None, None)
          }
        }
      }
  }

  /** REAL decode → exact 8-bucket red-channel histogram (32 code points
    * per bucket) — the feature-extraction shape with integer outputs so
    * it stays oracle-checkable. Only losslessly-decodable rows are
    * emitted (JPEG pixel values are approximate; corrupt rows don't
    * decode at all).
    */
  def channelHistogram(df: DataFrame): Dataset[MediaHistogram] = {
    val spark = df.sparkSession
    import spark.implicits._
    nonNullMedia(df).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val img = decode(bytes)
          if (img == null || !LosslessFormats(sniffFormat(bytes))) None
          else {
            val hist = new Array[Long](8)
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                hist(((img.getRGB(x, y) >> 16) & 0xff) / 32) += 1
                x += 1
              }
              y += 1
            }
            Some(MediaHistogram(id, hist.toSeq))
          }
        }
      }
  }

  /** REAL decode → nearest-neighbor downscale by an integer factor →
    * features of the RESIZED image (the thumbnail/feature-extraction
    * resize step of a media pipeline). Nearest-neighbor, deliberately:
    * out(x,y) = in(x·f, y·f) is exact integer pixel selection, so the
    * resized channel sums stay oracle-checkable closed-form (an
    * interpolating kernel would be float-blended and engine-specific).
    * Only losslessly-decoded rows are emitted (same contract as
    * [[channelHistogram]]); images smaller than the factor are dropped
    * (no 0-dimension output). A narrow map like every operator here.
    */
  def resizeFeatures(df: DataFrame, factor: Int): Dataset[ResizedFeatures] = {
    require(factor >= 1, s"resizeFeatures: factor must be >= 1, got $factor")
    val spark = df.sparkSession
    import spark.implicits._
    nonNullMedia(df).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val img = decode(bytes)
          if (img == null || !LosslessFormats(sniffFormat(bytes)) ||
            img.getWidth < factor || img.getHeight < factor) None
          else {
            val w2 = img.getWidth / factor
            val h2 = img.getHeight / factor
            var rs = 0L; var gs = 0L; var bs = 0L
            var y = 0
            while (y < h2) {
              var x = 0
              while (x < w2) {
                val rgb = img.getRGB(x * factor, y * factor)
                rs += (rgb >> 16) & 0xff
                gs += (rgb >> 8) & 0xff
                bs += rgb & 0xff
                x += 1
              }
              y += 1
            }
            Some(ResizedFeatures(id, w2, h2, rs, gs, bs))
          }
        }
      }
  }

  /** REAL audio decode (`javax.sound.sampled`, JDK built-in): WAV/PCM
    * payloads → frame count, channel count, sample rate, exact
    * per-channel sample sums and absolute peak. Same failure contract
    * as [[imageFeatures]]: undecodable payloads (truncated header,
    * garbage, unsupported container) are `ok=false` rows with NULL
    * features — countable, never a crash. The feature schema models
    * mono/stereo (ch0_sum, ch1_sum); payloads with more channels
    * still decode — their first two channels' sums are emitted, the
    * rest contribute only to the peak (documented contract edge).
    */
  def audioFeatures(df: DataFrame): Dataset[AudioFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    nonNullMedia(df).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val fmt = sniffAudioFormat(bytes)
          decodePcm(bytes) match {
            case None =>
              AudioFeatures(id, fmt, ok = false, None, None, None,
                None, None, None)
            case Some((channels, rate, frames, data)) =>
              val sums = new Array[Long](channels)
              var peak = 0L
              var i = 0
              while (i + 1 < data.length) {
                val v = ((data(i) & 0xff) | (data(i + 1) << 8)).toShort.toInt
                sums((i / 2) % channels) += v
                if (math.abs(v.toLong) > peak) peak = math.abs(v.toLong)
                i += 2
              }
              AudioFeatures(id, fmt, ok = true, Some(channels),
                Some(rate), Some(frames), Some(sums(0)),
                if (channels > 1) Some(sums(1)) else None, Some(peak))
          }
        }
      }
  }

  /** RIFF/WAVE container sniff (12-byte magic) — same pre-decode
    * routing role as [[sniffFormat]].
    */
  def sniffAudioFormat(bytes: Array[Byte]): String =
    if (bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == 'F' && bytes(8) == 'W' &&
      bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E') "wav"
    else "unknown"

  /** 16-bit PCM decode → (channels, rate, frames, raw little-endian
    * sample bytes); None for anything undecodable or non-s16 PCM.
    */
  private def decodePcm(bytes: Array[Byte])
      : Option[(Int, Int, Long, Array[Byte])] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(bytes))
      try {
        val f = in.getFormat
        if (f.getEncoding !=
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
          f.getSampleSizeInBits != 16 || f.isBigEndian ||
          f.getChannels < 1) None
        else Some((f.getChannels, f.getSampleRate.toInt,
          in.getFrameLength, in.readAllBytes()))
      } finally in.close()
    } catch { case NonFatal(_) => None }

  /** 64-bit envelope dHash of a decoded PCM payload — the audio
    * analogue of [[dhash9x8]]: split the interleaved sample stream into
    * 64 equal windows, sum |sample| per window (the energy envelope),
    * and emit one bit per adjacent window pair, set iff left > right
    * (bits 0–62; bit 63 is always 0). Comparisons of energies are
    * PROVABLY invariant under uniform positive gain — the re-mastered
    * duplicate a byte digest structurally misses — while an edit moves
    * only the bits whose windows it touches. Same (hash_hi, hash_lo)
    * halves contract as the image dHash, so [[graft.queries.Dedup
    * .phashPairs]] serves both modalities unchanged.
    *
    * Payloads that do not decode, or with fewer than 64 samples (empty
    * envelope windows), are dropped — the [[channelHistogram]]
    * contract.
    */
  def audioDhashFeatures(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    nonNullMedia(df).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          decodePcm(bytes) match {
            case None => None
            case Some((_, _, _, data)) =>
              val n = data.length / 2
              if (n < 64) None
              else {
                val env = new Array[Long](64)
                var w = 0
                while (w < 64) {
                  var i = w * n / 64
                  val hi = (w + 1) * n / 64
                  var e = 0L
                  while (i < hi) {
                    val v = ((data(2 * i) & 0xff) |
                      (data(2 * i + 1) << 8)).toShort.toLong
                    e += math.abs(v)
                    i += 1
                  }
                  env(w) = e
                  w += 1
                }
                var lo = 0L; var hi64 = 0L
                var b = 0
                while (b < 63) {
                  if (env(b) > env(b + 1)) {
                    if (b < 32) lo |= 1L << b else hi64 |= 1L << (b - 32)
                  }
                  b += 1
                }
                Some((id, hi64, lo))
              }
          }
        }
      }.toDF("id", "hash_hi", "hash_lo")
  }

  /** Payload-level features (no decode): size, digest, byte sum — the
    * exact-dedup / integrity side of a media pipeline (a binary digest
    * dedups identical crawls regardless of whether the payload decodes).
    */
  def payloadFeatures(df: DataFrame): Dataset[PayloadFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    nonNullMedia(df).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          PayloadFeatures(id, bytes.length, md5hex(bytes), byteSum(bytes))
        }
      }
  }

  // ---- video container (GFV1: indexed packed image frames) ----------------
  // The JDK ships no video codec, so the video operators work over an
  // OPEN container this repo defines — the MJPEG/AVI shape reduced to its
  // essentials: a magic, a frame count, an offset index, then real image
  // frames packed back-to-back. The frames themselves are REAL PNGs
  // decoded by the REAL `javax.imageio` codec; only the inter-frame
  // compression of a production codec is out of scope. The index is the
  // scale-defining piece: frame sampling seeks straight to the k selected
  // frames and decodes ONLY those — at 100 TB of video you sample frames,
  // you never decode the stream.
  //
  //   bytes 0-3   magic 'GFV1'
  //   bytes 4-7   int32 BE frame count n (1 ≤ n ≤ MaxVideoFrames)
  //   8 .. 8+4n-1 int32 BE per-frame byte length
  //   then        n frame payloads, concatenated in index order

  /** Upper bound on a parseable frame count — a malformed/hostile count
    * field must not drive a multi-GB index allocation on an executor.
    */
  val MaxVideoFrames: Int = 1 << 20

  /** GFV1 container sniff (4-byte magic) — same pre-decode routing role
    * as [[sniffFormat]], and independent of the parse: a truncated
    * container still sniffs as "gfv" while its parse fails.
    */
  def sniffVideoFormat(bytes: Array[Byte]): String =
    if (bytes.length >= 4 && bytes(0) == 'G' && bytes(1) == 'F' &&
      bytes(2) == 'V' && bytes(3) == '1') "gfv"
    else "unknown"

  /** Parse the GFV1 index into per-frame (offset, length) without
    * touching frame bytes — O(index), not O(payload). None for anything
    * malformed: short header, insane frame count, a frame extending past
    * the payload. Per-frame DECODE failures are not this layer's job —
    * a well-indexed container with one smashed frame should still let
    * every other frame decode.
    */
  private[multimodal] def parseVideoIndex(
      bytes: Array[Byte]): Option[Array[(Int, Int)]] = {
    if (sniffVideoFormat(bytes) != "gfv" || bytes.length < 8) return None
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt(4)
    if (n < 1 || n > MaxVideoFrames) return None
    val headerLen = 8L + 4L * n
    if (bytes.length < headerLen) return None
    val table = new Array[(Int, Int)](n)
    var off = headerLen.toInt
    var i = 0
    while (i < n) {
      val len = bb.getInt(8 + 4 * i)
      if (len < 0 || off.toLong + len > bytes.length) return None
      table(i) = (off, len)
      off += len
      i += 1
    }
    Some(table)
  }

  /** Uniform-stride frame selection: all frames when n ≤ k, else the k
    * indices ⌊j·n/k⌋ (j = 0..k−1, distinct because n > k). Mirrored by
    * the q_media_video oracle.
    */
  private[multimodal] def sampleIndices(n: Int, k: Int): IndexedSeq[Int] =
    if (n <= k) 0 until n
    else (0 until k).map(j => (j.toLong * n / k).toInt)

  /** REAL video frame sampling: parse the GFV1 index, seek to k
    * uniform-stride frames, decode ONLY those with `ImageIO`, and emit
    * per-frame dimensions + exact channel sums. Failure contract at both
    * granularities: an unparseable CONTAINER is one `ok=false` row with
    * NULL frame_idx (countable, never a crash); a sampled FRAME that
    * does not decode is an `ok=false` row with its frame_idx while the
    * container's other frames still emit — one smashed keyframe must
    * not void the clip. A narrow map like every media operator; decode
    * cost is O(k) per row regardless of clip length.
    */
  def videoFrameFeatures(df: DataFrame, k: Int): Dataset[VideoFrameFeatures] = {
    require(k >= 1, s"videoFrameFeatures: k must be >= 1, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    nonNullMedia(df).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          parseVideoIndex(bytes) match {
            case None =>
              Iterator.single(VideoFrameFeatures(id, None, None, ok = false,
                None, None, None, None, None))
            case Some(table) =>
              val n = table.length
              sampleIndices(n, k).iterator.map { fi =>
                val (off, len) = table(fi)
                val img =
                  decode(java.util.Arrays.copyOfRange(bytes, off, off + len))
                if (img == null)
                  VideoFrameFeatures(id, Some(n), Some(fi), ok = false,
                    None, None, None, None, None)
                else {
                  val (rs, gs, bs) = rgbSums(img)
                  VideoFrameFeatures(id, Some(n), Some(fi), ok = true,
                    Some(img.getWidth), Some(img.getHeight),
                    Some(rs), Some(gs), Some(bs))
                }
              }
          }
        }
      }
  }

  /** 64-bit difference hash (dHash) of a decoded image — the standard
    * perceptual fingerprint for image near-dup detection: downscale to
    * a 9×8 luma grid (nearest-neighbor — exact integer pixel selection,
    * so the closed-form fixture oracle can replay it; a production
    * box-filter variant would be a drop-in swap), then emit one bit per
    * horizontally adjacent cell pair, set iff left > right. Robust by
    * construction to exactly the transforms byte-digest dedup misses:
    * re-encoding (PNG↔BMP: identical pixels → identical grid) and
    * integer upscaling (nearest-neighbor sampling of a pixel-doubled
    * image provably selects the same source pixels — see the oracle
    * derivation in [[graft.queries.Multimodal]]).
    *
    * Bit layout (mirrored by the oracle): bit b = y·8 + x compares
    * grid(x, y) > grid(x+1, y); bits 0–31 in `lo`, 32–63 in `hi`, each
    * half a nonnegative Long in [0, 2^32) so the DuckDB mirror never
    * touches the sign bit.
    */
  private[multimodal] def dhash9x8(
      img: java.awt.image.BufferedImage): (Long, Long) = {
    val limbs = dhashGrid(img, 9, 8)
    (limbs(1), limbs(0))
  }

  /** General dHash over a gw×gh luma grid: (gw−1)·gh comparison bits,
    * bit b = y·(gw−1) + x set iff grid(x, y) > grid(x+1, y), packed
    * into 32-bit limbs (low bits first, each limb a nonnegative Long
    * in [0, 2^32) so the DuckDB mirror never touches the sign bit).
    * The 9×8 layout is the [[dhash9x8]] contract unchanged; 17×8 is
    * the 128-bit long-code knob ([[dhashFeaturesWide]]).
    */
  private[multimodal] def dhashGrid(img: java.awt.image.BufferedImage,
      gw: Int, gh: Int): Array[Long] = {
    val w = img.getWidth
    val h = img.getHeight
    val lum = new Array[Int](gw * gh)
    var y = 0
    while (y < gh) {
      var x = 0
      while (x < gw) {
        val rgb = img.getRGB(x * w / gw, y * h / gh)
        lum(y * gw + x) = (299 * ((rgb >> 16) & 0xff) +
          587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)) / 1000
        x += 1
      }
      y += 1
    }
    val bits = (gw - 1) * gh
    val limbs = new Array[Long]((bits + 31) / 32)
    var b = 0
    while (b < bits) {
      val yy = b / (gw - 1)
      val xx = b % (gw - 1)
      if (lum(yy * gw + xx) > lum(yy * gw + xx + 1))
        limbs(b / 32) |= 1L << (b % 32)
      b += 1
    }
    limbs
  }

  /** REAL decode → 64-bit dHash per image. Every DECODABLE payload is
    * hashed (a perceptual hash needs robustness, not bit-exact pixels,
    * so lossy formats hash too); undecodable rows are dropped — same
    * contract as [[channelHistogram]]. Output: (id, hash_hi, hash_lo).
    * A narrow map like every media operator.
    */
  def dhashFeatures(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    nonNullMedia(df).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val img = decode(bytes)
          if (img == null) None
          else {
            val (hi, lo) = dhash9x8(img)
            Some((id, hi, lo))
          }
        }
      }.toDF("id", "hash_hi", "hash_lo")
  }

  /** REAL decode → long perceptual code: dHash over a (gw×gh) grid,
    * (gw−1)·gh bits as 32-bit limbs (low first) — the code-width knob
    * behind [[graft.queries.Dedup.phashPairsWide]]. The default 17×8
    * grid yields the 128-bit code (8 lossless 16-bit bands to radius
    * 7, or 4 32-bit bands to radius 3 with a 2^32 key space — the
    * in-bucket-mass escape hatch for extreme corpus sizes). Same
    * decode contract as [[dhashFeatures]]: every decodable payload
    * hashes, undecodable rows drop. Output: (id, limbs ARRAY<BIGINT>).
    */
  def dhashFeaturesWide(df: DataFrame, gridW: Int = 17,
      gridH: Int = 8): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    nonNullMedia(df).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val img = decode(bytes)
          if (img == null) None
          else Some((id, dhashGrid(img, gridW, gridH).toSeq))
        }
      }.toDF("id", "limbs")
  }

  /** REAL video → per-sampled-frame dHash: parse the GFV1 index, seek
    * to the k uniform-stride frames, decode ONLY those, hash each with
    * [[dhash9x8]]. Emits the SAMPLE POSITION j (0..k−1), not the raw
    * frame index — position-aligned comparison is the clip-vote
    * contract of [[graft.queries.Dedup.videoPhashPairs]]: a re-encoded
    * duplicate clip has the same frame count, so position j samples
    * the same source frame on both sides. Unparseable containers and
    * undecodable frames drop (their position is simply absent), the
    * same skip-and-count contract as [[videoFrameFeatures]]. A narrow
    * map: at 100 TB of video you hash k sampled frames per clip, you
    * never decode the stream. Output: (id, pos, hash_hi, hash_lo).
    */
  def videoFrameDhashes(df: DataFrame, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    nonNullMedia(df).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          parseVideoIndex(bytes) match {
            case None => Iterator.empty
            case Some(table) =>
              sampleIndices(table.length, k).iterator.zipWithIndex
                .flatMap { case (fi, j) =>
                  val (off, len) = table(fi)
                  val img = decode(
                    java.util.Arrays.copyOfRange(bytes, off, off + len))
                  if (img == null) None
                  else {
                    val (hi, lo) = dhash9x8(img)
                    Some((id, j, hi, lo))
                  }
                }
          }
        }
      }.toDF("id", "pos", "hash_hi", "hash_lo")
  }

  /** Byte-level chunk sampling: split an OPAQUE payload into k contiguous
    * chunks and emit per-chunk summaries — the pre-decode integrity scan
    * for containers with no registered codec ([[videoFrameFeatures]] is
    * the decoding path for indexed GFV1 video).
    */
  def frameSample(df: DataFrame, k: Int): Dataset[FrameFeature] = {
    val spark = df.sparkSession
    import spark.implicits._
    nonNullMedia(df).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          (0 until k).map { i =>
            // long arithmetic: i * length overflows Int for ~100MB+ media
            val from = (i.toLong * bytes.length / k).toInt
            val until = ((i + 1).toLong * bytes.length / k).toInt
            FrameFeature(id, i, byteSum(bytes.slice(from, until)))
          }
        }
      }
  }
}

final case class ResizedFeatures(id: Long, width: Int, height: Int,
    r_sum: Long, g_sum: Long, b_sum: Long)
final case class AudioFeatures(id: Long, fmt: String, ok: Boolean,
    channels: Option[Int], rate: Option[Int], frames: Option[Long],
    ch0_sum: Option[Long], ch1_sum: Option[Long], peak: Option[Long])
final case class ImageFeatures(id: Long, fmt: String, ok: Boolean,
    width: Option[Int], height: Option[Int], n_px: Option[Long],
    r_sum: Option[Long], g_sum: Option[Long], b_sum: Option[Long])
final case class PayloadFeatures(id: Long, n_bytes: Int, digest: String,
    byte_sum: Long)
final case class FrameFeature(id: Long, frame_idx: Int, chunk_sum: Long)
final case class VideoFrameFeatures(id: Long, n_frames: Option[Int],
    frame_idx: Option[Int], ok: Boolean, width: Option[Int],
    height: Option[Int], r_sum: Option[Long], g_sum: Option[Long],
    b_sum: Option[Long])
final case class MediaHistogram(id: Long, hist: Seq[Long])
