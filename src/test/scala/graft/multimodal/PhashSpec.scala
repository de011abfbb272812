package graft.multimodal

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO

import graft.SparkSpec
import graft.queries.Dedup

/** The perceptual-hash near-dup path against an INDEPENDENT plain-Scala
  * reference: decode the very same fixture bytes with `ImageIO`
  * directly, recompute the 9×8 nearest-neighbor luma dHash in simple
  * loops, and brute-force all-pairs hamming — then require the blocked
  * operator to emit exactly that pair set. Plus the planted-duplicate
  * guarantees the fixture exists to prove: a PNG↔BMP re-encode and a
  * pixel-doubled upscale hash IDENTICALLY (the duplicates byte-digest
  * dedup structurally misses), a one-pixel edit moves ≤ 2 bits, and
  * corrupt payloads never reach the pair stage.
  */
class PhashSpec extends SparkSpec {
  import spark.implicits._

  /** Reference dHash: same definition as MediaOps.dhash9x8 but written
    * independently over a direct ImageIO decode (no MediaCodec pool, no
    * Spark) — a bug in either side breaks the equality below.
    */
  private def refHash(bytes: Array[Byte]): Option[(Long, Long)] = {
    val img =
      try ImageIO.read(new ByteArrayInputStream(bytes))
      catch { case _: Throwable => null }
    if (img == null) None
    else {
      val grid = Array.tabulate(8, 9) { (y, x) =>
        val rgb = img.getRGB(x * img.getWidth / 9, y * img.getHeight / 8)
        (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
          114 * (rgb & 0xff)) / 1000
      }
      var lo = 0L; var hi = 0L
      for (y <- 0 until 8; x <- 0 until 8) {
        val b = y * 8 + x
        if (grid(y)(x) > grid(y)(x + 1)) {
          if (b < 32) lo |= 1L << b else hi |= 1L << (b - 32)
        }
      }
      Some((hi, lo))
    }
  }

  private def refPairs(ids: Seq[Long], maxHamming: Int)
      : Set[(Long, Long, Long)] = {
    val hashes = ids.flatMap { id =>
      refHash(MediaFixture.encodePhash(id)).map(h => id -> h)
    }
    (for {
      (ida, (hia, loa)) <- hashes
      (idb, (hib, lob)) <- hashes
      if ida < idb
      ham = java.lang.Long.bitCount(hia ^ hib) +
        java.lang.Long.bitCount(loa ^ lob)
      if ham <= maxHamming
    } yield (ida, idb, ham.toLong)).toSet
  }

  private def opPairs(ids: Seq[Long], maxHamming: Int)
      : Set[(Long, Long, Long)] =
    Dedup.phashPairs(
      MediaOps.dhashFeatures(MediaFixture.phashTable(ids.toDS())),
      maxHamming)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("blocked pairs equal the brute-force reference (incl. corrupt ids)") {
    // 0..129 covers 26 planted clusters, 10 corrupt ids (…%13==5), all
    // five variant kinds, and every content dimension combination
    val ids = (0L until 130L)
    for (d <- Seq(0, 3)) {
      assert(opPairs(ids, d) == refPairs(ids, d), s"maxHamming=$d")
    }
  }

  test("planted re-encode and upscale duplicates hash identically; " +
    "a one-pixel edit moves at most 2 bits") {
    val pairs = opPairs(0L until 65L, 3).map(p => (p._1, p._2) -> p._3).toMap
    for (base <- Seq(0L, 10L, 20L, 60L)) { // uncorrupted planted clusters
      assert(pairs.get((base, base + 1)).contains(0L),
        s"PNG-BMP re-encode pair ($base, ${base + 1}) must be hamming 0")
      assert(pairs.get((base, base + 2)).contains(0L),
        s"2x-upscale pair ($base, ${base + 2}) must be hamming 0")
      val perturbed = pairs.get((base, base + 3))
      assert(perturbed.exists(_ <= 2L),
        s"perturbed pair ($base, ${base + 3}) must be within hamming 2, " +
          s"got $perturbed")
    }
  }

  test("corrupt payloads are dropped from hashing, never paired") {
    // id 5 is a corrupt member of cluster {5,6,7,8}: its siblings may
    // pair among themselves but nothing pairs WITH 5
    val pairs = opPairs(0L until 20L, 3)
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
    assert(MediaOps.dhashFeatures(
      MediaFixture.phashTable(Seq(5L, 18L).toDS())).count() == 0)
  }

  /** Reference 128-bit dHash: 17×8 grid, 4 independent 32-bit limbs —
    * the wide-code analogue of [[refHash]], again written directly
    * over ImageIO with plain loops.
    */
  private def refHashWide(bytes: Array[Byte]): Option[Seq[Long]] = {
    val img =
      try ImageIO.read(new ByteArrayInputStream(bytes))
      catch { case _: Throwable => null }
    if (img == null) None
    else {
      val grid = Array.tabulate(8, 17) { (y, x) =>
        val rgb = img.getRGB(x * img.getWidth / 17, y * img.getHeight / 8)
        (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
          114 * (rgb & 0xff)) / 1000
      }
      val limbs = new Array[Long](4)
      for (y <- 0 until 8; x <- 0 until 16) {
        val b = y * 16 + x
        if (grid(y)(x) > grid(y)(x + 1)) limbs(b / 32) |= 1L << (b % 32)
      }
      Some(limbs.toSeq)
    }
  }

  private def refWidePairs(ids: Seq[Long], maxHamming: Int)
      : Set[(Long, Long, Long)] = {
    val hashes = ids.flatMap { id =>
      refHashWide(MediaFixture.encodePhashWide(id)).map(h => id -> h)
    }
    (for {
      (ida, la) <- hashes
      (idb, lb) <- hashes
      if ida < idb
      ham = la.zip(lb)
        .map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
      if ham <= maxHamming
    } yield (ida, idb, ham.toLong)).toSet
  }

  private def opWidePairs(ids: Seq[Long], maxHamming: Int,
      bands: Int): Set[(Long, Long, Long)] =
    Dedup.phashPairsWide(
      MediaOps.dhashFeaturesWide(MediaFixture.phashWideTable(ids.toDS())),
      maxHamming, codeBits = 128, bands = bands)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("wide 128-bit pairs equal brute force at both band configs") {
    val ids = (0L until 130L)
    // 8×16-bit bands: lossless through radius 7
    for (d <- Seq(0, 3, 7))
      assert(opWidePairs(ids, d, bands = 8) == refWidePairs(ids, d),
        s"8x16 maxHamming=$d")
    // 4×32-bit bands (the extreme-n escape hatch): lossless to radius 3
    for (d <- Seq(0, 3))
      assert(opWidePairs(ids, d, bands = 4) == refWidePairs(ids, d),
        s"4x32 maxHamming=$d")
  }

  test("wide planted duplicates: re-encode/upscale identical, edit ≤ 1 bit") {
    val pairs = opWidePairs(0L until 65L, 7, bands = 8)
      .map(p => (p._1, p._2) -> p._3).toMap
    for (base <- Seq(0L, 10L, 20L, 60L)) {
      assert(pairs.get((base, base + 1)).contains(0L))
      assert(pairs.get((base, base + 2)).contains(0L))
      // ≥ 17 px wide content: only grid cell (0,0) samples pixel 0
      assert(pairs.get((base, base + 3)).exists(_ <= 1L))
    }
  }

  test("parameterized blocking at (64, 4 bands) matches phashPairs") {
    val hashes = MediaOps.dhashFeatures(
      MediaFixture.phashTable((0L until 130L).toDS()))
    val asLimbs = hashes.selectExpr("id", "array(hash_lo, hash_hi) AS limbs")
    val wide = Dedup.phashPairsWide(asLimbs, 3, codeBits = 64, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(wide == opPairs(0L until 130L, 3))
  }

  test("wide blocking rejects a radius past the pigeonhole bound") {
    val df = MediaOps.dhashFeaturesWide(
      MediaFixture.phashWideTable(Seq(0L).toDS()))
    val e = intercept[IllegalArgumentException] {
      Dedup.phashPairsWide(df, 4, codeBits = 128, bands = 4)
    }
    assert(e.getMessage.contains("pigeonhole"))
    val e2 = intercept[IllegalArgumentException] {
      Dedup.phashPairsWide(df, 3, codeBits = 128, bands = 3)
    }
    assert(e2.getMessage.contains("band"))
  }

  /** Reference clip vote: independent GFV1 parse (magic, count,
    * lengths), ImageIO frame decode, [[refHash]] per sampled frame,
    * brute-force position-aligned vote — no MediaOps, no Spark.
    */
  private def refVideoPairs(ids: Seq[Long], maxHamming: Int,
      minMatches: Int): Set[(Long, Long, Long)] = {
    def frames(bytes: Array[Byte]): Seq[(Int, (Long, Long))] = {
      if (bytes.length < 8 || !bytes.startsWith("GFV1".getBytes))
        return Nil
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val n = bb.getInt(4)
      if (bytes.length < 8 + 4 * n) return Nil
      val lens = (0 until n).map(i => bb.getInt(8 + 4 * i))
      val offs = lens.scanLeft(8 + 4 * n)(_ + _)
      val sampled = if (n <= 3) 0 until n
        else (0 until 3).map(j => (j.toLong * n / 3).toInt)
      sampled.zipWithIndex.flatMap { case (fi, j) =>
        refHash(java.util.Arrays.copyOfRange(
          bytes, offs(fi), offs(fi) + lens(fi))).map(j -> _)
      }
    }
    val clips = ids.map(id => id -> frames(MediaFixture.encodeVideoPhash(id)))
    (for {
      (ida, fa) <- clips; (idb, fb) <- clips
      if ida < idb
      matched = fa.flatMap { case (j, (hia, loa)) =>
        fb.collectFirst { case (`j`, (hib, lob))
          if java.lang.Long.bitCount(hia ^ hib) +
            java.lang.Long.bitCount(loa ^ lob) <= maxHamming => j }
      }.size
      if matched >= minMatches
    } yield (ida, idb, matched.toLong)).toSet
  }

  test("video clip vote equals the brute-force reference; planted " +
    "re-encode/upscale clips match 3/3 and a frame edit still pairs") {
    val ids = (0L until 100L)
    val got = Dedup.videoPhashPairs(
        MediaFixture.videoPhashTable(ids.toDS()), "id", "media",
        k = 3, maxHamming = 3, minMatches = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == refVideoPairs(ids, 3, 2))
    val byPair = got.map(p => (p._1, p._2) -> p._3).toMap
    for (base <- Seq(0L, 20L, 60L)) { // uncorrupted planted clusters
      assert(byPair.get((base, base + 1)).contains(3L),
        s"BMP re-encode clip ($base, ${base + 1}) must match 3/3")
      assert(byPair.get((base, base + 2)).contains(3L),
        s"2x-upscale clip ($base, ${base + 2}) must match 3/3")
      assert(byPair.get((base, base + 3)).exists(_ >= 2L),
        s"frame-perturbed clip ($base, ${base + 3}) must win the vote")
    }
    // corrupt container (id 5): parse fails, the clip never pairs
    assert(!got.exists(p => p._1 == 5L || p._2 == 5L))
  }

  private def refCrossPairs(inc: Seq[Long], corp: Seq[Long],
      maxHamming: Int): Set[(Long, Long, Long)] = {
    def hs(ids: Seq[Long]) = ids.flatMap { id =>
      refHash(MediaFixture.encodePhash(id)).map(h => id -> h)
    }
    (for {
      (ida, (hia, loa)) <- hs(inc)
      (idb, (hib, lob)) <- hs(corp)
      ham = java.lang.Long.bitCount(hia ^ hib) +
        java.lang.Long.bitCount(loa ^ lob)
      if ham <= maxHamming
    } yield (ida, idb, ham.toLong)).toSet
  }

  test("cross pairs equal the brute-force cross reference; the corpus " +
    "index is frozen and a streaming corpus is rejected") {
    graft.queries.StaticIndexCache.clear()
    val inc = (0L until 90L).filter(_ % 10 >= 8)
    val corp = (0L until 90L).filter(_ % 10 < 8)
    def op(maxHamming: Int): Set[(Long, Long, Long)] =
      Dedup.phashCrossPairs(
        MediaFixture.phashTable(inc.toDS()),
        MediaFixture.phashTable(corp.toDS()),
        "id", "media", maxHamming)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
    for (d <- Seq(0, 3))
      assert(op(d) == refCrossPairs(inc, corp, d), s"maxHamming=$d")
    // the planted cluster {20,21,22,23} straddles the slices? no —
    // all of 20..23 are corpus-side; cross pairs come from clusters
    // whose members split across % 10 slices, e.g. ids 28 (incoming)
    // and 25..27? kind(28)=3 -> cid 25: its base/re-enc/upscale
    // siblings 25,26,27 are corpus-side -> planted CROSS pairs exist
    assert(op(3).nonEmpty)
    assert(op(3).exists { case (a, b, h) => a == 28L && b == 25L && h <= 2 })
    // same (session, corpus plan, params) -> ONE frozen index entry
    val before = graft.queries.StaticIndexCache.size
    op(2)
    assert(graft.queries.StaticIndexCache.size == before)
    // a streaming corpus side is rejected loudly
    val dir = java.nio.file.Files.createTempDirectory("ph_cross_stream")
    dir.toFile.deleteOnExit()
    MediaFixture.phashTable(corp.toDS())
      .write.mode("overwrite").parquet(dir.toString)
    val schema = spark.read.parquet(dir.toString).schema
    val streaming = spark.readStream.schema(schema).parquet(dir.toString)
    val e = intercept[IllegalArgumentException] {
      Dedup.phashCrossPairs(MediaFixture.phashTable(inc.toDS()),
        streaming, "id", "media", 3)
    }
    assert(e.getMessage.contains("BOUNDED"))
    graft.queries.StaticIndexCache.clear()
  }

  /** Independent audio envelope dHash: decode the WAV bytes with
    * javax.sound directly, recompute the 64-window |sample| envelope
    * and delta bits in plain loops.
    */
  private def refAudioHash(bytes: Array[Byte]): Option[(Long, Long)] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(bytes))
      val data = try in.readAllBytes() finally in.close()
      val n = data.length / 2
      if (n < 64) None
      else {
        val env = (0 until 64).map { w =>
          (w * n / 64 until (w + 1) * n / 64).map { i =>
            math.abs(((data(2 * i) & 0xff) | (data(2 * i + 1) << 8))
              .toShort.toLong)
          }.sum
        }
        var lo = 0L; var hi = 0L
        for (b <- 0 until 63 if env(b) > env(b + 1)) {
          if (b < 32) lo |= 1L << b else hi |= 1L << (b - 32)
        }
        Some((hi, lo))
      }
    } catch { case _: Throwable => None }

  test("audio envelope pairs equal the brute-force reference; a x2 gain " +
    "re-master is hamming 0 and a first-sample edit moves at most 1 bit") {
    val ids = (0L until 100L)
    val refHashes = ids.flatMap { id =>
      refAudioHash(MediaFixture.encodeAudioPhash(id)).map(h => id -> h)
    }
    val want = (for {
      (ida, (hia, loa)) <- refHashes
      (idb, (hib, lob)) <- refHashes
      if ida < idb
      ham = java.lang.Long.bitCount(hia ^ hib) +
        java.lang.Long.bitCount(loa ^ lob)
      if ham <= 3
    } yield (ida, idb, ham.toLong)).toSet
    val got = Dedup.phashPairs(
      MediaOps.audioDhashFeatures(MediaFixture.audioPhashTable(ids.toDS())),
      3).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == want)
    val byPair = got.map(p => (p._1, p._2) -> p._3).toMap
    for (base <- Seq(0L, 12L, 48L)) { // uncorrupted planted clusters
      assert(byPair.get((base, base + 1)).contains(0L),
        s"gain re-master pair ($base, ${base + 1}) must be hamming 0")
      assert(byPair.get((base, base + 2)).exists(_ <= 1L),
        s"perturbed pair ($base, ${base + 2}) must be within hamming 1")
    }
    // corrupt ids (…%11==7) never hash, never pair
    assert(!got.exists(p => p._1 % 11 == 7 || p._2 % 11 == 7))
  }

  test("radius past the pigeonhole-lossless bound is rejected loudly") {
    val hashes = MediaOps.dhashFeatures(
      MediaFixture.phashTable(Seq(0L, 1L).toDS()))
    intercept[IllegalArgumentException](Dedup.phashPairs(hashes, 4))
    intercept[IllegalArgumentException](Dedup.phashPairs(hashes, -1))
  }

  test("pair set is partition-invariant") {
    val ids = (0L until 50L)
    val a = Dedup.phashPairs(MediaOps.dhashFeatures(
      MediaFixture.phashTable(ids.toDS().repartition(1))), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = Dedup.phashPairs(MediaOps.dhashFeatures(
      MediaFixture.phashTable(ids.toDS().repartition(13))), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b)
  }
}
