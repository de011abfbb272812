package graft.queries

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data release operators: PII redaction, URL/domain analysis,
  * and sequence packing — the steps between "deduplicated corpus" and
  * "tensors on trainer disks".
  *
  * The synthetic documents corpus is digit-free word salad, so the PII
  * and URL queries first ENRICH the text with deterministic doc_id-derived
  * fragments (emails, IPv4s, phone numbers, URLs) — identically in Spark
  * and the DuckDB oracle — and then run the real operator over the
  * enriched text. The operator under test is the regex scrub/extract
  * pipeline, and it sees real matches; the enrichment is just a
  * deterministic fixture both engines derive from the same table.
  *
  * Scale notes (100 TB): every query here is a narrow per-row map plus at
  * most one aggregation shuffle. Sequence packing's only non-map step is
  * a 2-phase distributed prefix sum: per-block token totals (B rows,
  * driver-side control plane) then per-block windows that run in
  * parallel — never a single-partition global window, which is the
  * classic concat-and-chunk scale trap.
  */
object Pipeline extends QueryPack {

  // -- regexes (shared verbatim by Spark and DuckDB; both dialects are
  //    RE2-compatible for this subset) ------------------------------------
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val Ipv4Re = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  private val PhoneRe = "\\+[0-9]{8,15}"
  private val UrlRe = "https?://[^ ]+"

  /** Deterministic PII enrichment: ~1/3 of docs get an email, 1/5 an
    * IPv4, 1/7 a phone number, all derived from doc_id.
    */
  private def piiEnriched(c: org.apache.spark.sql.Column,
      id: org.apache.spark.sql.Column) = concat(c,
    when(id % 3 === 0, concat(lit(" contact user"), id.cast("string"),
      lit("@mail.example.com now"))).otherwise(lit("")),
    when(id % 5 === 0, concat(lit(" from 10."), (id % 256).cast("string"),
      // floor(id/7) == id DIV 7 for the non-negative ids this fixture
      // takes (matches the oracle's // operator), and keeps the helper
      // a pure function of the id column
      lit(".0."), (floor(id / 7).cast("long") % 256).cast("string")))
      .otherwise(lit("")),
    when(id % 7 === 0, concat(lit(" call +1555"),
      lpad((id % 10000).cast("string"), 7, "0"))).otherwise(lit("")))

  // single-line: these interpolate into stripMargin'd oracle SQL, where a
  // multi-line fragment's leading "||" would lose a pipe to the margin
  private val oPiiEnriched = Seq(
    "text",
    "|| CASE WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.com now' ELSE '' END",
    "|| CASE WHEN doc_id % 5 = 0 THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.' || CAST((doc_id // 7) % 256 AS VARCHAR) ELSE '' END",
    "|| CASE WHEN doc_id % 7 = 0 THEN ' call +1555' || lpad(CAST(doc_id % 10000 AS VARCHAR), 7, '0') ELSE '' END")
    .mkString(" ")

  /** Deterministic URL enrichment: 1/4 of docs link an https page on one
    * of 20 domains, 1/6 an http page with a query string on one of 7.
    */
  private def urlEnriched(c: org.apache.spark.sql.Column,
      id: org.apache.spark.sql.Column) = concat(c,
    when(id % 4 === 0, concat(lit(" see https://site"), (id % 20).cast("string"),
      lit(".example.com/p/"), id.cast("string"))).otherwise(lit("")),
    when(id % 6 === 0, concat(lit(" ref http://www.ref"), (id % 7).cast("string"),
      lit(".org/x?id="), id.cast("string"), lit("&t=1"))).otherwise(lit("")))

  private val oUrlEnriched = Seq(
    "text",
    "|| CASE WHEN doc_id % 4 = 0 THEN ' see https://site' || CAST(doc_id % 20 AS VARCHAR) || '.example.com/p/' || CAST(doc_id AS VARCHAR) ELSE '' END",
    "|| CASE WHEN doc_id % 6 = 0 THEN ' ref http://www.ref' || CAST(doc_id % 7 AS VARCHAR) || '.org/x?id=' || CAST(doc_id AS VARCHAR) || '&t=1' ELSE '' END")
    .mkString(" ")

  /** Sequence length (tokens) and block count for concat-and-chunk
    * packing. Block width derives from max(doc_id), so block boundaries
    * are deterministic (range-partitioner sampling would not be).
    */
  private val PackSeqLen = 512
  private val PackBlocks = 32L

  /** Character chunking: window size and stride (50-char overlap). */
  private val ChunkSize = 200
  private val ChunkStride = 150

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // End-to-end curation pipeline — the composition a corpus owner
    // actually ships: normalize → quality gate → exact dedup (keep the
    // lowest doc_id per content hash) → deterministic hash sample, with
    // per-stage survivor counts and an id-sum checksum so every drop is
    // accounted for (the funnel report read before/after retuning any
    // threshold; no stage can silently lose or duplicate a doc). Each
    // stage is individually oracle-checked elsewhere; this query pins
    // the COMPOSITION. Plan at 100 TB: normalization and the quality
    // gate are per-row codegen maps, dedup is one content-hash-keyed
    // aggregation, the sample is a hash predicate — one corpus shuffle
    // total, stage counts ride a 4-row union of aggregates.
    "q_pipeline_curate" -> ((s, dir) => {
      import s.implicits._
      val cleaned = trim(regexp_replace(
        regexp_replace(lower($"text"), "[^a-z0-9 ]", ""), " +", " "))
      val normalized = Tables.load(s, dir, "documents")
        .select($"doc_id", cleaned.as("norm_text"))
        .withColumn("n_tok",
          when($"norm_text" === "", 0)
            .otherwise(size(split($"norm_text", " "))))
      // Two corpus scans total, not one per stage: stages 1+2 are
      // row-level predicates — one pass with conditional aggregates;
      // stages 3+4 share the dedup result — one pass over the
      // content-hash aggregation with the sample as a conditional.
      val isQ = $"n_tok" >= 20
      val s12 = normalized.agg(
        count(lit(1)).as("n1"), sum($"doc_id").as("i1"),
        count(when(isQ, 1)).as("n2"), sum(when(isQ, $"doc_id")).as("i2"))
        .selectExpr("stack(2, '1_ingested', n1, i1, '2_quality', n2, i2) " +
          "AS (stage, n, id_sum)")
      // deterministic ~3/4 sample on the content hash's first hex char
      val isSampled = substring($"h", 1, 1).isin(
        "0", "1", "2", "3", "4", "5", "6", "7", "8", "9", "a", "b")
      val s34 = normalized.filter(isQ)
        .withColumn("h", md5($"norm_text"))
        .groupBy($"h").agg(min($"doc_id").as("doc_id"))
        .agg(count(lit(1)).as("n3"), sum($"doc_id").as("i3"),
          count(when(isSampled, 1)).as("n4"),
          sum(when(isSampled, $"doc_id")).as("i4"))
        .selectExpr("stack(2, '3_deduped', n3, i3, '4_sampled', n4, i4) " +
          "AS (stage, n, id_sum)")
      s12.unionByName(s34)
    }),

    // PII redaction: count then scrub emails → IPv4s → phones, in that
    // order (emails carry dots+digits an IP pattern could nibble). Pure
    // per-row codegen'd regex work, no shuffle at all.
    "q_text_pii" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "documents")
        .select($"doc_id", piiEnriched($"text", $"doc_id").as("etext"))
        .select($"doc_id",
          regexp_count($"etext", lit(EmailRe)).as("n_emails"),
          regexp_count($"etext", lit(Ipv4Re)).as("n_ips"),
          regexp_count($"etext", lit(PhoneRe)).as("n_phones"),
          regexp_replace(regexp_replace(regexp_replace($"etext",
            EmailRe, "<EMAIL>"), Ipv4Re, "<IP>"), PhoneRe, "<PHONE>")
            .as("redacted"))
    }),

    // URL/domain analysis: extract URLs, reduce to domains, aggregate
    // link and document frequencies per domain — the core of a
    // blocklist/allowlist filtering pass. One shuffle, keyed by domain.
    // Per-source quota capping — the CommonCrawl-style curation step
    // that stops any one domain from dominating the training mix: keep
    // at most `quota` docs per source, ranked by quality (doc_id
    // tie-break). The quality projection is per-row codegen riding the
    // scan (qualityOn's keep-columns form — no join-back), so the ONLY
    // exchange is the source-keyed window; at 100 TB the per-source
    // sort is the declarative form of a quota-bounded top-k.
    "q_pipeline_domain_quota" -> ((s, dir) => {
      import s.implicits._
      val quota = 10
      TextAnalysis.qualityOn(Tables.load(s, dir, "documents"),
          "doc_id", "text", keep = Seq("source"))
        .withColumn("rank", row_number().over(
          Window.partitionBy($"source")
            .orderBy($"quality_score".desc, $"doc_id")))
        .filter($"rank" <= quota)
        .select($"doc_id", $"source", $"quality_score", $"rank")
    }),

    "q_text_urls" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "documents")
        .select($"doc_id", urlEnriched($"text", $"doc_id").as("etext"))
        .select($"doc_id",
          explode(regexp_extract_all($"etext", lit(UrlRe), lit(0)))
            .as("url"))
        .select($"doc_id",
          regexp_extract($"url", "^https?://([^/]+)", 1).as("domain"))
        .groupBy($"domain")
        .agg(count(lit(1)).as("n_urls"),
          countDistinct($"doc_id").as("n_docs"))
    }),

    // Overlapping document chunking — the embedding/retrieval
    // preprocessing step: fixed-size character windows with overlap,
    // one row per (doc, chunk). Pure generate-and-substring map (the
    // posexplode'd index sequence is the only row expansion); chunk
    // content travels as md5 so the gate hashes bounded rows, not text.
    "q_chunk_docs" -> ((s, dir) => {
      import s.implicits._
      // upper bound clamped to ≥0: an empty doc makes it -1, and Spark's
      // sequence(0, -1) yields a DESCENDING [0, -1] (two spurious
      // chunks) where generate_series(0, -1) yields [] — clamped, both
      // engines emit exactly one empty chunk at idx 0
      Tables.load(s, dir, "documents")
        .select($"doc_id", $"text",
          explode(sequence(lit(0L),
            greatest(lit(0L),
              floor((length($"text") - 1) / ChunkStride).cast("long"))))
            .as("idx"))
        .select($"doc_id", $"idx",
          md5(expr(s"substring(text, idx * $ChunkStride + 1, $ChunkSize)"))
            .as("chunk_md5"),
          expr(s"length(substring(text, idx * $ChunkStride + 1, $ChunkSize))")
            .cast("long").as("chunk_len"))
    }),

    // Concat-and-chunk sequence packing: documents concatenated in doc_id
    // order and sliced into fixed PackSeqLen-token training sequences;
    // each doc reports its global token offset and the sequence span it
    // lands in. The global running sum is a 2-phase prefix sum: (1) token
    // totals per deterministic doc_id block — PackBlocks rows to the
    // driver, control-plane sized; (2) per-block cumulative windows, all
    // blocks in parallel, offset by the broadcast block prefix. No
    // single-partition global window anywhere.
    "q_pack_sequences" -> ((s, dir) => {
      import s.implicits._
      // persist (doc_id, n_tok): the block-sums action AND the returned
      // plan both need it, and without the cache each would re-read and
      // re-tokenize the full document text — the corpus-dominant cost at
      // scale. The cached projection is ~16 bytes/doc, and Spark's cache
      // manager dedupes by plan, so repeated runs share one entry.
      val toks = Tables.load(s, dir, "documents")
        .select($"doc_id",
          size(split($"text", " ")).cast("long").as("n_tok"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val maxId = toks.agg(max($"doc_id")).head.getLong(0)
      val width = maxId / PackBlocks + 1
      val blocked = toks.withColumn("blk", expr(s"doc_id DIV $width"))
      val sums = blocked.groupBy($"blk").agg(sum($"n_tok").as("bs"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      var acc = 0L
      val offs = sums.map { case (b, v) => val o = acc; acc += v; (b, o) }
      val offDf = s.createDataFrame(offs.toIndexedSeq).toDF("blk", "blk_off")
      val w = Window.partitionBy($"blk").orderBy($"doc_id")
      blocked.join(broadcast(offDf), "blk")
        .withColumn("start_off",
          $"blk_off" + sum($"n_tok").over(w) - $"n_tok")
        .select($"doc_id", $"n_tok", $"start_off",
          expr(s"start_off DIV $PackSeqLen").as("first_seq"),
          expr(s"(start_off + n_tok - 1) DIV $PackSeqLen").as("last_seq"))
        .withColumn("n_seqs", $"last_seq" - $"first_seq" + 1)
    }),

    // Domain-authority ranking — PageRank over the host link graph, the
    // crawl-curation pass that scores domains before quality filtering
    // (keep documents whose host ranks above a floor). Edges: the doc's
    // publishing host (`source`) links to each outlink domain, plus
    // co-citation edges between CONSECUTIVE outlink domains within one
    // doc. Three power iterations in scaled-integer arithmetic
    // ([[graft.operators.PageRank]]); the DuckDB oracle unrolls the same
    // three rounds with `//` where Spark uses `div`, so ranks are
    // bit-equal. Corpus-sized work is one edge-aggregation shuffle;
    // every iteration after that is graph-sized.
    "q_graph_pagerank" -> ((s, dir) => {
      import s.implicits._
      val d = Tables.load(s, dir, "documents")
        .select($"source", urlEnriched($"text", $"doc_id").as("etext"))
        .select($"source",
          transform(regexp_extract_all($"etext", lit(UrlRe), lit(0)),
            u => regexp_extract(u, "^https?://([^/]+)", 1)).as("ds"))
      val hostEdges = d.select($"source".as("src"), explode($"ds").as("dst"))
      val cocite = d.filter(size($"ds") >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(ds) - 1), i -> " +
            "struct(element_at(ds, i) AS src, element_at(ds, i + 1) AS dst))"))
          .as("p"))
        .select($"p.src", $"p.dst")
      graft.operators.PageRank(hostEdges.union(cocite), PrIters)
        .select($"node".as("domain"), $"rank")
    }))

  /** PageRank rounds for q_graph_pagerank and the PAGERANK gate TVF —
    * the oracle unrolls exactly this many CTE stages, so the Spark
    * calls and the SQL move together.
    */
  private[queries] val PrIters = 3

  /** The unrolled-iteration oracle: c_k aggregates in-edge contributions
    * against r_{k-1}, r_k applies damping with the same two truncating
    * divisions the Spark kernel uses.
    */
  private def oPageRankIters(n: Int, nodeAs: String): String = {
    val rounds = (1 to n).map { k =>
      s"""c$k AS (SELECT ew.dst AS node, sum(ew.m * (r${k - 1}.r // deg.outdeg)) AS s
         |  FROM ew JOIN deg USING (src) JOIN r${k - 1} ON r${k - 1}.node = ew.src GROUP BY 1),
         |r$k AS (SELECT n.node, 150000000 + (85 * coalesce(c$k.s, 0)) // 100 AS r
         |  FROM nodes n LEFT JOIN c$k USING (node))""".stripMargin
    }.mkString(",\n")
    s"$rounds\nSELECT node AS $nodeAs, CAST(r$n.r AS BIGINT) AS rank FROM r$n"
  }

  /** Full PageRank oracle over any (src, dst) edge SELECT: the shared
    * machinery behind q_graph_pagerank and q_gate_pagerank_tvf.
    * `prefixCtes` (optional, no trailing comma) may define relations the
    * edge SELECT references.
    */
  private[queries] def oPageRank(prefixCtes: String, edgesSelect: String,
      nodeAs: String = "node"): String = {
    val pre = if (prefixCtes.trim.isEmpty) "" else prefixCtes.trim + ",\n"
    // NULL-endpoint edges are dropped exactly as the Spark kernel does
    s"""WITH ${pre}ed AS (SELECT src, dst FROM ($edgesSelect) e0
       |  WHERE src IS NOT NULL AND dst IS NOT NULL),
       |ew AS (SELECT src, dst, count(*) AS m FROM ed GROUP BY 1, 2),
       |deg AS (SELECT src, sum(m) AS outdeg FROM ew GROUP BY 1),
       |nodes AS (SELECT DISTINCT node FROM
       |  (SELECT src AS node FROM ew UNION ALL SELECT dst FROM ew) q),
       |r0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS r FROM nodes),
       |${oPageRankIters(PrIters, nodeAs)}""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
    "q_pipeline_curate" ->
      """WITH normalized AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text),
        |      '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm_text
        |  FROM documents),
        |n2 AS (SELECT doc_id, norm_text,
        |    CASE WHEN norm_text = '' THEN 0
        |         ELSE len(string_split(norm_text, ' ')) END AS n_tok
        |  FROM normalized),
        |quality AS (SELECT * FROM n2 WHERE n_tok >= 20),
        |deduped AS (SELECT md5(norm_text) AS h, MIN(doc_id) AS doc_id
        |  FROM quality GROUP BY md5(norm_text)),
        |sampled AS (SELECT * FROM deduped
        |  WHERE substr(h, 1, 1) IN ('0','1','2','3','4','5','6','7','8','9','a','b'))
        |SELECT '1_ingested' AS stage, COUNT(*) AS n,
        |  CAST(SUM(doc_id) AS BIGINT) AS id_sum FROM n2
        |UNION ALL
        |SELECT '2_quality', COUNT(*), CAST(SUM(doc_id) AS BIGINT) FROM quality
        |UNION ALL
        |SELECT '3_deduped', COUNT(*), CAST(SUM(doc_id) AS BIGINT) FROM deduped
        |UNION ALL
        |SELECT '4_sampled', COUNT(*), CAST(SUM(doc_id) AS BIGINT) FROM sampled""".stripMargin,

    "q_text_pii" ->
      s"""WITH e AS (SELECT doc_id, $oPiiEnriched AS etext FROM documents)
         |SELECT doc_id,
         |  len(regexp_extract_all(etext, '$EmailRe')) AS n_emails,
         |  len(regexp_extract_all(etext, '$Ipv4Re')) AS n_ips,
         |  len(regexp_extract_all(etext, '$PhoneRe')) AS n_phones,
         |  regexp_replace(regexp_replace(regexp_replace(etext,
         |    '$EmailRe', '<EMAIL>', 'g'), '$Ipv4Re', '<IP>', 'g'),
         |    '$PhoneRe', '<PHONE>', 'g') AS redacted
         |FROM e""".stripMargin,

    "q_pipeline_domain_quota" ->
      s"""WITH tq AS (SELECT doc_id, source,
         |    regexp_split_to_array(text, ' ') AS w FROM documents),
         |sc AS (SELECT doc_id, source,
         |  ${TextAnalysis.oQualityScore} AS quality_score FROM tq)
         |SELECT doc_id, source, quality_score, rank FROM (
         |  SELECT doc_id, source, quality_score,
         |    ROW_NUMBER() OVER (PARTITION BY source
         |      ORDER BY quality_score DESC, doc_id) AS rank
         |  FROM sc)
         |WHERE rank <= 10""".stripMargin,

    "q_text_urls" ->
      s"""WITH e AS (SELECT doc_id, $oUrlEnriched AS etext FROM documents),
         |u AS (SELECT doc_id, unnest(regexp_extract_all(etext, '$UrlRe')) AS url FROM e),
         |d AS (SELECT doc_id, regexp_extract(url, '^https?://([^/]+)', 1) AS domain FROM u)
         |SELECT domain, count(*) AS n_urls, count(DISTINCT doc_id) AS n_docs
         |FROM d GROUP BY domain""".stripMargin,

    "q_chunk_docs" ->
      s"""SELECT doc_id, c.idx, md5(c.ch) AS chunk_md5,
         |  CAST(length(c.ch) AS BIGINT) AS chunk_len
         |FROM (SELECT doc_id, unnest(
         |    [{idx: i, ch: substr(text, i * $ChunkStride + 1, $ChunkSize)}
         |     for i in generate_series(0, greatest(0,
         |       CAST(floor((length(text) - 1) / $ChunkStride) AS BIGINT)))])
         |    AS c
         |  FROM documents) t""".stripMargin,

    "q_graph_pagerank" ->
      oPageRank(
        s"""e AS (SELECT doc_id, source, $oUrlEnriched AS etext FROM documents),
           |d AS (SELECT source,
           |  [regexp_extract(u, '^https?://([^/]+)', 1)
           |   for u in regexp_extract_all(etext, '$UrlRe')] AS ds FROM e),
           |he AS (SELECT source AS src, unnest(ds) AS dst FROM d),
           |ce AS (SELECT p.s AS src, p.t AS dst FROM (
           |  SELECT unnest([{s: ds[i], t: ds[i + 1]}
           |    for i in generate_series(1, len(ds) - 1)]) AS p
           |  FROM d WHERE len(ds) >= 2) z)""".stripMargin,
        "SELECT src, dst FROM he UNION ALL SELECT src, dst FROM ce",
        nodeAs = "domain"),

    "q_pack_sequences" ->
      s"""WITH t AS (SELECT doc_id,
         |    CAST(len(regexp_split_to_array(text, ' ')) AS BIGINT) AS n_tok
         |  FROM documents),
         |c AS (SELECT doc_id, n_tok,
         |    CAST(sum(n_tok) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok
         |      AS BIGINT) AS start_off
         |  FROM t)
         |SELECT doc_id, n_tok, start_off,
         |  start_off // $PackSeqLen AS first_seq,
         |  (start_off + n_tok - 1) // $PackSeqLen AS last_seq,
         |  (start_off + n_tok - 1) // $PackSeqLen
         |    - start_off // $PackSeqLen + 1 AS n_seqs
         |FROM c""".stripMargin)
}
