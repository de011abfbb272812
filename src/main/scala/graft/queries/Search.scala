package graft.queries

import graft.{QueryPack, Tables}
import graft.Num.{dsum6, oSum6}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Full-text relevance search over the document corpus — the retrieval
  * side of a training-data pipeline (dedup-adjacent: "find everything
  * that looks like this query" is the same posting-list machinery as
  * contamination lookup, e.g. reference job platforms route such
  * queries to an external search sink;
  * /root/reference/docs/sql_demo/demo_7.md wires one up — here the
  * scoring itself is native).
  *
  * Scoring is BM25 with a LOG-FREE idf: the exact rational odds ratio
  * `(2(N-df)+1)/(2df+1)` stands in for `ln((N-df+0.5)/(df+0.5))`.
  * Rationale (the same rule every scoring op in this repo follows, see
  * [[TextAnalysis]]): libm `ln` is not bit-stable across engines, but
  * integer-derived divisions and IEEE multiply/divide chains are, so
  * the DuckDB oracle reproduces every score BIT-exactly. The odds
  * ratio is a strictly monotone transform of the textbook idf per
  * term; multi-term sums therefore weight rare terms more steeply than
  * the log form — a documented scoring-family deviation, not an
  * implementation approximation. The tf saturation term is textbook
  * BM25 (k1 = 1.2, b = 0.75), evaluated in one fixed expression-tree
  * order mirrored token-for-token in the oracle SQL.
  *
  * The 100 TB plan (classic distributed term-at-a-time retrieval):
  *   - Index build: ONE corpus tokenize pass → per-(doc,term) counts
  *     (map-side-combined keyed agg); document frequencies come from a
  *     count window over `term`, whose single exchange ALSO leaves the
  *     postings partitioned on the probe key. The corpus scalars (N,
  *     total tokens) reduce from the same tf relation — its shuffle is
  *     shared via ReuseExchange (spec-pinned), never a second corpus
  *     scan — and ride a 1-row cross join, broadcast, not collected.
  *   - Probe: ONE shuffle join of exploded query terms against the
  *     postings on `term` — fan-out is Σ df(term) over query terms,
  *     the inherent cost of term-at-a-time scoring. The per-(query,
  *     doc) score agg map-side combines; the final top-k is a
  *     `row_number` window partitioned by query id, k rows kept per
  *     query.
  *   - Skew: a stop-word-grade term's posting list is corpus-sized;
  *     production pairs this with stop-term dropping (df cap) — the
  *     same hot-bucket discipline as minhash LSH. Left uncapped here
  *     because the cap is a recall knob, not an index parameter.
  */
object Search extends QueryPack {

  /** Tokenization shared with [[TextAnalysis]]: plain single-space
    * split, mirrored as `regexp_split_to_array(text, ' ')` in DuckDB.
    */
  private def words(c: Column): Column = split(c, " ")

  private val K1 = 1.2
  private val B = 0.75

  /** Shared posting-index build (ONE corpus tokenize pass): per-(doc,
    * term) counts with dl riding the key, document frequency via a
    * term window — the single exchange that also leaves the postings
    * partitioned on the probe key — and the corpus scalars (n_docs,
    * total_tok) reduced from the same tf relation, whose shuffle both
    * consumers share via ReuseExchange (spec-pinned; never a second
    * corpus scan). Every non-NULL text yields ≥ 1 token (split of ""
    * is [""]), so countDistinct(doc_id) == N; NULL-text rows never
    * enter tf and are thereby excluded from the corpus and its
    * statistics — the oracle mirrors this with `WHERE text IS NOT
    * NULL`.
    */
  private def postingIndex(corpus: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val docs = corpus.select(col(idCol).as("doc_id"),
      words(col(textCol)).as("w"))
      .select(col("doc_id"), col("w"), size(col("w")).as("dl"))
    val tf = docs.select(col("doc_id"), col("dl"),
        explode(col("w")).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val stats = tf.agg(countDistinct(col("doc_id")).as("n_docs"),
      sum(col("tf")).as("total_tok"))
    tf.withColumn("df",
        count(lit(1)).over(Window.partitionBy(col("term"))))
      .crossJoin(stats)
  }

  /** The log-free rational odds-ratio idf shared by both scorers —
    * `(2(N-df)+1)/(2df+1)`, the exact monotone stand-in for
    * `ln((N-df+.5)/(df+.5))` (see the object Scaladoc).
    */
  private def idf: Column =
    (lit(2.0) * (col("n_docs") - col("df")) + lit(1.0)) /
      (lit(2.0) * col("df") + lit(1.0))

  /** BM25 top-k retrieval: for each query row, the k highest-scoring
    * corpus documents → (qid, doc_id, score, rank). Query terms are
    * de-duplicated across the relation (the standard short-query form;
    * qtf weighting is a long-query refinement this contract omits).
    * Ties break on doc_id so ranks are total and deterministic.
    * Queries with no term in the corpus vocabulary return no rows.
    * Contract edges: a NULL-text corpus row is excluded from the
    * corpus AND its statistics (N, avgdl) — the oracle mirrors this —
    * and `idCol` must be a key (duplicate ids would merge their term
    * counts).
    */
  def bm25TopK(queries: DataFrame, corpus: DataFrame,
      qidCol: String, qtextCol: String, idCol: String, textCol: String,
      k: Int = 10): DataFrame = {
    require(k >= 1, s"TEXT_SEARCH_BM25: k must be >= 1, got $k")
    val postings = postingIndex(corpus, idCol, textCol)

    // distinct across the RELATION, not just within a row: a caller
    // feeding duplicate qid rows must not double-count addends (the
    // oracle's DISTINCT (qid, term) contract)
    val qterms = queries.select(col(qidCol).as("qid"),
        explode(array_distinct(words(col(qtextCol)))).as("term"))
      .dropDuplicates("qid", "term")

    // the scoring expression, mirrored token-for-token by oracleSql:
    // every input is integer-derived, every op is IEEE mul/div/add in
    // a fixed tree, so both engines produce bit-identical doubles
    // literals spelled out (2.2, not K1+1.0: the Scala double sum is
    // 2.2000000000000002, the parsed literal both engines share is 2.2)
    val avgdl = col("total_tok").cast("double") / col("n_docs")
    val tfd = col("tf").cast("double")
    val sat = (tfd * lit(2.2)) /
      (tfd + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / avgdl))

    val scored = qterms.join(postings, "term")
      .groupBy(col("qid"), col("doc_id"))
      .agg(dsum6(idf * sat).as("score"))

    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("score").desc, col("doc_id"))))
      .filter(col("rank") <= k)
  }

  /** TF-IDF keyword extraction: the k most corpus-distinctive terms
    * per document → (doc_id, term, weight, rank). Weight is the
    * log-free rational `tf/dl × (2(N-df)+1)/(2df+1)` (same idf family
    * as [[bm25TopK]], same bit-stability rationale). One tokenize
    * pass, two map-side-combined keyed aggs, one per-doc window.
    */
  def keywordsTfidf(corpus: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    require(k >= 1, s"keywordsTfidf: k must be >= 1, got $k")
    val weight = (col("tf").cast("double") / col("dl")) * idf
    postingIndex(corpus, idCol, textCol)
      .select(col("doc_id"), col("term"), weight.as("weight"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("weight").desc, col("term"))))
      .filter(col("rank") <= k)
  }

  /** The oracle's deterministic query set: every 97th document's first
    * four tokens (≥5 queries at sf0.01, slice bounded so the all-docs
    * DuckDB mirror stays cheap).
    */
  private def oracleQueries(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id") % 97 === 3)
      .select(col("doc_id").as("qid"),
        concat_ws(" ", slice(words(col("text")), 1, 4)).as("qtext"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_text_bm25" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      bm25TopK(oracleQueries(docs), docs, "qid", "qtext",
        "doc_id", "text", k = 10)
    }),

    "q_text_keywords" -> ((s, dir) =>
      keywordsTfidf(Tables.load(s, dir, "documents"), "doc_id", "text",
        k = 3)))

  // --- DuckDB mirrors -----------------------------------------------------

  /** Shared by `q_text_bm25` and the gate TVF route so the two checks
    * cannot drift. The scoring arithmetic mirrors [[bm25TopK]]'s
    * expression tree token-for-token (see the object Scaladoc).
    */
  private[queries] val oBm25Sql: String =
    s"""WITH d AS (SELECT doc_id, regexp_split_to_array(text, ' ') AS w
       |    FROM documents WHERE text IS NOT NULL),
       |docs AS (SELECT doc_id, w, len(w) AS dl FROM d),
       |stats AS (SELECT COUNT(*) AS n_docs,
       |    SUM(dl) AS total_tok FROM docs),
       |tf AS (SELECT doc_id, dl, unnest(w) AS term FROM docs),
       |tfc AS (SELECT doc_id, dl, term, COUNT(*) AS tf
       |  FROM tf GROUP BY doc_id, dl, term),
       |dfreq AS (SELECT term, COUNT(*) AS df FROM tfc GROUP BY term),
       |q AS (SELECT doc_id AS qid, w[1:4] AS qw FROM docs
       |  WHERE doc_id % 97 = 3),
       |qt AS (SELECT DISTINCT qid, term
       |  FROM (SELECT qid, unnest(qw) AS term FROM q)),
       |scored AS (SELECT qt.qid, tfc.doc_id,
       |    ${oSum6(
           "((CAST(2.0 AS DOUBLE) * (n_docs - df) + CAST(1.0 AS DOUBLE)) / " +
           "(CAST(2.0 AS DOUBLE) * df + CAST(1.0 AS DOUBLE))) * " +
           "((CAST(tf AS DOUBLE) * CAST(2.2 AS DOUBLE)) / " +
           "(CAST(tf AS DOUBLE) + CAST(1.2 AS DOUBLE) * " +
           "(CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * dl / " +
           "(CAST(total_tok AS DOUBLE) / n_docs))))")}
       |      AS score
       |  FROM qt JOIN tfc USING (term)
       |    JOIN dfreq USING (term), stats
       |  GROUP BY qt.qid, tfc.doc_id)
       |SELECT qid, doc_id, score, rank FROM (
       |  SELECT qid, doc_id, score,
       |    ROW_NUMBER() OVER (PARTITION BY qid
       |      ORDER BY score DESC, doc_id) AS rank
       |  FROM scored)
       |WHERE rank <= 10""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q_text_bm25" -> oBm25Sql,

    "q_text_keywords" ->
      """WITH d AS (SELECT doc_id, regexp_split_to_array(text, ' ') AS w
        |    FROM documents WHERE text IS NOT NULL),
        |docs AS (SELECT doc_id, w, len(w) AS dl FROM d),
        |stats AS (SELECT COUNT(*) AS n_docs FROM docs),
        |tf AS (SELECT doc_id, dl, unnest(w) AS term FROM docs),
        |tfc AS (SELECT doc_id, dl, term, COUNT(*) AS tf
        |  FROM tf GROUP BY doc_id, dl, term),
        |dfreq AS (SELECT term, COUNT(*) AS df FROM tfc GROUP BY term),
        |wgt AS (SELECT doc_id, term,
        |    (CAST(tf AS DOUBLE) / dl) *
        |      ((CAST(2.0 AS DOUBLE) * (n_docs - df) + CAST(1.0 AS DOUBLE)) /
        |        (CAST(2.0 AS DOUBLE) * df + CAST(1.0 AS DOUBLE))) AS weight
        |  FROM tfc JOIN dfreq USING (term), stats)
        |SELECT doc_id, term, weight, rank FROM (
        |  SELECT doc_id, term, weight,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id
        |      ORDER BY weight DESC, term) AS rank
        |  FROM wgt)
        |WHERE rank <= 3""".stripMargin)
}
