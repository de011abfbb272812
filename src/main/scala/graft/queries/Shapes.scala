package graft.queries

import graft.{Num, QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generator (UDTF-shape) explode, exact order-statistics, histogram
  * bucketing, and Z-order layout keys — distribution-analysis and
  * file-layout operators a data pipeline leans on, all deterministic
  * and oracle-checked.
  */
object Shapes extends QueryPack {
  import Num._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // posexplode as the generator/UDTF surface (LATERAL VIEW shape).
    "q_posexplode" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "documents")
        .filter($"doc_id" < 20)
        .select($"doc_id", posexplode(split($"text", " ")))
        .toDF("doc_id", "pos", "word")
        .filter($"word".startsWith("s"))
    }),

    // Exact lower-median per group via row_number over a unique order —
    // bit-identical across engines (interpolating percentile_cont is
    // engine-specific; order statistics are not).
    "q_median" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"c_mktsegment")
        .orderBy($"c_acctbal", $"c_custkey")
      Tables.load(s, dir, "customer")
        .select($"c_mktsegment", $"c_acctbal", $"c_custkey")
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(
          Window.partitionBy($"c_mktsegment")))
        .filter($"rn" === expr("(n + 1) DIV 2")) // integer div, as oracle's //
        .select($"c_mktsegment", $"c_acctbal".as("median_bal"))
    }),

    // Deterministic train/val/test split: content-hash bucket (md5 first
    // byte) → 80/10/10. Hash-based splitting survives re-runs, appends,
    // and repartitioning — the only splitter that is stable at 100 TB.
    "q_train_split" -> ((s, dir) => {
      import s.implicits._
      val bucket = conv(substring(md5($"text"), 1, 2), 16, 10).cast("int")
      Tables.load(s, dir, "documents")
        .select($"doc_id", bucket.as("bucket"),
          when(bucket < 205, "train")
            .when(bucket < 230, "val")
            .otherwise("test").as("split"))
    }),

    // Deterministic distributed shuffle: disperse correlated documents
    // into hash shards with a reproducible within-shard order (salted
    // md5, doc_id tiebreak) — the "shuffle the corpus before training,
    // identically on every rerun" operator. Shard assignment is a
    // per-row map; ordering is a per-shard window (64-way parallel,
    // never a global sort).
    "q_shuffle_shards" -> ((s, dir) => {
      import s.implicits._
      val h = md5(concat(lit("shuf_"), $"doc_id".cast("string")))
      Tables.load(s, dir, "documents")
        .select($"doc_id", h.as("h"),
          (conv(substring(h, 1, 2), 16, 10).cast("int") % 64).as("shard"))
        .withColumn("pos", row_number().over(
          Window.partitionBy($"shard").orderBy($"h", $"doc_id"))
          .cast("long"))
        .select($"doc_id", $"shard", $"pos")
    }),

    // Stratified deterministic sampling: per-language keep rates applied
    // by content-hash bucket — the corpus-rebalancing operator
    // (downsample dominant languages) every training pipeline runs.
    // Hash-based, so the sample is stable across re-runs, appends, and
    // repartitioning at 100 TB; no shuffle, the filter rides the scan.
    "q_sample_stratified" -> ((s, dir) => {
      import s.implicits._
      val bucket = conv(substring(md5($"text"), 1, 2), 16, 10).cast("int")
      // keep 50% of en, 25% of de, ~10% of everything else (of 256)
      val keepBelow = when($"lang" === "en", 128)
        .when($"lang" === "de", 64).otherwise(26)
      Tables.load(s, dir, "documents")
        .filter(bucket < keepBelow)
        .select($"doc_id", $"lang", bucket.as("bucket"))
    }),

    // Deterministic uniform k-sample — the reproducible stand-in for
    // reservoir sampling: rank every row by a salted content-free hash
    // and keep the k smallest. Equivalent to a uniform sample without
    // replacement (the hash order is exchangeable), but unlike a true
    // reservoir it is stable across re-runs, partitioning, and appends
    // (prefix property: the sample only changes where the data does).
    // Spark executes orderBy+limit as TakeOrderedAndProject — a
    // per-partition top-k heap merged on the driver (k·partitions rows),
    // never a global sort shuffle; at 100 TB the corpus is scanned once
    // and only 32·k candidate rows ever leave the executors.
    "q_sample_reservoir" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "documents")
        .select($"doc_id",
          md5(concat(lit("smp_"), $"doc_id".cast("string"))).as("h"))
        .orderBy($"h", $"doc_id")
        .limit(100)
    }),

    // Token-budget corpus mixing — the "data mixture" step of a training
    // run: each language contributes documents, in a deterministic
    // salted-hash shuffle order, until its token budget is exhausted
    // (running token sum per language ≤ budget). The mechanism behind
    // per-source sampling ratios: budgets, not row counts, because
    // training cost is tokens. One shuffle on the language key; window
    // state is a running sum per group; every value integer-exact.
    "q_mix_budget" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"lang").orderBy($"h", $"doc_id")
      Tables.load(s, dir, "documents")
        .select($"doc_id", $"lang",
          size(split($"text", " ")).as("n_tok"),
          md5(concat(lit("mix_"), $"doc_id".cast("string"))).as("h"))
        .withColumn("cum_tok", sum($"n_tok").over(w))
        .filter($"cum_tok" <= 3000)
        .select($"doc_id", $"lang", $"n_tok", $"cum_tok")
    }),

    // Equal-width histogram of order totals (floor bucketing).
    "q_histogram" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "orders")
        .select(least(floor($"o_totalprice" / 50000.0), lit(9L)).as("bucket"))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n"))
    }),

    // Z-order (Morton) clustering key over two dimensions: the layout
    // primitive behind multi-column data skipping (ZOrder.clusterBy2
    // range-partitions files on this key at write time). The query
    // checks the exact interleave arithmetic — per Z-bucket, both
    // dimensions stay in a tight min/max envelope, which is precisely
    // what lets parquet row-group stats prune on EITHER predicate.
    "q_zorder_layout" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.ZOrder
      val a = $"p_size".cast("long")
      val b = floor($"p_retailprice").cast("long") - 900L
      Tables.load(s, dir, "part")
        .select(a.as("a"), b.as("b"),
          ZOrder.zValue2(a, b).as("zval"))
        .groupBy(shiftright($"zval", 8).as("zbucket"))
        .agg(count(lit(1)).as("n"),
          min($"a").as("min_size"), max($"a").as("max_size"),
          min($"b").as("min_pb"), max($"b").as("max_pb"))
    }))

  def oracleSql: Map[String, String] = Map(
    "q_posexplode" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') AS w
        |  FROM documents WHERE doc_id < 20),
        |u AS (SELECT doc_id,
        |    unnest([{'pos': i - 1, 'word': w[i]}
        |            for i in generate_series(1, len(w))]) AS e
        |  FROM t)
        |SELECT doc_id, e.pos AS pos, e.word AS word FROM u
        |WHERE e.word LIKE 's%'""".stripMargin,

    "q_median" ->
      """SELECT c_mktsegment, c_acctbal AS median_bal FROM (
        |  SELECT c_mktsegment, c_acctbal,
        |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment
        |      ORDER BY c_acctbal, c_custkey) AS rn,
        |    COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
        |  FROM customer) t
        |WHERE rn = (n + 1) // 2""".stripMargin,

    "q_train_split" ->
      """WITH b AS (SELECT doc_id,
        |    CAST((strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1) * 16
        |      + strpos('0123456789abcdef', substr(md5(text), 2, 1)) - 1
        |      AS INT) AS bucket
        |  FROM documents)
        |SELECT doc_id, bucket,
        |  CASE WHEN bucket < 205 THEN 'train'
        |       WHEN bucket < 230 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM b""".stripMargin,

    "q_shuffle_shards" ->
      """WITH b AS (SELECT doc_id,
        |    md5('shuf_' || CAST(doc_id AS VARCHAR)) AS h FROM documents),
        |s AS (SELECT doc_id, h,
        |    CAST(((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16
        |      + strpos('0123456789abcdef', substr(h, 2, 1)) - 1) % 64
        |      AS INT) AS shard
        |  FROM b)
        |SELECT doc_id, shard,
        |  ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h, doc_id) AS pos
        |FROM s""".stripMargin,

    "q_sample_stratified" ->
      """WITH b AS (SELECT doc_id, lang,
        |    CAST((strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1) * 16
        |      + strpos('0123456789abcdef', substr(md5(text), 2, 1)) - 1
        |      AS INT) AS bucket
        |  FROM documents)
        |SELECT doc_id, lang, bucket FROM b
        |WHERE bucket < CASE WHEN lang = 'en' THEN 128
        |                    WHEN lang = 'de' THEN 64
        |                    ELSE 26 END""".stripMargin,

    "q_sample_reservoir" ->
      """SELECT doc_id, md5('smp_' || CAST(doc_id AS VARCHAR)) AS h
        |FROM documents
        |ORDER BY h, doc_id
        |LIMIT 100""".stripMargin,

    "q_mix_budget" ->
      """WITH t AS (SELECT doc_id, lang,
        |    len(string_split(text, ' ')) AS n_tok,
        |    md5('mix_' || CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents),
        |c AS (SELECT doc_id, lang, n_tok,
        |    CAST(SUM(n_tok) OVER (PARTITION BY lang
        |      ORDER BY h, doc_id) AS BIGINT) AS cum_tok
        |  FROM t)
        |SELECT doc_id, lang, n_tok, cum_tok FROM c
        |WHERE cum_tok <= 3000""".stripMargin,

    "q_histogram" ->
      """SELECT LEAST(CAST(floor(o_totalprice / 50000.0) AS BIGINT), 9)
        |  AS bucket, COUNT(*) AS n
        |FROM orders GROUP BY 1""".stripMargin,

    // The same mask-shift Morton cascade as ZOrder.spread16, spelled in
    // portable bitwise SQL.
    "q_zorder_layout" ->
      """WITH base AS (
        |  SELECT CAST(p_size AS BIGINT) AS a,
        |    CAST(floor(p_retailprice) AS BIGINT) - 900 AS b
        |  FROM part),
        |-- the initial & 65535 mirrors ZOrder.spread16's low-16-bit mask,
        |-- so both engines agree for ALL inputs, not just [0, 2^16)
        |m AS (SELECT *, a & 65535 AS am, b & 65535 AS bm FROM base),
        |s1 AS (SELECT *, (am | (am << 8)) & 16711935 AS a1,
        |               (bm | (bm << 8)) & 16711935 AS b1 FROM m),
        |s2 AS (SELECT *, (a1 | (a1 << 4)) & 252645135 AS a2,
        |               (b1 | (b1 << 4)) & 252645135 AS b2 FROM s1),
        |s3 AS (SELECT *, (a2 | (a2 << 2)) & 858993459 AS a3,
        |               (b2 | (b2 << 2)) & 858993459 AS b3 FROM s2),
        |s4 AS (SELECT *, (a3 | (a3 << 1)) & 1431655765 AS a4,
        |               (b3 | (b3 << 1)) & 1431655765 AS b4 FROM s3),
        |z AS (SELECT a, b, (a4 | (b4 << 1)) AS zval FROM s4)
        |SELECT zval >> 8 AS zbucket, COUNT(*) AS n,
        |  MIN(a) AS min_size, MAX(a) AS max_size,
        |  MIN(b) AS min_pb, MAX(b) AS max_pb
        |FROM z GROUP BY zval >> 8""".stripMargin)
}
