package graft.queries

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: token counting,
  * quality scoring, language-ID heuristic, document fingerprinting, and
  * corpus n-gram statistics. Everything is a per-row expression or a
  * single aggregation — embarrassingly parallel at 100 TB, no shuffle
  * except the final group-bys, all inside whole-stage codegen: the
  * per-row loops that would need interpreted higher-order lambdas
  * (`transform`/`aggregate`/`filter`) run as fused native expressions
  * instead (graft.functions.{WordNgrams, CountInSet, TextFingerprint}),
  * and mean token length folds to pure length arithmetic.
  *
  * The language-ID heuristic is marker-word scoring (the standard cheap
  * pre-filter before a real classifier); the synthetic corpus shares one
  * vocabulary so it exercises the operator shape, not real discrimination.
  */
object TextAnalysis extends QueryPack {
  import graft.functions.GraftFunctions.{countIn, textFingerprint, wordNgrams}
  import graft.Num.{dsum6, oSum6}

  private val Stopwords = Seq("the", "a", "of", "and", "in", "to", "is")
  private val BpeIsh = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  // BPE trainer constants: symbols are sentinel-delimited (chr(1) twice —
  // double so adjacent merge patterns never share a separator char and
  // replace() stays exactly left-to-right non-overlapping greedy), merged
  // symbols glue with chr(2) (atomic in later rounds, collision-free:
  // the corpus is space-split words with neither control char)
  private[graft] val BpeSep = "\u0001\u0001"
  private[graft] val BpeGlue = "\u0002"
  private[graft] val BpeRounds = 4

  /** Merge-table cap for the codegen replace-chain encoder. Measured
    * r18 (tokenize stress cell, sf0.1→sf10): the chain stays
    * whole-stage-codegen'd and plan-building stays flat through 64
    * literal replaces, but per-row cost is O(merges × chars) — every
    * merge re-scans the document — so past ~64 the rank-table
    * mapPartitions encoder ([[bpeEncodeLarge]], per-row cost
    * independent of vocabulary size) wins and the TOKENIZE surface
    * routes there. Production tokenizers (32k-100k merges) always
    * take the large path.
    */
  private[graft] val BpeReplaceChainMax = 64

  private def words(c: Column): Column = split(c, " ")

  // language-ID marker words, one bag per language (shared by
  // q_text_langid's confusion matrix and the LANG_ID gate TVF)
  private val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "in"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "los", "las", "y", "es"))

  /** Per-row quality features over an arbitrary (id, text) frame — the
    * kernel behind q_text_quality and the gate's `TEXT_QUALITY` TVF.
    * Output: (idCol, mean_tok_len, stop_ratio, digit_ratio,
    * quality_score). Pure codegen'd per-row arithmetic, zero shuffles.
    */
  def qualityOn(df: DataFrame, idCol: String, textCol: String,
      keep: Seq[String] = Nil): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val t = col(textCol)
    val w = words(t)
    val nTok = size(w)
    // split on a single space partitions the string exactly, so the
    // summed token length is length(text) minus the nTok-1 separators —
    // pure codegen arithmetic, no interpreted aggregate(transform(...))
    // fold, and integer-identical to the oracle's list_sum
    val meanLen = (length(t) - (nTok - lit(1))).cast("double") / nTok
    val stopRatio = countIn(w, Stopwords).cast("double") / nTok
    // nullif: empty documents would divide by zero (ANSI throw)
    val digitRatio = (length(t) -
      length(regexp_replace(t, "[0-9]", ""))).cast("double") /
      nullif(length(t), lit(0))
    // `keep` carries passenger columns (e.g. the quota op's source)
    // through the per-row projection so callers never need a join-back
    df.select((col(idCol) +: keep.map(col)) ++ Seq(
      meanLen.as("mean_tok_len"),
      stopRatio.as("stop_ratio"), digitRatio.as("digit_ratio"),
      (stopRatio * 0.5 + meanLen * 0.1).as("quality_score")): _*)
  }

  /** Marker-word argmax language prediction with deterministic
    * tie-break, as a column over a whitespace-token array — the kernel
    * behind q_text_langid and the gate's `LANG_ID` TVF.
    */
  private def predictedLang(w: Column): Column = {
    val hit = LangMarkers.map { case (l, ms) => l -> countIn(w, ms) }.toMap
    val (en, de, fr, es) = (hit("en"), hit("de"), hit("fr"), hit("es"))
    when(de > en, "de")
      .when(fr > en && fr > de, "fr")
      .when(es > en && es > de && es > fr, "es")
      .otherwise("en")
  }

  /** Per-row language prediction over an arbitrary (id, text) frame.
    * Output: (idCol, predicted).
    */
  def langidOn(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.select(col(idCol), predictedLang(words(col(textCol))).as("predicted"))
  }

  /** The BPE training loop behind q_text_bpe_merges — reusable so the
    * spec can replay it on synthetic corpora against a plain-Scala
    * reference implementation. Output: (round, a, b, freq).
    */
  private[graft] def bpeMerges(df: DataFrame, textCol: String,
      rounds: Int): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    // Per-round state rides localCheckpoint (the same lineage
    // truncation PageRank and connectedComponents use), NOT
    // cache()+unpersist: unpersisting round r-1's cache entry CASCADES
    // into every cached plan containing it as a subtree — i.e. round
    // r's freshly-built cache — so each round silently recomputed the
    // whole replace chain from the base corpus, O(K²) corpus scans
    // total. Invisible at the 4-round default; measured at 64 rounds:
    // 797 s at 50k docs vs ~50 s once truncated (the r18 TOKENIZE
    // decade stress cell caught it). Old rounds' checkpoint blocks are
    // dropped by the ContextCleaner once unreferenced; MEMORY_AND_DISK
    // eviction bounds the interim footprint.
    // spread a sub-split corpus first: every round's pair-ngram explode
    // and merge rewrite is a narrow map over THIS relation's partitions,
    // so a one-split scan would run all K rounds single-core (§2.5).
    // Size-aware (1 MiB/slice): each round multiplies the per-partition
    // fixed cost by K, so tiny corpora stay at their natural split
    var cur = graft.Par.spreadSliced(df.select(col(textCol).as("__t")),
      1L << 20)
      .select(concat(lit(BpeSep),
        array_join(split(col("__t"), " "), BpeSep), lit(BpeSep)).as("s"))
      .localCheckpoint(true)
    val merges =
      scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val toks = filter(split($"s", BpeSep), x => x =!= "")
      // headOption, not head: a corpus of single-word docs (or more
      // requested rounds than realizable merges) has NO adjacent pair
      // left — stop cleanly with the merges learned so far. The oracle
      // mirrors this for free: its round-r argmax CTE is empty, so the
      // UNION ALL arm for round r (and, via the NULL-poisoned rewrite,
      // every later round) contributes zero rows.
      val topOpt = cur
        .select(explode(wordNgrams(toks, 2)).as("p"))
        .groupBy($"p").agg(count(lit(1)).as("c"))
        .orderBy($"c".desc, $"p").limit(1).collect().headOption
      topOpt match {
        case None => exhausted = true
        case Some(top) =>
          val Array(a, b) = top.getString(0).split(" ", 2)
          merges += ((r, a, b, top.getLong(1)))
          // The merge rewrite is anchored on BOTH sides with one
          // sentinel char (the reason BpeSep is a DOUBLED sentinel):
          // the pattern ·a··b· can only match
          // a and b as WHOLE symbols, never a symbol whose suffix is a
          // (e.g. 'xa' when merging ('a','b')) or whose prefix extends
          // b — an unanchored replace corrupted exactly those corpora.
          // The consumed boundary chars are restored in the
          // replacement, so symbol delimiters stay doubled.
          val anchor = BpeSep.substring(0, 1)
          cur = cur.select(
            replace($"s", lit(anchor + a + BpeSep + b + anchor),
              lit(anchor + a + BpeGlue + b + anchor)).as("s"))
            .localCheckpoint(true) // eager: materialize + truncate lineage
          r += 1
      }
    }
    merges.toSeq.toDF("round", "a", "b", "freq")
  }

  /** Learned merge table in round order, driver-collected — the merge
    * list is control-plane sized (K rows) by construction.
    */
  private[graft] def bpeMergeList(df: DataFrame, textCol: String,
      rounds: Int): Seq[(String, String)] =
    bpeMerges(df, textCol, rounds).orderBy(col("round")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq

  /** BPE ENCODE with a learned merge table: apply the merges in round
    * order (Sennrich 2016's encode — merge priority IS training
    * order), each as the same boundary-anchored greedy replace the
    * trainer uses, so encode(fit(corpus)) over the training corpus
    * reproduces the trainer's final per-document state bit-for-bit
    * (which is how the DuckDB oracle replays it: the trainer CTE
    * chain's last stage IS the encoding). Output: (idCol, n_tokens,
    * encoded) — token count plus a rendered form ('|' between tokens,
    * merged-pair glue shown as a space).
    *
    * Scale (100 TB): the merge table is control-plane sized, so the
    * encoder is a K-deep chain of codegen'd string replaces — one
    * narrow map over the corpus, no shuffle, no UDF. Token-budget
    * operators downstream (q_mix_budget_bpe) can therefore budget in
    * REAL tokenizer units for the cost of one extra projection.
    */
  def bpeEncode(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    require(merges.size <= BpeReplaceChainMax,
      s"BPE replace-chain encoder: ${merges.size} merges exceeds the " +
        s"$BpeReplaceChainMax cap. The chain is one literal replace() " +
        "per merge, so the plan's expression depth grows linearly with " +
        "the vocabulary (measured r18: analyze+codegen overhead is flat " +
        "to 64 but every merge re-scans the full string, so chain cost " +
        "per row is O(merges x chars)); large vocabularies must go " +
        "through bpeEncodeLarge / the TOKENIZE surface, which routes " +
        "to the rank-table mapPartitions encoder (O(chars log chars) " +
        "per row, independent of vocabulary size).")
    bpeEncodeChain(df, idCol, textCol, merges)
  }

  /** The raw replace chain — no cap, private so the stress harness can
    * measure chain-depth behavior past [[BpeReplaceChainMax]].
    */
  private[graft] def bpeEncodeChain(df: DataFrame, idCol: String,
      textCol: String, merges: Seq[(String, String)]): DataFrame = {
    val anchor = BpeSep.substring(0, 1)
    val s0 = concat(lit(BpeSep),
      array_join(split(col(textCol), " "), BpeSep), lit(BpeSep))
    val sK = merges.foldLeft(s0) { case (c, (a, b)) =>
      replace(c, lit(anchor + a + BpeSep + b + anchor),
        lit(anchor + a + BpeGlue + b + anchor))
    }
    val toks = filter(split(sK, BpeSep), x => x =!= "")
    // spread before the K-replace chain — O(merges × chars) per row of
    // pure CPU on whatever partitions the input arrives with (§2.5);
    // identity for streams (tokenize-at-ingest) and production scans
    graft.Par.spread(df.select(col(idCol), col(textCol)))
      .select(col(idCol), size(toks).cast("long").as("n_tokens"),
        replace(replace(sK, lit(BpeSep), lit("|")), lit(BpeGlue), lit(" "))
          .as("encoded"))
  }

  /** Large-vocabulary BPE ENCODE: the production form for real
    * tokenizer merge tables (32k-100k merges), where the replace
    * chain's O(merges × chars) per-row cost and linear plan growth
    * are both non-starters. One narrow `mapPartitions` with a
    * broadcast rank table; per document, the classic merge-priority
    * loop (Sennrich 2016 §3 / the GPT-2 encoder shape): symbols in a
    * doubly-linked list, a min-heap of (rank, position) candidates
    * with lazy invalidation, repeatedly merge the lowest-rank
    * leftmost adjacent pair — O(chars log chars) per document,
    * INDEPENDENT of vocabulary size.
    *
    * Bit-equal to the replace chain: exhaustive in-order passes (what
    * the chain does) and repeated lowest-rank-leftmost merging (what
    * this does) produce the same segmentation, PROVIDED an adjacency
    * born from the pass-k rewrite is only mergeable by ranks > k —
    * see the minRank bound in [[encodeOneDoc]] for the one corner
    * (merged-string collision with an earlier symbol) where the naive
    * heap loop would diverge. NOT greedy longest-match against the
    * final vocab, which diverges from merge order on corpora where a
    * long vocab entry overlaps a higher-priority short one.
    * TokenizeLargeVocabSpec pins the equality on random corpora.
    *
    * Scale (100 TB): stateless narrow projection — no shuffle, the
    * rank table broadcast once per job (a 100k-merge table is ~MBs),
    * streams unchanged at ingest like the chain form.
    */
  def bpeEncodeLarge(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val s = df.sparkSession
    val rank = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      // composite key with a char no symbol can contain (symbols are
      // space-split words glued with BpeGlue)
      rank.putIfAbsent(a + " " + b, Int.box(i))
    }
    val bc = s.sparkContext.broadcast(rank)
    val idField = df.schema(idCol)
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      idField.copy(name = idCol),
      org.apache.spark.sql.types.StructField("n_tokens",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("encoded",
        org.apache.spark.sql.types.StringType, nullable = false)))
    graft.Par.spread(df.select(col(idCol), col(textCol).as("__text")))
      .mapPartitions { it =>
        val rk = bc.value
        it.map { row =>
          val (n, enc) = encodeOneDoc(row.getString(1), rk)
          org.apache.spark.sql.Row(row.get(0), n, enc)
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Merge-priority encode of one document (see [[bpeEncodeLarge]]).
    * Returns (n_tokens, rendered encoding — the chain's exact render:
    * '|' delimiters including the leading/trailing boundary marks,
    * glue shown as ' ').
    */
  private[graft] def encodeOneDoc(text: String,
      rank: java.util.HashMap[String, Integer]): (Long, String) = {
    val syms0 = text.split(" ").filter(_.nonEmpty)
    val n0 = syms0.length
    if (n0 == 0) return (0L, "||")
    val sym = new Array[String](n0)
    System.arraycopy(syms0, 0, sym, 0, n0)
    val next = Array.tabulate(n0)(i => if (i == n0 - 1) -1 else i + 1)
    val prev = Array.tabulate(n0)(i => i - 1)
    val alive = Array.fill(n0)(true)
    // heap of (rank, leftPos) candidates, lazily invalidated: on pop,
    // re-check the pair is still adjacent with that exact rank.
    // minRank pins chain fidelity: the chain applies merge j in pass j
    // and NEVER revisits, so an adjacency created by the pass-k rewrite
    // is only ever merged by passes > k. Without the bound, a merged
    // symbol whose STRING collides with an earlier-round symbol (legal:
    // glue-joined strings don't record their derivation — (a,bc) and
    // (ab,c) both render a⟂b⟂c) could resurrect an earlier rank and
    // diverge from the trainer/oracle.
    val heap = new java.util.PriorityQueue[Long](math.max(n0, 1))
    def push(i: Int, minRank: Int): Unit = {
      val j = next(i)
      if (j >= 0) {
        val r = rank.get(sym(i) + " " + sym(j))
        if (r != null && r.intValue > minRank)
          heap.add((r.toLong << 32) | i.toLong)
      }
    }
    var i = 0
    while (i < n0 - 1) { push(i, -1); i += 1 }
    var nSyms = n0
    while (!heap.isEmpty) {
      val top = heap.poll()
      val r = (top >>> 32).toInt
      val li = (top & 0xffffffffL).toInt
      val rj = if (alive(li)) next(li) else -1
      if (rj >= 0) {
        val cur = rank.get(sym(li) + " " + sym(rj))
        if (cur != null && cur.intValue == r) {
          // merge rj into li; li's symbol becomes a⟂b (BpeGlue)
          sym(li) = sym(li) + BpeGlue + sym(rj)
          alive(rj) = false
          val rn = next(rj)
          next(li) = rn
          if (rn >= 0) prev(rn) = li
          nSyms -= 1
          // new adjacencies on both sides of the merged symbol — born
          // during "pass r", so mergeable only by ranks > r
          if (prev(li) >= 0) push(prev(li), r)
          push(li, r)
        }
      }
    }
    val sb = new java.lang.StringBuilder(text.length + 2)
    sb.append('|')
    var k = 0
    var first = true
    while (k < n0) {
      if (alive(k)) {
        if (!first) sb.append('|')
        first = false
        sb.append(sym(k).replace(BpeGlue, " "))
      }
      k += 1
    }
    sb.append('|')
    (nSyms.toLong, sb.toString)
  }

  /** Fit-then-encode over one relation — the TOKENIZE TVF kernel.
    * Routes by vocabulary size: the codegen replace chain up to
    * [[BpeReplaceChainMax]] merges (zero serialization, widest
    * whole-stage span), the rank-table mapPartitions encoder beyond
    * (per-row cost independent of vocabulary size). The two are
    * bit-equal (TokenizeLargeVocabSpec), so the routing is invisible.
    */
  def bpeFitEncode(df: DataFrame, idCol: String, textCol: String,
      rounds: Int): DataFrame = {
    // Freeze the fit per corpus version (StaticIndexCache), exactly like
    // the cross/streaming routes ([[bpeEncodeWith]]) already do — the
    // merge table is a pure function of the corpus, and "train once per
    // corpus version, encode forever" is the production cadence. The
    // cache key is the same as bpeEncodeWith's, so TOKENIZE over one
    // relation and the fit/transform split share a single fit. The K
    // driver-coordinated training scans still run (once) inside the
    // timed session — nothing is persisted across processes.
    val merges = StaticIndexCache.getOrBuild[Seq[(String, String)]](
      StaticIndexCache.corpusKey(df.sparkSession, df, "bpe_merges",
        textCol, rounds)) {
      bpeMergeList(df, textCol, rounds)
    }
    bpeEncodeAuto(df, idCol, textCol, merges)
  }

  /** Size-routed encode — see [[bpeFitEncode]]. */
  def bpeEncodeAuto(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame =
    if (merges.size <= BpeReplaceChainMax)
      bpeEncodeChain(df, idCol, textCol, merges)
    else bpeEncodeLarge(df, idCol, textCol, merges)

  /** Cross-corpus encode — the production tokenizer shape: the merge
    * table is trained ONCE on a bounded reference corpus (frozen per
    * corpus version via StaticIndexCache, so repeated gate invocations
    * and every micro-batch reuse one fit) and applied to a DIFFERENT
    * relation, which may STREAM: the encode chain is K literal
    * replaces, a stateless narrow projection that runs unchanged at
    * ingest — tokenize-at-ingest with zero keyed state.
    */
  def bpeEncodeWith(incoming: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String, rounds: Int): DataFrame = {
    require(!corpus.isStreaming,
      "TOKENIZE: the corpus (fit) side must be a BOUNDED relation — " +
        "the merge table is trained once and frozen; declare it with " +
        "'source.bounded' = 'true' or a batch connector")
    val s = corpus.sparkSession
    val merges = StaticIndexCache.getOrBuild[Seq[(String, String)]](
      StaticIndexCache.corpusKey(s, corpus, "bpe_merges", textCol,
        rounds)) {
      bpeMergeList(corpus, textCol, rounds)
    }
    bpeEncodeAuto(incoming, idCol, textCol, merges)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Token counting: whitespace tokens, BPE-ish regex tokens, chars.
    "q_text_tokens" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "documents")
        .select($"doc_id",
          size(words($"text")).as("n_ws_tokens"),
          regexp_count($"text", lit(BpeIsh)).as("n_re_tokens"),
          length($"text").as("n_chars_real"),
          $"n_chars")
    }),

    // BPE-style pair-merge TRAINER over word symbols (Sennrich et al.
    // 2016's induction loop, at phrase granularity): K rounds of
    // (count adjacent symbol pairs corpus-wide) → (argmax with
    // deterministic count-desc/pair-asc tie-break) → (merge every
    // non-overlapping left-to-right occurrence corpus-wide). The merge
    // rewrite is a plain string replace over a DOUBLE-sentinel-delimited
    // symbol string, anchored one sentinel char each side so only WHOLE
    // symbols match — replace()'s left-to-right non-overlapping
    // semantics are exactly BPE's greedy merge, and are identical in
    // Spark (UTF8String.replace) and DuckDB, so the oracle replays the
    // whole training loop bit-for-bit. Output: the learned merge table.
    //
    // Scale (100 TB): each round is one scan + one map-side-combined
    // pair count (shuffle = distinct pairs, vocabulary-sized) + one
    // per-row rewrite; the argmax is a driver-side single row
    // (control-plane sized). K rounds = K scans over a CACHED,
    // progressively-rewritten corpus — the standard distributed BPE
    // shape; lineage stays flat because each round materializes.
    "q_text_bpe_merges" -> ((s, dir) =>
      bpeMerges(Tables.load(s, dir, "documents"), "text", BpeRounds)),

    // BPE ENCODE with the merges trained on the same corpus — the
    // other half of the tokenizer: per-document token counts in real
    // tokenizer units. Fit is K driver-coordinated scans; encode is
    // one narrow codegen'd projection (K chained replaces).
    "q_text_bpe_encode" -> ((s, dir) =>
      bpeFitEncode(Tables.load(s, dir, "documents"), "doc_id", "text",
        BpeRounds)),

    // Cross-corpus encode: a 1-in-4 incoming slice tokenized with the
    // merge table trained on the FULL corpus — fit/transform split,
    // the production cadence (train once, encode forever).
    "q_text_bpe_encode_cross" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      bpeEncodeWith(docs.filter($"doc_id" % 4 === 0), docs,
        "doc_id", "text", BpeRounds)
    }),

    // Token-budget corpus mixing re-based on BPE counts (q_mix_budget
    // budgets in whitespace tokens; training cost is TOKENIZER tokens,
    // so the production form budgets in those). Same salted-hash
    // order, same running-sum window, n_tok from encode(fit(corpus)).
    "q_mix_budget_bpe" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      val tok = bpeFitEncode(docs, "doc_id", "text", BpeRounds)
        .select($"doc_id", $"n_tokens".as("n_tok"))
      val w = Window.partitionBy($"lang").orderBy($"h", $"doc_id")
      docs.select($"doc_id", $"lang",
          md5(concat(lit("mix_"), $"doc_id".cast("string"))).as("h"))
        .join(tok, "doc_id")
        .withColumn("cum_tok", sum($"n_tok").over(w))
        .filter($"cum_tok" <= 3000)
        .select($"doc_id", $"lang", $"n_tok", $"cum_tok")
    }),

    // Quality scoring: mean token length, stopword ratio, digit/punct
    // ratios, and a composite score — the usual junk-filter features.
    "q_text_quality" -> ((s, dir) =>
      qualityOn(Tables.load(s, dir, "documents"), "doc_id", "text")),

    // Sequential quality-filter funnel (the Gopher-rules shape): every
    // document is attributed to its FIRST failing rule, so the per-stage
    // drop counts reconcile exactly to the corpus total — the report a
    // pipeline owner reads before/after retuning thresholds. One pass,
    // all features the same codegen arithmetic as q_text_quality.
    "q_filter_funnel" -> ((s, dir) => {
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      val w = words($"text")
      val nTok = size(w)
      val meanLen = (length($"text") - (nTok - lit(1))).cast("double") / nTok
      val stopRatio = countIn(w, Stopwords).cast("double") / nTok
      val stage = when(nTok < 20, "r1_too_short")
        .when(meanLen < 4.2, "r2_short_tokens")
        .when(stopRatio < 0.02, "r3_no_stopwords")
        .otherwise("kept")
      Tables.load(s, dir, "documents")
        .select(stage.as("stage"))
        .groupBy($"stage")
        .agg(count(lit(1)).as("n"))
    }),

    // Language-ID heuristic: marker-word hit counts per language,
    // argmax with deterministic tie-break, confusion counts vs the
    // metadata label. The per-row prediction is langidOn's kernel.
    "q_text_langid" -> ((s, dir) => {
      import s.implicits._
      langidOn(Tables.load(s, dir, "documents"), "lang", "text")
        .groupBy($"lang", $"predicted")
        .agg(count(lit(1)).as("n_docs"))
    }),

    // Document fingerprint: order-sensitive polynomial rolling hash over
    // md5-derived word codes, mod 1e9+7 (no overflow in either engine),
    // fused into one codegen'd fold per row.
    "q_text_fingerprint" -> ((s, dir) => {
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      Tables.load(s, dir, "documents")
        .select($"doc_id", textFingerprint(words($"text")).as("fingerprint"))
    }),

    // Per-language document-length distribution: min/max/median token
    // counts + doc counts — the corpus-composition report that drives
    // sampling-rate choices. Median via exact order statistics (row_number
    // against count), not interpolating percentiles: bit-stable across
    // engines. One shuffle on the language key.
    "q_text_length_stats" -> ((s, dir) => {
      import s.implicits._
      val counts = Tables.load(s, dir, "documents")
        .select($"lang", size(words($"text")).as("n_tok"))
      // deterministic median: order by token count, take the upper-middle
      // row per language ((n+1) DIV 2 — integer division, as the oracle;
      // rank ties are value-identical so tie order can't change the pick)
      val ranked = counts
        .withColumn("rn", row_number().over(
          Window.partitionBy($"lang").orderBy($"n_tok")))
        .withColumn("n", count(lit(1)).over(Window.partitionBy($"lang")))
      val medians = ranked.filter($"rn" === expr("(n + 1) DIV 2"))
        .select($"lang", $"n_tok".as("median_tok"))
      counts.groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"), min($"n_tok").as("min_tok"),
          max($"n_tok").as("max_tok"))
        .join(medians, "lang")
        .select($"lang", $"n_docs", $"min_tok", $"median_tok", $"max_tok")
    }),

    // Corpus term statistics: per-term total frequency (tf) and document
    // frequency (df) — the exact-integer precursor of TF-IDF (the log
    // weighting is left to consumers: libm log is not bit-stable across
    // engines, counts are). Top-30 by (df desc, term).
    "q_text_tfdf" -> ((s, dir) => {
      import s.implicits._
      val tok = Tables.load(s, dir, "documents")
        .select($"doc_id", explode(words($"text")).as("term"))
      tok.groupBy($"term")
        .agg(count(lit(1)).as("tf"),
          countDistinct($"doc_id").as("df"))
        .orderBy($"df".desc, $"term")
        .limit(30)
    }),

    // Text normalization — the standard pre-dedup cleanup pass:
    // lowercase, strip non-alphanumerics, collapse runs of whitespace,
    // trim; emits the cleaned text + its token count. Pure per-row
    // codegen'd string ops, embarrassingly parallel.
    "q_text_normalize" -> ((s, dir) => {
      import s.implicits._
      val cleaned = trim(regexp_replace(
        regexp_replace(lower($"text"), "[^a-z0-9 ]", ""), " +", " "))
      Tables.load(s, dir, "documents")
        .select($"doc_id", cleaned.as("norm_text"),
          // size(split) counts 1 for empty text; when-guard matches the
          // oracle's len(list_filter(...)) over non-empty tokens
          when(cleaned === "", 0)
            .otherwise(size(split(cleaned, " "))).as("n_norm_tokens"))
    }),

    // Repetition detection — the duplicate-n-gram quality filter used by
    // large-scale corpus cleaning (a high duplicate-bigram fraction marks
    // boilerplate/spam): per doc, 1 - distinct_bigrams/total_bigrams.
    // Per-row fused word_ngrams + integer counts; no shuffle.
    "q_text_repetition" -> ((s, dir) => {
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      val w = words($"text")
      val grams = wordNgrams(w, 2)
      Tables.load(s, dir, "documents")
        .filter(size(w) >= 2)
        .select($"doc_id", size(grams).as("n_bigrams"),
          size(array_distinct(grams)).as("n_distinct"),
          (lit(1.0) - size(array_distinct(grams)).cast("double") /
            size(grams)).as("dup_ratio"))
    }),

    // Lexical-diversity quality signals — type-token ratio, hapax ratio,
    // and top-word dominance, the log-free cousins of entropy scoring
    // (every ratio is an integer/integer division, so the doubles are
    // bit-identical across engines; libm log is not). Two keyed
    // aggregations — (doc, term) then (doc) — both with map-side
    // combine; nothing else touches the corpus.
    "q_text_diversity" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "documents")
        .select($"doc_id", explode(words($"text")).as("term"))
        .groupBy($"doc_id", $"term")
        .agg(count(lit(1)).as("c"))
        .groupBy($"doc_id")
        .agg(sum($"c").as("n_tokens"),
          count(lit(1)).as("n_types"),
          sum(when($"c" === 1, 1L).otherwise(0L)).as("n_hapax"),
          max($"c").as("top_count"))
        .select($"doc_id", $"n_tokens", $"n_types",
          ($"n_types".cast("double") / $"n_tokens").as("ttr"),
          ($"n_hapax".cast("double") / $"n_types").as("hapax_ratio"),
          ($"top_count".cast("double") / $"n_tokens").as("top_share"))
    }),

    // Bigram language-model corpus-fit scoring — the CCNet/KenLM-style
    // quality filter: train conditional bigram probabilities on the
    // corpus itself (p(w2|w1) = bigram count / prefix count), then score
    // each document by its mean per-position probability. High scorers
    // read like the corpus; outliers (spam, wrong-language, word salad)
    // sink. Log-free on purpose: every probability is an int/int double
    // division (bit-identical across engines, libm log is not) and the
    // mean rides the exact-decimal sum. The plan at 100 TB: one
    // corpus-scale groupBy(gram) with map-side combine builds the model,
    // the prefix totals aggregate the (already-reduced) distinct-gram
    // table, and scoring is ONE keyed shuffle join of doc-gram positions
    // against the model — no broadcast of an unbounded vocabulary, no
    // driver-side model.
    "q_text_lm_score" -> ((s, dir) => {
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      val w = words($"text")
      val docGrams = Tables.load(s, dir, "documents")
        .filter(size(w) >= 2)
        .select($"doc_id", explode(wordNgrams(w, 2)).as("gram"))
      val b = docGrams.groupBy($"gram").agg(count(lit(1)).as("bg"))
        .withColumn("w1", split($"gram", " ").getItem(0))
      val pfx = b.groupBy($"w1").agg(sum($"bg").as("pn"))
      val model = b.join(pfx, "w1")
        .select($"gram", ($"bg".cast("double") / $"pn").as("p"))
      docGrams.join(model, "gram")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          (dsum6($"p") / count(lit(1))).as("lm_score"),
          min($"p").as("min_p"))
    }),

    // Corpus-level bigram frequency top-20 (deterministic tie-break).
    "q_text_ngram_freq" -> ((s, dir) => {
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      val w = words($"text")
      Tables.load(s, dir, "documents")
        .filter(size(w) >= 2)
        .select(explode(wordNgrams(w, 2)).as("bigram"))
        .groupBy($"bigram")
        .agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"bigram")
        .limit(20)
    }))

  // --- DuckDB mirrors shared with the gate TVF oracles --------------------

  private def oStop: String = Stopwords.map(s => s"'$s'").mkString("[", ", ", "]")
  private def oHits(markers: Seq[String]): String =
    s"len(list_filter(w, x -> list_contains(${markers.map(m => s"'$m'").mkString("[", ", ", "]")}, x)))"

  /** Per-doc quality SELECT over `documents` — mirrors [[qualityOn]]. */
  /** The quality_score expression alone (over a relation exposing `w`
    * = split text), for composers like the per-source quota op.
    */
  private[queries] def oQualityScore: String =
    s"""(CAST(len(list_filter(w, x -> list_contains($oStop, x))) AS DOUBLE)
       |    / len(w)) * 0.5 +
       |  (CAST(list_sum([length(x) for x in w]) AS DOUBLE) / len(w)) * 0.1"""
      .stripMargin

  private[queries] def oQualityPerDocSql: String =
    s"""WITH tq AS (SELECT doc_id, text,
       |    regexp_split_to_array(text, ' ') AS w FROM documents)
       |SELECT doc_id,
       |  CAST(list_sum([length(x) for x in w]) AS DOUBLE) / len(w) AS mean_tok_len,
       |  CAST(len(list_filter(w, x -> list_contains($oStop, x))) AS DOUBLE)
       |    / len(w) AS stop_ratio,
       |  CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
       |    AS DOUBLE) / nullif(length(text), 0) AS digit_ratio,
       |  (CAST(len(list_filter(w, x -> list_contains($oStop, x))) AS DOUBLE)
       |    / len(w)) * 0.5 +
       |  (CAST(list_sum([length(x) for x in w]) AS DOUBLE) / len(w)) * 0.1
       |    AS quality_score
       |FROM tq""".stripMargin

  /** Per-doc predicted-language SELECT over `documents` — mirrors
    * [[langidOn]].
    */
  private[queries] def oLangidPerDocSql: String =
    s"""SELECT doc_id,
       |  CASE WHEN de > en THEN 'de'
       |       WHEN fr > en AND fr > de THEN 'fr'
       |       WHEN es > en AND es > de AND es > fr THEN 'es'
       |       ELSE 'en' END AS predicted
       |FROM (SELECT doc_id,
       |    ${oHits(LangMarkers.toMap.apply("en"))} AS en,
       |    ${oHits(LangMarkers.toMap.apply("de"))} AS de,
       |    ${oHits(LangMarkers.toMap.apply("fr"))} AS fr,
       |    ${oHits(LangMarkers.toMap.apply("es"))} AS es
       |  FROM (SELECT doc_id, regexp_split_to_array(text, ' ') AS w
       |    FROM documents) tl) sc""".stripMargin

  /** DuckDB replay of the BPE trainer: the K rounds unroll into K CTE
    * stages, each recomputing the pair argmax (count desc, pair asc)
    * from the previous stage's rewritten corpus and applying the same
    * boundary-anchored left-to-right non-overlapping replace (one
    * chr(1) each side, exactly as the trainer). chr(1)/chr(2) mirror
    * [[BpeSep]]/[[BpeGlue]].
    */
  private val oS = "chr(1) || chr(1)"

  /** The shared WITH-chain: d0 (per-document sentinel symbol string,
    * doc_id carried so the ENCODE oracles can read per-document final
    * states — the merge-table oracle just ignores it), then per round
    * the argmax CTE m{r} and the rewritten corpus d{r}.
    */
  private lazy val oBpeCtes: String = {
    val sb = new StringBuilder
    sb ++= "WITH d0 AS (SELECT doc_id, " + oS +
      " || array_to_string(regexp_split_to_array(text, ' '), " + oS +
      ") || " + oS + " AS s FROM documents)"
    for (r <- 1 to BpeRounds) {
      // the COALESCE below mirrors the kernel's early stop: when a round
      // exhausts (m_r empty) the scalar subqueries are NULL and
      // replace(s, NULL, NULL) would NULL-poison every document's state;
      // COALESCE keeps s unchanged instead, exactly like the Scala fit
      // loop breaking out with the prefix learned so far
      def part(i: Int) = s"(SELECT split_part(p, ' ', $i) FROM m$r)"
      sb ++= s""",
         |m$r AS (SELECT p, c FROM (
         |    SELECT p, count(*) AS c FROM (
         |      SELECT unnest([w[i] || ' ' || w[i+1]
         |          for i in generate_series(1, len(w) - 1)]) AS p
         |      FROM (SELECT list_filter(string_split(s, $oS),
         |          x -> x <> '') AS w FROM d${r - 1})
         |      WHERE len(w) >= 2)
         |    GROUP BY p)
         |  ORDER BY c DESC, p LIMIT 1),
         |d$r AS (SELECT doc_id, COALESCE(replace(s,
         |    chr(1) || ${part(1)} || $oS || ${part(2)} || chr(1),
         |    chr(1) || ${part(1)} || chr(2) || ${part(2)} || chr(1)), s) AS s
         |  FROM d${r - 1})"""
        .stripMargin
    }
    sb.toString
  }

  private lazy val oBpeSql: String =
    oBpeCtes + (1 to BpeRounds).map { r =>
      s"""
         |SELECT $r AS round, split_part(p, ' ', 1) AS a,
         |  split_part(p, ' ', 2) AS b, c AS freq FROM m$r"""
        .stripMargin
    }.mkString("\nUNION ALL")

  /** DuckDB replay of encode(fit(corpus)): the final corpus state
    * d{K} IS the per-document encoding — count its symbols and render
    * them ('|' separators, merged-pair glue as a space), exactly
    * mirroring [[bpeEncode]].
    */
  private lazy val oBpeEncodeSql: String =
    oBpeCtes + s"""
      |SELECT doc_id,
      |  CAST(len(list_filter(string_split(s, $oS), x -> x <> ''))
      |    AS BIGINT) AS n_tokens,
      |  replace(replace(s, $oS, '|'), chr(2), ' ') AS encoded
      |FROM d$BpeRounds""".stripMargin

  /** The mix-budget oracle re-based on BPE token counts: the same
    * salted-hash order and running-sum window as q_mix_budget, with
    * n_tok read from the trained-and-encoded corpus instead of the
    * whitespace split.
    */
  private lazy val oMixBudgetBpeSql: String =
    oBpeCtes + s""",
      |tok AS (SELECT doc_id,
      |    CAST(len(list_filter(string_split(s, $oS), x -> x <> ''))
      |      AS BIGINT) AS n_tok
      |  FROM d$BpeRounds),
      |t AS (SELECT d.doc_id, d.lang, tok.n_tok,
      |    md5('mix_' || CAST(d.doc_id AS VARCHAR)) AS h
      |  FROM documents d JOIN tok ON d.doc_id = tok.doc_id),
      |c AS (SELECT doc_id, lang, n_tok,
      |    CAST(SUM(n_tok) OVER (PARTITION BY lang
      |      ORDER BY h, doc_id) AS BIGINT) AS cum_tok
      |  FROM t)
      |SELECT doc_id, lang, n_tok, cum_tok FROM c
      |WHERE cum_tok <= 3000""".stripMargin

  def oracleSql: Map[String, String] = {
    Map(
      "q_text_bpe_merges" -> oBpeSql,
      "q_text_bpe_encode" -> oBpeEncodeSql,
      // cross encode: the training chain runs over the FULL corpus
      // (d0..dK carry every doc), the output just filters to the
      // incoming slice — exactly the fit/transform split
      "q_text_bpe_encode_cross" ->
        (oBpeEncodeSql + "\nWHERE doc_id % 4 = 0"),
      "q_mix_budget_bpe" -> oMixBudgetBpeSql,

      "q_text_tokens" ->
        s"""SELECT doc_id, len(regexp_split_to_array(text, ' ')) AS n_ws_tokens,
           |  len(regexp_extract_all(text, '$BpeIsh')) AS n_re_tokens,
           |  length(text) AS n_chars_real, n_chars
           |FROM documents""".stripMargin,

      "q_text_quality" -> oQualityPerDocSql,

      "q_filter_funnel" ->
        s"""WITH t AS (SELECT
           |    len(regexp_split_to_array(text, ' ')) AS n_tok,
           |    CAST(length(text) - (len(regexp_split_to_array(text, ' ')) - 1)
           |      AS DOUBLE) / len(regexp_split_to_array(text, ' ')) AS mean_len,
           |    CAST(len(list_filter(regexp_split_to_array(text, ' '),
           |      x -> list_contains($oStop, x))) AS DOUBLE)
           |      / len(regexp_split_to_array(text, ' ')) AS stop_ratio
           |  FROM documents)
           |SELECT CASE WHEN n_tok < 20 THEN 'r1_too_short'
           |            WHEN mean_len < 4.2 THEN 'r2_short_tokens'
           |            WHEN stop_ratio < 0.02 THEN 'r3_no_stopwords'
           |            ELSE 'kept' END AS stage, COUNT(*) AS n
           |FROM t GROUP BY 1""".stripMargin,

      "q_text_langid" ->
        s"""WITH t AS (SELECT lang, regexp_split_to_array(text, ' ') AS w
           |    FROM documents),
           |sc AS (SELECT lang,
           |    ${oHits(Seq("the", "a", "of", "and", "in"))} AS en,
           |    ${oHits(Seq("der", "die", "das", "und", "ist"))} AS de,
           |    ${oHits(Seq("le", "la", "les", "et", "est"))} AS fr,
           |    ${oHits(Seq("el", "los", "las", "y", "es"))} AS es
           |  FROM t)
           |SELECT lang,
           |  CASE WHEN de > en THEN 'de'
           |       WHEN fr > en AND fr > de THEN 'fr'
           |       WHEN es > en AND es > de AND es > fr THEN 'es'
           |       ELSE 'en' END AS predicted,
           |  COUNT(*) AS n_docs
           |FROM sc GROUP BY 1, 2""".stripMargin,

      "q_text_fingerprint" ->
        """WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') AS w
          |    FROM documents),
          |c AS (SELECT doc_id,
          |    [list_sum([(CAST(strpos('0123456789abcdef', substr(md5(x), i, 1)) AS BIGINT)-1)
          |       << (4*(15-i)) for i in generate_series(1,15)]) % 1000000
          |     for x in w] AS codes
          |  FROM t)
          |SELECT doc_id,
          |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), codes),
          |    (acc, x) -> (acc * 31 + x) % 1000000007) AS BIGINT) AS fingerprint
          |FROM c""".stripMargin,

      "q_text_length_stats" ->
        """WITH c AS (SELECT lang, len(regexp_split_to_array(text, ' ')) AS n_tok
          |    FROM documents),
          |r AS (SELECT lang, n_tok,
          |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_tok) AS rn,
          |    COUNT(*) OVER (PARTITION BY lang) AS n
          |  FROM c),
          |m AS (SELECT lang, n_tok AS median_tok FROM r WHERE rn = (n + 1) // 2)
          |SELECT c.lang, COUNT(*) AS n_docs, MIN(n_tok) AS min_tok,
          |  ANY_VALUE(median_tok) AS median_tok, MAX(n_tok) AS max_tok
          |FROM c JOIN m ON c.lang = m.lang
          |GROUP BY c.lang""".stripMargin,

      "q_text_tfdf" ->
        """WITH tok AS (SELECT doc_id, unnest(regexp_split_to_array(text, ' ')) AS term
          |  FROM documents)
          |SELECT term, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
          |FROM tok GROUP BY term
          |ORDER BY df DESC, term LIMIT 30""".stripMargin,

      "q_text_normalize" ->
        """WITH c AS (SELECT doc_id,
          |    trim(regexp_replace(regexp_replace(lower(text),
          |      '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm_text
          |  FROM documents)
          |SELECT doc_id, norm_text,
          |  CASE WHEN norm_text = '' THEN 0
          |       ELSE len(regexp_split_to_array(norm_text, ' ')) END
          |    AS n_norm_tokens
          |FROM c""".stripMargin,

      "q_text_repetition" ->
        """WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') AS w
          |    FROM documents),
          |bg AS (SELECT doc_id,
          |    [w[i]||' '||w[i+1] for i in generate_series(1, len(w)-1)] AS g
          |  FROM t WHERE len(w) >= 2)
          |SELECT doc_id, len(g) AS n_bigrams,
          |  len(list_distinct(g)) AS n_distinct,
          |  1.0 - CAST(len(list_distinct(g)) AS DOUBLE) / len(g) AS dup_ratio
          |FROM bg""".stripMargin,

      "q_text_diversity" ->
        """WITH tok AS (SELECT doc_id,
          |    unnest(regexp_split_to_array(text, ' ')) AS term
          |  FROM documents),
          |tc AS (SELECT doc_id, term, COUNT(*) AS c
          |  FROM tok GROUP BY doc_id, term),
          |d AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
          |    COUNT(*) AS n_types,
          |    SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS n_hapax,
          |    MAX(c) AS top_count
          |  FROM tc GROUP BY doc_id)
          |SELECT doc_id, n_tokens, n_types,
          |  CAST(n_types AS DOUBLE) / n_tokens AS ttr,
          |  CAST(n_hapax AS DOUBLE) / n_types AS hapax_ratio,
          |  CAST(top_count AS DOUBLE) / n_tokens AS top_share
          |FROM d""".stripMargin,

      "q_text_ngram_freq" ->
        """WITH t AS (SELECT regexp_split_to_array(text, ' ') AS w FROM documents),
          |bg AS (SELECT unnest([w[i]||' '||w[i+1]
          |    for i in generate_series(1, len(w)-1)]) AS bigram
          |  FROM t WHERE len(w) >= 2)
          |SELECT bigram, COUNT(*) AS n FROM bg GROUP BY bigram
          |ORDER BY n DESC, bigram LIMIT 20""".stripMargin,

      "q_text_lm_score" ->
        s"""WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') AS w
          |    FROM documents),
          |dg AS (SELECT doc_id, unnest([w[i]||' '||w[i+1]
          |    for i in generate_series(1, len(w)-1)]) AS gram
          |  FROM t WHERE len(w) >= 2),
          |b AS (SELECT gram, COUNT(*) AS bg,
          |    string_split(gram, ' ')[1] AS w1
          |  FROM dg GROUP BY gram),
          |pfx AS (SELECT w1, SUM(bg) AS pn FROM b GROUP BY w1),
          |model AS (SELECT gram, CAST(bg AS DOUBLE) / pn AS p
          |  FROM b JOIN pfx USING (w1))
          |SELECT doc_id, COUNT(*) AS n_bigrams,
          |  ${oSum6("p")} / COUNT(*) AS lm_score,
          |  MIN(p) AS min_p
          |FROM dg JOIN model USING (gram)
          |GROUP BY doc_id""".stripMargin)
  }
}
