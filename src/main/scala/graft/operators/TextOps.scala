package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale document pipelines: tokenization,
  * quality scoring, language identification, fingerprinting. All are
  * single-pass narrow transforms (no shuffle) except language-ID, which
  * joins against a broadcast marker-word table — every one scales linearly
  * with the documents table.
  */
object TextOps {

  /** Whitespace tokenizer (regex split on \s+ after trim). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** BPE-ish piece pattern: letter runs, digit runs, single punctuation —
    * the pre-tokenization split most BPE vocabularies assume.
    */
  val piecePattern: String = """[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"""

  /** BPE-ish pieces of the text (regexp findall of [[piecePattern]]). */
  def pieces(text: Column): Column =
    regexp_extract_all(text, lit(piecePattern), lit(0))

  /** Real merges-file BPE tokens of the text ([[graft.functions.BpeTokens]]:
    * greedy lowest-rank-pair merging per whitespace word, GPT-2 semantics).
    * Narrow per-row expression; the merges table travels in the plan.
    * Callers must have run `NativeFunctions.register` on the session.
    */
  def bpeTokens(text: Column,
      merges: String = graft.functions.BpeOps.defaultMergesContent): Column =
    call_function("bpe_tokens", text, lit(merges))

  /** BPE token COUNT — the budget form (no token array materialized). */
  def bpeTokenCount(text: Column,
      merges: String = graft.functions.BpeOps.defaultMergesContent): Column =
    call_function("bpe_token_count", text, lit(merges))

  /** Per-document BPE token statistics: word count, token count, distinct
    * tokens, and an md5 digest of the exact space-joined token stream (so a
    * replaying engine must produce byte-identical tokens, not just matching
    * counts). One narrow scan at 100 TB.
    */
  def bpeTokenStats(docs: DataFrame): DataFrame = {
    graft.functions.NativeFunctions.register(docs.sparkSession)
    val tk = bpeTokens(col("text"))
    docs.select(
      col("doc_id"),
      size(filter(tokens(col("text")), w => w =!= "")).cast("long").as("n_words"),
      size(tk).cast("long").as("n_tokens"),
      size(array_distinct(tk)).cast("long").as("n_distinct_tokens"),
      md5(array_join(tk, " ")).as("token_digest"))
  }

  /** Normalized text: lowercased, whitespace collapsed to single spaces. */
  def normalized(text: Column): Column =
    lower(regexp_replace(trim(text), "\\s+", " "))

  /** Stable document fingerprint over normalized text. */
  def fingerprint(text: Column): Column = md5(normalized(text))

  /** Winnowing fingerprints (Schleimer et al.'s rolling-hash scheme, the
    * MOSS algorithm): hash every character k-gram of the normalized text,
    * then keep the minimum hash of each sliding window of `w` consecutive
    * k-gram hashes. Near-identical documents share most selected hashes
    * even under local edits — the local-similarity fingerprint that the
    * whole-document [[fingerprint]] (one hash, breaks on any edit) can't
    * provide.
    *
    * Everything is per-row array expressions (sequence/transform/slice)
    * inside codegen — a narrow single pass, no shuffle, like the shingle
    * pipeline. Hashes are md5 hex strings with lexicographic MIN, so DuckDB
    * replays the selection exactly.
    *
    * Returns (doc_id, n_kgrams, n_fingerprints, fp_digest) where fp_digest
    * is the md5 of the sorted distinct selected hashes — a compact
    * comparable summary; join selected-hash sets directly for containment
    * queries.
    */
  def winnowingFingerprints(docs: DataFrame, k: Int = 8, w: Int = 4): DataFrame =
    winnowingSets(docs, k, w)
      .select(col("doc_id"),
        size(col("kh")).cast("long").as("n_kgrams"),
        size(col("fps")).cast("long").as("n_fingerprints"),
        md5(array_join(col("fps"), ",")).as("fp_digest"))

  /** The selected-hash sets behind [[winnowingFingerprints]]: (doc_id, kh
    * k-gram hashes, fps sorted distinct window minima). Join `fps` sets
    * for containment/overlap queries.
    */
  def winnowingSets(docs: DataFrame, k: Int = 8, w: Int = 4): DataFrame = {
    require(k > 0 && w > 0, "k-gram size and window must be positive")
    // guard short docs explicitly: sequence(1, 0) would generate a
    // DESCENDING [1, 0] in Spark, not an empty array
    val kh =
      s"""CASE WHEN length(norm) < $k THEN CAST(array() AS array<string>)
         |ELSE transform(sequence(1, length(norm) - $k + 1),
         |       i -> md5(substring(norm, i, $k))) END""".stripMargin
    val wins =
      s"""CASE WHEN size(kh) = 0 THEN kh
         |WHEN size(kh) < $w THEN array(array_min(kh))
         |ELSE transform(sequence(1, size(kh) - $w + 1),
         |       j -> array_min(slice(kh, j, $w))) END""".stripMargin
    docs
      .withColumn("norm", normalized(col("text")))
      .withColumn("kh", expr(kh))
      .withColumn("fps", array_sort(array_distinct(expr(wins))))
      .select(col("doc_id"), col("kh"), col("fps"))
  }

  /** Gopher-style repetition statistics (Rae et al. 2021 §A1.1): the
    * fraction of repeated words and the dominance of the most common
    * word / 2-gram / 3-gram. High values flag boilerplate, keyword stuffing
    * and degenerate generations — the standard repetition pre-filter a
    * curation pipeline runs before dedup.
    *
    * Everything is per-row array expressions (split / array_distinct /
    * aggregate-fold over the distinct tokens) — a narrow single pass, no
    * shuffle, no explode. The per-row cost is O(distinct × length) on the
    * token array, fine for web-document sizes; for book-length inputs,
    * explode + groupBy(doc_id, gram) computes the same counts at one
    * shuffle and should be preferred past ~10⁴ tokens/doc.
    *
    * All fractions are exact int/int double divisions (no rounding needed
    * for engine parity); empty/short docs yield 0.0 instead of null.
    */
  def repetitionStats(docs: DataFrame): DataFrame = {
    val ws = filter(split(lower(trim(col("text"))), "\\s+"), w => w =!= "")
    def grams(n: Int): Column =
      when(size(col("ws")) < n, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), size(col("ws")) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(o => element_at(col("ws"), i + o)): _*)))
    // max occurrence count of any gram: fold over the distinct grams,
    // counting each one's occurrences in the full list
    def maxCount(arr: Column): Column =
      aggregate(array_distinct(arr), lit(0),
        (acc, d) => greatest(acc, size(filter(arr, x => x === d))))
    def frac(num: Column, den: Column): Column =
      when(den > 0, num.cast("double") / den.cast("double")).otherwise(lit(0.0))
    docs
      .withColumn("ws", ws)
      .withColumn("bg", grams(2))
      .withColumn("tg", grams(3))
      .select(
        col("doc_id"),
        size(col("ws")).cast("long").as("n_words"),
        size(array_distinct(col("ws"))).cast("long").as("n_distinct_words"),
        frac(size(col("ws")) - size(array_distinct(col("ws"))), size(col("ws")))
          .as("dup_word_frac"),
        frac(maxCount(col("ws")), size(col("ws"))).as("top_word_frac"),
        frac(maxCount(col("bg")), size(col("bg"))).as("top_bigram_frac"),
        frac(maxCount(col("tg")), size(col("tg"))).as("top_trigram_frac"))
  }

  /** PII patterns scrubbed by [[piiScrub]]. RE2-compatible (no lookarounds,
    * no backrefs) so a DuckDB oracle applies the exact same expressions.
    */
  val emailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Pattern: String = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val longNumberPattern: String = "\\b\\d{7,}\\b"

  /** PII redaction: replaces emails, dotted-quad IPs and long digit runs
    * (phone/account numbers) with typed placeholder tokens, and reports the
    * per-document match counts. Counts are taken on the original text;
    * replacement is staged email → IP → number so the narrower numeric
    * patterns never fire inside an already-redacted wider match.
    *
    * Pure per-row regexp expressions — narrow, codegen'd, no shuffle; this
    * is a full-corpus rewrite pass at 100 TB and costs exactly one scan.
    */
  def piiScrub(docs: DataFrame, text: Column): DataFrame = {
    def count(re: String): Column =
      size(regexp_extract_all(text, lit(re), lit(0))).cast("long")
    val scrubbed =
      regexp_replace(
        regexp_replace(
          regexp_replace(text, emailPattern, "<EMAIL>"),
          ipv4Pattern, "<IP>"),
        longNumberPattern, "<ID>")
    docs
      .withColumn("n_emails", count(emailPattern))
      .withColumn("n_ips", count(ipv4Pattern))
      .withColumn("n_ids", count(longNumberPattern))
      .withColumn("scrubbed", scrubbed)
  }

  /** Per-document token statistics. */
  def tokenStats(docs: DataFrame): DataFrame = {
    val tok = tokens(col("text"))
    docs.select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars"),
      size(tok).cast("long").as("n_tokens"),
      size(array_distinct(tok)).cast("long").as("n_distinct_tokens"),
      (size(array_distinct(tok)).cast("double") / size(tok).cast("double"))
        .as("type_token_ratio"),
      (length(regexp_replace(col("text"), "\\s", "")).cast("double") /
        size(tok).cast("double")).as("avg_token_len"))
  }

  /** English-ish stopwords used by the quality score. */
  val stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

  /** Heuristic quality score in [0,1]: length saturation x (1 - stopword
    * ratio penalty), the usual cheap pre-filter before expensive dedup.
    */
  def qualityScore(docs: DataFrame): DataFrame = {
    val tok = tokens(col("text"))
    val nTok = size(tok).cast("double")
    val stopCount = size(filter(tok, t => t.isInCollection(stopwords))).cast("double")
    Spread.forCpu(docs).select(
      col("doc_id"),
      nTok.cast("long").as("n_tokens"),
      (stopCount / nTok).as("stop_ratio"),
      (least(nTok / lit(100.0), lit(1.0)) * (lit(1.0) - stopCount / nTok))
        .as("quality_score"))
  }

  /** C4/Gopher-style heuristic document filter (Raffel et al. 2020 §2.2,
    * Rae et al. 2021 §A1.1): the cheap rule-based pass every curation
    * pipeline runs before anything expensive. Emits per-document
    * measurements plus one boolean flag per rule and a combined `keep`
    * verdict, so downstream stages can either filter on `keep` or audit
    * which rule fired.
    *
    * Rules (all thresholds are caller knobs):
    *   - word count outside [minWords, maxWords]        → flag_len
    *   - mean word length outside [minWordLen, maxWordLen] → flag_word_len
    *     (Gopher uses [3, 10]: shorter means symbol soup, longer means
    *     minified/concatenated junk)
    *   - distinct/total word ratio below minUniqueRatio → flag_repetitive
    *   - fewer than minStopwords distinct [[stopwords]] → flag_no_stop
    *     (C4's "must contain common English function words" rule)
    *
    * All measurements are exact int/int double divisions — no rounding
    * needed for engine parity. Pure per-row array expressions: narrow,
    * codegen'd, no shuffle; one corpus scan at 100 TB.
    */
  def heuristicFilter(docs: DataFrame,
      minWords: Int = 50, maxWords: Int = 100000,
      minWordLen: Double = 3.0, maxWordLen: Double = 10.0,
      minUniqueRatio: Double = 0.2, minStopwords: Int = 2): DataFrame = {
    val ws = filter(split(lower(trim(col("text"))), "\\s+"), w => w =!= "")
    val nWords = size(col("ws")).cast("long")
    val meanLen = when(nWords > 0,
      aggregate(col("ws"), lit(0L), (acc, w) => acc + length(w)).cast("double") /
        nWords.cast("double")).otherwise(lit(0.0))
    val uniqRatio = when(nWords > 0,
      size(array_distinct(col("ws"))).cast("double") / nWords.cast("double"))
      .otherwise(lit(0.0))
    val nStop = size(filter(array_distinct(col("ws")),
      w => w.isInCollection(stopwords))).cast("long")
    Spread.forCpu(docs)
      .withColumn("ws", ws)
      .withColumn("n_words", nWords)
      .withColumn("mean_word_len", meanLen)
      .withColumn("unique_ratio", uniqRatio)
      .withColumn("n_stopwords", nStop)
      .withColumn("flag_len",
        col("n_words") < minWords || col("n_words") > maxWords)
      .withColumn("flag_word_len",
        col("mean_word_len") < minWordLen || col("mean_word_len") > maxWordLen)
      .withColumn("flag_repetitive", col("unique_ratio") < minUniqueRatio)
      .withColumn("flag_no_stop", col("n_stopwords") < minStopwords)
      .withColumn("keep",
        !col("flag_len") && !col("flag_word_len") &&
          !col("flag_repetitive") && !col("flag_no_stop"))
      .select(col("doc_id"), col("n_words"), col("mean_word_len"),
        col("unique_ratio"), col("n_stopwords"), col("flag_len"),
        col("flag_word_len"), col("flag_repetitive"), col("flag_no_stop"),
        col("keep"))
  }

  /** TF-IDF top-k terms per document (sklearn's smooth-idf flavor:
    * idf = ln((1+N)/(1+df)) + 1, tfidf = tf × idf with raw counts as tf).
    * The per-corpus document frequency table is the classic inverted-index
    * aggregate; the scalar corpus size N rides along as a broadcast
    * single-row frame (no driver round-trip, same pattern as
    * [[Sampling.sourceMix]]).
    *
    * Shuffle budget at 100 TB: one groupBy(doc_id, term) with map-side
    * combine, one groupBy(term) over per-doc-distinct terms (≤ vocabulary
    * rows out), one join on term (build side has exactly one row per term —
    * no explosion), and one window partitioned by doc_id for the top-k.
    * Scores are rounded to 4 decimals at the very end; ordering uses the
    * unrounded value with the term string as total tie-break.
    */
  /** BM25 relevance of every document against a bag of query terms — the
    * retrieval scoring a RAG / data-selection pipeline runs after chunking
    * (Robertson-Spärck Jones BM25, the Okapi defaults k1=1.2 b=0.75):
    * `score(d) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1−b+b·|d|/avgdl))`
    * with `idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))`.
    *
    * Shuffle budget at 100 TB: the tokenize→explode is narrow; term
    * frequencies for the QUERY TERMS ONLY are one groupBy(doc_id, term)
    * with the `isin(queryTerms)` filter pushed BELOW the aggregation (the
    * whole vocabulary never shuffles — only matching postings); document
    * lengths are a second map-side-combined groupBy(doc_id); df/avgdl/N
    * ride as broadcast single-row or terms-sized frames. Scoring joins are
    * all broadcastable. Per-term contributions sum through DECIMAL so the
    * score is order-independent; only scored documents (≥1 query term)
    * return.
    */
  def bm25(docs: DataFrame, queryTerms: Seq[String], k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25 needs at least one query term")
    val tok = docs.select(col("doc_id"),
      explode(filter(split(lower(trim(col("text"))), "\\s+"), w => w =!= ""))
        .as("term"))
    val dlen = tok.groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("double").as("dl"))
    val hits = tok.filter(col("term").isin(queryTerms: _*))
    val tf = hits.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val df = hits.select(col("doc_id"), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).cast("double").as("df"))
    // avgdl via exact decimal total, then ONE double division — decimal
    // division scales differ across engines, double IEEE division doesn't
    val stats = dlen.agg(count(lit(1)).cast("double").as("n_docs"),
      (sum(col("dl").cast("decimal(38,6)")).cast("double") /
        count(lit(1)).cast("double")).as("avgdl"))
    val contrib = tf.join(broadcast(df), Seq("term"))
      .join(dlen, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5))))
      .withColumn("c",
        col("idf") * col("tf") * (lit(k1) + lit(1.0)) /
          (col("tf") + lit(k1) *
            (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
    contrib.groupBy(col("doc_id"))
      .agg(round(sum(col("c").cast("decimal(38,18)")).cast("double"), 6)
        .as("bm25"))
  }

  /** Flesch reading-ease readability score — the classic curation signal
    * (low scores flag legalese/boilerplate; implausibly high ones flag
    * word salad). Counts are regex-structural so the operator stays a
    * pure narrow map with no dictionary: syllables ≈ vowel-group runs
    * (`[aeiouy]+` over the lowercased text — the standard approximation),
    * sentences ≈ terminal-punctuation runs (min 1), words = whitespace
    * tokens. `206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)`
    * with plain left-associated double math, so the score is
    * engine-exact (no transcendentals at all).
    */
  def readability(docs: DataFrame): DataFrame = {
    val nw = size(filter(tokens(col("text")), w => w =!= "")).cast("long")
    val ns = greatest(lit(1L),
      size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0))).cast("long"))
    val syl = size(regexp_extract_all(lower(col("text")), lit("[aeiouy]+"),
      lit(0))).cast("long")
    docs.select(col("doc_id"), nw.as("n_words"), ns.as("n_sentences"),
        syl.as("n_syllables"))
      .select(col("doc_id"), col("n_words"), col("n_sentences"),
        col("n_syllables"),
        when(col("n_words") > 0,
          round(lit(206.835) -
            lit(1.015) * (col("n_words").cast("double") / col("n_sentences")) -
            lit(84.6) * (col("n_syllables").cast("double") / col("n_words")),
            4))
          .otherwise(lit(0.0)).as("flesch"))
  }

  /** Vocabulary coverage / OOV-rate stats — the tokenizer-evaluation
    * metric data pipelines compute before committing to a vocabulary:
    * build the corpus's top-`vocabSize` word vocabulary (count-desc,
    * word-asc total order, so the cut boundary is deterministic) and
    * report, per document, how many token OCCURRENCES fall outside it.
    * A doc with a high OOV rate either needs byte-fallback tokenization
    * or is noise (the two cases diverge downstream; this is the dial).
    *
    * Shape at 100 TB: the vocabulary is ONE map-side-combined word
    * histogram capped by TakeOrdered (t13's corpus-pass shape — the
    * cap bounds driver state at vocabSize rows); it broadcasts back, so
    * the per-doc pass is a narrow explode + broadcast lookup + one
    * doc-keyed count aggregate with map-side combine.
    */
  def vocabCoverage(docs: DataFrame, vocabSize: Int = 1000): DataFrame = {
    val toks = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .filter(col("w") =!= "")
    val vocab = broadcast(
      toks.groupBy(col("w")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("w")).limit(vocabSize)
        .select(col("w").as("__graft_vw")))
    val per = toks
      .join(vocab, col("w") === col("__graft_vw"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        count(col("__graft_vw")).as("n_in_vocab"))
    docs.select(col("doc_id"))
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        (coalesce(col("n_tokens"), lit(0L)) -
          coalesce(col("n_in_vocab"), lit(0L))).as("n_oov"),
        when(coalesce(col("n_tokens"), lit(0L)) > 0,
          (col("n_tokens") - coalesce(col("n_in_vocab"), lit(0L)))
            .cast("double") / col("n_tokens").cast("double"))
          .otherwise(lit(0.0)).as("oov_rate"))
  }

  def tfidfTopTerms(docs: DataFrame, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    val tok = docs.select(col("doc_id"),
      explode(filter(split(lower(trim(col("text"))), "\\s+"), w => w =!= ""))
        .as("term"))
    val tf = tok.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).cast("long").as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).cast("long").as("df"))
    val n = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val scored = tf.join(df, Seq("term")).crossJoin(broadcast(n))
      .withColumn("tfidf",
        col("tf").cast("double") *
          (log((lit(1.0) + col("n_docs")) / (lit(1.0) + col("df").cast("double")))
            + lit(1.0)))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("df"),
        round(col("tfidf"), 4).as("tfidf"))
  }

  /** Token-window chunking for training pipelines: cut each document into
    * overlapping windows of `chunkTokens` tokens, stepping by
    * `chunkTokens - overlapTokens` — the chunking stage that feeds
    * context-window packing ([[Packing]]) and per-chunk embedding.
    * `tokensOf` picks the token unit: whitespace words by default, or
    * [[bpeTokens]] for real subword budgets (what a training pipeline
    * actually packs against — callers register NativeFunctions first).
    * Output: (doc_id, chunk_id, n_tokens, chunk_md5) where chunk_md5
    * digests the exact chunk text (space-joined window), so an engine
    * replaying the rule must produce byte-identical chunks, not just the
    * same counts.
    *
    * Pure narrow shape: tokens/windows are per-row array expressions
    * (sequence → transform → slice) inside codegen, then one posexplode —
    * no shuffle, linear in corpus bytes. Chunk starts are `i*step` for
    * `i < ceil(n/step)`, so the final window may be shorter than
    * `chunkTokens` (it is never empty); whitespace-only documents emit no
    * chunks.
    */
  def chunk(docs: DataFrame, chunkTokens: Int = 64,
      overlapTokens: Int = 16,
      tokensOf: Column => Column = tokens): DataFrame = {
    require(overlapTokens >= 0 && chunkTokens > overlapTokens,
      "need chunkTokens > overlapTokens >= 0")
    graft.functions.NativeFunctions.register(docs.sparkSession)
    val step = chunkTokens - overlapTokens
    // Materialize the token array ONCE in its own projection. Inlining
    // `tokensOf` into the window transform re-runs the tokenizer per
    // window element (measured: 15 evaluations/row on an 8-word doc —
    // the transform lambda re-evaluates its operand per sequence index,
    // and HigherOrderFunction bodies are outside codegen CSE). The
    // multi-referenced non-cheap alias also stops CollapseProject from
    // undoing the split. BpeSpec pins exactly one merge-loop run per row.
    val toks = col("__toks")
    val n = size(toks)
    val nStarts = ceil(n.cast("double") / lit(step.toDouble)).cast("int")
    val windows = transform(sequence(lit(0), nStarts - 1), i =>
      struct(
        md5(array_join(slice(toks, i * step + 1, lit(chunkTokens)), " "))
          .as("chunk_md5"),
        least(lit(chunkTokens), n - i * step).cast("long").as("n_tokens")))
    // the tokenizer (BPE merge loop for t11) is compute-bound: spread a
    // one-split local scan across cores before it (no-op at scale)
    Spread.forCpu(docs.filter(trim(col("text")) =!= ""))
      .select(col("doc_id"), tokensOf(col("text")).as("__toks"))
      .select(col("doc_id"), posexplode(windows).as(Seq("chunk_id", "c")))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        col("c.n_tokens").as("n_tokens"), col("c.chunk_md5").as("chunk_md5"))
  }

  /** N-gram language-model quality score — the CCNet-style perplexity
    * filter (Wenzek et al. 2020 §4.3: rank documents by LM
    * log-likelihood per token; KenLM there, an add-α bigram model here —
    * same filter shape, engine-replayable arithmetic). High `avg_nll`
    * flags gibberish/boilerplate relative to the reference corpus the
    * model was fit on (`refDocs`, defaulting to the corpus itself — the
    * self-scoring form; production points it at a trusted corpus).
    *
    * Model: P(w₁) = (U(w₁)+α)/(T+αV) for the first token,
    * P(wᵢ|wᵢ₋₁) = (B(wᵢ₋₁,wᵢ)+α)/(U(wᵢ₋₁)+αV) for the rest, with U/B
    * the reference unigram/bigram counts, T total tokens, V vocabulary
    * size. Score = mean −ln P per token.
    *
    * Engine parity: each per-term −ln P is rounded to 6dp and summed as
    * DECIMAL(20,6) — an exact sum, immune to float summation order — and
    * only the final per-doc mean goes back to double (rounded 6dp).
    *
    * Shape at 100 TB: the LM tables are two map-side-combined groupBys
    * over the reference corpus (output ≈ vocabulary/bigram-type sized,
    * NOT corpus sized); scoring is one in-row bigram explode joined
    * against those tables (AQE broadcasts them when small, shuffles on
    * the gram key when not), then one per-doc aggregate. The two scalar
    * constants (T, V) ride along as a broadcast single-row frame — no
    * driver round-trip.
    */
  def lmScore(docs: DataFrame, refDocs: DataFrame = null,
      alpha: Double = 0.5): DataFrame = {
    val ref = Option(refDocs).getOrElse(docs)
    val ws = filter(tokens(col("text")), w => w =!= "")
    def tokRel(d: DataFrame) = d
      .withColumn("__ws", ws)
      .select(col("doc_id"), posexplode(col("__ws")).as(Seq("pos", "w")))
    val refTok = tokRel(ref)
    val ug = refTok.groupBy(col("w")).agg(count(lit(1)).as("uc"))
    val consts = refTok.agg(count(lit(1)).cast("double").as("t"))
      .crossJoin(ug.agg(count(lit(1)).cast("double").as("v")))
    // in-row bigram structs: one array transform per row, no window — the
    // same narrow shape serves BOTH the reference-side counts and the
    // scored side (the old reference-side lead/Window shuffled AND sorted
    // the whole reference corpus; self-scoring at scale paid a full-corpus
    // exchange the in-row form avoids)
    val pairs = when(size(col("__ws")) < 2,
        array().cast("array<struct<w1:string,w2:string>>"))
      .otherwise(transform(sequence(lit(1), size(col("__ws")) - 1), i =>
        struct(element_at(col("__ws"), i).as("w1"),
          element_at(col("__ws"), i + 1).as("w2"))))
    val bgc = ref.withColumn("__ws", ws)
      .select(explode(pairs).as("bg"))
      .groupBy(col("bg.w1").as("bw1"), col("bg.w2").as("bw2"))
      .agg(count(lit(1)).as("bc"))
    def nll6(p: Column): Column =
      round(-log(p), 6).cast("decimal(20,6)")
    val bigramTerms = docs.withColumn("__ws", ws)
      .select(col("doc_id"), explode(pairs).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      // LEFT joins: a scored doc may use words the reference never saw
      // (count 0 under add-α); self-scoring always matches
      .join(ug.select(col("w").as("w1"), col("uc")), Seq("w1"), "left")
      .join(bgc, col("w1") === col("bw1") && col("w2") === col("bw2"), "left")
      .crossJoin(broadcast(consts))
      .select(col("doc_id"), nll6(
        (coalesce(col("bc"), lit(0L)).cast("double") + alpha) /
          (coalesce(col("uc"), lit(0L)).cast("double") + lit(alpha) * col("v"))).as("nll"))
    val firstTerms = docs.withColumn("__ws", ws)
      .filter(size(col("__ws")) > 0)
      .select(col("doc_id"), element_at(col("__ws"), 1).as("w"))
      .join(ug, Seq("w"), "left")
      .crossJoin(broadcast(consts))
      .select(col("doc_id"), nll6(
        (coalesce(col("uc"), lit(0L)).cast("double") + alpha) /
          (col("t") + lit(alpha) * col("v"))).as("nll"))
    val per = bigramTerms.union(firstTerms).groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("nll")).as("total"))
    docs.select(col("doc_id"))
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_terms"), lit(0L)).as("n_tokens"),
        when(coalesce(col("n_terms"), lit(0L)) > 0,
          round(col("total").cast("double") / col("n_terms").cast("double"), 6))
          .otherwise(lit(0.0)).as("avg_nll"))
  }

  /** Perplexity gate over [[lmScore]]: keep the best `keepFraction` of
    * docs by average NLL against the (corpus- or reference-)trained bigram
    * LM — the standard model-based quality filter of pretraining curation.
    *
    * The DEFAULT is the 100 TB shape: one `approx_percentile` scalar
    * aggregation (Greenwald–Khanna summaries, merged map-side) whose
    * threshold broadcasts back as a plain filter — the corpus never sees
    * a global sort, and the only approximation is the cut point's rank,
    * bounded by `n / accuracy` positions (the spec pins that band:
    * identical keep-set away from the boundary, bounded disagreement at
    * it). Below `accuracy` retained samples the summary is lossless, so
    * at oracle scale the approx gate IS the exact gate — which is what
    * lets t15b oracle-check this exact production path.
    *
    * `exact = true` is the verification override: a global PERCENT_RANK
    * filter, portable to a SQL oracle with zero quantile-interpolation
    * ambiguity — but it ranks through a single-partition window, so it
    * exists for oracles and small corpora, never for production.
    */
  def perplexityGate(docs: DataFrame, keepFraction: Double = 0.9,
      refDocs: DataFrame = null, exact: Boolean = false,
      accuracy: Int = 10000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(keepFraction > 0 && keepFraction <= 1, "keepFraction in (0, 1]")
    val scored = lmScore(docs, refDocs)
    if (exact) {
      scored
        .withColumn("__pr", percent_rank().over(Window.orderBy(col("avg_nll"))))
        .filter(col("__pr") <= keepFraction)
        .drop("__pr")
    } else {
      val thr = scored.agg(
        expr(s"approx_percentile(avg_nll, $keepFraction, $accuracy)")
          .as("__thr"))
      scored.crossJoin(broadcast(thr))
        .filter(col("avg_nll") <= col("__thr"))
        .drop("__thr")
    }
  }

  /** N-gram novelty score: the fraction of a doc's distinct 3-gram
    * shingles that appear NOWHERE else in the corpus — the diversity-
    * selection complement of the duplication operators (a doc full of
    * corpus-common boilerplate scores near 0, genuinely fresh text near
    * 1).
    *
    * Scale shape: the shingle relation carries in-row-built 8-byte hashed
    * keys (strings never leave their row), checkpointed once for its two
    * consumers; doc-frequency is one map-side-combined groupBy on the key
    * and the scoring join is keyed on the same 8 bytes.
    */
  def noveltyScore(docs: DataFrame, n: Int = 3): DataFrame = {
    graft.functions.NativeFunctions.register(docs.sparkSession)
    val sh = Spread.byKey(docs, col("doc_id"))
      .select(col("doc_id"),
        explode(call_function("shingle_hashes", col("text"), lit(n))).as("sk"))
      .localCheckpoint(true)
    val dfreq = sh.groupBy(col("sk")).agg(count(lit(1)).as("__df"))
    val per = sh.join(dfreq, Seq("sk"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("__df") === 1L, 1L).otherwise(0L)).as("n_unique"))
    docs.select(col("doc_id")).join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_unique"), lit(0L)).as("n_unique"),
        when(coalesce(col("n_shingles"), lit(0L)) > 0,
          col("n_unique").cast("double") / col("n_shingles").cast("double"))
          .otherwise(lit(0.0)).as("novelty"))
  }

  /** Marker words per language for the n-gram/stopword language-ID
    * heuristic. Deterministic: ties broken by language code.
    */
  val langMarkers: Seq[(String, String)] = Seq(
    "en" -> "the", "en" -> "a", "en" -> "is", "en" -> "and", "en" -> "of",
    "de" -> "der", "de" -> "die", "de" -> "das", "de" -> "und", "de" -> "ist",
    "fr" -> "le", "fr" -> "la", "fr" -> "et", "fr" -> "les", "fr" -> "est",
    "es" -> "el", "es" -> "los", "es" -> "y", "es" -> "es", "es" -> "una",
    "zh" -> "de", "zh" -> "shi", "zh" -> "bu", "zh" -> "le", "zh" -> "ren")

  /** Distributed word-type histogram capped at the top `maxWordTypes` by
    * (freq desc, word asc) — the corpus-sized pass of BPE training. One
    * partial-aggregated shuffle on the word, then a TakeOrdered cap; the
    * corpus itself never moves.
    */
  def wordHistogram(docs: DataFrame, maxWordTypes: Int): DataFrame =
    docs.select(explode(tokens(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("w")).limit(maxWordTypes)

  /** Learn a BPE merges table from the corpus (Sennrich et al. 2016: start
    * from code points, repeatedly merge the most frequent adjacent symbol
    * pair, frequency-weighted over word TYPES). Returns (rank, lhs, rhs,
    * pair_count) for the first `nMerges` learned merges, rank 1-based in
    * learn order — the merges-file the apply expressions
    * ([[bpeTokens]]/[[graft.functions.BpeTokens]]) consume.
    *
    * Shape at 100 TB: the only corpus-sized pass is [[wordHistogram]] —
    * one word-keyed partial-aggregated shuffle. The merge loop itself runs
    * on the driver over the top-`maxWordTypes` histogram, which is
    * VOCABULARY-sized (Zipf: ~10⁶–10⁷ word types for a web-scale corpus,
    * capped explicitly) — the shape production BPE trainers use
    * (SentencePiece / HF tokenizers train over a word-count dictionary,
    * never the corpus). The alternative — one distributed pair-count
    * aggregate per merge — costs `vocabSize` shuffles sequentially at a
    * real 50k-merge vocabulary, which no cluster survives; bounded driver
    * state (like a04's centroids and a05/a06's codebooks) is the correct
    * trade, and the frequency cap makes the bound explicit.
    *
    * Determinism (oracle replays the loop stage by stage): pair counts are
    * exact integers; the argmax ties by (count desc, lhs asc, rhs asc);
    * merging splices occurrences leftmost-first, which cannot create new
    * occurrences of the SAME pair, so it equals the batch left-to-right
    * non-overlapping form. Stops early if pairs are exhausted before
    * `nMerges` (single-symbol words drop out of counting naturally).
    */
  def bpeTrain(docs: DataFrame, nMerges: Int = 12,
      maxWordTypes: Int = 4000): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val hist = wordHistogram(docs, maxWordTypes)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // per-word-type symbol state, split by CODE POINT (DuckDB substring
    // semantics), mutated in place across merge steps
    val states: Array[(scala.collection.mutable.ArrayBuffer[String], Long)] =
      hist.map { case (w, f) =>
        val syms = new scala.collection.mutable.ArrayBuffer[String](w.length)
        var i = 0
        while (i < w.length) {
          val n = Character.charCount(w.codePointAt(i))
          syms += w.substring(i, i + n)
          i += n
        }
        (syms, f)
      }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var exhausted = false
    while (merges.length < nMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      states.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val ((l, r), c) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        merges += ((l, r, c))
        states.foreach { case (syms, _) =>
          var i = 0
          while (i < syms.length - 1) {
            if (syms(i) == l && syms(i + 1) == r) {
              syms(i) = l + r
              syms.remove(i + 1)
            } else i += 1
          }
        }
      }
    }
    merges.toSeq.zipWithIndex
      .map { case ((l, r, c), i) => (i + 1L, l, r, c) }
      .toDF("rank", "lhs", "rhs", "pair_count")
  }

  /** Language-ID: explode tokens, join the broadcast marker table, argmax
    * matches per (doc, lang); docs with no marker hits get 'und'.
    */
  def langId(spark: SparkSession, docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val markers = spark.createDataFrame(langMarkers).toDF("cand_lang", "w")
    val tok = docs.select(col("doc_id"), explode(tokens(col("text"))).as("w"))
    val scores = tok.join(broadcast(markers), "w")
      .groupBy(col("doc_id"), col("cand_lang"))
      .agg(count(lit(1)).as("score"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("cand_lang"))
    val best = scores.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id").as("best_doc"), col("cand_lang").as("pred0"))
    docs.join(best, col("doc_id") === col("best_doc"), "left_outer")
      .select(col("doc_id"), coalesce(col("pred0"), lit("und")).as("pred_lang"),
        col("lang").as("actual_lang"))
  }

  /** Tokenizer FERTILITY by language: BPE tokens emitted per whitespace
    * word — the standard tokenizer-fit diagnostic (a language far above
    * the corpus mean pays disproportionate sequence length for the same
    * content; the signal that drives vocab rebalancing). One narrow pass
    * computing both counts per row, then a langs-sized aggregate;
    * fertility divides exact long sums, so the double is engine-exact.
    */
  def tokenFertility(docs: DataFrame): DataFrame = {
    graft.functions.NativeFunctions.register(docs.sparkSession)
    docs.select(col("lang"),
        size(filter(tokens(col("text")), w => w =!= ""))
          .cast("long").as("nw"),
        size(bpeTokens(col("text"))).cast("long").as("nt"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nw")).as("n_words"),
        sum(col("nt")).as("n_tokens"))
      .select(col("lang"), col("n_docs"), col("n_words"), col("n_tokens"),
        (col("n_tokens").cast("double") / col("n_words").cast("double"))
          .as("fertility"))
  }

  /** Zipf power-law fit over the corpus word-frequency distribution: OLS
    * of ln(freq) on ln(rank) across the `topK` most frequent word types —
    * a one-row corpus health statistic (natural-language corpora sit near
    * slope −1; a flat slope flags templated/machine text, a cliff flags a
    * truncated vocabulary).
    *
    * Shape at 100 TB: the corpus contributes ONE word-histogram shuffle
    * (partial-agg combines per map task, so vocabulary size — not corpus
    * size — crosses the wire), exactly t13's corpus pass. The histogram is
    * consumed twice (global type/token totals; top-K cut) — vocabulary-
    * sized lineage whose recompute is the histogram agg itself, the same
    * recompute-over-pin trade as d09, with a durable-persist of the
    * vocab-sized histogram as the knob if the corpus pass ever dominates.
    * The top-K cut is a bounded TakeOrdered; the rank window and OLS fold
    * run over ≤ topK rows. Every OLS sum goes through DECIMAL(38,18)
    * (order-independent, engine-exact); ln() ulps are absorbed by the
    * final ROUND(..., 4).
    */
  def zipfFit(docs: DataFrame, topK: Int = 500): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = docs
      .select(explode(tokens(lower(trim(col("text"))))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    val totals = hist.agg(
      count(lit(1)).as("n_types"),
      sum(col("freq")).as("n_tokens"))
    // bounded top-k (TakeOrderedAndProject), then rank over ≤ topK rows —
    // the single-partition window is capped by construction
    val top = hist.orderBy(col("freq").desc, col("w")).limit(topK)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("freq").desc, col("w"))))
    val pts = top.select(
      log(col("rank").cast("double")).as("x"),
      log(col("freq").cast("double")).as("y"))
    def dsum(c: Column): Column =
      sum(c.cast("decimal(38,18)")).cast("double")
    val fit = pts.agg(
      count(lit(1)).cast("double").as("k"),
      dsum(col("x")).as("sx"), dsum(col("y")).as("sy"),
      dsum(col("x") * col("y")).as("sxy"),
      dsum(col("x") * col("x")).as("sxx"),
      dsum(col("y") * col("y")).as("syy"))
    totals.crossJoin(fit).select(
      col("n_types").cast("long").as("n_types"),
      col("n_tokens").cast("long").as("n_tokens"),
      col("k").cast("long").as("k_fit"),
      round((col("k") * col("sxy") - col("sx") * col("sy")) /
        (col("k") * col("sxx") - col("sx") * col("sx")), 4).as("slope"),
      round((col("sy") - col("sx") *
        ((col("k") * col("sxy") - col("sx") * col("sy")) /
          (col("k") * col("sxx") - col("sx") * col("sx")))) / col("k"), 4)
        .as("intercept"),
      round(
        ((col("k") * col("sxy") - col("sx") * col("sy")) *
          (col("k") * col("sxy") - col("sx") * col("sy"))) /
          ((col("k") * col("sxx") - col("sx") * col("sx")) *
            (col("k") * col("syy") - col("sy") * col("sy"))), 4).as("r2"))
  }
}
