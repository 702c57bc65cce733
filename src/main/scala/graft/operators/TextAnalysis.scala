package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for corpus curation (BASELINE.json north star):
  * language ID (token-list heuristic), quality scoring, token counting,
  * document fingerprinting. Pure Column expressions — codegen'd end to
  * end, no UDFs, embarrassingly parallel at any scale, and every formula
  * is mirrored verbatim in the DuckDB oracles.
  */
object TextAnalysis {

  /** ASCII-word token count (whitespace+punct agnostic). */
  def tokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z0-9]+"))

  /** GPT-2-style pre-tokenizer pattern, restricted to the Java-regex ∩
    * RE2 subset both engines execute identically: English contractions,
    * optionally space-prefixed letter runs / digit runs / punctuation
    * runs, then whitespace runs. The original's trailing-space
    * lookahead (`\s+(?!\S)`) is dropped (RE2 has no lookaround) — the
    * count differs from GPT-2's only in how multi-space gaps group,
    * which a budget estimator doesn't care about. */
  val bpePattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** BPE-ish token count: the standard "how many tokens will the
    * tokenizer emit" estimator a token-budget pipeline runs BEFORE the
    * real (vocab-dependent) tokenizer exists — GPT-2's pre-tokenizer
    * split, whose piece count upper-bounds and tracks the merged BPE
    * count. Pure codegen'd `regexp_count`: zero-shuffle, mirrored
    * verbatim in the DuckDB oracle. */
  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit(bpePattern))

  /** Indicator token lists per language for the langId heuristic.
    * Deliberately tiny — the operator shape (N scored profiles → argmax
    * with deterministic tie-break) is what matters; real profiles are a
    * config concern. Ordered: ties resolve to the first (lexicographic). */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("join", "merge", "sort", "stream"),
    "en" -> Seq("the", "fast", "small", "a"),
    "es" -> Seq("row", "data", "query", "value"),
    "zh" -> Seq("scan", "table", "hash", "key"))

  /** Hits of `wordList` among whitespace tokens of `text` (with
    * multiplicity). */
  def profileHits(text: Column, wordList: Seq[String]): Column =
    size(filter(split(text, " "), t =>
      t.isin(wordList.map(_.asInstanceOf[Any]): _*)))

  /** Heuristic language ID: argmax of profile hits, first-profile wins
    * ties (evaluation order = langProfiles order = lexicographic). */
  def langId(text: Column): Column = {
    val hits = langProfiles.map { case (lang, words) =>
      lang -> profileHits(text, words)
    }
    // lang_i wins iff hits_i >= hits_j for all j (first winner kept)
    val cases = hits.map { case (lang, h) =>
      val geAll = hits.map(_._2).map(o => h >= o).reduce(_ && _)
      (geAll, lang)
    }
    cases.foldRight(lit("und"): Column) { case ((cond, lang), acc) =>
      when(cond, lit(lang)).otherwise(acc)
    }
  }

  /** PII redaction patterns — deliberately in the common subset of Java
    * regex (Spark) and RE2 (DuckDB/the oracle): character classes, `\b`,
    * bounded repetition; no lookaround, no backrefs. Order matters:
    * emails first (their local parts may contain digit runs), then IPv4,
    * then bare long digit runs (phone/account-number shaped). */
  val piiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b" -> "<IP>",
    "\\b\\d{9,}\\b" -> "<NUM>")

  /** Scrub emails, IPv4 addresses, and ≥9-digit runs from `text`,
    * replacing each span with a typed placeholder — the standard PII
    * pass of a training-data pipeline. Pure chained `regexp_replace`:
    * codegen'd, embarrassingly parallel, no shuffle. (Real deployments
    * extend [[piiPatterns]]; the operator shape is the point.) */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (re, tag)) =>
      regexp_replace(c, re, tag)
    }

  /** HTML → visible text (the crawl-extraction step upstream of every
    * other text operator; the jusText/trafilatura slot, rule-tier).
    * Deterministic chain, each step mirrored 1:1 by the q_html_extract
    * DuckDB oracle:
    *   1. `<script…>…</script>` and `<style…>…</style>` blocks removed
    *      wholly (case-insensitive, dot-matches-newline, non-greedy);
    *   2. HTML comments `<!-- … -->` removed;
    *   3. every remaining tag `<[^>]*>` → one space (block/inline
    *      distinction is irrelevant once whitespace collapses);
    *   4. the five XML entities + `&nbsp;` decoded (`&amp;` LAST, and
    *      replace() never rescans its own output, so `&amp;lt;`
    *      correctly yields literal text `&lt;` — both engines'
    *      replace share that left-to-right-over-input contract);
    *   5. whitespace runs `[\x09-\x0D ]+` collapsed to one space, trim.
    * Explicit `[\x09-\x0D ]` classes instead of `\s` throughout: Java
    * regex counts `\x0B` as `\s`, RE2 does not — the one place the two
    * engines' shorthand classes diverge.
    * Pure chained regexp_replace: codegen'd, zero exchanges — rides
    * the ingest scan at 100 TB like [[redactPii]]. */
  def htmlExtract(html: Column): Column = {
    val noScript = regexp_replace(html,
      "(?is)<script\\b[^>]*>.*?</script[\\x09-\\x0D ]*>", " ")
    val noStyle = regexp_replace(noScript,
      "(?is)<style\\b[^>]*>.*?</style[\\x09-\\x0D ]*>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]*>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, ch)) => replace(c, lit(e), lit(ch)) }
    trim(regexp_replace(decoded, "[\\x09-\\x0D ]+", " "))
  }

  /** Punctuation character count. */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.,!?;:]", ""))

  /** Composite quality score in [0,1]:
    *   0.4·min(tokens/50, 1)            (length signal)
    *   + 0.3·(1 − punct/chars)          (noise signal)
    *   + 0.3·min(avgTokenLen/8, 1)      (vocabulary signal)
    * The exact weights are illustrative; the operator is the shape. */
  def qualityScore(text: Column): Column = {
    val toks = tokenCount(text).cast("double")
    val chars = length(text).cast("double")
    val punct = punctCount(text).cast("double")
    val avgTokLen =
      (chars - (length(text) - length(replace(text, lit(" "), lit(""))))) /
        greatest(toks, lit(1.0))
    lit(0.4) * least(toks / lit(50.0), lit(1.0)) +
      lit(0.3) * (lit(1.0) - punct / greatest(chars, lit(1.0))) +
      lit(0.3) * least(avgTokLen / lit(8.0), lit(1.0))
  }

  /** Domain-level quality gate — curation at SOURCE granularity (the
    * CCNet/RefinedWeb move: a domain whose AVERAGE document quality is
    * low is dropped wholesale, catching boilerplate farms whose
    * individual pages each sneak past a per-doc threshold).
    *
    * Output: surviving docs as (idCol, srcCol, quality,
    * src_mean_quality), quality = [[qualityScore]] rounded half-up at
    * 4dp (+1e-9 tie-break, the q_quality convention).
    *
    * Cross-engine determinism of the MEAN: a float avg() is
    * summation-order-dependent, so the per-source mean is computed as
    * an EXACT integer sum of the 4dp-quantized scores (×10⁴ → long —
    * the q_mean_pool pattern) divided by the exact count; both engines
    * then perform the identical two FP divisions. The threshold
    * compares against that unrounded deterministic double.
    *
    * Scale shape: one vocabulary-bounded agg (exchange carries one row
    * per SOURCE, not per doc) + a broadcast of the surviving-source
    * stats back onto the corpus — zero corpus-side shuffles. At
    * web-crawl domain cardinality (~10⁷) the broadcast is ~100 MB of
    * (domain, mean) rows — still broadcast-viable; past that, drop the
    * broadcast hint and let the join shuffle on the source key. */
  def domainQualityFilter(df: DataFrame, idCol: String, srcCol: String,
      textCol: String, minMean: Double): DataFrame = {
    val perDoc = df.select(col(idCol), col(srcCol),
      round(qualityScore(col(textCol)) + lit(1e-9), 4).as("quality"))
    val qi = round(col("quality") * lit(1e4)).cast("long")
    val srcStats = perDoc.groupBy(col(srcCol))
      .agg(sum(qi).as("__sq"), count(lit(1)).as("__n"))
      .withColumn("__mean",
        col("__sq").cast("double") / col("__n") / lit(1e4))
      .filter(col("__mean") >= lit(minMean))
      .select(col(srcCol),
        round(col("__mean") + lit(1e-9), 6).as("src_mean_quality"))
    perDoc.join(broadcast(srcStats), Seq(srcCol))
      .select(col(idCol), col(srcCol), col("quality"),
        col("src_mean_quality"))
  }

  /** Lowercased `[a-z0-9]+` token stream (the [[tokenCount]] tokens,
    * case-folded) — shared by the unigram-LM scorer. */
  def lmTokens(textCol: String): Column =
    expr(s"regexp_extract_all(lower($textCol), '[a-z0-9]+', 0)")

  /** Train a unigram language model over a corpus: `(token, logp)` with
    * `logp = log2(count/total)`. The frequency table is the model — its
    * size is the VOCABULARY, not the corpus, so the one exchange here is
    * vocabulary-bounded (map-side partial counts), and the table joins
    * against scored corpora by token key (no broadcast assumption: real
    * vocabs outgrow broadcast; AQE picks the strategy). */
  def unigramLm(corpus: DataFrame, textCol: String): DataFrame = {
    val counts = corpus
      .select(explode(lmTokens(textCol)).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    // one scalar to the driver: the corpus token total (model-sized)
    val total = counts.agg(sum("cnt")).head().getLong(0)
    counts.select(col("token"),
      log2(col("cnt").cast("double") / total).as("logp"))
  }

  /** Score documents by mean negative log2 unigram probability — "bits
    * per token", the perplexity-filter shape of CCNet/Gopher cleaning
    * (low bits ≈ stereotypical text, high bits ≈ rare-token noise; real
    * pipelines threshold both tails). Out-of-vocabulary tokens cost
    * `oovBits` (default 30 ≈ a one-in-a-billion token). Docs with zero
    * tokens are omitted (no token stream to score).
    *
    * Plan: explode → vocabulary-keyed join → per-doc avg: two linear
    * shuffles (tokens, then doc keys), no window, no driver data. */
  def lmBitsPerToken(df: DataFrame, idCol: String, textCol: String,
      lm: DataFrame, oovBits: Double = 30.0): DataFrame =
    df.select(col(idCol), explode(lmTokens(textCol)).as("token"))
      .join(lm, Seq("token"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"),
        avg(-coalesce(col("logp"), lit(-oovBits))).as("bits_per_token"))

  /** Per-row bigram pairs from the token array — ZERO-shuffle (array
    * slice + zip, no window/self-join): `(w1, w2)` structs. */
  private[operators] def bigramsCol(textCol: String): Column = {
    val ts = lmTokens(textCol)
    filter(
      zip_with(
        slice(ts, lit(1), greatest(size(ts) - 1, lit(0))),
        slice(ts, lit(2), greatest(size(ts) - 1, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2"))),
      p => p.getField("w2").isNotNull)
  }

  /** Train an add-k-smoothed bigram language model: `(w1, w2, logp)`
    * with `logp = log2((c(w1,w2)+k) / (c(w1)+k·V))`, `c(w1)` the
    * count of w1 as a bigram CONTEXT and V the corpus vocabulary —
    * the conditional-probability upgrade of [[unigramLm]] (the CCNet
    * perplexity filter uses a 5-gram KenLM; the bigram captures the
    * local-coherence signal the unigram cannot: scrambled text scores
    * like clean text under a unigram model, high-bits under this
    * one). Three vocabulary-bounded aggregations, one model-sized
    * scalar (V) to the driver, no window. */
  def bigramLm(corpus: DataFrame, textCol: String,
      addK: Double = 0.5): DataFrame = {
    val pairs = corpus.select(explode(bigramsCol(textCol)).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    val c12 = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val c1 = pairs.groupBy("w1").agg(count(lit(1)).as("c1"))
    val v = corpus.select(explode(lmTokens(textCol)).as("t"))
      .agg(countDistinct("t")).head().getLong(0)
    c12.join(c1, "w1")
      .select(col("w1"), col("w2"),
        log2((col("c12") + lit(addK)) / (col("c1") + lit(addK * v)))
          .as("logp"))
  }

  /** Score documents by mean negative log2 bigram probability — the
    * conditional-coherence variant of [[lmBitsPerToken]]. Unseen
    * bigrams cost `oovBits`; docs with fewer than two tokens have no
    * bigram stream and are omitted. Same two-linear-shuffle plan. */
  def bigramBitsPerToken(df: DataFrame, idCol: String, textCol: String,
      lm: DataFrame, oovBits: Double = 30.0): DataFrame =
    df.select(col(idCol), explode(bigramsCol(textCol)).as("p"))
      .select(col(idCol), col("p.w1").as("w1"), col("p.w2").as("w2"))
      .join(lm, Seq("w1", "w2"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"),
        avg(-coalesce(col("logp"), lit(-oovBits))).as("bits_per_token"))

  /** Cross-document duplicate n-gram coverage: per doc, the fraction of
    * its word-n-gram OCCURRENCES whose n-gram also appears in at least
    * one OTHER document — the corpus-level complement of the per-doc
    * Gopher repetition rules, and the cheap flag for near-template docs
    * that exact/LSH dedup misses (a page that is 80% shared boilerplate
    * plus a unique 20% hashes uniquely and rarely crosses an LSH
    * threshold, but scores ~0.8 here). Output: `(idCol, n_grams,
    * n_shared, dup_coverage)`; docs with < n tokens keep 0s.
    *
    * Scale shape: per-(doc, gram) multiplicities aggregate map-side
    * before anything exchanges; gram document-frequency is a second agg
    * whose exchange is bounded by the distinct-gram vocabulary; the
    * join back is gram-keyed (AQE handles hot grams); the final agg is
    * doc-keyed. No all-pairs term anywhere — cost is O(total grams)
    * rows through two linear shuffles, same family as
    * [[lmBitsPerToken]]. */
  def crossDocCoverage(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    // r14: the gram is a pure group/join KEY (never output, never in
    // the oracle) — hash it to a long before the exchanges so both
    // aggs and the join move 8 bytes instead of an n-word string
    // (xxhash64; collision merges two grams — the signature-tier
    // trust model)
    val perDoc = df
      .select(col(idCol),
        explode(Dedup.wordShingles(col(textCol), n)).as("__gs"))
      .select(col(idCol), xxhash64(col("__gs")).as("g"))
      .groupBy(col(idCol), col("g"))
      .agg(count(lit(1)).as("m"))
    // docs-per-gram: perDoc already has one row per (doc, gram)
    val docFreq = perDoc.groupBy("g").agg(count(lit(1)).as("ndocs"))
    val cov = perDoc.join(docFreq, "g")
      .groupBy(col(idCol))
      .agg(sum(col("m")).as("n_grams"),
        sum(when(col("ndocs") >= 2, col("m")).otherwise(0L)).as("n_shared"))
    df.select(col(idCol)).join(cov, Seq(idCol), "left")
      .na.fill(0L, Seq("n_grams", "n_shared"))
      .withColumn("dup_coverage",
        when(col("n_grams") > 0,
          col("n_shared").cast("double") / col("n_grams"))
          .otherwise(lit(0.0)))
  }

  /** Duplicate-span detection — the word-level analog of exact-substring
    * training-data dedup (Lee et al. 2021, "Deduplicating Training Data
    * Makes Language Models Better": any substring that appears more than
    * once in the corpus is a removal candidate). A word n-gram is
    * DUPLICATED when its total occurrence count across the corpus is
    * ≥ 2 — a second copy anywhere, another document or the same one.
    * Per document, the start positions of duplicated n-grams merge into
    * maximal spans: starts p < p' share a span when p' − p ≤ n (their
    * n-word windows overlap or abut). Output: one row per span —
    * `(idCol, span_start, span_end, n_dup_grams)`, end exclusive, word
    * indices.
    *
    * Scale shape: O(total grams) position rows flow through exactly two
    * keyed exchanges (gram-count aggregation, which combines map-side,
    * then the gram equi-join back) plus one per-doc window — no
    * all-pairs term and no driver data. The reference technique's
    * suffix array is a sequential single-node structure; this is the
    * shuffle-native equivalent at n-gram resolution (spans shorter than
    * n words are below the detection floor, exactly like the suffix
    * -array pipeline's min-match-length). Ultra-frequent grams cost one
    * dictionary row each; AQE's skew join splits the position side if
    * one gram dominates a partition. */
  def duplicateSpans(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    // gram hashed to a long for the count agg + join back (key-only —
    // spans are reported as positions; xxhash64 trust model as above)
    val pos = df.select(col(idCol),
        posexplode(Dedup.wordShingles(col(textCol), n)).as(Seq("pos", "__gs")))
      .select(col(idCol), col("pos"), xxhash64(col("__gs")).as("g"))
    val dupGrams = pos.groupBy("g").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2)
    val w = Window.partitionBy(idCol).orderBy("pos")
    pos.join(dupGrams.select("g"), "g")
      // first row of a doc: lag is null → comparison null → otherwise(1)
      .withColumn("new_span",
        when(col("pos") - lag("pos", 1).over(w) <= n, lit(0)).otherwise(lit(1)))
      .withColumn("span_id", sum("new_span").over(w))
      .groupBy(col(idCol), col("span_id"))
      .agg(min("pos").as("span_start"),
        (max(col("pos")) + lit(n)).as("span_end"),
        count(lit(1)).as("n_dup_grams"))
      .drop("span_id")
  }

  /** The destructive half of exact-substring dedup: drop every word
    * covered by a duplicated span and rebuild the text. Docs with no
    * duplicated spans pass through unchanged. The per-doc span list is
    * collected into an array column (spans per doc are bounded by
    * words/n, and merged spans are far fewer), so the removal itself is
    * a narrow per-row filter over the token array with its index — no
    * extra shuffle beyond [[duplicateSpans]]' own. */
  def stripDuplicateSpans(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    val spans = duplicateSpans(df, idCol, textCol, n)
      .groupBy(idCol)
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("spans"))
    df.join(spans, Seq(idCol), "left")
      .withColumn("spans", coalesce(col("spans"),
        array().cast("array<struct<span_start:int,span_end:int>>")))
      .withColumn("clean_text", concat_ws(" ",
        filter(split(col(textCol), " "), (t, i) =>
          !exists(col("spans"), s =>
            i >= s.getField("span_start") && i < s.getField("span_end")))))
      .drop("spans")
  }

  /** Canonical-form fingerprint: md5 of lowercased text with every
    * non-alphanumeric run collapsed to one space, trimmed — robust to
    * whitespace/punct/case edits (rolling-hash-class dedup key). */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "[^a-z0-9]+", " ")))

  /** Fraction of an array taken by its most frequent element — computed
    * per ROW (sort + one fold over the sorted array tracking the longest
    * equal run), so the whole repetition family is a narrow projection:
    * no explode, no per-doc groupBy, nothing leaves the input partition.
    * Empty arrays score 0. */
  def maxRunFrac(arr: Column): Column = {
    val folded = aggregate(
      array_sort(arr),
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1)
          .otherwise(lit(1))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    when(size(arr) > 0,
      folded.cast("double") / size(arr).cast("double")).otherwise(lit(0.0))
  }

  /** Repetition / boilerplate signals (the Gopher-style quality rules
    * every corpus-curation pipeline applies before training):
    *  - `top_token_frac`    — share of tokens taken by the most frequent
    *    token (catches keyword stuffing / degenerate repetition);
    *  - `top_bigram_frac`   — share of word 2-grams taken by the most
    *    frequent 2-gram (catches phrase-level loops);
    *  - `dup_sent_frac`     — 1 − distinct/total over '. '-split
    *    sentences (catches copy-pasted boilerplate blocks).
    * All three are per-row Column expressions over the token/shingle
    * arrays — codegen-friendly narrow maps at any corpus size. */
  /** Gopher-style document-quality rule battery (Rae et al. 2021,
    * "Scaling Language Models: ... Gopher", §A1.1 — public paper;
    * thresholds verbatim). Each rule is an independent boolean column so
    * a pipeline can audit WHICH rule rejected a document (the paper's
    * ablation workflow); `keep` is their conjunction.
    *
    *  - r_wordcount:   50 ≤ word count ≤ 100,000
    *  - r_meanwordlen: 3 ≤ mean word character length ≤ 10
    *  - r_symbol:      (#'#' + #'...') / words < 0.1
    *  - r_bullet:      < 90% of lines start with a bullet
    *  - r_ellipsis:    < 30% of lines end with an ellipsis
    *  - r_alpha:       ≥ 80% of words contain ≥ 1 alphabetic char
    *  - r_stopwords:   ≥ 2 distinct of the 8 Gopher stop words present
    *
    * Every term is a codegen'd regexp/arithmetic fold over the row —
    * zero shuffles, trivially whole-stage at 100 TB. All expressions are
    * RE2 ∩ Java-regex so the DuckDB oracle mirrors them verbatim;
    * fractions are IEEE-double quotients of exact integers, so threshold
    * comparisons are engine-independent. */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  def gopherRules(text: Column): Column = {
    val words = tokenCount(text).cast("double")
    val wordLenSum =
      length(regexp_replace(text, lit("[^A-Za-z0-9]+"), lit(""))).cast("double")
    val meanWordLen = wordLenSum / greatest(words, lit(1.0))
    val symbols =
      (regexp_count(text, lit("#")) + regexp_count(text, lit("\\.\\.\\."))).cast("double")
    val lines = greatest(regexp_count(text, lit("\n")) + lit(1), lit(1)).cast("double")
    val bulletLines =
      regexp_count(text, lit("(?m)^\\s*(?:-|\\*|•)")).cast("double")
    val ellipsisLines =
      regexp_count(text, lit("(?m)\\.\\.\\.\\s*$")).cast("double")
    val alphaWords = regexp_count(text, lit("[A-Za-z0-9]*[A-Za-z][A-Za-z0-9]*")).cast("double")
    // presence via whitespace-split membership (not a regex): `$`-anchor
    // semantics differ between Java regex and RE2 on texts ending in a
    // newline, and membership is the cheaper op anyway
    val stopHits = gopherStopwords
      .map(w => when(array_contains(split(text, " "), w), 1).otherwise(0))
      .reduce(_ + _)
    struct(
      (words >= 50 && words <= 100000).as("r_wordcount"),
      (meanWordLen >= 3.0 && meanWordLen <= 10.0).as("r_meanwordlen"),
      (symbols / greatest(words, lit(1.0)) < 0.1).as("r_symbol"),
      (bulletLines / lines < 0.9).as("r_bullet"),
      (ellipsisLines / lines < 0.3).as("r_ellipsis"),
      (alphaWords / greatest(words, lit(1.0)) >= 0.8).as("r_alpha"),
      (stopHits >= 2).as("r_stopwords"))
  }

  def topTokenFrac(text: Column): Column =
    maxRunFrac(split(text, " "))

  def topBigramFrac(text: Column): Column =
    maxRunFrac(graft.functions.WordShingles(text, 2))

  def dupSentFrac(text: Column): Column = {
    val sents = split(text, "\\. ")
    when(size(sents) > 0,
      lit(1.0) - size(array_distinct(sents)).cast("double") /
        size(sents).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Corpus-level TF-IDF keyword extraction: the `k` highest-scoring
    * terms per document, `tfidf = tf · (ln((N+1)/(df+1)) + 1)` (the
    * smoothed formulation; tf = in-doc occurrences over whitespace
    * tokens, df = docs containing the term).
    *
    * Scale shape, stage by stage:
    *  - `tf`: explode → groupBy (doc, term) — map-side partial counts,
    *    shuffle keyed by (doc, term), no hot key possible (a doc bounds
    *    its own tokens);
    *  - `df`: per-row `array_distinct` (narrow) → groupBy(term) — the
    *    exchange is bounded by VOCABULARY, not corpus size;
    *  - the corpus count rides in as a broadcast 1-row frame (no
    *    window-over-everything);
    *  - score join keyed on term: stop words make the probe side skewed
    *    — AQE skew-join splits them (the build side has one row per
    *    term); the final top-k window partitions by doc (bounded by
    *    per-doc vocabulary). */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val total = df.agg(count(lit(1)).as("__N"))
    val tf = df
      .select(col(idCol), explode(split(col(textCol), " ")).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = df
      .select(explode(array_distinct(split(col(textCol), " "))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(idCol)
      .orderBy(col("tfidf").desc, col("term").asc)
    tf.join(dfreq, "term")
      .crossJoin(broadcast(total))
      .withColumn("tfidf",
        col("tf") * (log((col("__N") + 1).cast("double") /
          (col("df") + 1).cast("double")) + 1))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("term"), col("tfidf"))
  }

  /** Corpus-level frequent n-grams (heavy hitters) with occurrence
    * counts — the "what template phrases dominate this crawl" audit that
    * feeds boilerplate rules and stop-phrase lists. One narrow explode of
    * per-row shingles (multiset — repeated phrases in one doc count every
    * time) into ONE aggregation whose exchange is bounded by n-gram
    * vocabulary (map-side partials absorb the duplication), then a
    * TakeOrdered top-k (per-partition heap + driver merge of
    * partitions·k rows, nothing global). Ties break lexicographically
    * for determinism. */
  def topNgrams(df: DataFrame, textCol: String, n: Int, k: Int): DataFrame = {
    require(n >= 1 && k >= 1, "n and k must be >= 1")
    df.select(explode(Dedup.wordShingles(col(textCol), n)).as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("ngram").asc)
      .limit(k)
  }

  /** Tokenizer-fertility audit per group (typically language):
    * `(n_docs, chars, pieces, chars_per_piece, pieces_per_word)` from
    * the BPE-ish piece counter vs whitespace words — the multilingual
    * curation table that exposes which languages a tokenizer fragments
    * (low chars/piece, high pieces/word ⇒ that slice pays more compute
    * per character; re-balance budgets or retrain the vocab).
    *
    * One narrow per-row count projection + one group-keyed agg of exact
    * integer sums (exchange bounded by |groups|); the two ratios are
    * single double divisions of exact sums — engine-reproducible. */
  def tokenizerFertility(df: DataFrame, groupCol: String,
      textCol: String): DataFrame =
    df.select(col(groupCol),
        bpeTokenCount(col(textCol)).cast("long").as("__nb"),
        tokenCount(col(textCol)).cast("long").as("__nw"),
        length(col(textCol)).cast("long").as("__nc"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__nc")).as("chars"),
        sum(col("__nb")).as("pieces"),
        (sum(col("__nc")).cast("double") / sum(col("__nb")).cast("double"))
          .as("chars_per_piece"),
        (sum(col("__nb")).cast("double") / sum(col("__nw")).cast("double"))
          .as("pieces_per_word"))

  /** PMI collocations: the `k` adjacent word pairs whose observed
    * bigram frequency most exceeds the independence expectation,
    *
    *   pmi(w1 w2) = ln( (c2 · T1 · T1) / (T2 · c1(w1) · c1(w2)) )
    *
    * (c2 = bigram count, c1 = unigram counts, T1/T2 = corpus totals) —
    * the Church-Hanks collocation measure that feeds stop-phrase lists
    * and tokenizer-merge audits. `minCount` suppresses the classic PMI
    * pathology (hapax pairs score highest); rank on the UNROUNDED score,
    * bigram asc tie-break.
    *
    * Scale: both count tables are VOCABULARY-bounded aggregations of one
    * narrow explode each; the scoring joins are keyed on single terms
    * (vocab-sized build sides); totals ride in as broadcast 1-row
    * frames. Determinism: every input to the score is an exact integer,
    * and the product/division order is fixed, so the double is
    * bit-identical across partitionings and engines. */
  def pmiCollocations(df: DataFrame, textCol: String, k: Int,
      minCount: Long = 5): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val uni = df
      .select(explode(split(col(textCol), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("term").agg(count(lit(1)).as("c1"))
    val big = df
      .select(explode(Dedup.wordShingles(col(textCol), 2)).as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("c2"))
    val t1 = uni.agg(sum(col("c1")).cast("double").as("__T1"))
    val t2 = big.agg(sum(col("c2")).cast("double").as("__T2"))
    val ua = uni.select(col("term").as("__w1"), col("c1").as("__c1a"))
    val ub = uni.select(col("term").as("__w2"), col("c1").as("__c1b"))
    big.filter(col("c2") >= minCount)
      .withColumn("__w1", split(col("ngram"), " ").getItem(0))
      .withColumn("__w2", split(col("ngram"), " ").getItem(1))
      .join(ua, "__w1").join(ub, "__w2")
      .crossJoin(broadcast(t1)).crossJoin(broadcast(t2))
      .withColumn("__praw",
        log((col("c2").cast("double") * col("__T1") * col("__T1")) /
          (col("__T2") * col("__c1a") * col("__c1b"))))
      .orderBy(col("__praw").desc, col("ngram").asc)
      .limit(k)
      .select(col("ngram"), col("c2").as("cnt"),
        round(col("__praw") + lit(1e-9), 6).as("pmi"))
  }

  /** Zipf rank-frequency fit over the corpus vocabulary: OLS of
    * ln(count) on ln(rank) (rank = 1-based frequency rank, count-desc /
    * term-asc). Returns ONE row `(n_terms, alpha, intercept)` with
    * `alpha = -slope` — the "does this crawl look like natural
    * language" corpus audit (natural text ≈ 1.0; a template farm or
    * synthetic corpus shows up as a flat or cliffed curve).
    *
    * Scale: a vocabulary-bounded count agg, one vocabulary-sized global
    * rank (sorting a term dictionary, not the corpus), and a 1-row
    * moment aggregation. The rank needs exact per-term positions (ln of
    * the rank — unlike [[graft.operators.Drift.gini]] no tie closed
    * form exists), so the window is inherently single-partition over
    * the dictionary: the vocabulary is counted FIRST (on the persisted
    * counts, no second corpus scan) and the fit fails fast past
    * `maxTerms` instead of silently funneling an unbounded dictionary
    * through one sort partition. Determinism: all four moment sums
    * route through decimal(30,12) (an order-dependent double sum would
    * wobble in the last ulp across partitionings); ln of identical
    * doubles is bit-stable. */
  def zipfFit(df: DataFrame, textCol: String,
      maxTerms: Long = 5000000L): DataFrame = {
    val counts = df
      .select(explode(split(col(textCol), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("term").agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nv = counts.count()
      if (nv > maxTerms) throw new IllegalArgumentException(
        s"zipfFit vocabulary has $nv distinct terms (> maxTerms=" +
          s"$maxTerms): the exact rank is a single-partition sort of " +
          "the dictionary — pre-filter the vocabulary (min count, " +
          "frequency floor) or raise maxTerms deliberately")
      val ranked = counts
        .withColumn("rank", row_number().over(
          Window.orderBy(col("c").desc, col("term").asc)))
        .select(log(col("rank").cast("double")).as("x"),
          log(col("c").cast("double")).as("y"))
      def dsum(c: Column) = sum(c.cast("decimal(30,12)")).cast("double")
      ranked
        .agg(count(lit(1)).as("n_terms"), dsum(col("x")).as("sx"),
          dsum(col("y")).as("sy"), dsum(col("x") * col("y")).as("sxy"),
          dsum(col("x") * col("x")).as("sxx"))
        .withColumn("__slope",
          (col("n_terms") * col("sxy") - col("sx") * col("sy")) /
            (col("n_terms") * col("sxx") - col("sx") * col("sx")))
        .select(col("n_terms"),
          round(-col("__slope") + lit(1e-9), 6).as("alpha"),
          round((col("sy") - col("__slope") * col("sx")) /
            col("n_terms").cast("double") + lit(1e-9), 6).as("intercept"))
        .localCheckpoint(true)
    } finally counts.unpersist(false)
  }

  /** Word n-gram novelty vs a reference slice — the "how much of this
    * document is NEW text" audit (the complement of
    * [[crossDocDupCoverage]]'s duplication view): for each doc, the
    * fraction of its word `n`-grams absent from the n-gram set of the
    * `refPred` docs. Low novelty against a known-clean reference means
    * templated/recycled text; near-1 novelty against the training
    * corpus is what an eval set should score (the q_contamination
    * check, inverted to a per-doc ratio).
    *
    *   novelty = n_unseen / n_ngrams   (null when the doc has no
    *   n-grams — fewer than n tokens)
    *
    * — one exact-integer division, engine-reproducible.
    *
    * Tokens are the house `[A-Za-z0-9]+` extraction; n-grams join on
    * space. Docs shorter than `n` tokens get an EMPTY n-gram array
    * explicitly (`sequence(1, 0)` steps DOWN in Spark — the epochMix
    * lesson — so the guard is a `when`, not an empty sequence).
    *
    * Scale shape: the reference n-gram set is distinct-aggregated once
    * (vocabulary-bounded exchange) and met with an n-gram-keyed LEFT
    * join — both sides hash on the n-gram, no single hot partition (a
    * doc bounds its own n-grams). At 100 TB reference scale, swap the
    * equi-join for a bloom pre-filter ([[Dedup.exactDedupAgainst]]'s
    * move); the exact join here is the recall-lossless tier. */
  def ngramNovelty(df: DataFrame, idCol: String, textCol: String,
      refPred: Column, n: Int = 3): DataFrame = {
    require(n >= 1, "n must be >= 1")
    val toksRaw =
      regexp_extract_all(col(textCol), lit("[A-Za-z0-9]+"), lit(0))
    // bind the token array to a lambda variable before the per-gram
    // lambda references it: higher-order lambdas evaluate interpreted
    // and Catalyst does not CSE across lambda boundaries, so an
    // unbound `toks` re-runs the FULL regexp extraction for every
    // (gram, position) pair — n+2 extractions per gram instead of one
    // per row (the Similarity.quantize lesson, same fix)
    val grams = element_at(transform(array(toksRaw), tk =>
      when(size(tk) >= n,
        transform(sequence(lit(1), size(tk) - (n - 1)), i =>
          concat_ws(" ", (0 until n).map(j => element_at(tk, i + j)): _*)))
        .otherwise(array())), 1)
    // gram hashed to a long for the distinct + join (key-only; the
    // when() guard keeps explode_outer's null marker — xxhash64 itself
    // never returns null)
    val exploded = df.select(col(idCol), col(textCol), refPred.as("__isref"))
      .withColumn("__g0", explode_outer(grams))
      .select(col(idCol), col("__isref"),
        when(col("__g0").isNotNull, xxhash64(col("__g0"))).as("__g"))
    val ref = exploded.filter(col("__isref"))
      .select(col("__g")).where(col("__g").isNotNull).distinct()
      .withColumn("__seen", lit(1))
    exploded
      .join(ref, Seq("__g"), "left")
      .groupBy(col(idCol))
      .agg(
        count(col("__g")).as("n_ngrams"),
        sum(when(col("__g").isNotNull && col("__seen").isNull, 1L)
          .otherwise(0L)).as("n_unseen"))
      .withColumn("novelty",
        when(col("n_ngrams") > 0,
          col("n_unseen").cast("double") / col("n_ngrams").cast("double")))
  }
}
