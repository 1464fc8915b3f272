package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators over `documents` (doc_id, text, lang, source,
  * n_chars): token counting, quality scoring, language ID, fingerprinting.
  * All pure `functions._` column expressions — codegen'd, scale-oblivious
  * (per-row map work, no shuffle except final aggregations).
  */
object TextAnalysis {

  /** Whitespace token count; empty/blank text counts 0. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0L))
      .otherwise(size(split(trim(text), "\\s+")).cast("long"))

  /** BPE-ish subword proxy: word chunks, digits, and punctuation runs
    * counted separately (a cheap deterministic stand-in for a real BPE
    * vocab — the regex mirrors the GPT-2 pre-tokenizer's coarse classes). */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+"), lit(0))).cast("long")

  private val stopwords = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "from", "that", "this")

  /** Per-source adaptive quality gate: keep documents whose token count
    * reaches their OWN source's `p`-th percentile — the pipeline pattern
    * where a fixed global threshold would gut a terse-but-clean source
    * while letting a verbose low-quality one through.
    *
    * The percentile is the exact DISCRETE quantile (smallest value whose
    * cumulative count reaches `ceil(p·total)`), computed by counting:
    * one keyed aggregation to (source, value, cnt), cumulative windows
    * partitioned by source over the DISTINCT VALUES only (bounded by the
    * value domain, never document count — the property that keeps the
    * window safe when one source has billions of documents), then a
    * min-over-qualifying-values aggregate. Integer-only throughout, so
    * thresholds and kept/dropped counts hash-match any engine. Contrast
    * `percentile_approx`/interpolated `quantile_cont`: approximate or
    * float-interpolating, neither reproducible bit-for-bit across engines.
    *
    * Returns one row per source: (source, thr, n_docs, n_kept, n_dropped). */
  def adaptiveQualityGate(documents: DataFrame, p: Double = 0.25): DataFrame = {
    require(p > 0 && p <= 1, s"percentile must be in (0,1]: $p")
    import org.apache.spark.sql.expressions.Window
    val toks = documents.select(
      col("doc_id"), col("source"), tokenCount(col("text")).as("n_tokens"))
    val counts = toks.groupBy(col("source"), col("n_tokens"))
      .agg(count(lit(1)).as("cnt"))
    val cumW = Window.partitionBy(col("source")).orderBy(col("n_tokens"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = counts
      .withColumn("cum", sum(col("cnt")).over(cumW))
      .withColumn("total", sum(col("cnt")).over(Window.partitionBy(col("source"))))
    val thr = cum
      .filter(col("cum") >= ceil(lit(p) * col("total")))
      .groupBy(col("source")).agg(min(col("n_tokens")).as("thr"))
    toks.join(broadcast(thr), "source")
      .groupBy(col("source"), col("thr"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("n_tokens") >= col("thr"), 1L).otherwise(0L)).as("n_kept"))
      .withColumn("n_dropped", col("n_docs") - col("n_kept"))
      .orderBy(col("source"))
  }

  /** Per-document quality metrics: length, token stats, punctuation ratio,
    * stopword ratio, mean token length — the standard cheap filters a
    * pretraining pipeline applies before anything expensive. */
  def qualityMetrics(documents: DataFrame): DataFrame = {
    val toks = split(trim(col("text")), "\\s+")
    documents.select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars_actual"),
      tokenCount(col("text")).as("n_tokens"),
      ((length(col("text")) - length(regexp_replace(col("text"), "[\\.,;:!\\?]", "")))
        .cast("double") / greatest(length(col("text")), lit(1))).as("punct_ratio"),
      (size(array_intersect(transform(toks, t => lower(t)), lit(stopwords.toArray)))
        .cast("double") / greatest(size(toks), lit(1))).as("stopword_ratio"),
      (length(regexp_replace(col("text"), "\\s+", "")).cast("double") /
        greatest(tokenCount(col("text")), lit(1))).as("mean_token_len"))
      .orderBy(col("doc_id"))
  }

  /** Per-document token counts under both tokenizers — the sizing signal
    * a training pipeline budgets with. */
  def tokenCounts(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      tokenCount(col("text")).as("ws_tokens"),
      bpeishTokenCount(col("text")).as("bpe_tokens"))
      .orderBy(col("doc_id"))

  /** Per-language corpus statistics (oracle-checked aggregation). */
  def langStats(documents: DataFrame): DataFrame =
    documents
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        graft.Cols.dsum(tokenCount(col("text")).cast("double")).as("total_tokens"),
        graft.Cols.davg(length(col("text")).cast("double")).as("avg_chars"))
      .orderBy(col("lang"))

  /** Language-ID heuristic: score each candidate language by stopword hits
    * and pick the argmax. Deterministic, vocabulary-driven — the shape a
    * real n-gram identifier (e.g. CLD) takes, with a toy vocab sized to the
    * fixture's five languages. Not oracle-checkable (heuristic), verified
    * against the `lang` label column in tests instead. */
  def langId(documents: DataFrame): DataFrame = {
    val vocab: Map[String, Seq[String]] = Map(
      "en" -> Seq("the", "and", "of", "to", "is", "with", "for"),
      "es" -> Seq("el", "la", "de", "que", "y", "los", "con"),
      "fr" -> Seq("le", "la", "les", "des", "et", "que", "pour"),
      "de" -> Seq("der", "die", "das", "und", "ist", "mit", "von"),
      "zh" -> Seq("的", "是", "在", "了", "和", "有", "不"))
    val toks = transform(split(trim(col("text")), "\\s+"), t => lower(t))
    val scores = vocab.toSeq.sortBy(_._1).map { case (l, ws) =>
      struct(size(array_intersect(toks, lit(ws.toArray))).as("score"), lit(l).as("lang"))
    }
    // hoist the argmax into one column so greatest() is evaluated once
    documents
      .withColumn("_best", greatest(scores: _*))
      .select(
        col("doc_id"),
        col("lang").as("label_lang"),
        col("_best").getField("lang").as("pred_lang"),
        col("_best").getField("score").cast("long").as("score"))
      .orderBy(col("doc_id"))
  }

  /** Top-`k` characteristic terms per document: rank tokens by term
    * frequency, break ties toward rarer corpus-wide document frequency
    * (then token text) — a tf-idf-shaped keyword extractor whose ordering
    * is integer-only, so it is bit-exact across engines (a float tf·idf
    * score can flip ranks in the last ulp between libm implementations).
    *
    * Dataflow: one explode pass → (doc, token) counts (map-side partial) →
    * token document frequencies derived from the SAME aggregated frame
    * (each (doc, token) row counts once, no second scan of the corpus) →
    * key-join back → per-doc top-k window. At 100 TB the exchanges carry
    * (doc, token) and (token) group rows, never raw text. */
  def topTerms(documents: DataFrame, k: Int = 3): DataFrame = {
    val tf = documents
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("raw"))
      .select(col("doc_id"), lower(col("raw")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("tf").desc, col("df").asc, col("token").asc)
    tf.join(df, "token")
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("token"), col("tf"), col("df"), col("rank"))
      .orderBy(col("doc_id"), col("rank"))
  }

  /** Gopher-style repetition metrics (Rae et al. 2021, "Scaling Language
    * Models" §A1.1 quality filters): per document, the token-diversity and
    * repeated-phrase signals used to drop boilerplate/spam —
    *  - `distinct_ratio`: distinct tokens / total tokens,
    *  - `top_token_ratio`: occurrences of the most frequent token / total,
    *  - `top_bigram_ratio`: occurrences of the most frequent bigram /
    *    (total − 1 bigram slots).
    * All ratios are exact integer quotients in doubles (bit-deterministic
    * across engines). Dataflow: one explode pass per n-gram width into
    * (doc, gram) counts with map-side partial aggregation — the exchanges
    * carry group rows, never raw text; empty documents survive via the
    * left join with zeroed metrics. */
  def repetitionMetrics(documents: DataFrame): DataFrame = {
    val base = documents.withColumn("_tk", split(trim(col("text")), "\\s+"))
    val tokStats = base
      .select(col("doc_id"), explode(col("_tk")).as("raw"))
      .filter(col("raw") =!= "")
      .select(col("doc_id"), lower(col("raw")).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_tokens"), count(lit(1)).as("n_distinct"),
        max(col("cnt")).as("top_cnt"))
    val biStats = base
      .select(col("doc_id"), explode(expr(
        "transform(slice(_tk, 1, greatest(size(_tk) - 1, 0)), " +
          "(x, i) -> concat(x, ' ', element_at(_tk, i + 2)))")).as("raw"))
      .select(col("doc_id"), lower(col("raw")).as("bigram"))
      .groupBy(col("doc_id"), col("bigram")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(max(col("cnt")).as("top_bi_cnt"))
    documents.select(col("doc_id"))
      .join(tokStats, Seq("doc_id"), "left")
      .join(biStats, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        (coalesce(col("n_distinct"), lit(0L)).cast("double") /
          greatest(coalesce(col("n_tokens"), lit(0L)), lit(1L)).cast("double"))
          .as("distinct_ratio"),
        (coalesce(col("top_cnt"), lit(0L)).cast("double") /
          greatest(coalesce(col("n_tokens"), lit(0L)), lit(1L)).cast("double"))
          .as("top_token_ratio"),
        (coalesce(col("top_bi_cnt"), lit(0L)).cast("double") /
          greatest(coalesce(col("n_tokens"), lit(0L)) - 1L, lit(1L)).cast("double"))
          .as("top_bigram_ratio"))
      .orderBy(col("doc_id"))
  }

  /** Polynomial rolling-hash fingerprint of the token stream:
    * h = Σ token_hash(t_i) · 31^(n−1−i) (mod 2^64) — order-sensitive, so
    * permuted documents get different fingerprints (unlike a bag-of-words
    * hash). A native expression ([[graft.functions.TokenFingerprint64]])
    * because the wrapping multiply is an error under ANSI SQL arithmetic. */
  def fingerprint(text: Column): Column =
    graft.functions.TokenFingerprint64.tokenFingerprint64(split(trim(text), "\\s+"))

  /** Per-document fingerprint table. */
  def fingerprints(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), fingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id"))

  /** C4-style corpus-wide span deduplication (Raffel et al. 2020, §2.2:
    * "we discarded all but one of any three-sentence span occurring more
    * than once"; the fixture's texts have no sentence boundaries, so the
    * span unit is a non-overlapping `width`-token chunk): every distinct
    * span keeps only its first occurrence — ordered by (doc_id, span
    * index) — and the per-document ledger reports how many of its spans
    * survive. An exact-duplicate document loses every span.
    *
    * Dataflow: one explode pass → the first-occurrence owner per distinct
    * span via min(struct) — a grouped aggregate with map-side partial
    * combine, NOT a window (no per-group sort, and the exchange carries
    * one row per distinct span) — then a key-join back and a per-doc
    * count. At 100 TB both exchanges are hash-shuffles on span text /
    * doc_id; raw text moves once. */
  def spanDedup(documents: DataFrame, width: Int = 5): DataFrame = {
    val spans = documents
      .withColumn("_tk", split(trim(col("text")), "\\s+"))
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, greatest(cast(ceil(size(_tk) / $width.0) as int) - 1, 0))," +
          s" i -> array_join(slice(_tk, i * $width + 1, $width), ' '))"))
        .as(Seq("span_idx", "span")))
      .select(col("doc_id"), col("span_idx").cast("long").as("span_idx"), col("span"))
      .filter(length(trim(col("span"))) > 0)
    val firstOwner = spans
      .groupBy(col("span"))
      .agg(min(struct(col("doc_id"), col("span_idx"))).as("first"))
    val flagged = spans
      .join(firstOwner, "span")
      .select(col("doc_id"),
        (col("doc_id") === col("first.doc_id") &&
          col("span_idx") === col("first.span_idx")).as("kept"))
    documents.select(col("doc_id"))
      .join(flagged.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_spans"),
            sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (coalesce(col("n_spans"), lit(0L)) - coalesce(col("n_kept"), lit(0L)))
          .as("n_dropped"))
      .orderBy(col("doc_id"))
  }

  /** Sliding-window repeated-n-gram contamination (the per-document
    * signal behind exact-substring dedup, Lee et al., "Deduplicating
    * Training Data Makes Language Models Better", ACL 2022): for every
    * document, the count of its sliding `n`-token windows whose n-gram
    * occurs at ≥ 2 positions corpus-wide (any document, including another
    * offset of the same one), plus that count as an exact ppb fraction.
    * Complements [[spanDedup]] (non-overlapping blocks, first-owner
    * dedup) with the OVERLAPPING-window view a substring deduper needs.
    *
    * Scale shape: one tokenize + explode (≈ one row per corpus token,
    * the same volume as the inverted-index build), one map-side-combinable
    * count keyed by n-gram, one equi-join of the span stream back to
    * those counts (shuffle on the n-gram key; AQE handles hot n-grams),
    * one keyed rollup per document. `n_dup · 1e9 div n_ngrams` is BIGINT
    * floor division — order-free and engine-exact. Documents with fewer
    * than `n` tokens have no windows and are dropped. */
  def repeatedNgramStats(documents: DataFrame, n: Int = 5): DataFrame = {
    require(n >= 2 && n <= 16, s"2..16-token windows: $n")
    val toks = filter(split(trim(col("text")), "\\s+"), t => t =!= "")
    // sequence(0, size-n) DESCENDS when size < n — guard to an empty list
    val ngrams = documents
      .withColumn("_tk", toks)
      .filter(size(col("_tk")) >= n)
      .select(col("doc_id"), explode(transform(
        sequence(lit(0), size(col("_tk")) - n),
        i => concat_ws(" ", slice(col("_tk"), i + 1, lit(n))))).as("ng"))
    val counts = ngrams.groupBy(col("ng")).agg(count(lit(1)).as("c"))
    ngrams
      .join(counts, "ng")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_ngrams"),
        sum(when(col("c") >= 2L, 1L).otherwise(0L)).as("n_dup"))
      .withColumn("dup_ppb", expr("n_dup * 1000000000L div n_ngrams"))
      .orderBy(col("doc_id"))
  }

  /** Gopher rule-based quality flags (Rae et al. 2021, §A1.1): the
    * document-level filters a pretraining pipeline applies before any
    * model-based scoring —
    *  - word count within [minWords, maxWords],
    *  - mean word length within [3, 10] characters,
    *  - ≥ 80% of words contain at least one alphabetic character,
    *  - at least `minStopwords` stopword hits (the "ellipsis page" guard).
    * Emits the raw signals, one boolean per rule, and the conjunction as
    * `keep`. Every ratio is an exact integer quotient in doubles —
    * bit-deterministic across engines. Pure per-row map work; the only
    * exchange is the final ORDER BY. */
  def gopherQualityFlags(documents: DataFrame,
      minWords: Int = 50, maxWords: Int = 100000, minStopwords: Int = 2): DataFrame = {
    val toks = split(trim(col("text")), "\\s+")
    val nWords = tokenCount(col("text"))
    val meanLen = length(regexp_replace(col("text"), "\\s+", "")).cast("double") /
      greatest(nWords, lit(1L)).cast("double")
    val alphaFrac = size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("double") /
      greatest(size(toks), lit(1)).cast("double")
    val stopHits = size(array_intersect(transform(toks, t => lower(t)),
      lit(stopwords.toArray))).cast("long")
    documents.select(
      col("doc_id"),
      nWords.as("n_words"),
      meanLen.as("mean_word_len"),
      alphaFrac.as("alpha_word_frac"),
      stopHits.as("stopword_hits"),
      (nWords >= minWords && nWords <= maxWords).as("words_in_range"),
      (meanLen >= 3.0 && meanLen <= 10.0).as("mean_len_ok"),
      (alphaFrac >= 0.8).as("alpha_ok"),
      (stopHits >= minStopwords).as("stopwords_ok"))
      .withColumn("keep",
        col("words_in_range") && col("mean_len_ok") && col("alpha_ok") && col("stopwords_ok"))
      .orderBy(col("doc_id"))
  }

  /** Adjacent-token pair frequencies, top-k — the first merge-candidate
    * table of a BPE-style tokenizer-training pass (Sennrich et al. 2016:
    * each merge step promotes the most frequent adjacent pair). One round
    * here = the corpus-wide pair count at word granularity: per-document
    * pair explosion (narrow), a map-side-combinable count keyed on the
    * pair, and a global top-k that plans as TakeOrderedAndProject — no
    * sorted global shuffle. Ties break lexicographically so the result is
    * total-ordered and engine-exact. */
  /** Token-budget chunking plan: each document split into windows of
    * `maxTokens` whitespace tokens advancing by `stride` (overlap =
    * maxTokens − stride) — the long-document → context-window step of a
    * training pipeline, emitted as a PLAN (doc, chunk ordinal, start
    * token, length) rather than materialized text: pure per-row integer
    * arithmetic + one explode, no shuffle at all until a consumer groups.
    * Every token is covered; the final chunk may be short; empty docs
    * yield no chunks. */
  def chunkPlan(documents: DataFrame, maxTokens: Int = 64, stride: Int = 48): DataFrame = {
    require(stride > 0 && stride <= maxTokens, "0 < stride <= maxTokens")
    val n = when(length(trim(col("text"))) === 0, 0L)
      .otherwise(size(split(trim(col("text")), "\\s+")).cast("long"))
    documents
      .select(col("doc_id"), n.as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .select(col("doc_id"), col("n_tokens"),
        explode(expr(s"sequence(0, CAST((n_tokens - 1) DIV $stride AS INT))")).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        (col("chunk_idx").cast("long") * stride + 1).as("start_tok"),
        least(lit(maxTokens.toLong),
          col("n_tokens") - col("chunk_idx").cast("long") * stride).as("n_toks"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  /** Per-language character-trigram profile, top-k by frequency — the
    * feature table an n-gram language identifier trains on (Cavnar &
    * Trenkle 1994), over the raw character stream (whitespace included:
    * word-boundary trigrams are the discriminative ones). Narrow explode,
    * map-side-combinable counts keyed on (lang, trigram), per-lang top-k
    * via a rank-filtered window (WindowGroupLimit pre-trim). */
  def charTrigramProfile(documents: DataFrame, k: Int = 10): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("cnt").desc, col("trigram"))
    documents
      .filter(length(col("text")) >= 3)
      .select(col("lang"), explode(expr(
        "transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))"))
        .as("trigram"))
      .groupBy(col("lang"), col("trigram"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .orderBy(col("lang"), col("rnk"))
  }

  def bpeMergePairs(documents: DataFrame, k: Int = 20): DataFrame =
    documents
      .select(filter(split(trim(col("text")), "\\s+"), t => t =!= "").as("t"))
      .filter(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(t) - 1), i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"))
        .as("pair"))
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(k)

  /** Log-template mining (Drain-lite): collapse each raw message to its
    * TEMPLATE by masking numeric runs with `<num>` and keeping the first
    * `prefixTokens` whitespace tokens, then aggregate per template — the
    * "group my million log lines into 50 shapes" operation every
    * observability store ends up running. A full Drain builds a parse tree
    * with wildcard promotion; masking + fixed-depth prefix is the
    * deterministic core that covers numeric-variance templates, and being
    * pure string algebra it is oracle-checkable (a similarity-threshold
    * tree is not).
    *
    * `frame` must carry (msg, group_key: long, ts). Dataflow: per-row
    * regexp + split (codegen'd map work), ONE keyed aggregation on the
    * template string (map-side combine collapses each partition to its
    * distinct templates first — at 100 TB the exchange carries one row
    * per (partition, template), not per log line). */
  def logTemplates(frame: DataFrame, prefixTokens: Int = 8): DataFrame = {
    val tpl = array_join(
      slice(split(trim(regexp_replace(col("msg"), "[0-9]+", "<num>")), "\\s+"),
        1, prefixTokens), " ")
    frame
      .select(tpl.as("template"), col("group_key"), col("ts"))
      .groupBy(col("template"))
      .agg(
        count(lit(1)).as("n_msgs"),
        countDistinct(col("group_key")).as("n_keys"),
        min(col("ts")).as("first_seen"),
        max(col("ts")).as("last_seen"))
      .orderBy(col("n_msgs").desc, col("template"))
  }
}
