package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting/mixing for training-data pipelines.
  *
  * Everything keys off a CONTENT hash (the order-sensitive token
  * fingerprint, [[TextAnalysis.fingerprint]]), not off row ids or RNG:
  *  - re-runs and retries assign identically (no seed plumbing, no
  *    shuffle-order sensitivity) on any cluster layout;
  *  - byte-identical duplicates land in the same split, so near-miss
  *    train/test leakage from unnoticed dup pairs cannot happen through
  *    the splitter;
  *  - the assignment is a pure per-row projection — no shuffle, no state,
  *    100 TB = one narrow pass.
  */
object Sampling {

  /** Bucket in [0, buckets) from the content fingerprint. */
  private def bucket(text: Column, buckets: Int): Column =
    pmod(TextAnalysis.fingerprint(text), lit(buckets.toLong))

  /** Per-document split assignment: first `trainPct` fingerprint buckets →
    * train, next `valPct` → val, rest → test. */
  def assignSplit(documents: DataFrame, trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100, "bad split percentages")
    val b = bucket(col("text"), 100)
    documents.select(
      col("doc_id"),
      col("lang"),
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test").as("split"))
  }

  /** Split sizes per language — the sanity report a pipeline logs. */
  def splitCounts(documents: DataFrame, trainPct: Int = 90, valPct: Int = 5): DataFrame =
    assignSplit(documents, trainPct, valPct)
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"), col("split"))

  /** Weighted source mixing: keep each document with its source's sampling
    * rate (in basis points out of 10⁶), decided by fingerprint bucket —
    * the deterministic analogue of `sampleBy`, reproducible across runs
    * and engines. Sources absent from `ratesPpm` are dropped. */
  def mixSources(documents: DataFrame, ratesPpm: Map[String, Long]): DataFrame = {
    val rate = ratesPpm.foldLeft(lit(0L)) { case (acc, (src, ppm)) =>
      when(col("source") === src, lit(ppm)).otherwise(acc)
    }
    documents.filter(bucket(col("text"), 1000000) < rate)
  }

  /** Post-mix per-source counts (the mixture audit). */
  def mixCounts(documents: DataFrame, ratesPpm: Map[String, Long]): DataFrame =
    mixSources(documents, ratesPpm)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"))
      .orderBy(col("source"))

  /** Deterministic per-language eval sample: the k documents per lang
    * with the smallest (fingerprint, doc_id) — pseudorandom by content,
    * identical on every run and engine, so an eval set drawn this way is
    * reproducible without storing it. Rank-filtered window →
    * WindowGroupLimit pre-trims each partition to its local k. */
  def evalSample(documents: DataFrame, k: Int = 5): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("fp"), col("doc_id"))
    documents
      .select(col("lang"), col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .orderBy(col("lang"), col("rnk"))
  }

  /** Train/eval leakage audit: NEAR-duplicate pairs whose members landed
    * in DIFFERENT splits, counted per split-pair cell. Exact duplicates
    * cannot cross the splitter (assignment is a pure content-hash
    * function), but near-duplicates can — this is the pre-training report
    * that quantifies how much, composing the MinHash-LSH pair detector
    * with the split assignment. Pair frame is LSH-banded (never all
    * pairs); the two split lookups are doc-keyed joins. */
  def crossSplitLeakage(documents: DataFrame,
      trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    val splits = assignSplit(documents, trainPct, valPct)
      .select(col("doc_id"), col("split"))
    Dedup.minHashPairs(documents, n = 3, k = 64, bands = 16, threshold = 0.5)
      .select(col("id_a"), col("id_b"))
      .join(splits.select(col("doc_id").as("id_a"), col("split").as("sa")), "id_a")
      .join(splits.select(col("doc_id").as("id_b"), col("split").as("sb")), "id_b")
      .select(least(col("sa"), col("sb")).as("split_a"),
        greatest(col("sa"), col("sb")).as("split_b"))
      .groupBy(col("split_a"), col("split_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("split_a"), col("split_b"))
  }

  /** Deterministic global training order: every document gets a 1-based
    * position in a content-hash-shuffled sequence — the reproducible
    * "global shuffle" a training run needs so that restarts, re-runs, and
    * different cluster layouts all feed batches in the same order. Ordering
    * key is (fingerprint, doc_id): pseudorandom by content, total by id.
    * The global position comes from [[graft.analytics.GlobalRank]]'s range-
    * exchange row number — one range shuffle, no single-partition window,
    * so the sequencing itself holds at any corpus size. */
  def trainOrder(documents: DataFrame): DataFrame =
    graft.analytics.GlobalRank.withRowNumber(
      documents.select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp")),
      Seq(col("fp"), col("doc_id")), "pos")
      .select(col("doc_id"), col("fp"), col("pos"))
      .orderBy(col("pos"))

  /** Domain balancing: cap each source's contribution at its `cap` best
    * documents, ranked by whitespace token count (desc, doc_id tie) — the
    * curation step that stops one crawl domain from dominating the mix
    * (the complement of [[mixSources]]' rate-based downsampling: a hard
    * per-domain ceiling with a quality order instead of a random keep).
    *
    * Scale shape: one (source)-keyed ranking window; WindowGroupLimit
    * trims every partition to its local top-`cap` BEFORE the exchange, so
    * the shuffle carries at most `cap` rows per (partition, source) no
    * matter how many billions of documents a hot domain has. */
  def domainCap(documents: DataFrame, cap: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source"))
      .orderBy(col("n_tokens").desc, col("doc_id"))
    documents
      .select(col("doc_id"), col("source"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= cap)
      .orderBy(col("source"), col("rnk"))
  }

  /** Hashed n-gram IMPORTANCE WEIGHTS for domain-targeted data selection
    * (the DSIR shape — Xie et al. 2023, "Data Selection for Language
    * Models via Importance Resampling": featurize with hashed unigrams +
    * bigrams, fit target vs raw bucket distributions, score every raw
    * document by how target-like its features are, resample by weight).
    *
    * Score semantics, integer-exact on both engines: with Laplace-(+1)
    * bucket probabilities p_t(b) = (c_t(b)+1)/(C_t+B) and p_r likewise,
    * a document scores Σ over its feature occurrences of
    * (p_t(b) − p_r(b)) in fixed-point ppb — the first-order expansion of
    * DSIR's log-likelihood ratio Σ log(p_t/p_r) around p_t ≈ p_r, chosen
    * because a transcendental log can differ in the last ulp across
    * engines while ppb floor-division hash-matches exactly (the
    * q_lm_score precedent). Positive = more target-like than raw-like.
    * Documents with no tokens produce no row (no features, no evidence).
    *
    * Scale shape: the feature explode is corpus-token-sized but feeds
    * only two keyed integer aggregations — per-bucket counts (≤ B rows,
    * map-side combined, BROADCAST back) and the per-doc score sum — so
    * nothing document-sized ever shuffles and no all-pairs structure
    * exists. The explode is deliberately NOT snapshotted: it is bigger
    * than the corpus itself, and recomputing tokenization twice beats
    * materializing a token-level frame at 100 TB. `buckets` must be a
    * power of two so `hash & (B−1)` means the same unsigned residue on
    * both engines' integer types. */
  /** The hashed unigram∪bigram feature-occurrence frame (doc_id, source,
    * b) shared by the linear and LLR scorers. The explode is deliberately
    * NOT snapshotted (see [[importanceWeights]]). */
  private def featureOcc(documents: DataFrame, buckets: Int): DataFrame = {
    val tk = filter(split(trim(col("text")), "\\s+"), t => t =!= "")
    // unigrams ∪ bigrams, the DSIR featurization; sequence() is guarded
    // because Spark's sequence(1, 0) steps DOWNWARD instead of emitting
    // an empty array
    val feats = concat(col("_tk"),
      when(size(col("_tk")) < 2, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), size(col("_tk")) - 1),
          i => concat_ws(" ", element_at(col("_tk"), i),
            element_at(col("_tk"), i + 1)))))
    documents
      .withColumn("_tk", tk)
      .select(col("doc_id"), col("source"), explode(feats).as("f"))
      .select(col("doc_id"), col("source"),
        graft.functions.Fnv1a64Str.fnv1a64(col("f"))
          .bitwiseAND(lit(buckets - 1L)).as("b"))
  }

  /** One-time PERSISTED DSIR state for a STANDING corpus: the per-bucket
    * per-source feature totals (b, source, n) — at most B·|sources| rows,
    * the ENTIRE sufficient statistic of the importance model (Laplace
    * bucket probabilities need nothing but these counts), and
    * target-AGNOSTIC (any targetSources split derives from it by a
    * broadcast-sized aggregation, so one table serves every target
    * choice). Counts over disjoint doc sets ADD, so arrivals maintain the
    * table with one delta-only tokenize — the corpus is never re-read.
    * Same memoized build-once economics as
    * [[graft.ops.Search.invertedIndexPersisted]]; `suffix` keys tables
    * built over different base corpora under one dir. */
  def importanceCountsPersisted(spark: org.apache.spark.sql.SparkSession,
      dir: String, baseDocs: => DataFrame, buckets: Int = 4096,
      suffix: String = "_base"): DataFrame =
    graft.sources.ManagedTable.persisted(spark,
      s"dsir_bcounts_${buckets}${suffix}_" +
        graft.sources.ManagedTable.tag(dir))(
      featureOcc(baseDocs, buckets)
        .groupBy(col("b"), col("source")).agg(count(lit(1)).as("n")))

  /** INCREMENTAL DSIR — importance-score a newly-arrived delta batch at
    * cost ∝ delta, the arrival-time operation a curation pipeline
    * actually runs (score the arrivals against the corpus-wide model to
    * decide keep/resample; the standing corpus was scored when it was
    * selected): the persisted ≤B·|sources|-row count table
    * ([[importanceCountsPersisted]]) absorbs the delta's bucket counts
    * with ONE delta-only tokenize — counts over disjoint doc sets add —
    * and the delta's raw documents score through a broadcast of the
    * merged ppb table. Nothing corpus-sized is read, tokenized, or
    * shuffled anywhere.
    *
    * The recomposition is exact, not approximate: the merged counts
    * equal the full corpus's, so the emitted rows are bit-identical to
    * [[importanceWeights]] over (base ∪ delta) RESTRICTED to the delta's
    * raw documents — the oracle states exactly that slice. Base/delta
    * doc_id sets must be disjoint (the incremental family's standing
    * contract). EAGER: the delta's bucketed occurrences are snapshotted
    * (they feed the count merge AND the scoring join). */
  def importanceWeightsIncremental(spark: org.apache.spark.sql.SparkSession,
      dir: String, baseDocs: => DataFrame, deltaDocs: DataFrame,
      targetSources: Seq[String] = Seq("src1", "src7"),
      buckets: Int = 4096): DataFrame = {
    require(buckets > 0 && (buckets & (buckets - 1)) == 0,
      "buckets must be a power of two")
    require(targetSources.nonEmpty, "need at least one target source")
    val bcounts = importanceCountsPersisted(spark, dir, baseDocs, buckets)
    val dOcc = featureOcc(deltaDocs, buckets)
      .groupBy(col("doc_id"), col("source"), col("b"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val isTarget = col("source").isin(targetSources: _*)
    // merged ≤B-row bucket counts: base totals + the delta's — the model
    // state after absorbing the arrivals. Snapshotted like
    // importanceWeights' counts (two consumers: totals and ppb).
    val counts = bcounts
      .unionByName(dOcc.groupBy(col("b"), col("source"))
        .agg(sum(col("n")).as("n")))
      .groupBy(col("b")).agg(
        sum(when(isTarget, col("n")).otherwise(0L)).as("c_t"),
        sum(when(isTarget, 0L).otherwise(col("n"))).as("c_r"))
      .localCheckpoint(true)
    val totals = counts.agg(
      coalesce(sum(col("c_t")), lit(0L)).as("n_t"),
      coalesce(sum(col("c_r")), lit(0L)).as("n_r"))
    // identical ppb expressions to importanceWeights (decimal(38,0)
    // overflow guard and all) — `div` yields LONG on both paths
    val ppb = counts.crossJoin(broadcast(totals))
      .select(col("b"),
        expr(s"cast(c_t + 1 as decimal(38,0)) * 1000000000 div (n_t + $buckets)")
          .as("ppb_t"),
        expr(s"cast(c_r + 1 as decimal(38,0)) * 1000000000 div (n_r + $buckets)")
          .as("ppb_r"))
    dOcc.filter(!isTarget)
      .join(broadcast(ppb), "b")
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).as("n_feats"),
        sum(col("n") * (col("ppb_t") - col("ppb_r"))).as("score_ppb"))
      .withColumn("mean_ppb", expr("score_ppb div n_feats"))
      .orderBy(col("doc_id"))
  }

  def importanceWeights(documents: DataFrame,
      targetSources: Seq[String] = Seq("src1", "src7"),
      buckets: Int = 4096): DataFrame = {
    require(buckets > 0 && (buckets & (buckets - 1)) == 0,
      "buckets must be a power of two")
    require(targetSources.nonEmpty, "need at least one target source")
    val occ = featureOcc(documents, buckets)
    val isTarget = col("source").isin(targetSources: _*)
    // SNAPSHOTTED (eager localCheckpoint, ≤ B rows — memory-safe at any
    // corpus size) because it has two consumers, `totals` and `ppb`:
    // without the snapshot Catalyst re-derives the totals leg from
    // lineage and the corpus tokenize+explode runs THREE times, not the
    // two the docstring promises (measured in PLANS.md: the counts
    // subtree appeared twice, each with its own full Generate+scan)
    val counts = occ.groupBy(col("b")).agg(
      sum(when(isTarget, 1L).otherwise(0L)).as("c_t"),
      sum(when(isTarget, 0L).otherwise(1L)).as("c_r"))
      .localCheckpoint(true)
    // 1-row totals frame: crossJoin(broadcast) keeps the query one lazy
    // plan (no driver-side collect) — the Stats.scala precedent
    val totals = counts.agg(
      coalesce(sum(col("c_t")), lit(0L)).as("n_t"),
      coalesce(sum(col("c_r")), lit(0L)).as("n_r"))
    // (c+1)·10⁹ is computed in decimal(38,0), NOT bigint: per-bucket
    // feature counts pass Long.MaxValue/10⁹ ≈ 9.2e9 at roughly 10 TB of
    // text under the default 4096 buckets, and a silent bigint wrap here
    // would diverge from the oracle's int128 exactly in the corpus-scale
    // regime this operator targets. `div` on decimals is still integral
    // (floor toward zero on positives), and the quotient is ≤ 10⁹ so the
    // bigint result column is safe.
    val ppb = counts.crossJoin(broadcast(totals))
      .select(col("b"),
        expr(s"cast(c_t + 1 as decimal(38,0)) * 1000000000 div (n_t + $buckets)")
          .as("ppb_t"),
        expr(s"cast(c_r + 1 as decimal(38,0)) * 1000000000 div (n_r + $buckets)")
          .as("ppb_r"))
    occ.filter(!isTarget)
      .join(broadcast(ppb), "b")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"),
        sum(col("ppb_t") - col("ppb_r")).as("score_ppb"))
      .withColumn("mean_ppb", expr("score_ppb div n_feats"))
      .orderBy(col("doc_id"))
  }

  /** 256-entry mantissa table for the fixed-point base-2 log: entry m =
    * floor(log2(1 + m/256) · 10⁹). Computed ONCE here and embedded as a
    * literal in both engines' plans ([[graft.OracleSql]] prints the same
    * values), so no engine ever evaluates a transcendental at query time
    * — the cross-engine hash-exactness requirement that rules out native
    * `ln`. */
  private[graft] val Log2Table: IndexedSeq[Long] =
    (0 until 256).map(m =>
      math.floor(math.log1p(m / 256.0) / math.log(2.0) * 1e9).toLong)

  /** Fixed-point floor(log2(x) · 10⁹ + ε) for a POSITIVE integer column,
    * exact-by-construction on both engines: the exponent comes from the
    * binary digit count (`conv`/`to_base` string length — integer, never
    * a float log), the mantissa's top 8 bits index [[Log2Table]]. Max
    * error vs true log2 is log2(1 + 1/256) ≈ 0.0056 — a RANKING score,
    * not a probability; what matters is that both engines compute the
    * identical integer. */
  private[graft] def log2Fp(x: Column): Column = {
    val e = (length(conv(x, 10, 2)) - 1).cast("int")
    val m = (when(e >= 8, call_function("shiftright", x, e - 8))
      .otherwise(call_function("shiftleft", x, lit(8) - e)) - 256L).cast("int")
    e.cast("long") * lit(1000000000L) +
      element_at(typedLit(Log2Table), m + 1)
  }

  /** EXACT-LLR importance weights — [[importanceWeights]] with the score
    * upgraded from the first-order (p_t − p_r) expansion to DSIR's true
    * log-likelihood ratio Σ log(p_t(b)/p_r(b)), kept integer-exact via
    * [[log2Fp]]: with Laplace probabilities p = (c+1)/(C+B),
    *
    *   Σ_occ log2(p_t/p_r) = Σ_occ [L(c_t+1) − L(c_r+1)]
    *                         − n_feats · [L(C_t+B) − L(C_r+B)]
    *
    * where L is the fixed-point log2 — computed on the RAW COUNTS, so
    * unlike the ppb path nothing is floored before the log and no
    * overflow-prone ×10⁹ multiply exists (counts stay far below 2⁶³).
    * The linear score ranks by ABSOLUTE probability-mass difference
    * (dominated by frequent features); the LLR ranks by RELATIVE odds
    * (a rare feature 10× more likely under the target outweighs a
    * frequent one 1.1× more likely) — the fixture delta is pinned in
    * SamplingSpec. Scale shape identical to the linear scorer: two
    * corpus tokenize passes, a ≤B-row broadcast, one per-doc sum. */
  def importanceWeightsLlr(documents: DataFrame,
      targetSources: Seq[String] = Seq("src1", "src7"),
      buckets: Int = 4096): DataFrame = {
    require(buckets > 0 && (buckets & (buckets - 1)) == 0,
      "buckets must be a power of two")
    require(targetSources.nonEmpty, "need at least one target source")
    val occ = featureOcc(documents, buckets)
    val isTarget = col("source").isin(targetSources: _*)
    val counts = occ.groupBy(col("b")).agg(
      sum(when(isTarget, 1L).otherwise(0L)).as("c_t"),
      sum(when(isTarget, 0L).otherwise(1L)).as("c_r"))
      .localCheckpoint(true)
    val perBucket = counts.select(col("b"),
      (log2Fp(col("c_t") + 1L) - log2Fp(col("c_r") + 1L)).as("l_diff"))
    // 1-row frame: the denominators' log difference, applied per feature
    val totals = counts.agg(
      (log2Fp(coalesce(sum(col("c_t")), lit(0L)) + buckets.toLong) -
        log2Fp(coalesce(sum(col("c_r")), lit(0L)) + buckets.toLong)).as("l0"))
    occ.filter(!isTarget)
      .join(broadcast(perBucket), "b")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"), sum(col("l_diff")).as("_s"))
      .crossJoin(broadcast(totals))
      .select(col("doc_id"), col("n_feats"),
        (col("_s") - col("n_feats") * col("l0")).as("score_llr"))
      .orderBy(col("doc_id"))
  }

  /** The RESAMPLE step over [[importanceWeights]] — DSIR's selection made
    * deterministic and engine-exact: within each raw source, keep the top
    * ceil(n_src · keepPerMille / 1000) documents by
    * (score_ppb DESC, doc_id ASC) — a quota draw of the most target-like
    * documents per source, with the doc_id tiebreak making the cut a
    * total order both engines rank identically (sampling by hashed
    * Gumbel noise would be just as deterministic but its exp/log weights
    * are not integer-replicable; the quota-rank formulation keeps the
    * whole pipeline BIGINT-exact).
    *
    * Scale shape: the per-source ranking runs through
    * [[graft.analytics.GlobalRank.withRunningTotalsLong]]'s
    * range-partitioned stitch — a handful of sources over billions of
    * rows is exactly the degenerate case where a naive
    * `Window.partitionBy(source)` collapses to one task per source —
    * and the quotas are a ≤|sources|-row broadcast. The weights frame is
    * snapshotted once (doc-sized, three columns) because it feeds both
    * the quota count and the ranking; re-deriving it would re-run the
    * two corpus tokenize passes per consumer. */
  def importanceResample(documents: DataFrame,
      targetSources: Seq[String] = Seq("src1", "src7"),
      buckets: Int = 4096, keepPerMille: Int = 200): DataFrame = {
    require(keepPerMille >= 0 && keepPerMille <= 1000,
      "keepPerMille is a fraction of each source in thousandths")
    val w = importanceWeights(documents, targetSources, buckets)
      .select(col("doc_id"), col("score_ppb"))
      .join(documents.select(col("doc_id"), col("source")), "doc_id")
      // DISK_ONLY: one row per raw document — corpus-row-sized, the
      // nearDupClusters storage convention
      .localCheckpoint(true, org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val quotas = w.groupBy(col("source")).agg(count(lit(1)).as("n_src"))
      .withColumn("quota", expr(s"(n_src * $keepPerMille + 999) div 1000"))
    graft.analytics.GlobalRank.withRunningTotalsLong(w, Seq("source"),
      Seq(col("score_ppb").desc, col("doc_id").asc), Seq(lit(1L) -> "rk"))
      .join(broadcast(quotas), "source")
      .filter(col("rk") <= col("quota"))
      .select(col("doc_id"), col("source"), col("score_ppb"), col("rk"))
      .orderBy(col("source"), col("rk"))
  }

  /** The selection audit over [[importanceWeights]]: per-source counts of
    * raw documents whose importance score is positive (more target-like
    * than raw-like) vs total — the one-glance report of WHERE a
    * DSIR-style selection would draw from. Two keyed integer aggs over
    * the (already doc-sized) weight frame. */
  def importanceMix(documents: DataFrame,
      targetSources: Seq[String] = Seq("src1", "src7"),
      buckets: Int = 4096): DataFrame =
    importanceWeights(documents, targetSources, buckets)
      .join(documents.select(col("doc_id"), col("source")), "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("score_ppb") > 0, 1L).otherwise(0L)).as("n_selected"))
      .orderBy(col("source"))
}
