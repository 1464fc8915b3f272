package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end pretraining-corpus cleaning pipeline — the composition the
  * individual operators exist for: cheap per-row quality gates first, then
  * exact dedup, then MinHash near-dedup, emitting the surviving corpus
  * plus a per-stage attrition ledger.
  *
  * Stage order follows cost: O(row) filters cut the corpus before any
  * shuffle; the exact-dedup shuffle carries 16-byte hashes; the near-dedup
  * candidate join runs last over the smallest surviving set. At 100 TB
  * each stage is a narrow pass or a key-only shuffle — nothing quadratic,
  * nothing collected to the driver.
  */
object CleanPipeline {

  final case class Thresholds(
      minTokens: Long = 5,
      maxTokens: Long = 100000,
      maxPunctRatio: Double = 0.3,
      minStopwordRatio: Double = 0.0,
      nearDupJaccard: Double = 0.5)

  /** Apply the pipeline; returns the kept documents with a `drop_reason`
    * of NULL, or the dropped ones tagged by the first stage that cut them
    * (`quality`, `exact_dup`, `near_dup`). The near-dup tier is pluggable
    * (`nearDupPairs`: survivors → pair frame with an `id_b` column);
    * default is MinHash+LSH banding, [[cleanCharJaccard]] swaps in the
    * character-set tier. */
  def clean(documents: DataFrame, t: Thresholds = Thresholds(),
      nearDupPairs: DataFrame => DataFrame = null): DataFrame = {
    val nearTier: DataFrame => DataFrame =
      if (nearDupPairs != null) nearDupPairs
      else d => Dedup.minHashPairs(d, threshold = t.nearDupJaccard)
    val metrics = TextAnalysis.qualityMetrics(documents)
      .select(col("doc_id"), col("n_tokens"), col("punct_ratio"), col("stopword_ratio"))
    val withMetrics = documents.join(metrics, "doc_id")

    val qualityFail = col("n_tokens") < t.minTokens ||
      col("n_tokens") > t.maxTokens ||
      col("punct_ratio") > t.maxPunctRatio ||
      col("stopword_ratio") < t.minStopwordRatio

    val qualityKept = withMetrics.filter(!qualityFail)

    // exact dedup among quality survivors: min doc_id per text hash wins
    val exactDrops = Dedup.exactDropList(qualityKept)
      .select(col("doc_id"), lit("exact_dup").as("drop_reason"))

    val afterExact = qualityKept.join(exactDrops.select("doc_id"), Seq("doc_id"), "left_anti")

    // near-dedup among exact survivors: in each surviving pair, the larger
    // doc_id drops
    val nearDrops = nearTier(afterExact)
      .select(col("id_b").as("doc_id"))
      .distinct()
      .select(col("doc_id"), lit("near_dup").as("drop_reason"))

    val reasons = withMetrics.filter(qualityFail)
      .select(col("doc_id"), lit("quality").as("drop_reason"))
      .unionByName(exactDrops)
      .unionByName(nearDrops)

    documents
      .join(reasons, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("lang"), col("source"), col("drop_reason"))
      .orderBy(col("doc_id"))
  }

  /** [[clean]] with the char-jaccard near-dup tier — every stage (incl.
    * near-dup, via DuckDB's native `jaccard()`) is SQL-oracle-checkable by
    * an independent engine. */
  def cleanCharJaccard(documents: DataFrame, threshold: Double = 0.9,
      t: Thresholds = Thresholds()): DataFrame =
    clean(documents, t, d => Dedup.charJaccardPairs(d, threshold))

  /** Per-stage attrition counts. */
  def attrition(cleaned: DataFrame): DataFrame =
    cleaned
      .groupBy(coalesce(col("drop_reason"), lit("kept")).as("stage"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("stage"))
}
