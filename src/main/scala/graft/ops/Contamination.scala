package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark-contamination check — the train-vs-eval n-gram overlap audit
  * every serious pretraining pipeline runs (cf. the GPT-3 and PaLM
  * appendices on train/test overlap): for each training document, the
  * fraction of its distinct word n-grams that also appear anywhere in the
  * held-out evaluation set.
  *
  * Dataflow, sized for 100 TB of train against a benchmark-sized eval
  * side: both sides shingle with the same fused native pass
  * ([[graft.functions.WordShingles]]); the eval set reduces to DISTINCT
  * shingles (benchmark corpora are tiny — thousands of docs — so this
  * frame is broadcastable; the explicit `broadcast` hint keeps the train
  * side from shuffling); the train side explodes (doc_id, shingle) rows,
  * left-joins the eval set, and aggregates per document. The exchanges
  * carry shingle strings of the eval side only.
  */
object Contamination {

  /** Per-train-doc contamination: (doc_id, n_shingles, n_contaminated,
    * contamination ratio). `n` is the shingle width; ratio is an exact
    * integer quotient in doubles (deterministic across engines). */
  def benchmarkOverlap(train: DataFrame, eval: DataFrame, n: Int = 3): DataFrame = {
    val evalGrams = eval
      .select(explode(Dedup.shingles(col("text"), n)).as("sh"))
      .distinct()
    val trainGrams = train
      .select(col("doc_id"), explode(Dedup.shingles(col("text"), n)).as("sh"))
    trainGrams
      .join(broadcast(evalGrams.withColumn("hit", lit(1))), Seq("sh"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_shingles"),
        count(col("hit")).as("n_contaminated"))
      .withColumn("contamination",
        col("n_contaminated").cast("double") / col("n_shingles").cast("double"))
      .orderBy(col("doc_id"))
  }

  /** Cross-source overlap matrix: for every source pair, how many RARE
    * shingles both emit — the governance report that catches two feeds
    * scraping the same upstream before they get mixed into a corpus.
    * Distinct (shingle, source) pairs reduce first; shingles appearing in
    * more than `maxDf` documents are dropped — boilerplate shingles carry
    * no provenance signal AND are exactly the hot keys that would skew the
    * self-join, so the filter is both the statistics and the scale fix.
    * The pair join is a shingle-keyed equi-join over the rare survivors;
    * output is at most |sources|² rows. */
  def sourceOverlap(documents: DataFrame, n: Int = 3, maxDf: Int = 10): DataFrame = {
    val sh = documents
      .select(col("source"), col("doc_id"), explode(Dedup.shingles(col("text"), n)).as("sh"))
    val df = sh.groupBy(col("sh")).agg(countDistinct(col("doc_id")).as("df"))
    // snapshotted: `rare` is the SMALL frame by construction (df ≤ maxDf
    // kills every common shingle) yet feeds both self-join sides — without
    // the snapshot the corpus-sized shingle explode and the df aggregation
    // would each run twice
    val rare = sh
      .join(df.filter(col("df") <= maxDf), "sh")
      .select(col("sh"), col("source")).distinct()
      .localCheckpoint(true)
    rare.as("a")
      .join(rare.as("b"),
        col("a.sh") === col("b.sh") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("shared_shingles"))
      .orderBy(col("source_a"), col("source_b"))
  }
}
