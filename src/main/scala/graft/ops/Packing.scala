package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-sequence packing: lay the corpus out as one deterministic
  * token stream (documents concatenated in doc_id order) cut into
  * fixed-capacity packs — the GPT-style pretraining batch layout where a
  * document may straddle a pack boundary and `pack_id` is the pack holding
  * its first token. The assignment is pure integer arithmetic on the
  * global running token total, so it is exact, engine-stable, and
  * recomputable from (doc_id, n_tokens) alone.
  *
  * Scale shape: the running total is
  * [[graft.analytics.GlobalRank.withRunningTotalLong]] — range-partitioned
  * prefix sums, no data-sized single-partition window — and everything
  * after it is a per-row projection. The alternative greedy
  * no-split bin packing is inherently sequential; the streaming-concat
  * layout is what large-scale pipelines actually use precisely because it
  * parallelizes.
  */
object Packing {

  /** Per-document pack assignment under `capacity` tokens per pack:
    * (doc_id, n_tokens, cum_tokens, pack_id, offset_in_pack). */
  def sequencePacks(documents: DataFrame, capacity: Long): DataFrame = {
    require(capacity > 0, s"pack capacity must be positive, got $capacity")
    val toks = documents.select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("n_tokens"))
    graft.analytics.GlobalRank
      .withRunningTotalLong(toks, Seq(col("doc_id")), col("n_tokens"), "cum_tokens")
      .withColumn("pack_id", expr(s"(cum_tokens - n_tokens) DIV $capacity"))
      .withColumn("offset_in_pack", expr(s"(cum_tokens - n_tokens) % $capacity"))
      .select(col("doc_id"), col("n_tokens"), col("cum_tokens"),
        col("pack_id"), col("offset_in_pack"))
      .orderBy(col("doc_id"))
  }
}
