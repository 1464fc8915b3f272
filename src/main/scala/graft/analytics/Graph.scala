package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph centrality over the near-dup pair graph — the companion to the
  * connected-components pass in [[graft.ops.Dedup.nearDupClusters]]: CC
  * tells you WHICH documents form a duplicate family, PageRank tells you
  * which member is most CENTRAL (most corroborated by near-duplicates),
  * the signal pipelines use to pick a canonical representative or to
  * weight quality scores by redundancy.
  *
  * Cross-engine exactness: ranks are BIGINT parts-per-billion throughout.
  * Each iteration computes `contrib = pr div deg` (integer floor
  * division; all values nonnegative, so Spark's truncating `div` and
  * DuckDB's flooring `//` agree) and
  * `pr' = 150_000_000 + (85 * Σ contrib) div 100` — no doubles anywhere,
  * so partial-aggregation order cannot change a bit, and a FIXED
  * iteration count (no convergence test) lets the DuckDB oracle unroll
  * the same levels as plain CTEs.
  *
  * Scale shape: the symmetric edge list is checkpointed once (candidate
  * generation must not re-run per round); each of the `iters` rounds is
  * the standard Pregel message step — one hash join of the O(|V|) rank
  * frame onto the O(|E|) edge list and one keyed sum, two shuffles, both
  * on the node key. Degrees are computed once and reattached by join.
  * Documents with no near-dup edge are not graph nodes; they surface with
  * the dangling rank 0.15 ppb-scaled via the final left join.
  */
object Graph {

  def pageRankPpb(documents: DataFrame, pairs: DataFrame,
      iters: Int = 5): DataFrame = {
    val diskOnly = org.apache.spark.storage.StorageLevel.DISK_ONLY
    // symmetric directed view of the undirected (id_a < id_b) pair set
    val edges = pairs
      .select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint(true, diskOnly)
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val out = edges.join(deg, "src") // (src, dst, deg)
    var ranks = deg.select(col("src").as("node"),
      lit(1000000000L).as("pr"))
    for (_ <- 1 to iters) {
      // every node has deg >= 1 and an inbound edge (symmetric graph),
      // so the keyed sum re-covers the full node set each round
      ranks = out.join(ranks, col("src") === col("node"))
        .select(col("dst"), expr("pr div deg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
        .select(col("dst").as("node"),
          (lit(150000000L) + expr("(85 * s) div 100")).as("pr"))
    }
    documents.select(col("doc_id"))
      .join(ranks, col("doc_id") === col("node"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("pr"), lit(150000000L)).as("rank_ppb"))
      .orderBy(col("doc_id"))
  }
}
