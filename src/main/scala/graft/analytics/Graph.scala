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

  /** One-time-per-JVM PERSISTED PageRank table over the persisted pair
    * graph — same economics as the pair and cluster tables: the 5-round
    * integer recurrence is a derivation you run once per corpus version,
    * then every composite (survivor selection, rank-weighted sampling)
    * reads it. Rows are exactly [[pageRankPpb]]'s output, so readers
    * share its oracle. */
  def pageRankPpbPersisted(spark: org.apache.spark.sql.SparkSession,
      dir: String, documents: => DataFrame, pairs: => DataFrame,
      threshold: Double, iters: Int = 5): DataFrame =
    graft.sources.ManagedTable.persisted(spark,
      s"neardup_rank_${math.round(threshold * 1000)}_" +
        graft.sources.ManagedTable.tag(dir))(
      pageRankPpb(documents, pairs, iters))

  /** Centrality-weighted survivor selection — the composite the two graph
    * passes exist for: [[graft.ops.Dedup.nearDupClusters]] labels each
    * duplicate family, [[pageRankPpb]] scores how corroborated each member
    * is, and the keep list takes each family's MOST CENTRAL member (ties
    * to the smaller doc_id) instead of the arbitrary minimum id — at
    * pipeline scale, the copy every mirror agrees on, not the one with
    * the lowest key.
    *
    * The per-cluster argmax is ONE grouped max(struct(rank, −doc_id)) —
    * the span-dedup first-owner idiom, map-side combinable, no per-cluster
    * window sort; member counts ride the same aggregation. Singleton docs
    * survive as their own family at the dangling rank. */
  def centralSurvivors(documents: DataFrame, pairs: DataFrame,
      iters: Int = 5): DataFrame =
    centralSurvivorsFrom(graft.ops.Dedup.nearDupClusters(documents, pairs),
      pageRankPpb(documents, pairs, iters))

  /** The composite body off ALREADY-DERIVED label and rank frames — what
    * the registered query runs against the persisted cluster/rank tables:
    * one join and one grouped argmax, no component convergence and no
    * rank rounds on the read path. */
  def centralSurvivorsFrom(labels: DataFrame, ranks: DataFrame): DataFrame =
    labels.join(ranks, Seq("doc_id"))
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_members"),
        max(struct(col("rank_ppb").as("r"), (-col("doc_id")).as("nd"))).as("m"))
      .select(col("cluster_id"), (-col("m.nd")).as("rep_doc_id"),
        col("m.r").as("rep_rank_ppb"), col("n_members"))
      .orderBy(col("cluster_id"))

  /** Per-node triangle count + local clustering coefficient over the
    * near-dup pair graph — the density signal that separates a "template
    * family" (everyone near-duplicates everyone: coefficient → 1) from a
    * "chain of drift" (A~B~C but A!~C: coefficient → 0), which changes
    * what a dedup pass should keep.
    *
    * Triangles are enumerated once in canonical orientation a < b < c
    * (two self-equi-joins of the u<v edge list — the standard
    * compact-forward shape: every wedge b via (a,b),(b,c) is closed by
    * probing (a,c), so no triangle is counted twice and no orientation
    * explosion happens), then credited to each corner by an explode +
    * keyed count. The coefficient is ppb fixed point:
    * `(2·t·1e9) div (deg·(deg−1))` — integer floor division, exact in
    * both engines; deg ≥ 2 whenever t > 0, and deg-1 nodes emit 0.
    *
    * Scale shape: the wedge join shuffles on the shared endpoint, the
    * closing probe is an equi-join on (a, c) — both standard hash joins
    * over the bounded near-dup edge set (already blocked per source by
    * candidate generation), nothing quadratic in the corpus. */
  def triangleStats(documents: DataFrame, pairs: DataFrame): DataFrame = {
    val e = canonicalEdges(pairs)
    assemble(documents, degrees(e), enumeratedTriangles(e))
  }

  /** [[triangleStats]] with the worst-case output BOUNDED — the scale
    * path. Two component families skip enumeration and take the per-node
    * closed form `C(deg, 2)` (every pair of neighbors assumed adjacent):
    *
    *  1. COMPLETE cliques (component edge count = m(m−1)/2 over its m
    *     members — a one-agg test off the persisted cluster labels),
    *     where the closed form is an identity, not an approximation; and
    *  2. components with more than `cap` members, where it is a declared
    *     CLIQUE-CREDIT: a duplicate family that large is template mass
    *     whose density signal has saturated (its nodes report
    *     coeff_ppb = 1e9 exactly), and enumerating its ~C(m,3) triangle
    *     rows measures answer size, not structure — the output-cubic
    *     blow-up the 10× soak exposed.
    *
    * Only components that are small AND incomplete are enumerated, so
    * per-task wedge work is bounded by ~cap² regardless of corpus size.
    * The DuckDB oracle implements the same labeled-component rule, so
    * the cap is oracle-checked, not a silent Spark-side fudge; `cap` is
    * chosen so BOTH branches run at the gate SF.
    *
    * The small-component edge set and the closed-component id list are
    * eagerly checkpointed: the wedge join references its input three
    * times, and re-deriving the label anti-join per reference tripled
    * the query's cost when this read plans lazily.
    */
  def triangleStatsCapped(documents: DataFrame, pairs: DataFrame,
      labels: DataFrame, cap: Int = 24): DataFrame = {
    val diskOnly = org.apache.spark.storage.StorageLevel.DISK_ONLY
    val e = canonicalEdges(pairs)
    val deg = degrees(e).localCheckpoint(true, diskOnly)
    val lab = labels.select(col("doc_id").as("node"), col("cluster_id"))
    val sizes = labels.groupBy(col("cluster_id")).agg(count(lit(1)).as("m"))
    // endpoints share a label by construction, so labeling u labels the edge
    val eLab = e.join(lab, col("u") === col("node")).drop("node")
    val edgeCnt = eLab.groupBy(col("cluster_id")).agg(count(lit(1)).as("n_edges"))
    val closed = sizes.join(edgeCnt, "cluster_id")
      .filter(col("m") > cap ||
        col("n_edges") * 2 === col("m") * (col("m") - 1))
      .select(col("cluster_id"))
      .localCheckpoint(true, diskOnly)
    val closedTri = deg.join(lab, "node")
      .join(closed, Seq("cluster_id"), "left_semi")
      .select(col("node"), expr("(deg * (deg - 1)) div 2").as("n_triangles"))
    val eSmall = eLab.join(closed, Seq("cluster_id"), "left_anti")
      .select(col("u"), col("v"))
      .localCheckpoint(true, diskOnly)
    assemble(documents, deg,
      enumeratedTriangles(eSmall).unionByName(closedTri))
  }

  /** Canonical undirected u < v edge list of the pair graph. */
  private def canonicalEdges(pairs: DataFrame): DataFrame =
    pairs.filter(col("id_a") < col("id_b"))
      .select(col("id_a").as("u"), col("id_b").as("v"))

  private def degrees(e: DataFrame): DataFrame =
    e.select(col("u").as("node"))
      .unionByName(e.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))

  /** Compact-forward enumeration: every a<b<c wedge via (a,b),(b,c) is
    * closed by probing (a,c), so no triangle is counted twice and no
    * orientation explosion happens; each triangle is credited to its
    * three corners by an explode + keyed count. */
  private def enumeratedTriangles(e: DataFrame): DataFrame =
    e.as("e1")
      .join(e.as("e2"), col("e1.v") === col("e2.u"))
      .select(col("e1.u").as("a"), col("e1.v").as("b"), col("e2.v").as("c"))
      .join(e.as("e3"),
        col("a") === col("e3.u") && col("c") === col("e3.v"), "left_semi")
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))

  private def assemble(documents: DataFrame, deg: DataFrame,
      perNode: DataFrame): DataFrame =
    documents.select(col("doc_id"))
      .join(deg, col("doc_id") === col("node"), "inner")
      .drop("node")
      .join(perNode, col("doc_id") === col("node"), "left_outer")
      .select(col("doc_id"), col("deg"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
      .withColumn("coeff_ppb",
        when(col("deg") < 2, lit(0L)).otherwise(
          expr("(2 * n_triangles * 1000000000L) div (deg * (deg - 1))")))
      .orderBy(col("doc_id"))
}
