package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor surface over an `array<float>` embedding
  * column (the `embeddings` fixture: vec_id, embedding[64], label).
  *
  * Two tiers, mirroring how an ANN index degrades gracefully at scale:
  *  - [[bruteForceTopK]] — exact baseline; probes broadcast, one pass over
  *    the corpus, per-probe top-k. Correctness oracle for everything else.
  *  - [[lshTopK]] — random-hyperplane (SimHash) bucketing: corpus and
  *    probes hashed into signature buckets, candidate pairs come only from
  *    bucket collisions (a shuffle on the bucket key, not a cross join),
  *    exact cosine re-ranks the candidates. The 100 TB path: candidate
  *    generation is linear in corpus size × tables, never quadratic.
  */
object Similarity {

  /** Exact top-k cosine neighbors for each probe (excluding self-matches).
    *
    * The probe side is collected to a broadcast join (probes are a handful
    * of vectors by construction), so the corpus is scanned once with no
    * shuffle of corpus rows; the only exchange is the per-probe top-k
    * ranking, whose input is already cut to |probes| × |corpus| similarity
    * rows. Norms are computed once per side before the join.
    */
  def bruteForceTopK(embeddings: DataFrame, probeIds: Seq[Long], k: Int): DataFrame = {
    val corpus = embeddings
      .select(col("vec_id"), col("embedding"), normSq(col("embedding")).as("nsq"))
    val probes = corpus
      .filter(col("vec_id").isin(probeIds: _*))
      .select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"), col("nsq").as("p_nsq"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    corpus
      .join(broadcast(probes), col("vec_id") =!= col("probe_id"))
      .withColumn("cosine",
        cosinePrenormed(dot(col("embedding"), col("p_emb")), col("nsq"), col("p_nsq")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("vec_id"), col("cosine"), col("rank"))
      .orderBy(col("probe_id"), col("rank"))
  }

  /** Random-hyperplane LSH signature (Charikar 2002; locality-sensitive
    * hashing family of Indyk-Motwani 1998): `bits` sign-bits of dot products with
    * deterministic pseudo-random hyperplanes, packed into a long. Vectors
    * close in cosine agree on most bits. Hyperplane components are derived
    * from xxhash64(bit, dim) — deterministic across executors, no
    * driver-side randomness to ship. */
  private def signature(emb: org.apache.spark.sql.Column, table: Int, bits: Int): org.apache.spark.sql.Column =
    graft.functions.HyperplaneSig.hyperplaneSig(emb, table, bits)

  /** Approximate top-k: LSH-bucketed candidate generation + exact re-rank.
    *
    * Each vector gets `tables` independent signatures of `bits` bits; a
    * corpus vector is a candidate for a probe iff they collide in at least
    * one table. The join is an equi-join on (table, signature) — shuffle,
    * not cross product — then exact cosine ranks candidates. Recall is
    * tunable via (bits, tables); misses are possible (approximate by
    * design), so this query is benchmarked against [[bruteForceTopK]]
    * rather than a SQL oracle.
    *
    * Default (bits=6, tables=12) targets the top-k regime where the true
    * neighbors sit at moderate cosine (~0.3-0.5): per-bit agreement
    * probability is 1−θ/π ≈ 0.6, so 6-bit buckets collide with ~5% per
    * table and 12 tables lift recall to ~50%. Near-dup detection (cosine
    * ≥ 0.9) wants longer signatures (e.g. bits=16, tables=4) — collision
    * probability concentrates much harder there.
    */
  def lshTopK(embeddings: DataFrame, probeIds: Seq[Long], k: Int,
      bits: Int = 6, tables: Int = 12): DataFrame = {
    val sigd = embeddings.select(
      col("vec_id"), col("embedding"), normSq(col("embedding")).as("nsq"),
      array((0 until tables).map(t =>
        struct(lit(t).as("t"), signature(col("embedding"), t, bits).as("sig"))): _*).as("sigs"))
    val exploded = sigd.select(col("vec_id"), col("embedding"), col("nsq"),
      explode(col("sigs")).as("ts"))
      .select(col("vec_id"), col("embedding"), col("nsq"),
        col("ts.t").as("t"), col("ts.sig").as("sig"))
    val probes = exploded
      .filter(col("vec_id").isin(probeIds: _*))
      .select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"),
        col("nsq").as("p_nsq"), col("t"), col("sig"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    exploded
      .join(broadcast(probes), Seq("t", "sig"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"), col("embedding"), col("nsq"),
        col("p_emb"), col("p_nsq"))
      .distinct()
      .withColumn("cosine",
        cosinePrenormed(dot(col("embedding"), col("p_emb")), col("nsq"), col("p_nsq")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("vec_id"), col("cosine"), col("rank"))
      .orderBy(col("probe_id"), col("rank"))
  }

  /** Quantized-scan top-k: int8 candidate generation + exact float re-rank
    * (the SQ8 search shape — FAISS's scalar-quantizer index without the
    * IVF coarse layer).
    *
    * Pass 1 touches ONLY the codes frame ([[Quantization.codes]] — int8
    * codes + integer self-dots; 4× smaller than the float column when
    * materialized): per-(probe, vector) integer dot products rank
    * candidates by quantized cosine `q_a·q_b / √(‖q_a‖²‖q_b‖²)` — the
    * per-vector scales cancel in the cosine, so the score needs no float
    * data at all. Pass 2 re-attaches true embeddings to the top
    * `k·poolFactor` candidates only (a broadcast of candidate ids against
    * the corpus — at 100 TB that is an id-pushdown point lookup, not a
    * scan) and exact cosine produces the final top-k.
    *
    * Every step is integer-exact or an identical IEEE double expression on
    * both engines, so unlike the LSH/IVF tiers this approximate index is
    * fully hash-comparable against a DuckDB SQL replica — determinism
    * without a recall-twin. Candidate-pool misses (true neighbor ranked
    * out of the pool by quantization error) are possible by design;
    * `poolFactor` trades them away geometrically.
    */
  def int8TopK(embeddings: DataFrame, probeIds: Seq[Long], k: Int,
      poolFactor: Int = 4): DataFrame = {
    import graft.ops.Quantization
    val codes = Quantization.codes(embeddings)
    val pCodes = codes.filter(col("vec_id").isin(probeIds: _*))
      .select(col("vec_id").as("probe_id"), col("qv").as("p_qv"), col("qn").as("p_qn"))
    val wq = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos_q").desc, col("vec_id"))
    val candidates = codes
      .join(broadcast(pCodes), col("vec_id") =!= col("probe_id"))
      .withColumn("qdot", aggregate(
        zip_with(col("qv"), col("p_qv"), (x, y) => (x * y).cast("long")),
        lit(0L), (a, x) => a + x))
      .withColumn("cos_q",
        when(col("qn") === 0L || col("p_qn") === 0L, lit(-2.0d))
          .otherwise(col("qdot").cast("double") /
            sqrt((col("qn") * col("p_qn")).cast("double"))))
      .withColumn("qrank", row_number().over(wq))
      .filter(col("qrank") <= k * poolFactor)
      .select(col("probe_id"), col("vec_id"))
    val corpus = embeddings
      .select(col("vec_id"), col("embedding"), normSq(col("embedding")).as("nsq"))
    val probes = corpus.filter(col("vec_id").isin(probeIds: _*))
      .select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"),
        col("nsq").as("p_nsq"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    corpus
      .join(broadcast(candidates), Seq("vec_id"))
      .join(broadcast(probes), Seq("probe_id"))
      .withColumn("cosine",
        cosinePrenormed(dot(col("embedding"), col("p_emb")), col("nsq"), col("p_nsq")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("vec_id"), col("cosine"), col("rank"))
      .orderBy(col("probe_id"), col("rank"))
  }

  /** IVF-flat approximate top-k (the inverted-file structure of Jegou,
    * Douze & Schmid 2011, "Product quantization for nearest neighbor
    * search", without the PQ compression): a coarse quantizer
    * (deterministically sampled centroids) buckets the corpus by nearest
    * centroid; each probe searches only its `nProbe` nearest buckets with
    * exact cosine.
    *
    * This is the scale path complementary to [[lshTopK]]: the index is an
    * equi-bucketed table (build = one pass + a k×dim broadcast), queries
    * touch nProbe/nCentroids of the corpus, and the bucket assignment
    * shuffles once on cluster id. Centroid selection is a hash-ranked
    * sample — deterministic across runs and executors, no fitted state to
    * ship around.
    */
  /** Lloyd (k-means) refinement of a centroid frame against the corpus:
    * each iteration assigns every vector to its nearest centroid (the
    * broadcast + native-argmax pattern — zero corpus exchange of
    * embeddings beyond the per-dimension aggregation) and replaces each
    * centroid with its cluster's mean. Means are computed on 2⁻²⁰-
    * quantized components summed as exact integers (every step — scale by
    * a power of two, floor, integer sum, one final division — is exact or
    * correctly-rounded IEEE arithmetic), so refined centroids and hence
    * measured recall are deterministic across runs, partitionings AND
    * engines (the DuckDB oracle replicates them bit-for-bit; a decimal
    * AVG would hit engine-specific precision/rounding rules). The 2⁻²⁰
    * quantization is noise relative to k-means' own convergence
    * tolerance. Clusters that lose every point drop out (standard Lloyd
    * behavior); the per-dimension aggregation carries (cluster, pos,
    * value) rows whose map-side combine reduces shuffle volume to
    * tasks × k × dim. All lazy — no job at query-construction time. */
  private def refineCentroids(corpus: DataFrame, seeds: DataFrame, iters: Int): DataFrame = {
    val q = 1048576.0 // 2^20
    var cents = seeds
    for (_ <- 1 to iters) {
      val centArr = cents
        .agg(collect_list(struct(col("c_id"), col("c_emb"), col("c_nsq"))).as("cents"))
      val assigned = corpus
        .crossJoin(broadcast(centArr))
        .withColumn("cluster",
          graft.functions.ArgMaxCosine.argmaxCosine(col("embedding"), col("nsq"), col("cents")))
        .select(col("cluster"), col("embedding"))
      val byDim = assigned
        .select(col("cluster"), posexplode(col("embedding")))
        .groupBy(col("cluster"), col("pos"))
        .agg(
          // decimal(38,0) keeps the integer sum exact at any cluster size
          // (a long would wrap near 2^63); the values being integral makes
          // the decimal conversion itself exact
          sum(floor(col("col").cast("double") * lit(q)).cast("decimal(38,0)")).as("qsum"),
          count(lit(1)).as("n"))
        .select(col("cluster"), col("pos"),
          (col("qsum").cast("double") / (col("n").cast("double") * lit(q))).as("m"))
      cents = byDim
        .groupBy(col("cluster"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cluster").as("c_id"),
          transform(col("pm"), x => x.getField("m")).as("c_emb"))
        .withColumn("c_nsq", normSq(col("c_emb")))
    }
    cents
  }

  /** The shared IVF index construction: hash-sampled seeds, optional Lloyd
    * refinement, and the per-row nearest-centroid assignment. Returns
    * (corpus, centroids, assigned) — all lazy subplans.
    *
    * Assignment folds the whole centroid set into ONE array-of-structs row
    * and broadcast-joins it onto the corpus, so (a) centroid computation
    * stays lazy — it runs inside the job, not at query-construction time;
    * (b) no corpus row ever moves (a groupBy(vec_id)/max_by formulation
    * would re-shuffle the corpus including embeddings — the build-phase
    * bottleneck at 100 TB); (c) nCentroids scales to the 10⁴-10⁵ a real
    * IVF index wants, where a per-centroid-literal expression tree dies on
    * codegen/constant-pool limits. The argmax itself is the native
    * [[graft.functions.ArgMaxCosine]] kernel, ties toward the smaller c_id
    * (max_by(c_id, struct(c_sim, -c_id)) semantics), and handles
    * nCentroids=1 and empty corpora (empty → no assignments). */
  private def ivfIndex(embeddings: DataFrame, nCentroids: Int, lloydIters: Int)
      : (DataFrame, DataFrame, DataFrame) = {
    val corpus = embeddings
      .select(col("vec_id"), col("embedding"), normSq(col("embedding")).as("nsq"))
    val seeds = corpus
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(nCentroids)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
        col("nsq").as("c_nsq"))
    // Hash-sampled seeds land where the data is dense but carry single
    // vectors' noise; a couple of Lloyd rounds move them to cluster means,
    // which tightens buckets and lifts probe recall substantially (0.40 →
    // measured 0.60+ at the gate SF with the registered defaults). A real
    // deployment materializes the refined index once; here the subplan
    // stays lazy inside the query.
    val centroids =
      if (lloydIters <= 0) seeds else refineCentroids(corpus, seeds, lloydIters)
    (corpus, centroids, assignToCentroids(embeddings, centroids))
  }

  /** The deterministic centroid construction alone (hash-sampled seeds +
    * Lloyd refinement — the exact subplan [[ivfIndex]] builds), for
    * consumers that manage their own centroid persistence instead of the
    * catalog tables ([[graft.streaming.EmbeddingStream]] keys centroids
    * by epoch directory under its state root). Same corpus rows → same
    * centroids, regardless of row order: the seed sample orders by
    * (xxhash64(vec_id), vec_id). */
  private[graft] def trainCentroids(embeddings: DataFrame,
      nCentroids: Int = 32, lloydIters: Int = 2): DataFrame =
    ivfIndex(embeddings, nCentroids, lloydIters)._2

  /** The quantization-fit + occupancy statistics of ONE assigned batch —
    * the shared kernel of [[ivfDriftGauge]] (which assigns, then calls
    * this) and the runnable embedding pipeline's inline per-batch gauge
    * (which reuses the assignment its pair tier already computed, so the
    * gauge costs two 1-row aggregates, not an extra argmax pass).
    * `assigned` carries (cluster, embedding, nsq); output is one row
    * (n, fit_ppb, top_share_ppb) in the integer-ppb convention —
    * NULL fits/shares on an empty batch (no evidence, not zero). */
  private[graft] def fitAndShareStats(assigned: DataFrame,
      centroids: DataFrame): DataFrame = {
    val f = assigned
      .join(broadcast(centroids), col("cluster") === col("c_id"))
      .select(floor(cosinePrenormed(dot(col("embedding"), col("c_emb")),
        col("nsq"), col("c_nsq")) * lit(1000000000.0d)).cast("long")
        .as("csim_ppb"))
      .agg(count(lit(1)).as("n"), sum(col("csim_ppb")).as("s"))
    val occ = assigned.groupBy(col("cluster"))
      .agg(count(lit(1)).as("c"))
      .agg(coalesce(max(col("c")), lit(0L)).as("mx"))
    // n = 0 (an EMPTY batch — e.g. every arrival dropped as a
    // byte-identical re-send) must yield NULL signals, not a
    // DIVIDE_BY_ZERO: the documented no-evidence convention. CaseWhen
    // short-circuits, so the div never evaluates on the zero row.
    f.crossJoin(broadcast(occ))
      .select(col("n"),
        when(col("n") === 0, lit(null).cast("long"))
          .otherwise(expr("s div n")).as("fit_ppb"),
        when(col("n") === 0, lit(null).cast("long"))
          .otherwise(expr("mx * 1000000000L div n")).as("top_share_ppb"))
  }

  /** Assign vectors to FIXED centroids — the FAISS `add()`-after-`train()`
    * contract, and the one assignment construction every IVF consumer
    * shares (the batch index build above, and the STREAMING index upkeep
    * in [[graft.streaming.IndexUpkeep]], which appends arriving vectors to
    * the persisted cluster-partitioned table without retraining). The
    * centroid frame folds to ONE broadcast array row; assignment is the
    * native argmax-cosine kernel per vector — no shuffle of the corpus. */
  def assignToCentroids(vectors: DataFrame, centroids: DataFrame): DataFrame = {
    val centArr = centroids
      .agg(collect_list(struct(col("c_id"), col("c_emb"), col("c_nsq"))).as("cents"))
    vectors
      .select(col("vec_id"), col("embedding"), normSq(col("embedding")).as("nsq"))
      .crossJoin(broadcast(centArr))
      .withColumn("cluster",
        graft.functions.ArgMaxCosine.argmaxCosine(col("embedding"), col("nsq"), col("cents")))
      .drop("cents")
  }

  /** One-time-per-JVM PERSISTED IVF index — "build once, query many", the
    * economics a real 100 TB ANN deployment has (the lazy [[ivfTopK]]
    * subplan rebuilds centroids + assignments inside every query; a real
    * index pays that once at ingest). Memoized per (app, dir, params) like
    * [[graft.analytics.Bucketing.bucketedFacts]]:
    *
    *  - `centroids` persists as a small plain table (broadcast at query
    *    time);
    *  - `assignments` persists PARTITIONED BY cluster, so a probe query's
    *    bucket join prunes to the probed clusters' directories — the scan
    *    reads nProbe/nCentroids of the corpus instead of all of it
    *    (dynamic partition pruning; asserted in SimilaritySpec).
    *
    * The persisted rows are the SAME deterministic centroids/assignments
    * the lazy plan computes, so [[ivfTopKPersisted]] hash-matches
    * q_knn_ivf's oracle. */
  def ivfIndexPersisted(spark: org.apache.spark.sql.SparkSession, dir: String,
      embeddings: => DataFrame, nCentroids: Int = 32, lloydIters: Int = 2,
      suffix: String = ""): (DataFrame, DataFrame) = {
    val (cName, aName) = ivfIndexTableNames(
      spark, dir, embeddings, nCentroids, lloydIters, suffix)
    (spark.table(cName), spark.table(aName))
  }

  /** [[ivfIndexPersisted]] returning the CATALOG TABLE NAMES (centroids,
    * assignments) instead of frames — what the streaming index upkeep
    * ([[graft.streaming.IndexUpkeep]]) needs to append arriving vectors
    * into the assignment table's cluster partitions. */
  def ivfIndexTableNames(spark: org.apache.spark.sql.SparkSession, dir: String,
      embeddings: => DataFrame, nCentroids: Int = 32, lloydIters: Int = 2,
      suffix: String = ""): (String, String) = {
    val appId = spark.sparkContext.applicationId
    // per-key build lock (ManagedTable.once): one builder, waiters block;
    // `suffix` keys indexes trained on DIFFERENT corpora under the same
    // dir/params (the incremental path's base-trained index must not
    // collide with the full-corpus index)
    graft.sources.ManagedTable.once(
      s"$appId/ivf_index$suffix/$dir/$nCentroids/$lloydIters") {
        val tag = graft.sources.ManagedTable.tag(dir)
        val c = s"ivf_centroids_${nCentroids}_$lloydIters${suffix}_$tag"
        val a = s"ivf_assign_${nCentroids}_$lloydIters${suffix}_$tag"
        val (_, centroids, assigned) = ivfIndex(embeddings, nCentroids, lloydIters)
        graft.sources.ManagedTable.write(centroids, c)
        graft.sources.ManagedTable.write(assigned, a, partitionCol = Some("cluster"))
        (c, a)
      }
  }

  /** [[ivfTopK]] reading the PERSISTED index: centroids broadcast from the
    * index table, probed buckets scanned off the cluster-partitioned
    * assignment table (partition pruning does the nProbe/nCentroids cut),
    * exact cosine re-rank. Same parameters → same rows as [[ivfTopK]],
    * same oracle — only the build cost moved out of the query. `suffix`
    * selects which persisted epoch serves (the [[ivfRetrainEpoch]]
    * rotation — kNN resumes against the new epoch the same way the
    * incremental SemDeDup path does). */
  def ivfTopKPersisted(spark: org.apache.spark.sql.SparkSession, dir: String,
      embeddings: => DataFrame, probeIds: Seq[Long], k: Int,
      nCentroids: Int = 32, nProbe: Int = 6, lloydIters: Int = 2,
      suffix: String = ""): DataFrame = {
    val (centroids, assigned) = ivfIndexPersisted(
      spark, dir, embeddings, nCentroids, lloydIters, suffix)
    val probes = assigned
      .filter(col("vec_id").isin(probeIds: _*))
      .select(col("vec_id"), col("embedding"), col("nsq"))
      .join(broadcast(centroids))
      .withColumn("c_sim",
        cosinePrenormed(dot(col("embedding"), col("c_emb")), col("nsq"), col("c_nsq")))
      .withColumn("r", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("c_sim").desc, col("c_id"))))
      .filter(col("r") <= nProbe)
      .select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"),
        col("nsq").as("p_nsq"), col("c_id").as("cluster"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    assigned
      .join(broadcast(probes), Seq("cluster"))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("cosine",
        cosinePrenormed(dot(col("embedding"), col("p_emb")), col("nsq"), col("p_nsq")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("vec_id"), col("cosine"), col("rank"))
      .orderBy(col("probe_id"), col("rank"))
  }

  def ivfTopK(embeddings: DataFrame, probeIds: Seq[Long], k: Int,
      nCentroids: Int = 32, nProbe: Int = 6, lloydIters: Int = 2): DataFrame = {
    val (corpus, centroids, assigned) = ivfIndex(embeddings, nCentroids, lloydIters)
    // each probe picks its nProbe nearest clusters
    val probes = corpus
      .filter(col("vec_id").isin(probeIds: _*))
      .join(broadcast(centroids))
      .withColumn("c_sim",
        cosinePrenormed(dot(col("embedding"), col("c_emb")), col("nsq"), col("c_nsq")))
      .withColumn("r", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("c_sim").desc, col("c_id"))))
      .filter(col("r") <= nProbe)
      .select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"),
        col("nsq").as("p_nsq"), col("c_id").as("cluster"))
    // search only the probed buckets, exact cosine re-rank
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    assigned
      .join(broadcast(probes), Seq("cluster"))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("cosine",
        cosinePrenormed(dot(col("embedding"), col("p_emb")), col("nsq"), col("p_nsq")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("vec_id"), col("cosine"), col("rank"))
      .orderBy(col("probe_id"), col("rank"))
  }

  /** Product-quantization ADC top-k (Jégou, Douze & Schmid, "Product
    * quantization for nearest neighbor search", TPAMI 2011 — the PQ
    * compression layer the IVF tier above deliberately omits):
    *
    *  - CODEBOOK: the embedding splits into `m` subspaces; each
    *    subspace's `nCodes` centroids are the subvectors of hash-ranked
    *    seed vectors (the IVF seeding, so the whole codebook is
    *    deterministic and engine-replicable).
    *  - ENCODE: per (vector, subspace), the code is the L2-nearest
    *    centroid via the identity argmin‖x−c‖² = argmax(x·c − ‖c‖²/2) —
    *    dots only, so the fold semantics the oracle already mirrors
    *    (`list_dot_product`) carry over; ties toward the smaller code.
    *    A vector stores m small codes — the 8-byte-per-vector regime
    *    that makes billion-vector indexes RAM-resident at real scale.
    *  - QUERY (asymmetric distance): each probe precomputes its m×nCodes
    *    dot-product lookup table; a candidate's approximate dot is the
    *    LUT sum over its codes — O(m) per pair instead of O(dim), the
    *    ADC speedup. Top `k·poolFactor` candidates per probe re-rank
    *    with exact cosine (the same two-pass shape as [[int8TopK]]).
    *
    * Every step is a deterministic dot/fold or an integer, so the query
    * is fully hash-comparable against its DuckDB replica — no recall
    * twin needed; pool misses are the documented approximation.
    *
    * Scale shape: encoding is m rows per vector through ONE
    * map-side-combinable argmax aggregation (the only data-sized
    * exchanges carry (vec, subspace) group rows); the codebook and the
    * per-probe LUTs are broadcasts; the ADC scan is probes×corpus×O(m)
    * with WindowGroupLimit trimming each partition's top pool before the
    * rank exchange. */
  def pqTopK(embeddings: DataFrame, probeIds: Seq[Long], k: Int,
      m: Int = 8, nCodes: Int = 16, poolFactor: Int = 4): DataFrame = {
    val dim = 64 // fixture embedding width; codebook slicing needs it fixed
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    // Fail loudly on width mismatch instead of slicing short/empty
    // subvectors into wrong codes: assert_true throws per-row; on success
    // it is NULL so the filter keeps every row, and it cannot be pruned
    // away (it sits in a predicate, not an unused projection).
    val corpus = embeddings
      .select(col("vec_id"), col("embedding"), normSq(col("embedding")).as("nsq"))
      .filter(assert_true(size(col("embedding")) === lit(dim),
        lit(s"pqTopK expects $dim-wide embeddings")).isNull)
    val sub = dim / m
    // nCodes post-limit rows — explicit single bucket, not a degradation
    val wSeed = Window.partitionBy(graft.analytics.GlobalRank.singleBucket)
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
    val seeds = corpus
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(nCodes)
      .withColumn("cidx", (row_number().over(wSeed) - 1))
      .select(col("cidx"), col("embedding").as("c_emb"))
    // codebook rows: (s, cidx, c_sub, half = ‖c_sub‖²/2) — m·nCodes rows
    val centSubs = seeds
      .select(col("cidx"), explode(expr(
        s"transform(sequence(0, ${m - 1}), s -> struct(s AS s, slice(c_emb, s * $sub + 1, $sub) AS c_sub))")).as("sc"))
      .select(col("sc.s").as("s"), col("cidx"), col("sc.c_sub").as("c_sub"))
      .withColumn("half", normSq(col("c_sub")) * lit(0.5))
    // per (vector, subspace) rows carrying the subvector
    def subRows(src: DataFrame, idCol: String) = src
      .select(col(idCol), explode(expr(
        s"transform(sequence(0, ${m - 1}), s -> struct(s AS s, slice(embedding, s * $sub + 1, $sub) AS v))")).as("sv"))
      .select(col(idCol), col("sv.s").as("s"), col("sv.v").as("v"))
    // ENCODE: argmax(x·c − ‖c‖²/2), ties toward smaller cidx; codes
    // assembled into an m-array ordered by subspace
    val codes = subRows(corpus, "vec_id")
      .join(broadcast(centSubs), Seq("s"))
      .withColumn("score", dot(col("v"), col("c_sub")) - col("half"))
      .groupBy(col("vec_id"), col("s"))
      .agg(max(struct(col("score"), (-col("cidx")).as("nc"))).as("best"))
      .groupBy(col("vec_id"))
      .agg(array_sort(collect_list(struct(col("s"), (-col("best.nc")).as("code")))).as("sc"))
      .select(col("vec_id"),
        transform(col("sc"), x => x.getField("code")).as("codes"))
    // per-probe LUT: lut[s·nCodes + cidx] = probe_s · c_{s,cidx}
    val probeLut = subRows(
        corpus.filter(col("vec_id").isin(probeIds: _*)), "vec_id")
      .join(broadcast(centSubs), Seq("s"))
      .withColumn("d", dot(col("v"), col("c_sub")))
      .groupBy(col("vec_id"))
      .agg(array_sort(collect_list(struct(col("s"), col("cidx"), col("d")))).as("scd"))
      .select(col("vec_id").as("probe_id"),
        transform(col("scd"), x => x.getField("d")).as("lut"))
    // ADC scan: O(m) per (probe, vector); pool trim per probe
    val wq = Window.partitionBy(col("probe_id"))
      .orderBy(col("approx").desc, col("vec_id"))
    val pool = codes
      .crossJoin(broadcast(probeLut))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("approx", aggregate(
        sequence(lit(0), lit(m - 1)), lit(0.0d),
        (acc, s) => acc + element_at(col("lut"),
          (s * nCodes + element_at(col("codes"), s + 1) + 1).cast("int"))))
      .withColumn("qrank", row_number().over(wq))
      .filter(col("qrank") <= k * poolFactor)
      .select(col("probe_id"), col("vec_id"))
    // exact re-rank over the pool only
    val probes = corpus.filter(col("vec_id").isin(probeIds: _*))
      .select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"),
        col("nsq").as("p_nsq"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    corpus
      .join(broadcast(pool), Seq("vec_id"))
      .join(broadcast(probes), Seq("probe_id"))
      .withColumn("cosine",
        cosinePrenormed(dot(col("embedding"), col("p_emb")), col("nsq"), col("p_nsq")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("vec_id"), col("cosine"), col("rank"))
      .orderBy(col("probe_id"), col("rank"))
  }

  /** IVF-PQ composite — the production ANN shape (FAISS IndexIVFPQ;
    * Jégou et al. 2011 §V): coarse IVF bucket pruning AND compressed
    * in-bucket scanning, combined. [[ivfTopKPersisted]] prunes which
    * vectors are LOOKED AT but scans them at full width; [[pqTopK]]
    * scans O(m) codes per pair but looks at the whole corpus; at real
    * scale you need both cuts at once — nProbe/nCentroids of the corpus
    * touched, 8 bytes per touched vector.
    *
    *  - INDEX (both halves persisted, built once per corpus): the
    *    cluster-partitioned IVF assignment ([[ivfIndexPersisted]]), plus
    *    a codes table — every vector's m PQ codes stored WITH its
    *    cluster id and partitioned by it, the "codes live in the
    *    inverted lists" layout that makes the probed-bucket scan read
    *    only probed buckets' codes. The codebook is corpus-global
    *    (hash-ranked seeds, identical derivation to [[pqTopK]]), so
    *    codes are comparable across buckets.
    *  - QUERY: probes pick nProbe clusters by centroid cosine (broadcast
    *    centroid table); the ADC scan joins the codes table on the
    *    cluster key — partition pruning does the corpus cut — and sums
    *    each candidate's per-subspace LUT entries; the top k·poolFactor
    *    pool per probe re-ranks with exact cosine over re-attached
    *    embeddings (bounded frame, broadcast).
    *
    * Every step is the same deterministic dot/fold arithmetic as the two
    * parent operators, so the composite is hash-compared end to end
    * against its DuckDB replica (OracleSql.knnIvfPqSql) — pool and
    * bucket misses are the documented approximation, asserted non-fatal
    * by the recall twin.
    */
  def ivfPqTopKPersisted(spark: org.apache.spark.sql.SparkSession,
      dir: String, embeddings: => DataFrame, probeIds: Seq[Long], k: Int,
      nCentroids: Int = 32, nProbe: Int = 6, lloydIters: Int = 2,
      m: Int = 8, nCodes: Int = 16, poolFactor: Int = 4): DataFrame = {
    val dim = 64
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val sub = dim / m
    val (centroids, assigned) = ivfIndexPersisted(
      spark, dir, embeddings, nCentroids, lloydIters)
    // corpus-global codebook: subvectors of the hash-ranked seed vectors
    // (exactly pqTopK's derivation — comparable codes across buckets)
    // nCodes post-limit rows — explicit single bucket, not a degradation
    val wSeed = Window.partitionBy(graft.analytics.GlobalRank.singleBucket)
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
    val centSubs = assigned
      .select(col("vec_id"), col("embedding"))
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(nCodes)
      .withColumn("cidx", (row_number().over(wSeed) - 1))
      .select(col("cidx"), col("embedding").as("c_emb"))
      .select(col("cidx"), explode(expr(
        s"transform(sequence(0, ${m - 1}), s -> struct(s AS s, slice(c_emb, s * $sub + 1, $sub) AS c_sub))")).as("sc"))
      .select(col("sc.s").as("s"), col("cidx"), col("sc.c_sub").as("c_sub"))
      .withColumn("half", normSq(col("c_sub")) * lit(0.5))
    def subRows(src: DataFrame, idCol: String) = src
      .select(col(idCol), explode(expr(
        s"transform(sequence(0, ${m - 1}), s -> struct(s AS s, slice(embedding, s * $sub + 1, $sub) AS v))")).as("sv"))
      .select(col(idCol), col("sv.s").as("s"), col("sv.v").as("v"))
    // persisted inverted-list codes: (vec_id, codes[m], cluster),
    // partitioned by cluster so probed-bucket scans prune at listing time
    val codesTable = graft.sources.ManagedTable.persisted(spark,
      s"ivfpq_codes_${nCentroids}_${lloydIters}_${m}_${nCodes}_" +
        graft.sources.ManagedTable.tag(dir), partitionCol = Some("cluster")) {
      subRows(assigned.select(col("vec_id"), col("embedding")), "vec_id")
        .join(broadcast(centSubs), Seq("s"))
        .withColumn("score", dot(col("v"), col("c_sub")) - col("half"))
        .groupBy(col("vec_id"), col("s"))
        .agg(max(struct(col("score"), (-col("cidx")).as("nc"))).as("best"))
        .groupBy(col("vec_id"))
        .agg(array_sort(collect_list(struct(col("s"), (-col("best.nc")).as("code")))).as("sc"))
        .select(col("vec_id"),
          transform(col("sc"), x => x.getField("code")).as("codes"))
        .join(assigned.select(col("vec_id"), col("cluster")), Seq("vec_id"))
    }
    // probes: nProbe nearest clusters each (same ranking as the IVF tier)
    val probeRows = assigned
      .filter(col("vec_id").isin(probeIds: _*))
      .select(col("vec_id"), col("embedding"), col("nsq"))
    val probes = probeRows
      .join(broadcast(centroids))
      .withColumn("c_sim",
        cosinePrenormed(dot(col("embedding"), col("c_emb")), col("nsq"), col("c_nsq")))
      .withColumn("r", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("c_sim").desc, col("c_id"))))
      .filter(col("r") <= nProbe)
      .select(col("vec_id").as("probe_id"), col("c_id").as("cluster"))
    // per-probe LUT over the corpus-global codebook
    val probeLut = subRows(probeRows, "vec_id")
      .join(broadcast(centSubs), Seq("s"))
      .withColumn("d", dot(col("v"), col("c_sub")))
      .groupBy(col("vec_id"))
      .agg(array_sort(collect_list(struct(col("s"), col("cidx"), col("d")))).as("scd"))
      .select(col("vec_id").as("probe_id"),
        transform(col("scd"), x => x.getField("d")).as("lut"))
    // bucket-pruned ADC scan + pool trim
    val wq = Window.partitionBy(col("probe_id"))
      .orderBy(col("approx").desc, col("vec_id"))
    val pool = codesTable
      .join(broadcast(probes), Seq("cluster"))
      .filter(col("vec_id") =!= col("probe_id"))
      .join(broadcast(probeLut), Seq("probe_id"))
      .withColumn("approx", aggregate(
        sequence(lit(0), lit(m - 1)), lit(0.0d),
        (acc, s) => acc + element_at(col("lut"),
          (s * nCodes + element_at(col("codes"), s + 1) + 1).cast("int"))))
      .withColumn("qrank", row_number().over(wq))
      .filter(col("qrank") <= k * poolFactor)
      .select(col("probe_id"), col("vec_id"))
    // exact re-rank over the bounded pool
    val pFrame = probeRows
      .select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"),
        col("nsq").as("p_nsq"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    assigned
      .select(col("vec_id"), col("embedding"), col("nsq"))
      .join(broadcast(pool), Seq("vec_id"))
      .join(broadcast(pFrame), Seq("probe_id"))
      .withColumn("cosine",
        cosinePrenormed(dot(col("embedding"), col("p_emb")), col("nsq"), col("p_nsq")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("vec_id"), col("cosine"), col("rank"))
      .orderBy(col("probe_id"), col("rank"))
  }

  /** Embedding near-duplicate pairs: all (a, b) with cosine ≥ threshold,
    * a < b. Exact version — pairwise over the corpus; kept oracle-checkable
    * at test SF. The scale path reuses the LSH bucketing above for
    * candidate generation. */
  def embeddingNearDupPairs(embeddings: DataFrame, threshold: Double): DataFrame = {
    val a = embeddings.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"),
      normSq(col("embedding")).as("nsq_a"))
    val b = embeddings.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"),
      normSq(col("embedding")).as("nsq_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cosine",
        cosinePrenormed(dot(col("emb_a"), col("emb_b")), col("nsq_a"), col("nsq_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** SemDeDup-style semantic near-duplicate pairs (Abbas et al. 2023,
    * "SemDeDup: Data-efficient learning at web-scale through semantic
    * deduplication"): cluster the corpus with the IVF coarse quantizer
    * (deterministic hash-sampled seeds + Lloyd refinement — the exact
    * construction [[ivfTopK]] proves and the DuckDB oracle replicates
    * bit-for-bit), then emit all within-cluster pairs with cosine ≥
    * `threshold`.
    *
    * This is the dedup tier whose *semantics* are cluster-local by design
    * — pairwise work is Σ|cluster|² instead of n², and at 100 TB the
    * cluster count scales with the corpus (n/k roughly constant) so
    * per-cluster work stays bounded while the only data-sized exchange is
    * one shuffle of (cluster, vec_id, embedding) rows per join side.
    * Unlike the LSH twin ([[embeddingNearDupPairsLsh]]) there is no
    * per-pair miss probability to bound: the answer is exactly "all
    * same-cluster pairs over the threshold", which the oracle recomputes
    * independently — hash-exact, not recall-bounded. */
  def semanticDedupPairs(embeddings: DataFrame, threshold: Double,
      nCentroids: Int = 32, lloydIters: Int = 2): DataFrame =
    semanticDedupOverAssigned(ivfIndex(embeddings, nCentroids, lloydIters)._3,
      threshold)

  /** [[semanticDedupPairs]] off the PERSISTED index
    * ([[ivfIndexPersisted]]): the cluster assignment is read, not rebuilt
    * — SemDeDup over a standing corpus re-runs per threshold/policy, and
    * the expensive part (Lloyd + assignment) is the same every time. Same
    * rows, same oracle. */
  def semanticDedupPairsPersisted(spark: org.apache.spark.sql.SparkSession,
      dir: String, embeddings: => DataFrame, threshold: Double,
      nCentroids: Int = 32, lloydIters: Int = 2): DataFrame =
    semanticDedupOverAssigned(
      ivfIndexPersisted(spark, dir, embeddings, nCentroids, lloydIters)._2,
      threshold)

  private def semanticDedupOverAssigned(assigned: DataFrame,
      threshold: Double): DataFrame =
    semanticDedupUnordered(assigned, threshold)
      .orderBy(col("id_a"), col("id_b"))

  /** HOT-CLUSTER CAP — [[graft.ops.Dedup.minHashPairsCapped]] on the
    * vector tier, the executable bound the IVF drift gauge's
    * `top_share` alert calls for: a COLLAPSED cluster (mode-collapsed
    * upstream encoder, an embedding-template flood) makes the
    * cluster-local pair join quadratic in that cluster's occupancy while
    * contributing almost no dedup value — its members are the flood.
    * This variant EXCLUDES clusters whose occupancy exceeds `cap` from
    * pair generation entirely.
    *
    * The semantics are explicitly RECALL-BOUNDED, and deterministically
    * so: every pair inside a quarantined cluster is missed — including
    * the organic vectors the collapse dragged in (at the receipt fixture
    * that is 7 of 107 members; the rest ARE the flood). The DuckDB
    * oracle applies the same occupancy rule to the same deterministic
    * assignment, so the row is hash-exact — the POLICY is the tested
    * contract, and the stated operational answer to a firing cap is the
    * gauge's own: retrain/split in the next maintenance window
    * ([[ivfRetrainEpoch]]), with the cap bounding the join in the
    * meantime.
    *
    * Scale shape: occupancy is one map-side-combinable count over
    * (cluster, vec_id) rows; the hot set (clusters OVER the cap) is tiny
    * by construction and broadcasts into a LeftAnti prune of the
    * assignment — the pair join's shape is unchanged, its worst key now
    * bounded by cap², exactly the skew ceiling a 100 TB always-on vector
    * ingest needs while the retrain amortizes. */
  def semanticDedupPairsCapped(embeddings: DataFrame, threshold: Double,
      nCentroids: Int = 32, lloydIters: Int = 2, cap: Int = 64): DataFrame = {
    val assigned = ivfIndex(embeddings, nCentroids, lloydIters)._3
      .localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val hot = assigned.groupBy(col("cluster"))
      .agg(count(lit(1)).as("occ"))
      .filter(col("occ") > cap)
      .select(col("cluster"))
    val cool = assigned.join(broadcast(hot), Seq("cluster"), "left_anti")
    semanticDedupOverAssigned(cool, threshold)
  }

  /** [[semanticDedupOverAssigned]] without the presentation sort — for
    * composition (the incremental path unions it with the delta-vs-base
    * between-join and sorts ONCE at the end; the embedding live-pipeline
    * gate drives it wave by wave). */
  private[graft] def semanticDedupUnordered(assigned: DataFrame,
      threshold: Double): DataFrame = {
    val a = assigned.select(col("cluster"), col("vec_id").as("id_a"),
      col("embedding").as("emb_a"), col("nsq").as("nsq_a"))
    val b = assigned.select(col("cluster"), col("vec_id").as("id_b"),
      col("embedding").as("emb_b"), col("nsq").as("nsq_b"))
    a.join(b, Seq("cluster"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine",
        cosinePrenormed(dot(col("emb_a"), col("emb_b")), col("nsq_a"), col("nsq_b")))
      .filter(col("cosine") >= threshold)
      // explicit long: the persisted index reads `cluster` back through
      // partition-column type inference (int for small ids)
      .select(col("id_a"), col("id_b"),
        col("cluster").cast("long").as("cluster"), col("cosine"))
  }

  /** SemDeDup for a DELTA of newly-arrived vectors against a STANDING
    * corpus — the embedding tier's arrival-time dedup, completing the
    * incremental family ([[graft.ops.Dedup.hammingPairs128Between]] is the
    * fingerprint twin, [[graft.ops.Search.bm25TopKIncremental]] the
    * retrieval one). The base-trained IVF coarse quantizer persists once
    * ([[ivfIndexPersisted]], `_base` suffix); arriving vectors are
    * assigned to those FIXED centroids ([[assignToCentroids]] — the FAISS
    * add-after-train contract, the same construction the streaming index
    * upkeep appends through) and compared ONLY within their cluster:
    * delta × base via a broadcast join against the cluster-partitioned
    * assignment table, delta × delta via the cluster-local self-join.
    *
    * Scale shape: nothing re-clusters and nothing corpus-sized shuffles —
    * the delta's assignment is one broadcast-argmax pass over the batch,
    * the between-join broadcasts the ASSIGNED DELTA (batch-sized by the
    * same contract as the label merge) so the base assignment table
    * streams through with no shuffle, and the delta self-join is
    * delta-sized. Cost ∝ delta × avg cluster occupancy, vs rebuild ∝
    * Σ|cluster|² over the corpus.
    *
    * Semantics contract: pairs are defined w.r.t. the BASE-trained
    * quantizer (retraining on insert would reshuffle cluster boundaries —
    * FAISS deployments retrain offline, exactly like the periodic rebuild
    * this path amortizes), and `baseEmb`/`deltaEmb` must carry DISJOINT
    * vec_id sets (the family's standing contract — overlapping ids would
    * double-emit a pair once per leg). The DuckDB oracle replicates the
    * base-trained chain bit-for-bit, so the gate is hash-exact, not
    * recall-bounded.
    *
    * EAGER: the delta assignment is snapshotted (it feeds both join legs
    * — without it the argmax pass runs twice), so construction triggers
    * Spark jobs — batch-only, like the banded-hamming family. */
  /** `expiredIds` composes RETENTION with arrival-time serving (the
    * [[graft.ops.Dedup.minHashPairsIncremental]] pattern on the vector
    * tier): the persisted cluster-partitioned assignment drops the
    * expired vectors' rows through [[graft.ops.Dedup.expireRows]]'
    * broadcast anti-join before the delta joins it — arrivals can never
    * re-pair with retired vectors, and because assignment under FIXED
    * centroids is per-vector (RetentionSpec), the output equals the
    * incremental run over (base − expired) exactly. The CENTROIDS stay
    * (train-once; [[ivfDriftGauge]] owns their decay), and the physical
    * partition rewrite stays an offline compaction decision. */
  /** `suffix` selects WHICH persisted epoch's index serves (default the
    * base-trained `_base`): after [[ivfRetrainEpoch]] rotates the
    * quantizer, arrivals resume against the new epoch by passing its
    * suffix — the serve side of the drift → retrain loop. */
  def semanticDedupPairsIncremental(spark: org.apache.spark.sql.SparkSession,
      dir: String, baseEmb: => DataFrame, deltaEmb: DataFrame,
      threshold: Double, nCentroids: Int = 32, lloydIters: Int = 2,
      expiredIds: Option[DataFrame] = None,
      suffix: String = "_base"): DataFrame = {
    val (centroids, assignedAll) = ivfIndexPersisted(spark, dir, baseEmb,
      nCentroids, lloydIters, suffix)
    val assigned = expiredIds.fold(assignedAll)(e =>
      graft.ops.Dedup.expireRows(assignedAll, "vec_id", e))
    val dAssigned = assignToCentroids(deltaEmb, centroids)
      .localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    semanticDedupPairsBetween(dAssigned, assigned, threshold)
      .unionByName(semanticDedupUnordered(dAssigned, threshold))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** [[semanticDedupPairsIncremental]]`(expiredIds)`'s MAINTENANCE-WINDOW
    * twin (the [[graft.ops.Search.bm25TopKRetiredRewritten]] pattern on
    * the vector tier): instead of anti-joining the expired set against
    * the cluster-partitioned assignment on every arrival batch, the
    * assignment table is physically REWRITTEN once
    * ([[graft.sources.ManagedTable.rewriteExpired]] — expired vectors'
    * rows dropped in place, cluster partitioning preserved so the probe
    * pruning survives), and serving runs the exact un-expired incremental
    * plan against the dedicated `_rwret` epoch: broadcast delta argmax +
    * cluster-partitioned between-join, NO anti-join anywhere. The
    * base-trained CENTROIDS stay (train-once — k-means on the same base
    * is deterministic, so the `_rwret` centroids equal `_base`'s), and
    * assignment under fixed centroids is per-vector (RetentionSpec), so
    * the rewritten assignment IS the survivors' — pairs bit-identical to
    * the serve-time-expiry path, one oracle for both. */
  def semanticDedupPairsIncrementalRewritten(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      baseEmb: => DataFrame, deltaEmb: DataFrame, threshold: Double,
      expiredIds: DataFrame, nCentroids: Int = 32,
      lloydIters: Int = 2): DataFrame = {
    val appId = spark.sparkContext.applicationId
    val fp = graft.sources.ManagedTable.idSetFingerprint(expiredIds, "vec_id")
    val builtFp = graft.sources.ManagedTable.once(
        s"$appId/ivf_rwret/$dir/${nCentroids}_$lloydIters") {
      val (_, aName) = ivfIndexTableNames(spark, dir, baseEmb,
        nCentroids, lloydIters, "_rwret")
      graft.sources.ManagedTable.rewriteExpired(spark, aName, "vec_id",
        expiredIds, partitionCol = Some("cluster"))
      fp
    }
    graft.sources.ManagedTable.requireSameExpiry(builtFp, fp,
      s"the _rwret IVF assignment for $dir")
    semanticDedupPairsIncremental(spark, dir, baseEmb, deltaEmb, threshold,
      nCentroids, lloydIters, expiredIds = None, suffix = "_rwret")
  }

  /** Cluster-local over-threshold pairs BETWEEN an assigned delta and an
    * assigned standing corpus (both (vec_id, embedding, nsq, cluster)) —
    * the delta×base half of [[semanticDedupPairsIncremental]], public so
    * the wave-replay parity gate can drive it against a GROWING
    * assignment. The assigned delta BROADCASTS (batch-sized by contract)
    * so the standing side streams through with no shuffle; emits
    * canonical (id_a < id_b, cluster, cosine), UNSORTED; delta×delta
    * pairs are NOT emitted (compose with [[semanticDedupUnordered]] over
    * the delta, as the incremental path does). Vec_id sets must be
    * disjoint. */
  def semanticDedupPairsBetween(deltaAssigned: DataFrame,
      baseAssigned: DataFrame, threshold: Double): DataFrame = {
    val d = deltaAssigned.select(col("cluster").cast("long").as("cluster"),
      col("vec_id").as("id_d"), col("embedding").as("emb_d"),
      col("nsq").as("nsq_d"))
    val i = baseAssigned.select(col("cluster").cast("long").as("cluster"),
      col("vec_id").as("id_i"), col("embedding").as("emb_i"),
      col("nsq").as("nsq_i"))
    broadcast(d).join(i, Seq("cluster"))
      .filter(col("id_d") =!= col("id_i"))
      .withColumn("cosine",
        cosinePrenormed(dot(col("emb_d"), col("emb_i")), col("nsq_d"), col("nsq_i")))
      .filter(col("cosine") >= threshold)
      .select(least(col("id_d"), col("id_i")).as("id_a"),
        greatest(col("id_d"), col("id_i")).as("id_b"),
        col("cluster"), col("cosine"))
  }

  /** IVF DRIFT GAUGE — the retrain trigger for the add-after-train
    * contract every incremental embedding path commits to
    * ([[semanticDedupPairsIncremental]], the streaming index upkeep):
    * base-trained centroids are FIXED under arrivals, which is exactly
    * right until the arrival distribution shifts — then bucket recall
    * erodes silently. The gauge compares the quantization fit of the
    * CURRENT arrival batch against a REFERENCE arrival batch (an earlier
    * in-distribution one), both assigned to the same persisted base
    * centroids. Comparing two held-out batches is deliberate: comparing
    * arrivals against the TRAINING corpus' own fit would bake Lloyd's
    * overfit-to-its-sample gap into the signal (measured ~0.14 cosine at
    * the fixture scale on an in-distribution delta — pure generalization
    * gap, zero actual drift), while held-out-vs-held-out cancels it and
    * isolates the distribution movement.
    *
    * TWO signals, because single-signal gauges have measured blind spots
    * (the `ivfdrift` soak probes all of this):
    *
    *  - FIT DRIFT: mean cosine of each batch vector to its assigned
    *    centroid, in ppb fixed point (floor(csim·10⁹) summed as BIGINT,
    *    integer-divided — order-free and engine-exact, the q_lm_score
    *    convention; the cosines themselves are bit-identical IEEE on
    *    both engines, proven by the semdedup oracle chain). Catches
    *    diffuse shifts — a degenerate encoder emitting axis-spike
    *    vectors moves it by 0.068 where in-distribution noise is ~0.0001.
    *  - OCCUPANCY COLLAPSE: the new batch's largest assigned-cluster
    *    share. Catches exactly what fit drift CANNOT: a shift
    *    concentrating arrivals in one direction (mode collapse, a stuck
    *    upstream model) can keep — even improve — mean centroid cosine
    *    while 85% of the batch lands in one bucket (measured), which
    *    destroys IVF's probe economics regardless of fit.
    *
    * One output row: (n_ref, n_new, ref_fit_ppb, new_fit_ppb, drift_ppb
    * = ref − new, ref_top_share_ppb, new_top_share_ppb, retrain).
    * retrain fires when drift_ppb > retrainDriftPpb (default 0.05
    * cosine) OR new_top_share_ppb > collapseSharePpb (default 0.40) —
    * both an order of magnitude above the in-distribution values the
    * receipt records, and well under the measured shifted cases. RETRAIN
    * POLICY: when it fires, rebuild the IVF index over (base ∪
    * accumulated deltas) — the amortized offline retrain FAISS
    * deployments schedule — and reset the suffix epoch; until then
    * arrivals keep assigning to the fixed centroids.
    *
    * Scale shape: two batch-sized broadcast-argmax passes (each
    * snapshotted — fit and occupancy are two consumers) folding to 1-row
    * aggregates — nothing corpus-sized is read at all, so the gauge is
    * cheap enough to run on every arrival batch. EAGER (batch-only). */
  def ivfDriftGauge(spark: org.apache.spark.sql.SparkSession, dir: String,
      baseEmb: => DataFrame, refDelta: DataFrame, newDelta: DataFrame,
      nCentroids: Int = 32, lloydIters: Int = 2,
      retrainDriftPpb: Long = 50000000L,
      collapseSharePpb: Long = 400000000L,
      suffix: String = "_base"): DataFrame = {
    val (centroids, _) = ivfIndexPersisted(spark, dir, baseEmb,
      nCentroids, lloydIters, suffix)
    def fitAndShare(batch: DataFrame): DataFrame = {
      val assigned = assignToCentroids(batch, centroids)
        .select(col("cluster").cast("long").as("cluster"),
          col("embedding"), col("nsq"))
        .localCheckpoint(true,
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      fitAndShareStats(assigned, centroids)
    }
    val r = fitAndShare(refDelta).select(col("n").as("n_ref"),
      col("fit_ppb").as("ref_fit_ppb"),
      col("top_share_ppb").as("ref_top_share_ppb"))
    val d = fitAndShare(newDelta).select(col("n").as("n_new"),
      col("fit_ppb").as("new_fit_ppb"),
      col("top_share_ppb").as("new_top_share_ppb"))
    // an EMPTY batch (a quiet arrival window) is no evidence, not an
    // alarm: fits/shares stay NULL (0 would read as massive drift) and
    // the coalesce pins retrain to false instead of NULL — callers that
    // read the flag positionally must never NPE on a quiet window
    r.crossJoin(broadcast(d))
      .select(col("n_ref"), col("n_new"),
        col("ref_fit_ppb"), col("new_fit_ppb"),
        (col("ref_fit_ppb") - col("new_fit_ppb")).as("drift_ppb"),
        col("ref_top_share_ppb"), col("new_top_share_ppb"),
        (coalesce((col("ref_fit_ppb") - col("new_fit_ppb")) >
            retrainDriftPpb, lit(false)) ||
          coalesce(col("new_top_share_ppb") > collapseSharePpb, lit(false)))
          .as("retrain"))
  }

  /** EXECUTE the retrain [[ivfDriftGauge]]'s policy prescribes: rebuild
    * the IVF index over the ACCUMULATED corpus (base ∪ every delta
    * admitted since the last epoch) under a fresh epoch suffix — the
    * amortized offline retrain FAISS deployments schedule. The old
    * epoch's tables stay addressable until their readers drain (suffix
    * keys are the version pins — the `ivfIndexPersisted` economics), new
    * arrivals assign to the NEW epoch's centroids from here on, and the
    * gauge re-anchors: SimilaritySpec pins the loop end to end — a
    * shifted batch fires retrain against epoch 0, and after retraining
    * on (base ∪ shifted), the same distribution measured against epoch 1
    * sits back under both thresholds. */
  def ivfRetrainEpoch(spark: org.apache.spark.sql.SparkSession, dir: String,
      corpus: => DataFrame, epoch: Int, nCentroids: Int = 32,
      lloydIters: Int = 2): (DataFrame, DataFrame) =
    ivfIndexPersisted(spark, dir, corpus, nCentroids, lloydIters,
      suffix = s"_epoch$epoch")

  /** Per-label corpus statistics over the embedding column — the sanity
    * profile (cardinality, norm distribution) an embedding pipeline logs
    * before/after normalization. One narrow pass + a tiny label exchange;
    * norms via the native [[graft.functions.VecDot]] kernel. */
  def embeddingStats(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("label"), sqrt(normSq(col("embedding"))).as("nrm"))
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n_vecs"),
        graft.Cols.davg(col("nrm")).as("avg_norm"),
        min(col("nrm")).as("min_norm"),
        max(col("nrm")).as("max_norm"))
      .orderBy(col("label"))

  /** Embedding near-duplicate pairs via hyperplane-LSH candidate
    * generation — the 100 TB twin of [[embeddingNearDupPairs]]: candidates
    * come from an equi-join on (table, signature) bucket collisions (a
    * key-only shuffle of 24-byte rows, linear in corpus × tables), then the
    * few surviving candidate pairs re-attach their embeddings and verify
    * with exact cosine, so every emitted pair is a true pair (precision 1
    * by construction; recall is the tunable). At the near-dup regime
    * (cosine ≥ 0.9, per-bit agreement ≈ 0.86) bits=8/tables=16 gives
    * per-table collision ≈ 0.30 and overall miss ≈ 0.7¹⁶ ≈ 3·10⁻³ per
    * pair. Never materializes the O(n²) pair space. */
  def embeddingNearDupPairsLsh(embeddings: DataFrame, threshold: Double,
      bits: Int = 8, tables: Int = 16): DataFrame = {
    val base = embeddings.select(col("vec_id"), col("embedding"),
      normSq(col("embedding")).as("nsq"))
    // (table, signature, vec_id) — the only thing that shuffles
    val sigs = base.select(col("vec_id"),
      explode(array((0 until tables).map(t =>
        struct(lit(t).as("t"), signature(col("embedding"), t, bits).as("sig"))): _*)).as("ts"))
      .select(col("vec_id"), col("ts.t").as("t"), col("ts.sig").as("sig"))
    val candidates = sigs.select(col("t"), col("sig"), col("vec_id").as("id_a"))
      .join(sigs.select(col("t"), col("sig"), col("vec_id").as("id_b")), Seq("t", "sig"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    candidates
      .join(base.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"),
        col("nsq").as("nsq_a")), Seq("id_a"))
      .join(base.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"),
        col("nsq").as("nsq_b")), Seq("id_b"))
      .withColumn("cosine",
        cosinePrenormed(dot(col("emb_a"), col("emb_b")), col("nsq_a"), col("nsq_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
      .orderBy(col("id_a"), col("id_b"))
  }
}
