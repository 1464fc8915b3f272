package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The RUNNABLE live EMBEDDING-dedup pipeline — the vector twin of
  * [[DocumentStream]]: the incremental chain the hand-driven wave gate
  * ([[ParityCheck.embeddingLiveParity]]) proves, wired as ONE
  * checkpointed Structured Streaming job, with the IVF health loop
  * ([[graft.ops.Similarity.ivfDriftGauge]] → retrain → serve) running
  * INSIDE the pipeline instead of as a separate batch ritual. Per
  * micro-batch:
  *
  *  1. EXACT tier — byte-identical vectors dedup against the standing
  *     hash state (batch hashes broadcast INTO the corpus-sized state so
  *     it streams through narrow; only collided hashes broadcast back)
  *     and within the batch (min vec_id per hash) — repeated upstream
  *     re-encodes of the same content are dropped before they cost an
  *     argmax or a pair join.
  *  2. ASSIGN + GAUGE — survivors assign to the CURRENT EPOCH's fixed
  *     centroids ([[graft.ops.Similarity.assignToCentroids]] — the FAISS
  *     add-after-train contract). The same assignment feeds the per-batch
  *     drift gauge ([[graft.ops.Similarity.fitAndShareStats]] against the
  *     epoch's persisted reference row), so gauging costs two 1-row
  *     aggregates, not an extra pass — every batch leaves a
  *     (fit, occupancy, retrain) health row in `gauge/`.
  *  3. PAIR — cluster-local over-threshold pairs against the standing
  *     assigned state ([[graft.ops.Similarity.semanticDedupPairsBetween]]
  *     — the batch side broadcasts; the corpus side streams through
  *     unshuffled) plus the within-batch self-join.
  *  4. LABEL — the batch's pairs merge into the standing labeling via
  *     [[graft.ops.Dedup.mergeClusterDelta]], cost ∝ batch.
  *
  * EPOCH HANDOFF (the drift gauge's retrain policy, closed in-pipeline):
  * when gauge rows fire, a maintenance window (stream STOPPED at a
  * committed checkpoint) calls [[retrainEpoch]] — centroids retrain over
  * the standing corpus ([[graft.ops.Similarity.trainCentroids]] — the
  * amortized offline rebuild FAISS deployments schedule), every standing
  * `vecs/` directory is reassigned in place (sidecars preserved), the
  * gauge re-anchors on a fresh reference row, and an `epoch/` row keyed
  * by the last committed batch id makes the rotation DETERMINISTIC for
  * every subsequent batch: batch N's epoch is the max over committed
  * epoch rows strictly below N, so a replayed batch resolves the same
  * centroids the original run used.
  *
  * RESTART CONTRACT: identical to [[DocumentStream]]'s (the shared
  * [[BatchState]] machinery) — foreachBatch is at-least-once, so every
  * state write is keyed by batch id and every state read is pinned
  * strictly before the current batch; a replayed batch recomputes
  * against exactly the pre-batch state and overwrites its own
  * directories with identical rows. The stop/restart-across-a-
  * consolidation gate is [[ParityCheck.embeddingRestartParity]]
  * (q_embstream_restart_parity): it kills the query mid-run, restarts
  * from the checkpoint, and asserts the final pair/label state equals
  * the all-at-once batch twin ([[ParityCheck.embeddingBatchTwin]] — the
  * SAME definition the hand-driven gate compares against);
  * EmbeddingStreamSpec drives [[processBatch]] directly for the
  * tier-level contracts (exact-tier drops, consolidation equivalence,
  * epoch determinism, retire, the fully-duplicate no-op batch).
  *
  * State layout under `root` (each `batch=<id>` directory overwrite-
  * idempotent; the standing corpus initializes as `batch=-1` via
  * [[init]]):
  *  - `vecs/`   (vec_id, embedding, nsq, cluster) — survivor vectors
  *     assigned under the current epoch (retrain rewrites `cluster` in
  *     place — the offline cost the epoch amortizes)
  *  - `vhash/`  (vec_id, vhash)  — exact-tier hash state
  *  - `pairs/`  (id_a, id_b, cluster, cosine) — verified semantic pairs
  *     (plus the standing corpus's pair table as `batch=-1`; [[retire]]
  *     re-converges split components from real edges)
  *  - `gauge/`  one health row per non-empty batch (batch_id, n_ref,
  *     n_new, fit ppb, drift ppb, occupancy ppb, epoch, retrain)
  *  - `labels/` FULL snapshot per batch, reaped to the previous one
  *  - `epoch/`  (epoch) rows at `batch=-1` (0) and at each retrain
  *  - `cents/epoch=<e>`, `gref/epoch=<e>` — per-epoch centroid table and
  *     gauge reference row (tiny; one directory per epoch, not per batch)
  *
  * Directory growth in BATCH COUNT is bounded exactly as in
  * [[DocumentStream]]: `consolidateEvery = K` runs the tiered
  * [[BatchState.tieredFold]] over `vecs`/`vhash`/`pairs`/`gauge` at the
  * start of every K-th batch — K + log₂(batches/K) + 2 directories per
  * sub for any uptime, O(log batches) rewrites per byte.
  *
  * Scale shape per batch: one hash anti-join against the standing hash
  * state (batch side broadcasts, state streams), one broadcast-argmax
  * assignment of the batch, one broadcast cluster join of the batch
  * against the cluster-keyed standing state, batch-sized
  * label merge, two 1-row gauge aggregates. Nothing corpus-sized
  * shuffles at arrival time; the corpus-sized work (retrain +
  * reassignment) happens only in the maintenance window the gauge rows
  * call for. */
object EmbeddingStream {

  /** One streamed vector. */
  final case class VecIn(vec_id: Long, embedding: Array[Float])

  private val VecsSchema =
    "vec_id BIGINT, embedding ARRAY<FLOAT>, nsq DOUBLE, cluster BIGINT"
  private val VhashSchema = "vec_id BIGINT, vhash BIGINT"
  private val PairsSchema =
    "id_a BIGINT, id_b BIGINT, cluster BIGINT, cosine DOUBLE"
  private val GaugeSchema =
    "batch_id BIGINT, n_ref BIGINT, n_new BIGINT, ref_fit_ppb BIGINT, " +
    "new_fit_ppb BIGINT, drift_ppb BIGINT, ref_top_share_ppb BIGINT, " +
    "new_top_share_ppb BIGINT, epoch INT, retrain BOOLEAN, " +
    "hot_clusters BIGINT"
  private val EpochSchema = "epoch INT"

  private val memDisk = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

  private def assignedOf(vectors: DataFrame, cents: DataFrame): DataFrame =
    graft.ops.Similarity.assignToCentroids(
        vectors.select(col("vec_id"), col("embedding")), cents)
      .select(col("vec_id"), col("embedding"), col("nsq"),
        col("cluster").cast("long").as("cluster"))

  private def centsOf(spark: SparkSession, root: String,
      epoch: Int): DataFrame =
    spark.read.parquet(s"$root/cents/epoch=$epoch")

  /** The epoch a batch resolves: max over COMMITTED epoch rows strictly
    * below it — deterministic under replay ([[retrainEpoch]] only writes
    * rows at a stopped committed checkpoint, so the rows a batch can see
    * never change under it). */
  private[streaming] def epochOf(spark: SparkSession, root: String,
      before: Long): Int = {
    val row = BatchState.state(spark, root, "epoch", before, EpochSchema)
      .agg(max(col("epoch"))).head()
    require(!row.isNullAt(0),
      s"no epoch rows under $root/epoch — call init first")
    row.getInt(0)
  }

  /** Initialize the standing state: the base corpus trains the epoch-0
    * centroids and lands assigned as `vecs/batch=-1` (with its hash
    * state), its persisted labeling AND pair table land as `batch=-1`
    * (the [[retire]] raw material), and `refDelta` — a held-out
    * in-distribution arrival sample, NOT the training corpus (training-
    * corpus fit would bake Lloyd's generalization gap into every drift
    * reading — the [[graft.ops.Similarity.ivfDriftGauge]] argument) —
    * anchors the epoch-0 gauge reference row. */
  def init(spark: SparkSession, root: String, baseEmb: DataFrame,
      basePairs: DataFrame, baseLabels: DataFrame, refDelta: DataFrame,
      nCentroids: Int = 32, lloydIters: Int = 2): Unit =
    initWith(spark, root, baseEmb,
      graft.ops.Similarity.trainCentroids(baseEmb, nCentroids, lloydIters),
      None, basePairs, baseLabels, refDelta)

  /** [[init]] with pre-trained epoch-0 centroids (and optionally the
    * base corpus already assigned under them) — so a caller that
    * trained/assigned while DERIVING the base artifacts
    * ([[initFromCorpus]]) does not pay the two heaviest passes twice. */
  private def initWith(spark: SparkSession, root: String,
      baseEmb: DataFrame, cents0: DataFrame,
      baseAssigned: Option[DataFrame], basePairs: DataFrame,
      baseLabels: DataFrame, refDelta: DataFrame): Unit = {
    cents0.write.mode("overwrite").parquet(s"$root/cents/epoch=0")
    val cents = centsOf(spark, root, 0)
    BatchState.write(
      baseAssigned.getOrElse(assignedOf(baseEmb, cents)), root, "vecs", -1L)
    BatchState.write(baseEmb.select(col("vec_id"),
      xxhash64(col("embedding")).as("vhash")), root, "vhash", -1L)
    BatchState.write(basePairs.select(col("id_a"), col("id_b"),
        col("cluster").cast("long"), col("cosine")),
      root, "pairs", -1L)
    BatchState.write(baseLabels.select(col("doc_id"), col("cluster_id")),
      root, "labels", -1L)
    graft.ops.Similarity.fitAndShareStats(
        assignedOf(refDelta, cents), cents)
      .write.mode("overwrite").parquet(s"$root/gref/epoch=0")
    import spark.implicits._
    BatchState.write(Seq(0).toDF("epoch"), root, "epoch", -1L)
  }

  /** [[init]] with the standing corpus's own artifacts DERIVED here —
    * the bootstrap every gate/soak/registration shares (one definition,
    * so a change to init's contract cannot silently diverge a gate from
    * the pipeline it gates): epoch-0 centroids train on `baseEmb`
    * (deterministic — same rows, same centroids as any other train on
    * them), the base pair table is the cluster-local self-join under
    * those centroids, and the base labeling is its connected
    * components. A production deployment with PRE-built artifacts calls
    * [[init]] directly. */
  def initFromCorpus(spark: SparkSession, root: String, baseEmb: DataFrame,
      refDelta: DataFrame, threshold: Double = 0.4, nCentroids: Int = 32,
      lloydIters: Int = 2): Unit = {
    // train ONCE and assign ONCE — the derived artifacts (pairs, labels)
    // and the standing `vecs/` state share the same checkpointed frames
    // instead of re-running the two heaviest passes inside init
    val cents0 = graft.ops.Similarity
      .trainCentroids(baseEmb, nCentroids, lloydIters)
      .localCheckpoint(true, memDisk)
    val assigned0 = assignedOf(baseEmb, cents0)
      .localCheckpoint(true, memDisk)
    val basePairs = graft.ops.Similarity
      .semanticDedupUnordered(assigned0, threshold)
      .localCheckpoint(true, memDisk)
    val baseLabels = graft.ops.Dedup.nearDupClusters(
      baseEmb.select(col("vec_id").as("doc_id")),
      basePairs.select(col("id_a"), col("id_b")))
    initWith(spark, root, baseEmb, cents0, Some(assigned0), basePairs,
      baseLabels, refDelta)
    Seq(cents0, assigned0, basePairs)
      .foreach(graft.Snap.free(_))
  }

  /** Consolidate every committed state surface below `upToBatch` — the
    * [[DocumentStream.consolidate]] contract on the vector tier: called
    * at the start of every K-th batch over exactly the checkpoint-
    * committed directories. All four subs fold row-for-row (the vector
    * pipeline's dedup is deep-history — "semantic dup of anything ever
    * kept" — so no row ages out on a horizon; [[retire]] owns row
    * retirement). `labels/` is already bounded at two snapshots;
    * `epoch/`/`cents/`/`gref/` grow one directory per EPOCH, not per
    * batch. */
  def consolidate(spark: SparkSession, root: String,
      upToBatch: Long): Unit = {
    BatchState.tieredFold(spark, root, "vecs", upToBatch, VecsSchema, identity)
    BatchState.tieredFold(spark, root, "vhash", upToBatch, VhashSchema, identity)
    BatchState.tieredFold(spark, root, "pairs", upToBatch, PairsSchema, identity)
    BatchState.tieredFold(spark, root, "gauge", upToBatch, GaugeSchema, identity)
  }

  /** The per-batch transaction — public so the spec can drive a single
    * batch directly. Deterministic given (state before `batchId`, batch
    * rows): the epoch resolves from committed rows, every read is pinned
    * below `batchId`, every write overwrites `batch=<batchId>`. */
  def processBatch(batch: DataFrame, batchId: Long, root: String,
      threshold: Double = 0.4, consolidateEvery: Int = 0,
      hotClusterCap: Int = 0, retrainDriftPpb: Long = RetrainDriftPpb,
      collapseSharePpb: Long = CollapseSharePpb): Unit = {
    val spark = batch.sparkSession
    if (consolidateEvery > 0 && batchId > 0 &&
        batchId % consolidateEvery == 0)
      consolidate(spark, root, batchId)
    if (batch.isEmpty) return
    val epoch = epochOf(spark, root, batchId)
    val cents = centsOf(spark, root, epoch)

    // ── tier 1: exact (byte-identical) vector dedup ──
    val hashed = batch.select(col("vec_id"), col("embedding"))
      .withColumn("vhash", xxhash64(col("embedding")))
      .localCheckpoint(true, memDisk)
    // batch hashes broadcast INTO the corpus-sized hash state (narrow
    // streamed scan); only the collided subset — batch-bounded —
    // broadcasts back for the anti-join. Broadcasting the state itself
    // would ship the all-time hash set per batch (the DocumentStream
    // kept-endpoint argument).
    val dupHashes = BatchState.state(spark, root, "vhash", batchId, VhashSchema)
      .join(broadcast(hashed.select(col("vhash")).distinct()), Seq("vhash"))
      .select(col("vhash")).distinct()
    val fresh = hashed.join(broadcast(dupHashes), Seq("vhash"), "left_anti")
    val keptIds = fresh.groupBy(col("vhash"))
      .agg(min(col("vec_id")).as("vec_id")).select(col("vec_id"))
    val kept = hashed.join(keptIds, Seq("vec_id"))
      .localCheckpoint(true, memDisk)
    BatchState.write(kept.select(col("vec_id"), col("vhash")),
      root, "vhash", batchId)

    // ── tier 2: fixed-centroid assignment + inline drift gauge ──
    val assigned = assignedOf(kept, cents).localCheckpoint(true, memDisk)
    BatchState.write(assigned, root, "vecs", batchId)
    // the hot-cluster occupancy rule (tier 3's containment) computes
    // HERE so the ledger can persist how often it intervened — the
    // text/media tiers' hot_buckets audit column; an operator asking
    // "did containment fire last night" reads this, not the logs
    val hotOpt =
      if (hotClusterCap <= 0) None
      else Some(assigned.groupBy(col("cluster"))
        .agg(count(lit(1)).as("occ"))
        .filter(col("occ") > hotClusterCap)
        .select(col("cluster"))
        .localCheckpoint(true, memDisk))
    val nHot = hotOpt
      .map(_.agg(count(lit(1)).as("hot_clusters")))
      .getOrElse(spark.range(1).select(lit(0L).as("hot_clusters")))
    val stats = graft.ops.Similarity.fitAndShareStats(assigned, cents)
    val gref = spark.read.parquet(s"$root/gref/epoch=$epoch")
      .select(col("n").as("n_ref"), col("fit_ppb").as("ref_fit_ppb"),
        col("top_share_ppb").as("ref_top_share_ppb"))
    val gaugeRow = gref.crossJoin(stats).crossJoin(broadcast(nHot))
      .select(lit(batchId).as("batch_id"), col("n_ref"),
        col("n").as("n_new"), col("ref_fit_ppb"),
        col("fit_ppb").as("new_fit_ppb"),
        (col("ref_fit_ppb") - col("fit_ppb")).as("drift_ppb"),
        col("ref_top_share_ppb"),
        col("top_share_ppb").as("new_top_share_ppb"),
        lit(epoch).as("epoch"),
        (coalesce((col("ref_fit_ppb") - col("fit_ppb")) >
            lit(retrainDriftPpb), lit(false)) ||
          coalesce(col("top_share_ppb") > lit(collapseSharePpb),
            lit(false))).as("retrain"),
        col("hot_clusters"))
    BatchState.write(gaugeRow, root, "gauge", batchId)

    // ── tier 3: cluster-local pairs vs standing state + within batch ──
    // HOT-CLUSTER CAP ([[graft.ops.Similarity.semanticDedupPairsCapped]]
    // live): a mode-collapsed BATCH — the flood shape the inline gauge's
    // top_share signal detects — would otherwise make the within-batch
    // self-join quadratic in the collapsed cluster's batch occupancy and
    // the between-join's broadcast side flood-sized for that key.
    // Occupancy is the BATCH's (deliberately: standing-cluster size
    // grows with the corpus — a total-occupancy rule would eventually
    // quarantine every cluster); over-cap clusters prune from the
    // batch's pair-join side only, which kills the cluster's pairs
    // entirely (it is the join key) while the vectors still land in
    // `vecs/`/`vhash/` — quarantined from pairing until the retrain the
    // gauge prescribes, exactly the batch operator's stated policy.
    // (Occupancy itself computed in tier 2, where the ledger records it.)
    val assignedCool = hotOpt
      .map(h => assigned.join(broadcast(h), Seq("cluster"), "left_anti"))
      .getOrElse(assigned)
    val vecsState = BatchState.state(spark, root, "vecs", batchId, VecsSchema)
    val pairs = graft.ops.Similarity
      .semanticDedupPairsBetween(assignedCool, vecsState, threshold)
      .unionByName(
        graft.ops.Similarity.semanticDedupUnordered(assignedCool, threshold))
      .localCheckpoint(true, memDisk)
    BatchState.write(pairs, root, "pairs", batchId)

    // ── tier 4: incremental label merge over the previous snapshot ──
    val prevId = BatchState.batchDirs(spark, root, "labels", batchId)
      .map(_.split("batch=").last.toLong).max // -1 exists from init
    val merged = graft.ops.Dedup.mergeClusterDelta(
      spark.read.parquet(s"$root/labels/batch=$prevId"),
      kept.select(col("vec_id").as("doc_id")),
      pairs.select(col("id_a"), col("id_b")))
    BatchState.write(merged, root, "labels", batchId)
    val f = BatchState.fs(spark, root)
    BatchState.batchDirs(spark, root, "labels", prevId)
      .filter(!_.endsWith("batch=-1"))
      .foreach(p => f.delete(new org.apache.hadoop.fs.Path(p), true))
    // the batch's checkpoint blocks serve nothing once its state is on
    // disk — free them now instead of waiting for the ContextCleaner
    // (a long-lived session would otherwise pin one frame set per batch)
    Seq(hashed, kept, assigned, pairs, merged)
      .foreach(graft.Snap.free(_))
    hotOpt.foreach(graft.Snap.free(_))
  }

  /** Default gauge thresholds — the [[graft.ops.Similarity.ivfDriftGauge]]
    * calibration (an order of magnitude above measured in-distribution
    * noise, well under the measured shifted cases — SCALE.md receipts). */
  val RetrainDriftPpb = 50000000L
  val CollapseSharePpb = 400000000L

  /** EXECUTE the retrain the gauge rows call for — the in-pipeline form
    * of [[graft.ops.Similarity.ivfRetrainEpoch]]. OPERATIONAL CONTRACT:
    * run with the stream STOPPED at a committed checkpoint (the
    * reference's maintenance-window discipline; earlier batches must not
    * replay afterwards).
    *
    *  - centroids retrain over the STANDING corpus (base ∪ every kept
    *    arrival) — deterministic in the row set, so the handoff equals a
    *    from-scratch build on the accumulated corpus
    *    (EmbeddingStreamSpec + the q_embstream_epoch_handoff oracle);
    *  - every `vecs/` directory reassigns in place (`_unit_lo` sidecars
    *    preserved) — the one corpus-sized pass, amortized per epoch;
    *  - the gauge re-anchors: `refDelta` (a recent in-distribution-NOW
    *    arrival sample — after a real shift that means the post-shift
    *    distribution) becomes the new epoch's reference row;
    *  - the `epoch/` row lands at the last committed batch id, so every
    *    subsequent batch — and only subsequent batches — resolves the
    *    new epoch. */
  def retrainEpoch(spark: SparkSession, root: String, newEpoch: Int,
      refDelta: DataFrame, nCentroids: Int = 32,
      lloydIters: Int = 2): Unit = {
    Seq("vecs", "vhash", "pairs", "gauge")
      .foreach(BatchState.recoverFold(spark, root, _))
    val standing = BatchState.state(spark, root, "vecs", Long.MaxValue,
      VecsSchema).select(col("vec_id"), col("embedding"))
    graft.ops.Similarity.trainCentroids(standing, nCentroids, lloydIters)
      .write.mode("overwrite").parquet(s"$root/cents/epoch=$newEpoch")
    val cents = centsOf(spark, root, newEpoch)
    BatchState.batchDirs(spark, root, "vecs", Long.MaxValue).foreach { p =>
      BatchState.rewriteDirPreservingUnit(spark, root, "vecs", p,
        df => assignedOf(df, cents))
    }
    graft.ops.Similarity.fitAndShareStats(assignedOf(refDelta, cents), cents)
      .write.mode("overwrite").parquet(s"$root/gref/epoch=$newEpoch")
    val lastCommitted = BatchState.batchDirs(spark, root, "vecs",
        Long.MaxValue)
      .map(_.split("batch=").last.toLong).max
    import spark.implicits._
    BatchState.write(Seq(newEpoch).toDF("epoch"), root, "epoch",
      lastCommitted)
  }

  /** RETROACTIVE DECONTAMINATION — [[FingerprintStream.decontaminate]]'s
    * vector twin, completing the repair operator across all three
    * runnable tiers: a root that ran UNCAPPED through an
    * embedding-template flood (a mode-collapsed encoder, a re-posted
    * viral embedding) has persisted the collapsed cluster's quadratic
    * junk pairs and merged the family into a mega-cluster. This applies
    * the occupancy rule retroactively over the STANDING assignment:
    * clusters over `hotClusterCap` quarantine — every persisted pair
    * touching one of their members deletes (pairs are cluster-local by
    * construction, so under the fixed-quantizer contract "touching" and
    * "within" coincide), the pair directories physically rewrite, and
    * only the touched components' labels re-converge
    * ([[graft.ops.Dedup.reconvergeClusterDelta]]). Run with the stream
    * STOPPED at a committed checkpoint.
    *
    * SEMANTICS: with the quantizer unrotated since the pairs were
    * committed (the fixed-centroid epoch contract), the post-repair
    * pair state equals
    * [[graft.ops.Similarity.semanticDedupPairsCapped]]'s policy over
    * the standing corpus — spec-pinned against the capped twin root.
    * Across an epoch rotation the repair is the POLICY form: pairs
    * touching a currently-over-cap cluster quarantine (the conservative
    * reading — exactness has no meaning for pairs generated under a
    * retired quantizer). `vecs/` is NOT rewritten: the vectors are real
    * arrivals, retention owns their lifecycle, and the standing
    * occupancy must stay visible to the gauge — the quarantine-not-
    * deletion stance of the live cap. Idempotent; cost ∝ flood-touched
    * components; the clean-root pass pays one occupancy count. Returns
    * the one-row repair report. */
  def decontaminate(spark: SparkSession, root: String, hotClusterCap: Int,
      broadcastRowLimit: Long = 8L << 20): DataFrame = {
    import spark.implicits._
    require(hotClusterCap > 0,
      s"hotClusterCap must be positive: $hotClusterCap")
    Seq("vecs", "vhash", "pairs", "gauge")
      .foreach(BatchState.recoverFold(spark, root, _))
    val assigned = assignedState(spark, root)
      .select(col("vec_id"), col("cluster"))
    val hot = assigned.groupBy(col("cluster"))
      .agg(count(lit(1)).as("occ"))
      .filter(col("occ") > hotClusterCap)
      .select(col("cluster"))
      .localCheckpoint(true, memDisk) // tiny by construction
    val nHot = hot.count()
    val members = assigned.join(broadcast(hot), Seq("cluster"))
      .select(col("vec_id")).distinct()
      .localCheckpoint(true, memDisk)
    val nMembers = members.count()
    def mb(df: DataFrame): DataFrame =
      if (nMembers <= broadcastRowLimit) broadcast(df) else df
    val pairsState = livePairs(spark, root).select(col("id_a"), col("id_b"))
    val dropped = pairsState
      .join(mb(members.select(col("vec_id").as("id_a"))), Seq("id_a"),
        "left_semi")
      .unionByName(pairsState
        .join(mb(members.select(col("vec_id").as("id_b"))), Seq("id_b"),
          "left_semi")
        .select(col("id_a"), col("id_b")))
      .distinct()
      .localCheckpoint(true, memDisk)
    val nDropped = dropped.count()
    // pair-sized set: its broadcast decision probes its own count (the
    // [[FingerprintStream.decontaminate]] flood-clique argument)
    def mbPairs(df: DataFrame): DataFrame =
      if (nDropped <= broadcastRowLimit) broadcast(df) else df
    if (nDropped > 0) {
      BatchState.batchDirs(spark, root, "pairs", Long.MaxValue).foreach {
        p => BatchState.rewriteDirPreservingUnit(spark, root, "pairs", p,
          df => df.join(mbPairs(dropped), Seq("id_a", "id_b"), "left_anti"))
      }
      val newPairs = BatchState.state(spark, root, "pairs", Long.MaxValue,
        PairsSchema).select(col("id_a"), col("id_b"))
      val seeds = dropped.select(col("id_a").as("doc_id"))
        .unionByName(dropped.select(col("id_b").as("doc_id")))
        .distinct()
      val repaired = graft.ops.Dedup.reconvergeClusterDelta(
        labels(spark, root).select(col("doc_id"), col("cluster_id")),
        newPairs, seeds)
      val latest = BatchState.batchDirs(spark, root, "labels", Long.MaxValue)
        .maxBy(_.split("batch=").last.toLong)
      repaired.write.mode("overwrite").parquet(latest)
      graft.Snap.free(repaired)
    }
    Seq(hot, members, dropped).foreach(graft.Snap.free(_))
    Seq((nHot, nMembers, nDropped))
      .toDF("hot_clusters", "n_members", "n_dropped")
  }

  /** RETENTION — [[DocumentStream.retire]] on the vector tier, with the
    * same stopped-checkpoint contract: labels re-converge through the
    * surviving pair edges ([[graft.ops.Dedup.retireClusterDelta]] — the
    * PRE-prune pair state, since removal can split components), then
    * every per-vector state surface drops the expired rows in place
    * (sidecars preserved). A retired vector stops generating pairs
    * IMMEDIATELY (its `vecs/` row is gone from the between-join) and a
    * re-sent identical vector is genuinely new again (its `vhash/` row
    * is gone). */
  def retire(spark: SparkSession, root: String,
      expiredIds: DataFrame): Unit = {
    Seq("vecs", "vhash", "pairs", "gauge")
      .foreach(BatchState.recoverFold(spark, root, _))
    val e = expiredIds
      .select(col(graft.ops.Dedup.expiryKey(expiredIds, "vec_id"))
        .as("doc_id")).distinct()
      .localCheckpoint(true, memDisk)
    val pairsState = BatchState.state(spark, root, "pairs", Long.MaxValue,
      PairsSchema).select(col("id_a"), col("id_b"))
    // retireClusterDelta returns its result already checkpointed
    val retired = graft.ops.Dedup.retireClusterDelta(
      labels(spark, root), pairsState, e)
    val latest = BatchState.batchDirs(spark, root, "labels", Long.MaxValue)
      .maxBy(_.split("batch=").last.toLong)
    retired.write.mode("overwrite").parquet(latest)
    def prune(sub: String, cols: Seq[String]): Unit =
      BatchState.batchDirs(spark, root, sub, Long.MaxValue).foreach { p =>
        BatchState.rewriteDirPreservingUnit(spark, root, sub, p,
          df => cols.foldLeft(df)(
            (acc, c) => graft.ops.Dedup.expireRows(acc, c, e)))
      }
    prune("vecs", Seq("vec_id"))
    prune("vhash", Seq("vec_id"))
    prune("pairs", Seq("id_a", "id_b"))
    graft.Snap.free(e)
    graft.Snap.free(retired)
    ()
  }

  /** Start the pipeline on a streaming (vec_id, embedding) frame.
    * `schedulerPool` names the FAIR pool every batch's jobs submit to
    * (thread-local `spark.scheduler.pool`, set on the foreachBatch
    * execution thread — the co-residency deployment shape, SCALE.md);
    * the gauge thresholds are deployment-tunable with the
    * oracle-pinned calibration as defaults. */
  def start(vectors: DataFrame, root: String, checkpoint: String,
      threshold: Double = 0.4, maxDelayMs: Long = 100L,
      consolidateEvery: Int = 0, hotClusterCap: Int = 0,
      retrainDriftPpb: Long = RetrainDriftPpb,
      collapseSharePpb: Long = CollapseSharePpb,
      schedulerPool: Option[String] = None): StreamingQuery =
    vectors.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(s"$maxDelayMs milliseconds"))
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        schedulerPool.foreach(p => batch.sparkSession.sparkContext
          .setLocalProperty("spark.scheduler.pool", p))
        processBatch(batch, batchId, root, threshold,
          consolidateEvery = consolidateEvery,
          hotClusterCap = hotClusterCap,
          retrainDriftPpb = retrainDriftPpb,
          collapseSharePpb = collapseSharePpb)
      }
      .start()

  // ── served outputs (what a reader queries between batches) ──

  def keptIds(spark: SparkSession, root: String): DataFrame =
    BatchState.state(spark, root, "vecs", Long.MaxValue, VecsSchema)
      .select(col("vec_id"))

  /** The standing assigned corpus (vec_id, embedding, nsq, cluster) —
    * what an arrival batch's between-join reads, and what [[retrainEpoch]]
    * rebuilds from. */
  def assignedState(spark: SparkSession, root: String): DataFrame =
    BatchState.state(spark, root, "vecs", Long.MaxValue, VecsSchema)

  def livePairs(spark: SparkSession, root: String): DataFrame =
    BatchState.state(spark, root, "pairs", Long.MaxValue, PairsSchema)

  /** Health rows, one per non-empty batch — the pipeline's drift ledger
    * (what an operator alerts on, and what decides [[retrainEpoch]]). */
  def gaugeRows(spark: SparkSession, root: String): DataFrame =
    BatchState.state(spark, root, "gauge", Long.MaxValue, GaugeSchema)

  def labels(spark: SparkSession, root: String): DataFrame = {
    val dirs = BatchState.batchDirs(spark, root, "labels", Long.MaxValue)
    require(dirs.nonEmpty, s"no label snapshot under $root/labels")
    spark.read.parquet(dirs.maxBy(_.split("batch=").last.toLong))
  }

  def currentEpoch(spark: SparkSession, root: String): Int =
    epochOf(spark, root, Long.MaxValue)

  /** One batch's emitted pair set (the epoch-handoff gate serves the
    * post-retrain batch's pairs through this) — requires the directory
    * not to have been consolidated past. */
  def pairsOfBatch(spark: SparkSession, root: String,
      batchId: Long): DataFrame =
    spark.read.schema(
        org.apache.spark.sql.types.StructType.fromDDL(PairsSchema))
      .parquet(s"$root/pairs/batch=$batchId")
}
