package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.ops.{Dedup, Similarity}

/** The RUNNABLE vector pipeline ([[EmbeddingStream]]), held to the
  * hand-driven gate's truth plus the surfaces only the runnable form
  * has: the exact-hash tier actually dropping byte-identical re-sends,
  * the drift → retrain → serve epoch handoff resolving deterministically
  * from committed state, consolidation preserving every served row, and
  * retention re-converging labels on the survivor corpus. */
class EmbeddingStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def freshRoot(name: String): String = {
    val root = s"target/embstream_spec/$name"
    new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(root), true)
    root
  }

  /** Base/arrival split with the pipeline initialized on the base slice;
    * returns (root, emb, splitId, cents0). */
  private def initOn(name: String, threshold: Double = 0.4)
      : (String, org.apache.spark.sql.DataFrame, Long,
         org.apache.spark.sql.DataFrame) = {
    val emb = graft.Tables.embeddings(spark, SparkTestBase.sfDir)
    val maxId = emb.agg(max(col("vec_id"))).head().getLong(0)
    val splitId = (maxId + 1L) * 3L / 5L
    val base = emb.filter(col("vec_id") < splitId)
    val root = freshRoot(name)
    EmbeddingStream.initFromCorpus(spark, root, base,
      refDelta = emb.filter(col("vec_id") >= splitId), threshold)
    // twins compare under the PIPELINE's own epoch-0 centroids
    (root, emb, splitId, spark.read.parquet(s"$root/cents/epoch=0"))
  }

  private def setEqual(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  test("exact tier drops byte-identical re-sends; labels equal the survivor twin") {
    val (root, emb, splitId, cents0) = initOn("exact")
    // arrivals in two batches; the second batch re-sends the first
    // base vector's embedding under new ids (plus one in-batch copy)
    val dupSrc = emb.filter(col("vec_id") === 0).select(col("embedding"))
      .head().getSeq[Float](0)
    import spark.implicits._
    val midId = splitId + (emb.filter(col("vec_id") >= splitId).count() / 2)
    val w1 = emb.filter(col("vec_id") >= splitId && col("vec_id") < midId)
      .select(col("vec_id"), col("embedding"))
    val dupIds = Seq(900001L, 900002L)
    val w2 = emb.filter(col("vec_id") >= midId)
      .select(col("vec_id"), col("embedding"))
      .unionByName(dupIds.map(id => (id, dupSrc.toArray))
        .toDF("vec_id", "embedding"))
    EmbeddingStream.processBatch(w1, 0L, root)
    EmbeddingStream.processBatch(w2, 1L, root)

    // both re-sends dropped: vec_id 0 already holds that hash
    val kept = EmbeddingStream.keptIds(spark, root)
    assert(kept.filter(col("vec_id").isin(dupIds: _*)).isEmpty)
    assert(kept.count() === emb.count())

    // final labels equal the all-at-once twin over the SURVIVOR corpus
    val (_, twin) = ParityCheck.embeddingBatchTwin(emb, cents0, 0.4)
    assert(setEqual(EmbeddingStream.labels(spark, root), twin))
  }

  test("decontam gate end to end on the sf corpus: the uncapped " +
      "sign-flip flood root, repaired, equals the cool-cluster truth") {
    val dir = graft.SparkTestBase.sfDir
    val root = ParityCheck.buildDecontamEmbeddingPipeline(spark, dir)
    val row = ParityCheck.embDecontamParity(spark, dir, root).head()
    assert(row.getAs[Boolean]("parity_ok"),
      s"vector decontam gate diverged: $row")
    assert(row.getAs[Long]("n_dropped") > 0L, "repair dropped nothing")
    assert(row.getAs[Long]("hot_clusters") > 0L, "no hot cluster found")
  }

  test("hot-cluster cap: a mode-collapsed batch's flood cluster is " +
      "quarantined from pairing; organic clusters keep theirs") {
    import spark.implicits._
    val (rootC, emb, splitId, _) = initOn("hotcap")
    val (rootU, _, _, _) = initOn("hotcap_twin")
    // a flood batch: the arrivals plus many near-copies of one base
    // vector (distinct bytes — a tiny per-copy nudge — so the exact
    // tier keeps them and they all assign to that vector's cluster)
    val src = emb.filter(col("vec_id") === 0).select(col("embedding"))
      .head().getSeq[Float](0).toArray
    val floodRows = (0 until 40).map { i =>
      val v = src.clone(); v(0) = v(0) + (i + 1) * 1e-4f
      (800000L + i, v)
    }
    val batch = emb.filter(col("vec_id") >= splitId)
      .select(col("vec_id"), col("embedding"))
      .unionByName(floodRows.toDF("vec_id", "embedding"))
      .localCheckpoint(true)
    EmbeddingStream.processBatch(batch, 0L, rootC, hotClusterCap = 30)
    EmbeddingStream.processBatch(batch, 0L, rootU)
    val floodIds = floodRows.map(_._1).toSet
    def pairsOf(root: String): Set[(Long, Long)] =
      EmbeddingStream.livePairs(spark, root)
        .filter(col("id_a") >= splitId || col("id_b") >= splitId)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = pairsOf(rootC)
    val uncapped = pairsOf(rootU)
    // uncapped: the flood pairs (near-copies of one vector, cosine ~1);
    // capped: the flood cluster is over the cap, so NO flood-touching
    // pair survives — while pairs wholly outside it are identical
    assert(uncapped.count(p => floodIds(p._1) || floodIds(p._2)) > 100,
      s"flood scenario vacuous: ${uncapped.size}")
    assert(capped.forall(p => !floodIds(p._1) && !floodIds(p._2)),
      "capped batch still paired the flood cluster")
    // the flood vectors are QUARANTINED, not dropped: still indexed
    assert(EmbeddingStream.keptIds(spark, rootC)
      .filter(col("vec_id").isin(floodIds.toSeq: _*)).count()
      === floodIds.size.toLong)
    // capped == uncapped minus pairs touching the flood CLUSTER (the
    // hot cluster is the flood's assigned cluster; organic arrivals
    // assigned there quarantine too — the stated recall consequence)
    val hotCluster = EmbeddingStream.assignedState(spark, rootC)
      .filter(col("vec_id") === floodRows.head._1)
      .select(col("cluster")).head().getLong(0)
    val clusterIds = EmbeddingStream.assignedState(spark, rootC)
      .filter(col("cluster") === hotCluster)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val expected = uncapped.filter(p =>
      !(clusterIds(p._1) && clusterIds(p._2)))
    assert(capped == expected,
      s"capped != uncapped-minus-hot-cluster: only-capped=" +
        s"${(capped -- expected).take(3)} only-expected=" +
        s"${(expected -- capped).take(3)}")
    // the intervention is a LEDGER row, not just behavior: the capped
    // run's gauge records exactly one pruned cluster; the uncapped run
    // (and a capped run with no flood) records zero — the post-incident
    // audit surface the text/media tiers' hot_buckets column provides
    def hotOf(root: String): Long = EmbeddingStream.gaugeRows(spark, root)
      .filter(col("batch_id") === 0L)
      .select(col("hot_clusters")).head().getLong(0)
    assert(hotOf(rootC) === 1L, "capped flood batch must ledger its prune")
    assert(hotOf(rootU) === 0L, "uncapped run must ledger zero")

    // ── RETROACTIVE DECONTAMINATION (vector twin). The repair's cap is
    // a CORPUS-level occupancy bound over the STANDING assignment (the
    // live cap's basis is the batch — the media tier's arrival-vs-
    // corpus distinction), so the spec derives it from the fixture: one
    // over the largest ORGANIC standing cluster, making the flood
    // cluster the exact hot set. Repairing the uncapped root must then
    // delete every persisted pair touching the flood cluster — the
    // base init's pairs inside it included, which the live cap (born
    // after init) never saw — and re-converge exactly those components.
    val standingOcc = EmbeddingStream.assignedState(spark, rootU)
      .groupBy(col("cluster")).agg(count(lit(1)).as("occ"))
    val organicMax = standingOcc.filter(col("cluster") =!= hotCluster)
      .agg(max(col("occ"))).head().getLong(0)
    val floodOcc = standingOcc.filter(col("cluster") === hotCluster)
      .select(col("occ")).head().getLong(0)
    assert(floodOcc > organicMax,
      s"fixture degenerate: flood $floodOcc <= organic max $organicMax")
    def allPairsOf(root: String): Set[(Long, Long)] =
      EmbeddingStream.livePairs(spark, root)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncappedAll = allPairsOf(rootU)
    val expectedAfter = uncappedAll.filter(p =>
      !clusterIds(p._1) && !clusterIds(p._2))
    val report = EmbeddingStream.decontaminate(spark, rootU,
      hotClusterCap = organicMax.toInt).head()
    assert(report.getAs[Long]("hot_clusters") === 1L, s"report: $report")
    assert(report.getAs[Long]("n_members") === floodOcc, s"report: $report")
    assert(report.getAs[Long]("n_dropped") ===
      (uncappedAll.size - expectedAfter.size).toLong, s"report: $report")
    assert(allPairsOf(rootU) == expectedAfter,
      "repaired pairs != policy truth")
    // labels re-converged to CC over the surviving pair set exactly
    val ccAfter = graft.ops.Dedup.nearDupClusters(
      EmbeddingStream.keptIds(spark, rootU)
        .select(col("vec_id").as("doc_id")),
      expectedAfter.toSeq.toDF("id_a", "id_b"))
    assert(setEqual(EmbeddingStream.labels(spark, rootU), ccAfter),
      "repaired labels != CC over surviving pairs")
    // idempotent: the hot cluster is still over cap (vectors stay — the
    // quarantine stance) but nothing is left to drop
    val again = EmbeddingStream.decontaminate(spark, rootU,
      hotClusterCap = organicMax.toInt).head()
    assert(again.getAs[Long]("hot_clusters") === 1L)
    assert(again.getAs[Long]("n_dropped") === 0L, s"second pass: $again")
    assert(allPairsOf(rootU) == expectedAfter, "second pass changed state")
  }

  test("a fully-duplicate batch (upstream re-send) is a clean no-op") {
    val (root, emb, splitId, _) = initOn("fulldup")
    val arr = emb.filter(col("vec_id") >= splitId)
      .select(col("vec_id"), col("embedding")).localCheckpoint(true)
    EmbeddingStream.processBatch(arr, 0L, root)
    val keptBefore = EmbeddingStream.keptIds(spark, root).count()
    val labelsBefore = EmbeddingStream.labels(spark, root)
      .localCheckpoint(true)
    // the whole batch re-sends already-kept bytes under new ids: every
    // row must drop at the exact tier and no served state may change
    val resend = arr.select((col("vec_id") + lit(5000000L)).as("vec_id"),
      col("embedding"))
    EmbeddingStream.processBatch(resend, 1L, root)
    assert(EmbeddingStream.keptIds(spark, root).count() === keptBefore)
    assert(setEqual(EmbeddingStream.labels(spark, root), labelsBefore))
    // the batch still leaves its (empty-n) health row — quiet, not NULL
    // alarms
    val g = EmbeddingStream.gaugeRows(spark, root)
      .filter(col("batch_id") === 1L).head()
    assert(g.getAs[Long]("n_new") === 0L)
    assert(!g.getAs[Boolean]("retrain"))
  }

  test("consolidation preserves every served row and bounds directories") {
    val (rootA, emb, splitId, _) = initOn("consA")
    val (rootB, _, _, _) = initOn("consB")
    val arr = emb.filter(col("vec_id") >= splitId)
      .select(col("vec_id"), col("embedding")).localCheckpoint(true)
    val n = arr.count()
    val ids = arr.select(col("vec_id")).as[Long](
      org.apache.spark.sql.Encoders.scalaLong).collect().sorted
    val waves = ids.grouped(math.max(1, ids.length / 6)).toSeq
    waves.zipWithIndex.foreach { case (w, i) =>
      val batch = arr.filter(col("vec_id").isin(w: _*))
      EmbeddingStream.processBatch(batch, i.toLong, rootA,
        consolidateEvery = 2)
      EmbeddingStream.processBatch(batch, i.toLong, rootB)
    }
    // one more consolidation pass over everything committed
    EmbeddingStream.consolidate(spark, rootA, waves.length.toLong)
    assert(setEqual(EmbeddingStream.livePairs(spark, rootA),
      EmbeddingStream.livePairs(spark, rootB)))
    assert(setEqual(EmbeddingStream.labels(spark, rootA),
      EmbeddingStream.labels(spark, rootB)))
    assert(setEqual(EmbeddingStream.keptIds(spark, rootA),
      EmbeddingStream.keptIds(spark, rootB)))
    assert(setEqual(EmbeddingStream.gaugeRows(spark, rootA),
      EmbeddingStream.gaugeRows(spark, rootB)))
    val f = new org.apache.hadoop.fs.Path(rootA)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dirs(root: String, sub: String) =
      f.listStatus(new org.apache.hadoop.fs.Path(s"$root/$sub"))
        .count(_.getPath.getName.startsWith("batch="))
    Seq("vecs", "vhash", "pairs", "gauge").foreach { sub =>
      assert(dirs(rootA, sub) < dirs(rootB, sub),
        s"$sub: consolidation must reduce directory count")
      // the ladder bound over FOLDED batches: base + O(log) units
      assert(dirs(rootA, sub) <= 4,
        s"$sub: ${dirs(rootA, sub)} dirs after full fold")
    }
    assert(n > 0)
  }

  test("epoch handoff: gauge fires on a shifted batch, retrain re-anchors, epoch resolution is committed-state-deterministic") {
    val (root, emb, splitId, _) = initOn("epoch")
    def shift(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("embedding",
        transform(col("embedding"), x => (abs(x) + lit(0.5d)).cast("float")))
    val arr = emb.filter(col("vec_id") >= splitId)
      .select(col("vec_id"), col("embedding"))
    val midId = splitId + (emb.filter(col("vec_id") >= splitId).count() / 2)
    val d0 = arr.filter(col("vec_id") < midId)
    val d1 = shift(arr.filter(col("vec_id") >= midId))
    EmbeddingStream.processBatch(d0, 0L, root)
    EmbeddingStream.processBatch(d1, 1L, root)
    val rows = EmbeddingStream.gaugeRows(spark, root)
      .orderBy(col("batch_id")).collect()
    assert(!rows(0).getAs[Boolean]("retrain"),
      s"in-distribution batch must stay quiet: ${rows(0)}")
    assert(rows(1).getAs[Boolean]("retrain"),
      s"shifted batch must fire: ${rows(1)}")
    EmbeddingStream.retrainEpoch(spark, root, 1, refDelta = d1)
    // committed-state epoch resolution: batches ≤ the retrain point keep
    // epoch 0; every later batch resolves epoch 1
    assert(EmbeddingStream.epochOf(spark, root, 1L) === 0)
    assert(EmbeddingStream.epochOf(spark, root, 2L) === 1)
    assert(EmbeddingStream.currentEpoch(spark, root) === 1)
    // re-anchored: the post-shift distribution is quiet under epoch 1
    // (a DIFFERENT sample of it — shifting d0's vectors — so the exact
    // tier doesn't drop the batch as byte-identical re-sends)
    val d1b = shift(d0)
      .withColumn("vec_id", col("vec_id") + lit(1000000L))
    EmbeddingStream.processBatch(d1b, 2L, root)
    val after = EmbeddingStream.gaugeRows(spark, root)
      .filter(col("batch_id") === 2L).head()
    assert(after.getAs[Int]("epoch") === 1)
    assert(!after.getAs[Boolean]("retrain"),
      s"re-anchored gauge must be quiet on the new distribution: $after")
    // the standing state serves under the new quantizer: every vecs row's
    // cluster equals a fresh assignment to the epoch-1 centroids
    val cents1 = spark.read.parquet(s"$root/cents/epoch=1")
    val standing = EmbeddingStream.assignedState(spark, root)
      .localCheckpoint(true)
    val reassigned = Similarity.assignToCentroids(
        standing.select(col("vec_id"), col("embedding")), cents1)
      .select(col("vec_id"), col("cluster").cast("long").as("cluster"))
    assert(setEqual(standing.select(col("vec_id"), col("cluster")),
      reassigned))
  }

  test("retire: labels re-converge on survivors; retired vectors stop pairing and re-sends are new again") {
    val (root, emb, splitId, cents0) = initOn("retire")
    val arr = emb.filter(col("vec_id") >= splitId)
      .select(col("vec_id"), col("embedding")).localCheckpoint(true)
    EmbeddingStream.processBatch(arr, 0L, root)
    // expire every 5th vector (base and arrivals both)
    val expired = emb.select(col("vec_id"))
      .filter(col("vec_id") % 5 === 0).localCheckpoint(true)
    EmbeddingStream.retire(spark, root, expired)
    val survivors = emb.join(expired, Seq("vec_id"), "left_anti")
      .localCheckpoint(true)
    assert(setEqual(EmbeddingStream.keptIds(spark, root),
      survivors.select(col("vec_id"))))
    // label truth on survivors under the UNCHANGED epoch-0 quantizer
    val (survPairs, twin) = ParityCheck.embeddingBatchTwin(
      survivors, cents0, 0.4)
    assert(setEqual(EmbeddingStream.labels(spark, root), twin))
    assert(setEqual(
      EmbeddingStream.livePairs(spark, root)
        .select(col("id_a"), col("id_b")),
      survPairs))
    // a re-sent expired vector is genuinely new: its hash row is gone,
    // so it survives the exact tier
    val resend = emb.filter(col("vec_id") === 5)
      .select((col("vec_id") + lit(2000000L)).as("vec_id"),
        col("embedding"))
    EmbeddingStream.processBatch(resend, 1L, root)
    assert(EmbeddingStream.keptIds(spark, root)
      .filter(col("vec_id") === 2000005L).count() === 1L)
    // the expiry key resolves BY NAME: a multi-column frame without a
    // vec_id column must fail loudly instead of silently keying on
    // whatever column happens to be first
    import spark.implicits._
    val bad = Seq(("junk", 10L)).toDF("note", "other_id")
    val err = intercept[IllegalArgumentException] {
      EmbeddingStream.retire(spark, root, bad)
    }
    assert(err.getMessage.contains("single-column"))
    // and a frame that CARRIES vec_id (not first) keys on it by name
    val survivorsNow = EmbeddingStream.keptIds(spark, root)
      .collect().map(_.getLong(0)).toSet
    val target = survivorsNow.head
    EmbeddingStream.retire(spark, root,
      Seq(("junk", target)).toDF("note", "vec_id"))
    assert(!EmbeddingStream.keptIds(spark, root)
      .collect().map(_.getLong(0)).toSet.contains(target),
      "by-name expiry did not retire the vec_id column's row")
  }
}
