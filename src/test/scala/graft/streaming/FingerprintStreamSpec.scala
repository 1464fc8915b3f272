package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.ops.{Dedup, Multimodal}

/** The runnable FINGERPRINT (media) pipeline's tier-level contracts,
  * driven batch-by-batch on a synthetic real-PNG corpus (the texture
  * classes make the truth closed-form: same doc_id % 5 class → hamming 0
  * cliques; cross-class ≈ 64 bits apart). The stop/restart-across-
  * consolidation gate is [[ParityCheck.fingerprintRestartParity]]
  * (q_fpstream_restart_parity); this spec pins replay idempotency,
  * consolidation equivalence, the quarantine ledger, and retire. */
class FingerprintStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("batches land on the closed-form truth; replay idempotent; " +
      "quarantine counted; consolidation no-op on served rows; retire " +
      "prunes index and re-converges labels") {
    import spark.implicits._
    // 40 real PNG images (ids ≡ 1 mod 3 — imagePngMedia's slice), five
    // texture classes by id % 5
    val ids = (0L until 40L).map(i => i * 3 + 1)
    val docs = ids.map(id => (id, s"src${id % 8}")).toDF("doc_id", "source")
    val media = Multimodal.imagePngMedia(spark, docs)
      .collect().sortBy(_.media_id)
    val (baseMedia, arrMediaRaw) = media.splitAt(25)
    // one corrupt arrival: truncated payload must quarantine, not crash
    val corruptId = arrMediaRaw(2).media_id
    val arrMedia = arrMediaRaw.map(m =>
      if (m.media_id == corruptId) m.copy(payload = m.payload.take(10))
      else m)

    def fpOf(ms: Seq[Multimodal.MediaRow]) =
      Multimodal.pHashes(spark.createDataset(ms.toSeq))
        .filter(_.decoded).toDF()
        .select(col("media_id").as("doc_id"),
          col("ph0").as("sh0"), col("ph1").as("sh1"))

    val base = "target/fpstream_spec"
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    val root = s"$base/state"
    val baseFps = fpOf(baseMedia.toSeq).localCheckpoint(true)
    val basePairs = Dedup.hammingPairs128(baseFps, 3).localCheckpoint(true)
    FingerprintStream.init(spark, root, baseFps, basePairs,
      Dedup.nearDupClusters(baseFps.select(col("doc_id")),
        basePairs.select(col("id_a"), col("id_b"))))

    val waves = arrMedia.toSeq.grouped(5).toSeq
    def served() = (
      FingerprintStream.indexedFps(spark, root)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq,
      FingerprintStream.livePairs(spark, root)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq,
      FingerprintStream.labels(spark, root)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap)
    waves.zipWithIndex.foreach { case (w, i) =>
      FingerprintStream.processBatch(spark.createDataset(w).toDF(),
        i.toLong, root, maxHamming = 3, consolidateEvery = 2)
      if (i == 1) {
        // the at-least-once hazard: replaying the committed batch must
        // leave every surface bit-identical
        val snap = served()
        FingerprintStream.processBatch(spark.createDataset(w).toDF(),
          i.toLong, root, maxHamming = 3, consolidateEvery = 2)
        assert(served() == snap, "replay changed state")
      }
    }

    // ── closed-form truth: decoded docs form hamming-0 class cliques ──
    val decodedIds = ids.filter(_ != corruptId)
    val expectLabels = decodedIds.map(id =>
      id -> decodedIds.filter(_ % 5 == id % 5).min).toMap
    val (fpsNow, pairsNow, labelsNow) = served()
    assert(labelsNow == expectLabels,
      s"labels != closed-form cliques")
    assert(fpsNow.map(_._1).toSet == decodedIds.toSet,
      "index != decoded doc set")
    val expectPairs = (for {
      a <- decodedIds; b <- decodedIds
      if a < b && a % 5 == b % 5
    } yield (a, b)).sorted
    assert(pairsNow == expectPairs, "pair state != class cliques")

    // ── quarantine ledger: exactly the corrupt arrival, nothing else ──
    val g = FingerprintStream.gaugeRows(spark, root)
      .agg(sum(col("n_arrived")), sum(col("n_decoded")),
        sum(col("n_quarantined")), sum(col("n_pairs"))).head()
    assert(g.getLong(0) == arrMedia.length.toLong)
    assert(g.getLong(1) == arrMedia.length.toLong - 1L)
    assert(g.getLong(2) == 1L, s"quarantine count wrong: $g")
    // quarantine-rate ALERT policy: the corrupt wave (1 of 5 = 20% >
    // the 5% threshold) must mark alert with quar_ppb exact; clean
    // uncapped waves must not (no hot buckets, no quarantine)
    val rows = FingerprintStream.gaugeRows(spark, root)
      .orderBy(col("batch_id")).collect()
    val corruptWave = rows.filter(_.getAs[Long]("n_quarantined") > 0L)
    assert(corruptWave.length == 1)
    assert(corruptWave.head.getAs[Long]("quar_ppb") == 200000000L)
    assert(corruptWave.head.getAs[Boolean]("alert"))
    assert(rows.filter(_.getAs[Long]("n_quarantined") == 0L)
      .forall(r => !r.getAs[Boolean]("alert") &&
        r.getAs[Long]("hot_buckets") == 0L),
      "clean uncapped wave alerted")

    // ── a consolidation pass changes no served row and bounds dirs ──
    val before = served()
    FingerprintStream.consolidate(spark, root, waves.length.toLong)
    assert(served() == before, "consolidation changed a served row")
    for (sub <- Seq("fps", "pairs", "gauge")) {
      val dirs = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$root/$sub"))
        .map(_.getPath.getName).count(_.startsWith("batch="))
      assert(dirs <= 4, s"$sub not consolidated: $dirs dirs")
    }

    // ── retire one class: index/pairs pruned, labels re-converge ──
    val expiredClass = 1L // ids ≡ 1 mod 5 among image ids
    val expired = decodedIds.filter(_ % 5 == expiredClass)
    FingerprintStream.retire(spark, root,
      expired.toDF("doc_id"))
    val (fpsR, pairsR, labelsR) = served()
    assert(fpsR.map(_._1).toSet ==
      decodedIds.toSet -- expired, "retire left expired index rows")
    assert(pairsR.forall(p =>
      !expired.contains(p._1) && !expired.contains(p._2)),
      "retire left expired pair endpoints")
    val survivors = decodedIds.filterNot(_ % 5 == expiredClass)
    val expectRetired = survivors.map(id =>
      id -> survivors.filter(_ % 5 == id % 5).min).toMap
    assert(labelsR == expectRetired,
      "retired labels != closed-form cliques over survivors")
    // a multi-column expiry frame with the id NOT first must fail loudly
    val bad = expired.map(id => (s"junk$id", id)).toDF("text", "other_id")
    val err = intercept[IllegalArgumentException] {
      FingerprintStream.retire(spark, root, bad)
    }
    assert(err.getMessage.contains("single-column"))
  }

  test("capped gate end to end on the sf0.001 corpus: restarted capped " +
      "stream equals the per-wave capped batch twin, ledger accounting " +
      "exact") {
    val dir = graft.SparkTestBase.sfDir
    val root = ParityCheck.buildCappedFingerprintPipeline(spark, dir)
    val row = ParityCheck.fpCappedRestartParity(spark, dir, root).head()
    assert(row.getAs[Boolean]("parity_ok"),
      s"capped media gate diverged: $row")
    assert(row.getAs[Long]("hot_buckets_total") > 0L, "cap never fired")
    assert(row.getAs[Long]("n_pairs_live") > 0L, "vacuous pair tier")
  }

  test("decontam gate end to end on the sf0.001 corpus: the uncapped " +
      "flood root, repaired, equals the global capped batch operator") {
    val dir = graft.SparkTestBase.sfDir
    val root = ParityCheck.buildDecontamFingerprintPipeline(spark, dir)
    val row = ParityCheck.fpDecontamParity(spark, dir, root).head()
    assert(row.getAs[Boolean]("parity_ok"),
      s"media decontam gate diverged: $row")
    assert(row.getAs[Long]("n_dropped") > 0L, "repair dropped nothing")
    assert(row.getAs[Long]("hot_buckets") > 0L, "no hot bucket found")
  }

  test("hotBucketCap quarantines a DECODABLE template flood at arrival: " +
      "no flood pair persists, organics keep pairing, the ledger " +
      "accounts (hot_buckets, alert), and the uncapped twin leaks") {
    import spark.implicits._
    // 15 base images over 5 texture classes; the flood payload is one
    // fixed out-of-family texture (seed range no generator uses), so
    // every flood copy hashes identically and collides with nothing else
    val baseIds = (0L until 15L).map(i => i * 3 + 1)
    val baseDocs = baseIds.map(id => (id, s"src${id % 8}"))
      .toDF("doc_id", "source")
    val baseMedia = Multimodal.imagePngMedia(spark, baseDocs)
      .collect().sortBy(_.media_id).toSeq
    val floodPayload = Multimodal.pngBytes(
      Multimodal.textureImage(4100000000L, 0))
    // two waves: 8 flood copies + 2 organic arrivals each (organic ids
    // continue the ≡1 mod 3 slice so they join existing classes)
    val organicIds = (15L until 19L).map(i => i * 3 + 1)
    val organicMedia = Multimodal.imagePngMedia(spark,
        organicIds.map(id => (id, s"src${id % 8}")).toDF("doc_id", "source"))
      .collect().sortBy(_.media_id).toSeq
    var fid = 9000L
    def floodRows(n: Int) = (0 until n).map { _ =>
      fid += 1; Multimodal.MediaRow(fid, "image", floodPayload, "flood")
    }
    val waves = Seq(
      organicMedia.take(2) ++ floodRows(8),
      organicMedia.drop(2) ++ floodRows(8))

    def fpOf(ms: Seq[Multimodal.MediaRow]) =
      Multimodal.pHashes(spark.createDataset(ms))
        .filter(_.decoded).toDF()
        .select(col("media_id").as("doc_id"),
          col("ph0").as("sh0"), col("ph1").as("sh1"))
    val base = "target/fpstream_cap_spec"
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    val baseFps = fpOf(baseMedia).localCheckpoint(true)
    val basePairs = Dedup.hammingPairs128(baseFps, 3).localCheckpoint(true)
    val baseLabels = Dedup.nearDupClusters(baseFps.select(col("doc_id")),
      basePairs.select(col("id_a"), col("id_b")))

    for ((mode, cap) <- Seq("uncapped" -> 0, "capped" -> 4)) {
      val root = s"$base/$mode"
      FingerprintStream.init(spark, root, baseFps, basePairs, baseLabels)
      waves.zipWithIndex.foreach { case (w, i) =>
        FingerprintStream.processBatch(spark.createDataset(w).toDF(),
          i.toLong, root, maxHamming = 3, hotBucketCap = cap)
      }
      val pairs = FingerprintStream.livePairs(spark, root)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val floodTouching = pairs.filter(p => p._1 >= 9000L || p._2 >= 9000L)
      // the pair state carries the base pair table from init (batch=-1)
      // plus every committed arrival pair — all same-class pairs over
      // base ∪ organic, none touching the flood
      val allOrganicIds = baseIds ++ organicIds
      val organicExpected = (for {
        a <- allOrganicIds; b <- allOrganicIds
        if a < b && a % 5 == b % 5
      } yield (a, b)).toSet
      if (mode == "uncapped") {
        // the leak the cap exists to stop: wave 2's 8 copies pair with
        // wave 1's 8 standing flood fingerprints plus within-wave pairs
        assert(floodTouching.nonEmpty, "uncapped flood produced no pairs")
        // DETECTION is cap-independent: the top-share signal (8 flood
        // copies of 10 decoded = 80%) alerts even with containment off
        val rows = FingerprintStream.gaugeRows(spark, root).collect()
        assert(rows.forall(_.getAs[Long]("hot_buckets") == 0L))
        assert(rows.forall(_.getAs[Long]("top_share_ppb") == 800000000L))
        assert(rows.forall(_.getAs[Boolean]("alert")),
          "uncapped flood batch did not alert")
      } else {
        assert(floodTouching.isEmpty,
          s"capped run persisted flood pairs: $floodTouching")
        assert(pairs.filterNot(p => p._1 >= 9000L || p._2 >= 9000L) ==
          organicExpected, "organic pairs damaged by the cap")
        // ledger: the flood class is 4 hot buckets in each wave; both
        // waves alert with zero quarantine (the flood DECODES — this is
        // the traffic quarantine cannot stop)
        val rows = FingerprintStream.gaugeRows(spark, root)
          .orderBy(col("batch_id")).collect()
        assert(rows.length == 2)
        assert(rows.forall(_.getAs[Long]("hot_buckets") == 4L),
          s"hot bucket accounting: ${rows.mkString(",")}")
        assert(rows.forall(_.getAs[Boolean]("alert")))
        assert(rows.forall(_.getAs[Long]("n_quarantined") == 0L))
        // the index still carries the flood fingerprints (retention owns
        // their lifecycle; only pairing is throttled)
        assert(FingerprintStream.indexedFps(spark, root)
          .filter(col("doc_id") >= 9000L).count() == 16L)
      }
    }

    // ── RETROACTIVE DECONTAMINATION: repair the uncapped root ──
    // the run above persisted the flood's 16-copy clique (C(16,2) = 120
    // junk pairs) and merged it into one mega-cluster; the repair at the
    // same cap must land on exactly the capped batch operator's truth —
    // organic pairs untouched, flood pairs gone, flood docs singletons
    val uncappedRoot = s"$base/uncapped"
    val megaBefore = FingerprintStream.labels(spark, uncappedRoot)
      .filter(col("doc_id") >= 9000L)
      .select(col("cluster_id")).distinct().count()
    assert(megaBefore == 1L, "flood did not mega-cluster before repair")
    val report = FingerprintStream.decontaminate(spark, uncappedRoot,
      hotBucketCap = 4).head()
    assert(report.getAs[Long]("hot_buckets") == 4L, s"report: $report")
    assert(report.getAs[Long]("n_members") == 16L, s"report: $report")
    assert(report.getAs[Long]("n_dropped") == 120L, s"report: $report")
    val allOrganicIds = baseIds ++ organicIds
    val organicExpected = (for {
      a <- allOrganicIds; b <- allOrganicIds
      if a < b && a % 5 == b % 5
    } yield (a, b)).toSet
    val pairsAfter = FingerprintStream.livePairs(spark, uncappedRoot)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairsAfter == organicExpected,
      "repaired pairs != capped truth")
    // the repaired state equals the GLOBAL capped batch operator over
    // the standing index — the decontaminate contract, verbatim
    val twin = Dedup.hammingPairs128Capped(
        FingerprintStream.indexedFps(spark, uncappedRoot), 3, 4)
    assert(twin.select(col("id_a"), col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet == pairsAfter)
    graft.Snap.free(twin)
    val labelsAfter = FingerprintStream.labels(spark, uncappedRoot)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val expectLabels =
      allOrganicIds.map(id =>
        id -> allOrganicIds.filter(_ % 5 == id % 5).min).toMap ++
      (9001L to 9016L).map(id => id -> id).toMap // split to singletons
    assert(labelsAfter == expectLabels,
      "repaired labels != capped truth")
    // idempotent: a second pass finds the same hot set, drops nothing
    val again = FingerprintStream.decontaminate(spark, uncappedRoot,
      hotBucketCap = 4).head()
    assert(again.getAs[Long]("n_dropped") == 0L, s"second pass: $again")
    assert(FingerprintStream.livePairs(spark, uncappedRoot)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      pairsAfter, "second pass changed state")
  }
}
