package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The RUNNABLE live-dedup pipeline, held to the same truth as the
  * wave-replay gate: after streaming the arrival slice in waves — with a
  * mid-replay STOP, an out-of-band REPLAY of an already-committed batch
  * (the at-least-once hazard foreachBatch actually has), and a RESTART
  * from the checkpoint — the served kept/pair/label state must equal the
  * all-at-once batch twin ([[graft.streaming.ParityCheck
  * .livePipelineParity]]'s definition, reconstructed from the same
  * public operators). */
class DocumentStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("stop mid-replay + batch replay + restart: final state equals the batch twin") {
    import spark.implicits._
    val dir = SparkTestBase.sfDir
    val horizonMs = 60 * 60000L
    val t0Ms = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime

    val all = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val splitId = (all.map(_._1).max + 1L) * 3L / 5L
    val dupText = all.minBy(_._1)._2
    // duplicate traffic: every 11th arrival re-sends the corpus-min text
    // (the gate's rewrite — the exact tier must actually fire)
    val arrivals = all.filter(_._1 >= splitId)
      .map { case (id, tx) => DocumentStream.DocTsIn(id,
        t0Ms + id * 60000L, if (id % 11 == 0) dupText else tx) }
    val documents = graft.Tables.documents(spark, dir)
      .withColumn("text",
        when(col("doc_id") >= splitId && col("doc_id") % 11 === 0,
          lit(dupText)).otherwise(col("text")))
    val history = documents.filter(col("doc_id") < splitId)

    val root = "target/docstream_spec/state"
    val ckpt = "target/docstream_spec/ckpt"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path("target/docstream_spec"), true)

    val histPairs0 = graft.ops.Dedup.minHashPairs(history)
      .localCheckpoint(true)
    DocumentStream.init(spark, root, history, histPairs0,
      graft.ops.Dedup.nearDupClusters(history, histPairs0))

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[DocumentStream.DocTsIn]
    val waves = arrivals.grouped(math.max(1, arrivals.length / 4)).toSeq

    // waves 1-2, then STOP mid-replay
    var q = DocumentStream.start(mem.toDF(), root, ckpt, horizonMs)
    mem.addData(waves(0).toSeq); q.processAllAvailable()
    mem.addData(waves(1).toSeq); q.processAllAvailable()
    q.stop()

    // the at-least-once hazard, forced: re-apply the last committed batch
    // out of band — idempotent batch-keyed writes must leave the state
    // bit-identical (reads see only batches strictly before it)
    val keptBefore = DocumentStream.keptIds(spark, root)
      .collect().map(_.getLong(0)).sorted.toSeq
    val labelsBefore = DocumentStream.labels(spark, root)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // wave 2 was the last committed batch — read its id off the state
    // layout rather than assuming the engine's numbering
    val lastId = fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/kept"))
      .map(_.getPath.getName.drop(6).toLong).max
    DocumentStream.processBatch(waves(1).toSeq.toDF(), lastId,
      root, horizonMs)
    assert(DocumentStream.keptIds(spark, root)
      .collect().map(_.getLong(0)).sorted.toSeq == keptBefore,
      "replaying a committed batch changed the kept state")
    assert(DocumentStream.labels(spark, root)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap == labelsBefore,
      "replaying a committed batch changed the labels")

    // RESTART from the checkpoint; remaining waves
    q = DocumentStream.start(mem.toDF(), root, ckpt, horizonMs)
    waves.drop(2).foreach { w => mem.addData(w.toSeq); q.processAllAvailable() }
    q.stop()

    // ── batch twin: the gate's SHARED definition ──
    val (keptBatch, livePairsB, batchLabels) =
      ParityCheck.livePipelineBatchTwin(documents, history, splitId, horizonMs)

    // served state == twin, all three surfaces
    val keptGot = DocumentStream.keptIds(spark, root)
      .filter(col("doc_id") >= splitId)
      .collect().map(_.getLong(0)).toSet
    val keptWant = keptBatch.collect().map(_.getLong(0)).toSet
    assert(keptGot == keptWant, "kept-survivor set diverged from the twin")
    assert(keptWant.nonEmpty && keptWant.size < arrivals.length,
      "the exact tier never fired — the gate would be vacuous")

    val pairsGot = DocumentStream.livePairs(spark, root)
      .filter(col("id_a") >= splitId) // exclude the standing batch=-1 table
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pairsWant = livePairsB.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairsGot == pairsWant, "live pair set diverged from the twin")
    assert(pairsWant.nonEmpty, "no live pairs — the near-dup tier is vacuous")

    val labelsGot = DocumentStream.labels(spark, root)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val labelsWant = batchLabels.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(labelsGot == labelsWant, "label table diverged from the twin")

    // label storage stayed bounded: at most the init snapshot + two
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/labels"))
      .length <= 3, "label snapshots were not reaped")

    // band-state janitor: at the TRUE high-water mark it must drop
    // EXACTLY the batch directories whose newest event time is beyond
    // horizon + lateness — no admissible arrival could pair with those —
    // and nothing fresher (the safety bound)
    val highWater = arrivals.map(_.ts_ms).max
    val cut = highWater - horizonMs - 600000L
    val expectAged = waves.count(_.map(_.ts_ms).max < cut)
    assert(DocumentStream.compactBands(spark, root, highWater, horizonMs) ==
      expectAged, "janitor drop set diverged from the horizon+lateness bound")
    // a high water past everyone's horizon reclaims every directory
    // (the state ∝ arrival-rate × horizon bound, physically)
    val farFuture = highWater + horizonMs + 600001L
    assert(DocumentStream.compactBands(spark, root, farFuture, horizonMs) ==
      waves.length - expectAged, "janitor failed to reclaim aged band state")
    assert(!fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/bands"))
      .exists(_.getPath.getName.startsWith("batch=")),
      "aged band directories survived the janitor")

    // ── full lifecycle: TTL retirement mid-stream ──
    // expire the oldest third of history plus every current holder of the
    // duplicate-traffic text, with the stream STOPPED at a committed
    // checkpoint (the operational contract)
    val histDirs = fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/hist"))
      .map(_.getPath.toString).filter(_.contains("batch=")).toSeq
    val expired = DocumentStream.keptIds(spark, root)
      .filter(col("doc_id") < splitId / 3)
      .unionByName(spark.read.schema("doc_id BIGINT, text STRING")
        .parquet(histDirs: _*)
        .filter(col("text") === dupText).select(col("doc_id")))
      .distinct().localCheckpoint(true)
    val expiredSet = expired.collect().map(_.getLong(0)).toSet
    assert(expiredSet.nonEmpty, "retire scenario needs a non-empty expiry")
    DocumentStream.retire(spark, root, expired)
    // every state surface dropped the expired ids
    val keptAfter = DocumentStream.keptIds(spark, root)
      .collect().map(_.getLong(0)).toSet
    assert(keptAfter.intersect(expiredSet).isEmpty, "kept state kept expired ids")
    val pairsAfter = DocumentStream.livePairs(spark, root)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(!pairsAfter.exists(p =>
      expiredSet.contains(p._1) || expiredSet.contains(p._2)),
      "pair state kept edges of expired docs")
    // labels re-converged: hash-equal to a rebuild over the survivors
    // from the surviving pair edges (splits included)
    val labelsAfterRetire = DocumentStream.labels(spark, root)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val rebuilt = graft.ops.Dedup.nearDupClusters(
      DocumentStream.keptIds(spark, root).select(col("doc_id")),
      DocumentStream.livePairs(spark, root))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(labelsAfterRetire == rebuilt,
      "retired labels diverged from the rebuild over survivors")

    // RE-ADMISSION — the reference's TTL semantics: the expired text is
    // genuinely NEW again, so a post-retire re-send is KEPT where every
    // pre-retire one was dropped (fresh timestamp — the admission bound
    // is enforced now, a stale ts would be late-dropped)
    val maxArrivalId = arrivals.map(_.doc_id).max
    val fresh = DocumentStream.DocTsIn(maxArrivalId + 2,
      t0Ms + (maxArrivalId + 2) * 60000L, dupText)
    q = DocumentStream.start(mem.toDF(), root, ckpt, horizonMs)
    try { mem.addData(Seq(fresh)); q.processAllAvailable() }
    finally q.stop()
    val keptFinal = DocumentStream.keptIds(spark, root)
      .collect().map(_.getLong(0)).toSet
    assert(keptFinal.contains(fresh.doc_id),
      "a post-retire re-send of the expired text was not re-admitted")
    // standing invariant across merges AND retires: the label table is
    // always exactly CC over (kept ids, pair-state edges)
    val labelsFinal = DocumentStream.labels(spark, root)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val ccFinal = graft.ops.Dedup.nearDupClusters(
      DocumentStream.keptIds(spark, root).select(col("doc_id")),
      DocumentStream.livePairs(spark, root))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(labelsFinal == ccFinal,
      "label table drifted from CC over the maintained state")
  }

  test("consolidation: bounded directory counts, replay-idempotent fold, " +
      "state equal to the unconsolidated twin, retire prunes bands") {
    import spark.implicits._
    val dir = SparkTestBase.sfDir
    val horizonMs = 60 * 60000L
    val t0Ms = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime

    val all = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val splitId = (all.map(_._1).max + 1L) * 3L / 5L
    val dupText = all.minBy(_._1)._2
    val arrivals = all.filter(_._1 >= splitId)
      .map { case (id, tx) => DocumentStream.DocTsIn(id,
        t0Ms + id * 60000L, if (id % 11 == 0) dupText else tx) }
    val history = graft.Tables.documents(spark, dir)
      .filter(col("doc_id") < splitId)

    val base = "target/docstream_consolidate_spec"
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    val histPairs = graft.ops.Dedup.minHashPairs(history)
      .localCheckpoint(true)
    val histLabels = graft.ops.Dedup.nearDupClusters(history, histPairs)
      .localCheckpoint(true)
    val rootA = s"$base/consolidated"  // consolidateEvery = 4
    val rootB = s"$base/twin"          // never consolidated
    DocumentStream.init(spark, rootA, history, histPairs, histLabels)
    DocumentStream.init(spark, rootB, history, histPairs, histLabels)

    val waves = arrivals.grouped(math.max(1, arrivals.length / 8)).toSeq
    def batchDf(w: Seq[DocumentStream.DocTsIn]) = w.toDF()
    def subDirs(root: String, sub: String): Seq[String] = {
      val p = new org.apache.hadoop.fs.Path(s"$root/$sub")
      if (!fs.exists(p)) Nil
      else fs.listStatus(p).map(_.getPath.getName)
        .filter(_.startsWith("batch=")).toSeq
    }
    def served(root: String) = (
      DocumentStream.keptIds(spark, root)
        .collect().map(_.getLong(0)).sorted.toSeq,
      DocumentStream.livePairs(spark, root)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq,
      DocumentStream.labels(spark, root)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap)

    waves.zipWithIndex.foreach { case (w, i) =>
      DocumentStream.processBatch(batchDf(w.toSeq), i.toLong, rootA,
        horizonMs, consolidateEvery = 4)
      if (i == 4) {
        // a REPLAYED consolidation batch (the at-least-once crash
        // surface, straddling the fold — only the LAST batch can
        // replay, so replay it here): every surface must be
        // bit-identical after the re-run
        val snap = served(rootA)
        DocumentStream.processBatch(batchDf(w.toSeq), i.toLong, rootA,
          horizonMs, consolidateEvery = 4)
        assert(served(rootA) == snap,
          "replaying the consolidation batch changed state")
      }
      DocumentStream.processBatch(batchDf(w.toSeq), i.toLong, rootB,
        horizonMs)
    }

    // every served surface identical to the never-consolidated twin
    val finalState = served(rootA)
    assert(finalState == served(rootB),
      "consolidation changed a served row")
    // directory counts bounded by the tiered ladder: ≤ K recent +
    // log₂(batches/K) units + base (while the twin holds one per batch
    // + base)
    for (sub <- Seq("hist", "kept", "pairs", "hw")) {
      assert(subDirs(rootA, sub).length <= 4 + 2,
        s"$sub directory count not bounded: ${subDirs(rootA, sub)}")
      assert(subDirs(rootB, sub).length >= waves.length,
        s"twin $sub unexpectedly compacted")
    }

    // an interrupted fold with NO commit marker is aborted on the next
    // pass (garbage staged data must never swap in)
    val stage = new org.apache.hadoop.fs.Path(s"$rootA/kept/_stage")
    fs.mkdirs(stage)
    DocumentStream.consolidate(spark, rootA, waves.length.toLong, horizonMs)
    assert(!fs.exists(stage), "uncommitted stage was not aborted")
    assert(served(rootA) == finalState,
      "recovery from an uncommitted stage changed state")

    // MAJOR compaction: intoBase folds everything into batch=-1 and
    // still serves the same rows
    DocumentStream.consolidate(spark, rootA, waves.length.toLong,
      horizonMs, intoBase = true)
    for (sub <- Seq("hist", "kept", "pairs", "hw"))
      assert(subDirs(rootA, sub) == Seq("batch=-1"),
        s"intoBase left extra $sub directories: ${subDirs(rootA, sub)}")
    assert(served(rootA) == finalState,
      "intoBase compaction changed a served row")

    // retire prunes the expired docs' BAND signatures too — arrivals
    // stop candidate-generating against retired docs immediately
    def bandIds(root: String): Set[Long] = {
      val dirs = subDirs(root, "bands").map(n => s"$root/bands/$n")
      if (dirs.isEmpty) Set.empty
      else spark.read
        .schema("doc_id BIGINT, band INT, bh BIGINT, ts_ms BIGINT")
        .parquet(dirs: _*)
        .select(col("doc_id")).distinct().collect().map(_.getLong(0)).toSet
    }
    val expired = DocumentStream.keptIds(spark, rootA)
      .filter(col("doc_id") >= splitId && col("doc_id") % 3 === 0)
      .localCheckpoint(true)
    val expiredSet = expired.collect().map(_.getLong(0)).toSet
    assert(bandIds(rootA).intersect(expiredSet).nonEmpty,
      "retire-prunes-bands scenario is vacuous: no expired doc holds " +
        "band state")
    DocumentStream.retire(spark, rootA, expired)
    assert(bandIds(rootA).intersect(expiredSet).isEmpty,
      "band state kept expired docs' signatures")

    // the expiry key resolves BY NAME: a (text, other_id) frame without
    // a doc_id column must fail loudly, not retire the text column
    val badFrame = Seq(("junk", 1L)).toDF("text", "other_id")
    val keyErr = intercept[IllegalArgumentException] {
      DocumentStream.retire(spark, rootA, badFrame)
    }
    assert(keyErr.getMessage.contains("single-column"))

    // ── retire must PRESERVE the tiered units' sidecars: a retire on a
    // laddered state (rootB never consolidated — consolidate it now,
    // leaving units + raws) followed by another consolidate must be a
    // cascade NO-OP (dir set unchanged — a lost sidecar would demote
    // units to raw and re-fold them), and the retired rows must stay
    // gone through that no-op
    // two consolidates leave TWO units (masses 4 and <4 — no cascade)
    // plus raw dirs: a lost sidecar would demote BOTH units to raw and
    // the re-consolidation below would visibly re-fold them into one
    DocumentStream.consolidate(spark, rootB, 4L, horizonMs)
    DocumentStream.consolidate(spark, rootB, waves.length.toLong - 2,
      horizonMs)
    val expiredB = DocumentStream.keptIds(spark, rootB)
      .filter(col("doc_id") >= splitId && col("doc_id") % 3 === 0)
      .localCheckpoint(true)
    DocumentStream.retire(spark, rootB, expiredB)
    val dirsBefore = Seq("hist", "kept", "pairs", "hw", "bands")
      .map(s => s -> subDirs(rootB, s).sorted).toMap
    val servedAfterRetire = served(rootB)
    DocumentStream.consolidate(spark, rootB, waves.length.toLong - 2,
      horizonMs)
    val dirsAfter = Seq("hist", "kept", "pairs", "hw", "bands")
      .map(s => s -> subDirs(rootB, s).sorted).toMap
    assert(dirsAfter == dirsBefore,
      s"re-consolidation after retire re-folded units (sidecars lost): " +
        s"$dirsBefore -> $dirsAfter")
    assert(served(rootB) == servedAfterRetire,
      "the no-op consolidation changed retired state")
  }

  test("decontam gate end to end on the sf0.001 corpus: the uncapped " +
      "near-dup flood root, repaired, equals the capped batch twin") {
    val dir = graft.SparkTestBase.sfDir
    val root = ParityCheck.buildDecontamPipeline(spark, dir)
    val row = ParityCheck.docDecontamParity(spark, dir, root).head()
    assert(row.getAs[Boolean]("parity_ok"),
      s"text decontam gate diverged: $row")
    assert(row.getAs[Long]("n_dropped") > 0L, "repair dropped nothing")
    assert(row.getAs[Long]("hot_buckets") > 0L, "no hot bucket found")
  }

  test("hot-bucket cap: flood pairs pruned, organic pair kept, capped " +
      "restart parity vs the capped twin, ledger records the intervention") {
    import spark.implicits._
    val horizonMs = 60 * 60000L
    val latenessMs = 600000L
    val t0Ms = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val cap = 8

    // synthetic corpus with PROVABLE margins (the gate's fixture
    // argument, constructed): the flood is 15 BYTE-IDENTICAL re-sends of
    // a history document per wave — identical texts band identically, so
    // per band ALL of a wave's flood rows land in ONE bucket: every
    // flood bucket holds ≥ 15 > cap rows from each wave's own banding
    // (hot at every wave exactly as globally), and every other bucket
    // holds ≤ a few rows (never hot) — no sub-bucket can straddle the
    // cap prefix-dependently. The cap's DISCRIMINATION is pinned by two
    // kept near-dup pairs: one adjacent to the template (its shared
    // buckets are the flooded ones → the cap must prune it; uncapped
    // finds it) and one with disjoint vocabulary (cool buckets → both
    // runs must find it)
    val template = "the quick brown fox jumps over the lazy dog near " +
      "the riverbank today at dawn with mist"
    val organicBase = "completely different subject matter about parquet " +
      "shuffle partitions and broadcast joins"
    def organic(i: Int) = s"unrelated organic document number $i with its " +
      s"own distinct vocabulary token$i payload$i marker$i"
    val history = (0L until 20L).map(i =>
      (i, if (i == 0L) template
          else s"history document $i with standalone text body hist$i"))
    val arrivals = scala.collection.mutable.ArrayBuffer
      .empty[DocumentStream.DocTsIn]
    var id = 100L
    for (w <- 0 until 4) {
      for (_ <- 0 until 15) {
        arrivals += DocumentStream.DocTsIn(id, t0Ms + id * 60000L,
          template); id += 1
      }
      for (o <- 0 until 10) {
        val tx =
          if (w == 0 && o == 0) s"$organicBase version one"
          else if (w == 1 && o == 0) s"$organicBase version two"
          // ONE-token suffixes: the variants share no shingle beyond the
          // template's, so any band where they agree carries the
          // template's own slice — every collision bucket is a flooded
          // one, which is what makes "the cap prunes this pair" exact
          else if (w == 0 && o == 1) s"$template extraone"
          else if (w == 1 && o == 1) s"$template extratwo"
          else organic(w * 100 + o)
        arrivals += DocumentStream.DocTsIn(id, t0Ms + id * 60000L, tx)
        id += 1
      }
    }
    val splitId = 100L
    val documents = (history.map { case (i, t) => (i, t) } ++
      arrivals.map(d => (d.doc_id, d.text))).toDF("doc_id", "text")
    val historyDf = documents.filter(col("doc_id") < splitId)
      .localCheckpoint(true)

    val base = "target/docstream_cap_spec"
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    val histPairs = graft.ops.Dedup.minHashPairs(historyDf)
      .localCheckpoint(true)
    val histLabels = graft.ops.Dedup.nearDupClusters(historyDf, histPairs)
      .localCheckpoint(true)

    // ── capped STREAM with a mid-run restart straddling a consolidation ──
    val rootC = s"$base/capped"
    DocumentStream.init(spark, rootC, historyDf, histPairs, histLabels)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[DocumentStream.DocTsIn]
    val waves = arrivals.toSeq.grouped(25).toSeq
    var q = DocumentStream.start(mem.toDF(), rootC, s"$base/ckpt",
      horizonMs, consolidateEvery = 2, hotBucketCap = cap)
    waves.take(2).foreach { w => mem.addData(w); q.processAllAvailable() }
    q.stop()
    q = DocumentStream.start(mem.toDF(), rootC, s"$base/ckpt",
      horizonMs, consolidateEvery = 2, hotBucketCap = cap)
    try waves.drop(2).foreach { w =>
      mem.addData(w); q.processAllAvailable()
    } finally q.stop()

    // ── uncapped twin root, driven batch-by-batch (same waves) ──
    val rootU = s"$base/uncapped"
    DocumentStream.init(spark, rootU, historyDf, histPairs, histLabels)
    waves.zipWithIndex.foreach { case (w, i) =>
      DocumentStream.processBatch(w.toDF(), i.toLong, rootU, horizonMs)
    }

    def pairSet(root: String): Set[(Long, Long)] =
      DocumentStream.livePairs(spark, root)
        .filter(col("id_a") >= splitId)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cappedPairs = pairSet(rootC)
    val uncappedPairs = pairSet(rootU)
    def pairOf(prefix: String): (Long, Long) = {
      val ids = arrivals.filter(d => d.text.startsWith(prefix) &&
        d.text != template).map(_.doc_id).sorted
      assert(ids.length == 2); (ids(0), ids(1))
    }
    val organicPair = pairOf(organicBase)
    val tplPair = pairOf(template)
    // the exact tier drops the byte-identical flood in BOTH runs (no
    // flood endpoints are kept); uncapped finds both near-dup pairs;
    // capped must prune the template-adjacent pair (its shared buckets
    // are the flooded ones) while keeping the organic pair (cool
    // buckets) — the recall-bounded semantics, pinned exactly
    assert(uncappedPairs == Set(organicPair, tplPair),
      s"uncapped pair set unexpected: $uncappedPairs")
    assert(cappedPairs == Set(organicPair),
      s"capped pair set unexpected: $cappedPairs")

    // ── capped stream == capped GLOBAL-occupancy batch twin ──
    val (keptBatch, livePairsB, batchLabels) =
      ParityCheck.cappedPipelineBatchTwin(documents, historyDf, splitId,
        horizonMs, cap)
    val keptArr = DocumentStream.keptIds(spark, rootC)
      .filter(col("doc_id") >= splitId)
      .collect().map(_.getLong(0)).toSet
    assert(keptArr ==
      keptBatch.collect().map(_.getLong(0)).toSet)
    assert(cappedPairs ==
      livePairsB.collect().map(r => (r.getLong(0), r.getLong(1))).toSet,
      "capped stream pairs != capped batch twin")
    val streamLabels = DocumentStream.labels(spark, rootC)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(streamLabels ==
      batchLabels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap,
      "capped stream labels != capped batch twin")

    // ── the inline ledger: cap intervened EVERY batch, the uncapped
    // twin's ledger shows no intervention and a higher candidate rate ──
    val gC = DocumentStream.gaugeRows(spark, rootC)
      .orderBy(col("batch_id"))
      .collect().map(r => (r.getAs[Long]("batch_id"),
        r.getAs[Long]("hot_buckets"), r.getAs[Long]("cand_ppb"),
        r.getAs[Boolean]("alert")))
    val gU = DocumentStream.gaugeRows(spark, rootU)
      .orderBy(col("batch_id"))
      .collect().map(r => (r.getAs[Long]("batch_id"),
        r.getAs[Long]("hot_buckets"), r.getAs[Long]("cand_ppb")))
    assert(gC.length == 4 && gU.length == 4)
    assert(gC.forall(_._2 > 0),
      s"capped ledger missing hot-bucket interventions: ${gC.toSeq}")
    assert(gC.forall(_._4),
      s"flood batches must alert (top share over threshold): ${gC.toSeq}")
    assert(gU.forall(_._2 == 0L),
      s"uncapped ledger claims interventions: ${gU.toSeq}")
    gC.zip(gU).foreach { case (c, u) =>
      assert(c._3 < u._3,
        s"capped candidate rate not below uncapped at batch ${c._1}: " +
          s"${c._3} vs ${u._3}")
    }

    // ── RETROACTIVE DECONTAMINATION: repair the uncapped root to the
    // capped truth. The policy's discrimination carries over verbatim:
    // the template-adjacent pair (every shared bucket flooded) must be
    // deleted; the organic pair (cool buckets, not even a suspect) must
    // survive untouched — and the repaired state equals the capped
    // stream's, pair-for-pair and label-for-label ──
    val report = DocumentStream.decontaminate(spark, rootU, cap,
      horizonMs).head()
    assert(report.getAs[Long]("hot_buckets") > 0L, s"report: $report")
    assert(report.getAs[Long]("n_dropped") == 1L, s"report: $report")
    assert(pairSet(rootU) == Set(organicPair),
      "repaired pairs != capped truth")
    val repairedLabels = DocumentStream.labels(spark, rootU)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(repairedLabels == streamLabels,
      "repaired labels != capped stream labels")
    // idempotent: the second pass finds nothing left to drop
    val again = DocumentStream.decontaminate(spark, rootU, cap,
      horizonMs).head()
    assert(again.getAs[Long]("n_dropped") == 0L, s"second pass: $again")
    assert(pairSet(rootU) == Set(organicPair), "second pass changed state")
  }
}
