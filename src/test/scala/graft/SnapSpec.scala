package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Snap.free]]'s contract, pinned empirically — the reason it exists:
  * on this Spark, `Dataset.unpersist` does NOT release the blocks of an
  * eagerly localCheckpointed frame (it only consults the CacheManager),
  * so the pipelines' per-batch hygiene must unpersist the checkpoint RDD
  * itself. The suite asserts (1) the underlying Spark behavior this
  * works around, so an upstream fix shows up as a failing assumption
  * rather than silent redundancy, (2) free() actually shrinks
  * `sc.getPersistentRDDs`, (3) root-only ownership — a DERIVED frame
  * cannot free its parent's snapshot, and (4) the pipelines' per-batch
  * hygiene leaves the persistent-RDD set no larger than before the
  * batch (the long-lived-session leak regression). */
class SnapSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private def sc = spark.sparkContext
  private def pinnedIds: Set[Int] = sc.getPersistentRDDs.keySet.toSet

  test("Dataset.unpersist leaves localCheckpoint blocks pinned; " +
      "Snap.free releases them; a derived frame cannot free its parent") {
    val before = pinnedIds
    val df = spark.range(10000).toDF("x")
      .localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mine = pinnedIds -- before
    assert(mine.size === 1, s"expected one checkpoint RDD, got $mine")

    // the workaround's reason: Dataset.unpersist is a no-op here. If
    // this ever starts failing, Spark fixed it upstream — Snap.free
    // is then redundant (but still correct).
    df.unpersist(blocking = true)
    assert((pinnedIds -- before) === mine,
      "Dataset.unpersist released localCheckpoint blocks — upstream " +
      "behavior changed; revisit Snap")

    // root-only ownership: freeing through a DERIVED frame must not
    // touch the parent's snapshot other consumers still read
    val derived = df.filter(col("x") % 2 === 0)
    assert(Snap.free(derived) === 0)
    assert((pinnedIds -- before) === mine,
      "free() through a derived frame released the parent's blocks")
    assert(derived.count() === 5000L)

    // the owner's free releases exactly its snapshot
    assert(Snap.free(df, blocking = true) === 1)
    assert((pinnedIds -- before) === Set.empty[Int],
      "Snap.free left the checkpoint RDD pinned")
  }

  test("pipeline per-batch hygiene: processBatch pins no frames past " +
      "its commit on any of the three tiers") {
    import spark.implicits._
    val base = "target/snap_spec"
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(sc.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)

    // ── media tier ──
    val ids = (0L until 20L).map(i => i * 3 + 1)
    val docs = ids.map(id => (id, s"src${id % 4}")).toDF("doc_id", "source")
    val media = ops.Multimodal.imagePngMedia(spark, docs)
      .collect().sortBy(_.media_id)
    val (baseM, arrM) = media.splitAt(12)
    def fpOf(ms: Seq[ops.Multimodal.MediaRow]) =
      ops.Multimodal.pHashes(spark.createDataset(ms.toSeq))
        .filter(_.decoded).toDF()
        .select(col("media_id").as("doc_id"),
          col("ph0").as("sh0"), col("ph1").as("sh1"))
    val fpRoot = s"$base/fp"
    val baseFps = fpOf(baseM.toSeq).localCheckpoint(true)
    val basePairs = ops.Dedup.hammingPairs128(baseFps, 3)
      .localCheckpoint(true)
    streaming.FingerprintStream.init(spark, fpRoot, baseFps, basePairs,
      ops.Dedup.nearDupClusters(baseFps.select(col("doc_id")),
        basePairs.select(col("id_a"), col("id_b"))))
    Seq(baseFps, basePairs).foreach(Snap.free(_))
    val beforeFp = pinnedIds
    streaming.FingerprintStream.processBatch(
      spark.createDataset(arrM.toSeq).toDF(), 0L, fpRoot,
      maxHamming = 3, hotBucketCap = 4)
    assert((pinnedIds -- beforeFp) === Set.empty[Int],
      "FingerprintStream.processBatch left checkpoint blocks pinned")

    // ── text tier ──
    val docRoot = s"$base/doc"
    val hist = (1000L until 1005L)
      .map(i => (i, s"history text body $i"))
      .toDF("doc_id", "text")
    val histPairs = ops.Dedup.minHashPairs(hist)
    streaming.DocumentStream.init(spark, docRoot, hist, histPairs,
      ops.Dedup.nearDupClusters(hist, histPairs))
    val texts = (0L until 30L)
      .map(i => (i, i * 60000L, s"text body number ${i % 7}"))
      .toDF("doc_id", "ts_ms", "text")
    val beforeDoc = pinnedIds
    streaming.DocumentStream.processBatch(texts, 0L, docRoot,
      horizonMs = 3600000L, hotBucketCap = 4)
    assert((pinnedIds -- beforeDoc) === Set.empty[Int],
      "DocumentStream.processBatch left checkpoint blocks pinned")

    // ── vector tier ──
    val emb = Tables.embeddings(spark, SparkTestBase.sfDir)
    val maxId = emb.agg(max(col("vec_id"))).head().getLong(0)
    val splitId = (maxId + 1L) * 3L / 5L
    val embRoot = s"$base/emb"
    streaming.EmbeddingStream.initFromCorpus(spark, embRoot,
      emb.filter(col("vec_id") < splitId),
      refDelta = emb.filter(col("vec_id") >= splitId))
    val beforeEmb = pinnedIds
    streaming.EmbeddingStream.processBatch(
      emb.filter(col("vec_id") >= splitId)
        .select(col("vec_id"), col("embedding")),
      0L, embRoot, hotClusterCap = 30)
    assert((pinnedIds -- beforeEmb) === Set.empty[Int],
      "EmbeddingStream.processBatch left checkpoint blocks pinned")
  }
}
