package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestBase, Tables}

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private lazy val emb = Tables.embeddings(spark, SparkTestBase.sfDir)

  test("bruteForceTopK: k rows per probe, cosine descending, no self-match") {
    val res = Similarity.bruteForceTopK(emb, Seq(0L, 1L, 2L), 5).collect()
    assert(res.length == 15)
    val byProbe = res.groupBy(_.getAs[Long]("probe_id"))
    byProbe.foreach { case (probe, rows) =>
      assert(rows.length == 5)
      assert(!rows.exists(_.getAs[Long]("vec_id") == probe))
      val cosines = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("cosine"))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b })
      assert(cosines.forall(c => c >= -1.0000001 && c <= 1.0000001))
    }
  }

  test("lshTopK: recall against brute force is substantial") {
    val exact = Similarity.bruteForceTopK(emb, Seq(0L, 1L, 2L, 3L, 4L), 5).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("vec_id"))).toSet
    val approx = Similarity.lshTopK(emb, Seq(0L, 1L, 2L, 3L, 4L), 5).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("vec_id"))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.3, s"LSH recall too low: $recall")
    // approximate neighbors it does return must be genuinely computed
    assert(approx.nonEmpty)
  }

  test("ivfTopK: substantial recall, exact cosines on returned rows") {
    val probes = Seq(0L, 1L, 2L, 3L, 4L)
    val exact = Similarity.bruteForceTopK(emb, probes, 5).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("vec_id"), r.getAs[Double]("cosine")))
    val approx = Similarity.ivfTopK(emb, probes, 5, nCentroids = 16, nProbe = 4).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("vec_id"), r.getAs[Double]("cosine")))
    val exactSet = exact.map(t => (t._1, t._2)).toSet
    val approxSet = approx.map(t => (t._1, t._2)).toSet
    val recall = exactSet.intersect(approxSet).size.toDouble / exactSet.size
    assert(recall >= 0.3, s"IVF recall too low: $recall")
    // cosines on overlapping results agree exactly with brute force
    val exactCos = exact.map(t => (t._1, t._2) -> t._3).toMap
    approx.foreach { case (p, v, c) =>
      exactCos.get((p, v)).foreach(e => assert(e == c))
    }
  }

  test("embeddingNearDupPairs: ordered pairs above threshold only") {
    val res = Similarity.embeddingNearDupPairs(emb, 0.4).collect()
    assert(res.forall(r => r.getAs[Long]("id_a") < r.getAs[Long]("id_b")))
    assert(res.forall(_.getAs[Double]("cosine") >= 0.4))
  }

  test("ivfTopK: Lloyd refinement lifts recall over raw hash-sampled seeds") {
    val probes = Seq(0L, 1L, 2L, 3L, 4L)
    val exact = Similarity.bruteForceTopK(emb, probes, 5).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("vec_id"))).toSet
    def recall(iters: Int): Double = {
      val approx = Similarity.ivfTopK(emb, probes, 5, nCentroids = 16, nProbe = 4,
        lloydIters = iters).collect()
        .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("vec_id"))).toSet
      exact.intersect(approx).size.toDouble / exact.size
    }
    val raw = recall(0)
    val refined = recall(2)
    // deterministic on the fixture (decimal-exact means): 0.36 -> 0.52
    assert(refined > raw, s"refinement did not lift recall: $raw -> $refined")
    assert(refined >= 0.5, s"refined recall too low: $refined")
  }

  test("ivfTopK: nCentroids=1 degrades to brute force; empty corpus is empty") {
    val probes = Seq(0L, 1L)
    val one = Similarity.ivfTopK(emb, probes, 3, nCentroids = 1, nProbe = 1).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("vec_id"), r.getAs[Double]("cosine")))
    val exact = Similarity.bruteForceTopK(emb, probes, 3).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("vec_id"), r.getAs[Double]("cosine")))
    // a single centroid = every vector in one probed bucket = exact search
    assert(one.toSeq == exact.toSeq)
    val empty = Similarity.ivfTopK(emb.filter("vec_id < 0"), probes, 3).collect()
    assert(empty.isEmpty)
  }

  test("ivfTopK: nCentroids=1024 plans and runs (no literal-tree ceiling)") {
    // with more centroids than corpus rows every vector is its own
    // centroid; probing its own bucket plus neighbors still returns k rows
    val res = Similarity.ivfTopK(emb, Seq(0L, 1L), 3, nCentroids = 1024, nProbe = 64).collect()
    assert(res.nonEmpty)
    assert(res.forall(r => r.getAs[Double]("cosine") <= 1.0000001))
  }

  test("ivfTopK: query construction runs no Spark job (lazy centroids)") {
    val sc = spark.sparkContext
    val before = sc.statusTracker.getJobIdsForGroup(null).length
    val df = Similarity.ivfTopK(emb, Seq(0L), 5, nCentroids = 16)
    val after = sc.statusTracker.getJobIdsForGroup(null).length
    assert(after == before, "building the IVF query fired an eager Spark job")
    assert(df.columns.contains("cosine"))
  }

  test("embeddingNearDupPairsLsh: planted near-dups — nonzero truth, recall >= 0.9") {
    import org.apache.spark.sql.functions._
    // the raw fixture has ZERO pairs at cosine >= 0.9, which made this
    // tier's recall assertion vacuous; plant deterministic near-duplicates
    // (copy of vec 0..9 with one component scaled 5%) so the truth set is
    // nonzero and the bucketed candidate path is actually exercised
    val planted = emb.filter(col("vec_id") < 10)
      .select((col("vec_id") + 10000L).as("vec_id"),
        expr("transform(embedding, (x, i) -> " +
          "CASE WHEN i = 0 THEN CAST(x * 1.05 AS FLOAT) ELSE x END)").as("embedding"),
        col("label"))
    val corpus = emb.unionByName(planted)
    val exact = Similarity.embeddingNearDupPairs(corpus, 0.9).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Double]("cosine")))
    assert(exact.length >= 10, s"planting failed: only ${exact.length} true pairs")
    val lsh = Similarity.embeddingNearDupPairsLsh(corpus, 0.9).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Double]("cosine")))
    val exactMap = exact.map(t => (t._1, t._2) -> t._3).toMap
    // precision 1: every LSH pair is a true pair with the identical cosine
    lsh.foreach { case (a, b, c) => assert(exactMap.get((a, b)).contains(c)) }
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.9, s"LSH near-dup recall too low: $recall (truth ${exact.size})")
  }

  test("embeddingNearDupPairsLsh: 0.4 regime vs exact truth — recall above bound") {
    // the registered q_dedup_embedding_lsh_check regime: the fixture's
    // pair mass sits at ~0.4 cosine, bits=4/tables=16
    val exact = Similarity.embeddingNearDupPairs(emb, 0.4).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val lsh = Similarity.embeddingNearDupPairsLsh(emb, 0.4, bits = 4, tables = 16)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(exact.nonEmpty, "fixture has no pairs at 0.4 — regime check is vacuous")
    assert(lsh.subsetOf(exact))
    val recall = lsh.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"LSH pair recall at 0.4 regime too low: $recall")
  }

  test("embeddingNearDupPairsLsh: exact-verified subset of the all-pairs result") {
    val exact = Similarity.embeddingNearDupPairs(emb, 0.9).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Double]("cosine")))
    val lsh = Similarity.embeddingNearDupPairsLsh(emb, 0.9).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Double]("cosine")))
    val exactMap = exact.map(t => (t._1, t._2) -> t._3).toMap
    // precision 1: every LSH pair is a true pair with the identical cosine
    lsh.foreach { case (a, b, c) => assert(exactMap.get((a, b)).contains(c)) }
    // recall: the bucketed path finds the overwhelming share of true pairs
    if (exact.nonEmpty) {
      val recall = lsh.size.toDouble / exact.size
      assert(recall >= 0.9, s"LSH near-dup recall too low: $recall")
    }
  }

  test("semanticDedupPairs: cluster-local subset of all-pairs, identical cosines") {
    val exact = Similarity.embeddingNearDupPairs(emb, 0.4).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Double]("cosine")))
    val sem = Similarity.semanticDedupPairs(emb, 0.4).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Double]("cosine")))
    assert(sem.nonEmpty, "no within-cluster pairs at the fixture's 0.4 regime")
    val exactMap = exact.map(t => (t._1, t._2) -> t._3).toMap
    // SemDeDup only restricts the pair space: every emitted pair is a true
    // pair with the bit-identical cosine
    sem.foreach { case (a, b, c) => assert(exactMap.get((a, b)).contains(c)) }
  }

  test("semanticDedupPairsIncremental: between ∪ delta-self decomposition equals " +
      "one full assignment over the base-trained centroids") {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions.{dot, normSq, cosinePrenormed}
    val baseEmb = emb.filter(col("vec_id") % 7 =!= 0)
    val deltaEmb = emb.filter(col("vec_id") % 7 === 0)
    val incr = Similarity.semanticDedupPairsIncremental(
      spark, SparkTestBase.sfDir, baseEmb, deltaEmb, 0.4).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Long]("cluster"), r.getAs[Double]("cosine")))
    assert(incr.nonEmpty, "no delta-touching pairs at the fixture's 0.4 regime")
    // undecomposed reference: ONE assignment of the full corpus against the
    // same persisted base-trained centroids, one cluster-local self-join,
    // filtered to pairs touching a delta vector
    val (cents, _) = Similarity.ivfIndexPersisted(
      spark, SparkTestBase.sfDir, baseEmb, suffix = "_base")
    val assigned = Similarity.assignToCentroids(emb, cents)
    val a = assigned.select(col("cluster"), col("vec_id").as("id_a"),
      col("embedding").as("emb_a"), col("nsq").as("nsq_a"))
    val b = assigned.select(col("cluster"), col("vec_id").as("id_b"),
      col("embedding").as("emb_b"), col("nsq").as("nsq_b"))
    val expected = a.join(b, Seq("cluster"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine",
        cosinePrenormed(dot(col("emb_a"), col("emb_b")), col("nsq_a"), col("nsq_b")))
      .filter(col("cosine") >= 0.4)
      .filter(col("id_a") % 7 === 0 || col("id_b") % 7 === 0)
      .select(col("id_a"), col("id_b"),
        col("cluster").cast("long").as("cluster"), col("cosine"))
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Long]("cluster"), r.getAs[Double]("cosine")))
    assert(incr.toSet == expected.toSet)
    // both delta×base and delta×delta legs are exercised by the fixture
    assert(incr.exists { case (ia, ib, _, _) => ia % 7 != 0 || ib % 7 != 0 })
  }

  test("pqTopK: substantial recall, exact cosines, k rows per probe") {
    import org.apache.spark.sql.functions._
    val probes = Seq(0L, 1L, 2L, 3L, 4L)
    val exact = Similarity.bruteForceTopK(emb, probes, 5).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("vec_id"))).toSet
    val pq = Similarity.pqTopK(emb, probes, 5).collect()
    val byProbe = pq.groupBy(_.getAs[Long]("probe_id"))
    assert(byProbe.keySet == probes.toSet)
    byProbe.foreach { case (probe, rows) =>
      assert(rows.length == 5)
      assert(!rows.exists(_.getAs[Long]("vec_id") == probe))
    }
    // returned cosines are EXACT (pass-2 re-rank), so each must equal the
    // brute-force cosine for the same (probe, vec) when shared
    val bf = Similarity.bruteForceTopK(emb, probes, 50).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("vec_id")) -> r.getAs[Double]("cosine"))
      .toMap
    pq.foreach { r =>
      val key = (r.getAs[Long]("probe_id"), r.getAs[Long]("vec_id"))
      bf.get(key).foreach(c => assert(c == r.getAs[Double]("cosine")))
    }
    val approx = pq.map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("vec_id"))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.3, s"PQ recall too low: $recall")
  }

  test("pqTopK: deterministic under repartition") {
    val a = Similarity.pqTopK(emb, Seq(0L, 1L), 5).collect().toSeq
    val b = Similarity.pqTopK(emb.repartition(7), Seq(0L, 1L), 5).collect().toSeq
    assert(a == b)
  }

  test("ivfTopKPersisted: identical rows to the lazy plan; probed buckets partition-pruned") {
    val dir = graft.SparkTestBase.sfDir
    val persisted = Similarity.ivfTopKPersisted(
      spark, dir, graft.Tables.embeddings(spark, dir), 0L until 10L, 5)
    val lazyRows = Similarity.ivfTopK(
      graft.Tables.embeddings(spark, dir), 0L until 10L, 5).collect().toSeq
    assert(persisted.collect().toSeq == lazyRows)
    // the bucket scan must reach the corpus through a dynamic partition
    // filter on `cluster` — the nProbe/nCentroids read cut is the point
    // of persisting the index
    assert(persisted.queryExecution.executedPlan.toString.contains("dynamicpruning"))
    // second call hits the memo — no rebuild (same table objects)
    val again = Similarity.ivfTopKPersisted(
      spark, dir, graft.Tables.embeddings(spark, dir), 0L until 10L, 5)
    assert(again.collect().toSeq == lazyRows)
  }

  test("ivfPqTopKPersisted: bucket-pruned ADC — exact cosines, recall >= 0.6, pruned scan") {
    import org.apache.spark.sql.functions._
    val dir = graft.SparkTestBase.sfDir
    val out = Similarity.ivfPqTopKPersisted(
      spark, dir, graft.Tables.embeddings(spark, dir), 0L until 10L, 5,
      nProbe = 8, poolFactor = 16)
    val rows = out.collect()
    // k rows per probe at most; returned cosines are EXACT re-ranks, so
    // each must equal the brute-force cosine for the same pair
    val truthAll = Similarity.bruteForceTopK(
      graft.Tables.embeddings(spark, dir), 0L until 10L, 500)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    rows.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(truthAll.contains(key) &&
        math.abs(truthAll(key) - r.getDouble(2)) < 1e-12,
        s"inexact cosine for $key")
    }
    // double-approximation recall floor (measured 0.64 at this SF)
    val truth = Similarity.bruteForceTopK(
      graft.Tables.embeddings(spark, dir), 0L until 10L, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = rows.map(r => (r.getLong(0), r.getLong(1))).count(truth)
    assert(hits >= (truth.size * 0.6).toInt, s"recall $hits/${truth.size}")
    // the codes scan must prune on the cluster partition key
    assert(out.queryExecution.executedPlan.toString.contains("dynamicpruning"),
      "probed-bucket codes scan is not partition-pruned")
  }

  test("semanticDedupPairs: exact duplicates always share a cluster and are found") {
    import org.apache.spark.sql.functions._
    // assignment is a pure function of the embedding, so a verbatim copy
    // lands in its original's cluster — exact dups can never be missed
    val copies = emb.filter(col("vec_id") < 10)
      .select((col("vec_id") + 20000L).as("vec_id"), col("embedding"), col("label"))
    val corpus = emb.unionByName(copies)
    val sem = Similarity.semanticDedupPairs(corpus, 0.99)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    (0L until 10L).foreach { i =>
      assert(sem.contains((i, i + 20000L)), s"exact duplicate of vec $i missed")
    }
  }

  test("drift → retrain loop: a shifted arrival batch fires the gauge " +
      "against epoch 0; retraining on the accumulated corpus resets it") {
    import org.apache.spark.sql.functions._
    val base = emb.filter(col("vec_id") % 7 =!= 0)
    val delta = emb.filter(col("vec_id") % 7 === 0)
    // the arrivals come from a SHIFTED distribution (one-orthant mode
    // collapse — the gauge's occupancy signal territory)
    def shift(df: org.apache.spark.sql.DataFrame) = df.withColumn(
      "embedding", transform(col("embedding"),
        x => (abs(x) + lit(0.5d)).cast("float")))
    val refShift = shift(delta.filter(col("vec_id") % 2 === 0))
    val newShift = shift(delta.filter(col("vec_id") % 2 =!= 0))
    // epoch 0 (base-trained): an in-distribution reference batch vs the
    // shifted arrivals — retrain must fire
    val g0 = Similarity.ivfDriftGauge(spark, SparkTestBase.sfDir, base,
      delta.filter(col("vec_id") % 2 === 0), newShift).head()
    assert(g0.getBoolean(7), s"shifted batch did not fire retrain: $g0")
    // execute the policy: epoch 1 trains on base ∪ the accumulated
    // shifted arrivals (disjoint ids by the % 7 split)
    val corpus1 = base.unionByName(refShift).unionByName(newShift)
    Similarity.ivfRetrainEpoch(spark, SparkTestBase.sfDir, corpus1, epoch = 1)
    // the same distribution measured against epoch 1 is in-distribution
    // again: both signals back under threshold
    val g1 = Similarity.ivfDriftGauge(spark, SparkTestBase.sfDir, corpus1,
      refShift, newShift, suffix = "_epoch1").head()
    assert(!g1.getBoolean(7), s"gauge still alarming after retrain: $g1")
  }

  test("semanticDedupPairsCapped: collapsed cluster quarantined, cool " +
      "clusters keep their pairs, degenerates to uncapped above occupancy") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // an embedding-template flood: every 5th vector collapses onto the
    // corpus-minimum vector (byte-identical), concentrating one cluster
    // far over the cap while organic clusters sit far under it
    val tpl = broadcast(emb.orderBy(col("vec_id")).limit(1)
      .select(col("embedding").as("tpl_emb")))
    val rew = emb.crossJoin(tpl).select(col("vec_id"),
      when(col("vec_id") % 5 === 0, col("tpl_emb"))
        .otherwise(col("embedding")).as("embedding"))
      .localCheckpoint(true)
    val capped = Similarity.semanticDedupPairsCapped(rew, 0.4, cap = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = Similarity.semanticDedupPairs(rew, 0.4)
      .localCheckpoint(true)
    val uncappedPairs = uncapped.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // the flood's byte-identical members pair at cosine 1.0 uncapped and
    // must be quarantined by the cap (the flooded cluster's occupancy is
    // over any sane cap at this fixture)
    val floodPairs = uncappedPairs.filter(p => p._1 % 5 == 0 && p._2 % 5 == 0)
    assert(floodPairs.nonEmpty, "flood scenario vacuous: no flood pairs")
    assert(capped.intersect(floodPairs).isEmpty,
      s"capped kept flood pairs: ${capped.intersect(floodPairs).take(5)}")
    // exact policy equality: capped == uncapped restricted to clusters
    // whose occupancy (over the same deterministic assignment) is ≤ cap
    val cents = Similarity.trainCentroids(rew, 32, 2)
    val hotSet = Similarity.assignToCentroids(rew, cents)
      .groupBy(col("cluster").cast("long").as("cluster"))
      .agg(count(lit(1)).as("occ"))
      .filter(col("occ") > 8)
      .collect().map(_.getLong(0)).toSet
    val expected = uncapped.collect()
      .filter(r => !hotSet(r.getLong(2)))
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == expected,
      s"capped != uncapped-minus-hot-clusters: " +
        s"only-capped=${(capped -- expected).take(5)} " +
        s"only-expected=${(expected -- capped).take(5)}")
    // a cap above every occupancy must change nothing (the policy's
    // only lever is the occupancy rule)
    val cappedHigh = Similarity.semanticDedupPairsCapped(rew, 0.4,
      cap = 1000000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cappedHigh == uncappedPairs,
      "cap above every occupancy must degenerate to the uncapped pairs")
  }
}
