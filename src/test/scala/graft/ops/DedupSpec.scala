package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class DedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  /** Synthetic corpus with one exact dup pair (0,1), one near-dup pair
    * (2,3: one word changed out of 12), and unrelated docs. */
  private lazy val docs = {
    import spark.implicits._
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the river", "en", "s0"),
      (1L, "the quick brown fox jumps over the lazy dog near the river", "en", "s0"),
      (2L, "pack my box with five dozen liquor jugs for the long trip", "en", "s0"),
      (3L, "pack my box with five dozen liquor jugs for the short trip", "en", "s0"),
      (4L, "sphinx of black quartz judge my vow tonight under bright stars", "en", "s1"),
      (5L, "completely different words appear here without any overlap at all", "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
  }

  test("exact: identical texts collapse to min doc_id") {
    val res = Dedup.exact(docs).collect()
    val dup = res.find(_.getAs[Long]("n_copies") == 2L)
    assert(dup.isDefined && dup.get.getAs[Long]("keep_id") == 0L)
    assert(res.length == 5) // 6 docs, one pair merged
    val drop = Dedup.exactDropList(docs).collect()
    assert(drop.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 0L)))
  }

  test("minhash LSH: finds exact and near dup pairs, not unrelated ones") {
    val pairs = Dedup.minHashPairs(docs, n = 2, k = 64, bands = 16, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((2L, 3L)))
    assert(!pairs.exists { case (a, b) => Set(a, b).intersect(Set(4L, 5L)).nonEmpty })
  }

  test("minhash jaccard matches brute-force shingle jaccard") {
    val got = Dedup.minHashPairs(docs, n = 2, k = 64, bands = 16, threshold = 0.4)
      .filter(col("id_a") === 2 && col("id_b") === 3)
      .collect().head.getAs[Double]("jaccard")
    // 12 tokens → 11 bigrams each; one word differs → 2 bigrams differ per
    // side: |∩| = 9, |∪| = 13
    assert(math.abs(got - 9.0 / 13.0) < 1e-12)
  }

  test("simhash: near-dups within small hamming distance, pairs found") {
    val pairs = Dedup.simHashPairs(docs, maxHamming = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L))) // identical → hamming 0
    assert(pairs.contains((2L, 3L)))
  }

  test("simhash128: identical docs hash to hamming 0; banding complete at radius 3") {
    val pairs = Dedup.simHash128Pairs(docs, maxHamming = 24).collect()
    val set = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(set.contains((0L, 1L)))
    assert(pairs.find(r => r.getLong(0) == 0L && r.getLong(1) == 1L)
      .get.getLong(2) == 0L)
    // 4×32-bit banding is COMPLETE for hamming ≤ 3 (pigeonhole): the
    // banded pair set at radius 3 must equal brute-force popcount pairs
    val hashed = docs.select(col("doc_id"),
      graft.functions.SimHash64.simhash64(Dedup.tokens(col("text"))).as("sh0"),
      graft.functions.SimHash64.simhashMix64(Dedup.tokens(col("text"))).as("sh1"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = (for {
      (ia, a0, a1) <- hashed.toSeq
      (ib, b0, b1) <- hashed.toSeq if ia < ib
      if java.lang.Long.bitCount(a0 ^ b0) + java.lang.Long.bitCount(a1 ^ b1) <= 3
    } yield (ia, ib)).toSet
    val banded3 = Dedup.simHash128Pairs(docs, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded3 == brute)
  }

  test("banded hamming: guarded (hot-bucket) and plain paths emit the same pairs") {
    import spark.implicits._
    // 12 identical fingerprints land in ONE bucket per band; targetBlock=4
    // forces the g×g grid-guard branch (g=3), the default leaves it on the
    // bare equi-join — both must produce exactly C(12,2) hamming-0 pairs
    val hashed = (0L until 12L).map(i => (i, 0x1234L, 0x9876L))
      .toDF("doc_id", "sh0", "sh1")
    def pairs(block: Int) =
      Dedup.hammingPairs128Unordered(hashed, maxHamming = 3, targetBlock = block)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = (for { a <- 0L until 12L; b <- 0L until 12L if a < b } yield (a, b)).toSet
    assert(pairs(4) == brute)    // guarded path
    assert(pairs(4096) == brute) // plain path
  }

  test("char jaccard pairs respect the source blocking key") {
    val res = Dedup.charJaccardPairs(docs, 0.0).collect()
    assert(res.forall(r => r.getAs[String]("source") != null))
    // cross-source pairs (e.g. 0-4) must not appear
    assert(!res.exists(r => r.getAs[Long]("id_a") == 0L && r.getAs[Long]("id_b") == 4L))
    // identical strings → jaccard exactly 1.0
    val p01 = res.find(r => r.getAs[Long]("id_a") == 0L && r.getAs[Long]("id_b") == 1L)
    assert(p01.isDefined && p01.get.getAs[Double]("jaccard") == 1.0)
  }

  test("char jaccard adaptive sub-blocking preserves the exact pair set") {
    import spark.implicits._
    // one skewed mega-block: 40 docs in a single source (the unguarded
    // shape that becomes one quadratic task), plus a small second block —
    // g derives per source as ceil(|block| / targetBlock), so the big
    // block splits while the small one stays whole
    val skewed = ((0 until 40).map(i => (i.toLong, s"shared alphabet soup $i", "en", "big")) ++
      Seq((100L, "tiny block one", "en", "small"), (101L, "tiny block two", "en", "small")))
      .toDF("doc_id", "text", "lang", "source")
    def pairs(target: Int) = Dedup.charJaccardPairs(skewed, 0.5, targetBlock = target).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val whole = pairs(1000) // g = 1 everywhere (no sub-blocking)
    assert(whole.nonEmpty)
    assert(pairs(7) == whole) // big block g = 6, small block g = 1
    assert(pairs(1) == whole) // g = |block|: more cells than rows per cell
  }

  test("char jaccard sub-block grid bounds per-cell pair work by ~targetBlock^2") {
    import spark.implicits._
    // replicate the grid-cell construction to measure the biggest cell a
    // task would see: with targetBlock=8 over a 64-row block, g=8 and no
    // (ga, gb) cell may hold more than ~ceil(64/8)=8 rows per side
    val docs = (0 until 64).map(i => (i.toLong, s"doc $i", "en", "one"))
      .toDF("doc_id", "text", "lang", "source")
    val g = 8L
    val sideSizes = docs
      .select(pmod(xxhash64(col("doc_id")), lit(g)).as("ga"))
      .groupBy(col("ga")).count().collect().map(_.getLong(1))
    // hash-balanced: no sub-block should exceed a small multiple of n/g
    assert(sideSizes.max <= 3 * (64 / g))
  }

  test("hammingPairs128Between: delta×index pairs equal the self-join's cross subset") {
    import spark.implicits._
    // 10 fingerprints in 2 classes (hamming 0 within, far across); the
    // delta is ids 7..9 — between(delta, base) ∪ self(delta) must equal
    // the FULL self-join restricted to delta-touching pairs
    val all = (0L until 10L).map(i =>
      (i, if (i % 2 == 0) 0x1234L else -0x4321L,
        if (i % 2 == 0) 0x9876L else 0x1111L))
      .toDF("doc_id", "sh0", "sh1")
    val base = all.filter(col("doc_id") < 7)
    val delta = all.filter(col("doc_id") >= 7)
    val got = Dedup.hammingPairs128Between(delta, base, 3)
      .unionByName(Dedup.hammingPairs128(delta, 3))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Dedup.hammingPairs128(all, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == full.filter { case (a, b) => a >= 7 || b >= 7 })
    assert(got.nonEmpty && got != full) // neither vacuous nor everything
  }

  test("nearDupClusters: transitive pairs collapse into one component") {
    import spark.implicits._
    val docs = Seq(
      (10L, "x", "en", "s"), (11L, "x", "en", "s"), (12L, "x", "en", "s"),
      (20L, "y", "en", "s"), (30L, "z", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    // chain 10~11, 11~12 WITHOUT the 10~12 edge; 20 isolated via no pairs
    val pairs = Seq((10L, 11L), (11L, 12L)).toDF("id_a", "id_b")
    val got = Dedup.nearDupClusters(docs, pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 30L -> 30L))
  }

  test("nearDupClusters: non-convergence is an error, not a silent wrong answer") {
    import spark.implicits._
    // a path graph 0-1-2-3-4-5 has diameter 5; two rounds of min-label
    // propagation cannot close it — the loop must throw rather than
    // return partially-propagated labels that diverge from the oracle's
    // transitive closure
    val docs = (0L to 5L).map(i => (i, s"d$i", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val pairs = (0L until 5L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    intercept[IllegalStateException] {
      Dedup.nearDupClusters(docs, pairs, maxIter = 2)
    }
    // with enough rounds the same graph converges to one component
    val ok = Dedup.nearDupClusters(docs, pairs, maxIter = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(ok.values.toSet == Set(0L))
  }

  test("minHashPairsIncremental: equals the full run's delta-touching slice " +
      "and finds delta-base and delta-delta pairs") {
    val docs = graft.Tables.documents(spark, SparkTestBase.sfDir)
    val isDelta = col("doc_id") % 7 === 0
    val incr = Dedup.minHashPairsIncremental(spark, SparkTestBase.sfDir,
      docs.filter(!isDelta), docs.filter(isDelta))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val full = Dedup.minHashPairs(docs)
      .filter(col("id_a") % 7 === 0 || col("id_b") % 7 === 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(incr.nonEmpty, "no delta-touching near-dup pairs in the fixture")
    assert(incr == full)
    // the between leg must actually fire (a delta-only result would mean
    // the persisted index path is silently broken)
    assert(incr.exists { case (a, b, _) => a % 7 != 0 || b % 7 != 0 })
  }

  test("mergeClusterDelta: merging a pair delta equals the full rebuild") {
    import spark.implicits._
    val baseDocs = Seq(1L, 2L, 3L, 10L, 11L, 20L, 30L)
      .map(i => (i, s"d$i", "en", "s")).toDF("doc_id", "text", "lang", "source")
    val basePairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val baseLabels = Dedup.nearDupClusters(baseDocs, basePairs)
    // delta: 40 joins {1,2,3} via 3; 41 chains onto 40; 50 is an edge-less
    // singleton; 11~20 merges two EXISTING components (10s and 20)
    val deltaDocs = Seq(40L, 41L, 50L).toDF("doc_id")
    val deltaPairs = Seq((40L, 3L), (41L, 40L), (11L, 20L)).toDF("id_a", "id_b")
    // BOTH resolution paths must agree with the full rebuild: the
    // driver union-find fast path (default limit) and the distributed
    // star contraction (limit 0 forces it)
    val merged = Dedup.mergeClusterDelta(baseLabels, deltaDocs, deltaPairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val mergedDist = Dedup.mergeClusterDelta(baseLabels, deltaDocs,
      deltaPairs, driverEdgeLimit = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val full = Dedup.nearDupClusters(
      baseDocs.unionByName(deltaDocs.select(col("doc_id"), lit("t").as("text"),
        lit("en").as("lang"), lit("s").as("source"))),
      basePairs.unionByName(deltaPairs)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(merged == full)
    assert(mergedDist == full)
    assert(merged == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 40L -> 1L, 41L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 10L, 30L -> 30L, 50L -> 50L))
  }

  test("mergeClusterDelta: untouched labels pass through; replayed deltas are idempotent") {
    import spark.implicits._
    val baseDocs = Seq(1L, 2L, 30L).map(i => (i, s"d$i", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val baseLabels = Dedup.nearDupClusters(baseDocs,
      Seq((1L, 2L)).toDF("id_a", "id_b"))
    val deltaDocs = Seq(40L).toDF("doc_id")
    val deltaPairs = Seq((40L, 2L)).toDF("id_a", "id_b")
    val once = Dedup.mergeClusterDelta(baseLabels, deltaDocs, deltaPairs)
    // replay the SAME delta against the merged labels: nothing changes —
    // 40 is already labeled, its edge re-converges to the same star
    val twice = Dedup.mergeClusterDelta(once, deltaDocs, deltaPairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(twice == Map(1L -> 1L, 2L -> 1L, 30L -> 30L, 40L -> 1L))
    assert(twice(30L) == 30L) // untouched singleton passed through
  }

  test("retireClusterDelta: retiring a bridge SPLITS its component; " +
      "equals the rebuild on survivors (both resolution paths)") {
    import spark.implicits._
    // chain 1-2-3-4: retiring the bridge 2 splits the component into {1}
    // and {3,4}; 10-11 is untouched and must pass through unscanned;
    // 20 is an expired singleton that simply disappears
    val docs = Seq(1L, 2L, 3L, 4L, 10L, 11L, 20L)
      .map(i => (i, s"d$i", "en", "s")).toDF("doc_id", "text", "lang", "source")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("id_a", "id_b")
    val labels = Dedup.nearDupClusters(docs, pairs)
    val expired = Seq(2L, 20L).toDF("doc_id")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val retired = asMap(Dedup.retireClusterDelta(labels, pairs, expired))
    val retiredDist = asMap(
      Dedup.retireClusterDelta(labels, pairs, expired, driverEdgeLimit = 0))
    val rebuilt = asMap(Dedup.nearDupClusters(
      docs.filter(!col("doc_id").isin(2L, 20L)),
      pairs.filter(!col("id_a").isin(2L, 20L) && !col("id_b").isin(2L, 20L))))
    assert(retired == rebuilt)
    assert(retiredDist == rebuilt)
    assert(retired == Map(1L -> 1L, 3L -> 3L, 4L -> 3L, 10L -> 10L, 11L -> 10L))
  }

  test("reconvergeClusterDelta: deleting a bridge EDGE splits its " +
      "component, docs stay; untouched labels pass through; both " +
      "resolution paths; idempotent") {
    import spark.implicits._
    // chain 1-2-3-4 plus pair 10-11: the PRE-deletion labeling; the
    // repair deletes the bridge edge (2,3) — docs all survive, the
    // component must split into {1,2} and {3,4}; {10,11} untouched
    val docs = Seq(1L, 2L, 3L, 4L, 10L, 11L)
      .map(i => (i, s"d$i", "en", "s")).toDF("doc_id", "text", "lang", "source")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("id_a", "id_b")
    val labels = Dedup.nearDupClusters(docs, pairs)
    val newPairs = Seq((1L, 2L), (3L, 4L), (10L, 11L)).toDF("id_a", "id_b")
    val seeds = Seq(2L, 3L).toDF("doc_id") // the dropped edge's endpoints
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val got = asMap(Dedup.reconvergeClusterDelta(labels, newPairs, seeds))
    val gotDist = asMap(Dedup.reconvergeClusterDelta(labels, newPairs,
      seeds, driverEdgeLimit = 0))
    val rebuilt = asMap(Dedup.nearDupClusters(docs, newPairs))
    assert(got == rebuilt)
    assert(gotDist == rebuilt)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L,
      10L -> 10L, 11L -> 10L))
    // idempotent: re-running against the repaired labeling is a no-op
    val again = asMap(Dedup.reconvergeClusterDelta(
      Dedup.nearDupClusters(docs, newPairs), newPairs, seeds))
    assert(again == rebuilt)
    // a member losing its LAST edge becomes a singleton
    val none = asMap(Dedup.reconvergeClusterDelta(labels,
      Seq((1L, 2L), (10L, 11L)).toDF("id_a", "id_b"),
      Seq(3L, 4L).toDF("doc_id")))
    assert(none == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 4L,
      10L -> 10L, 11L -> 10L))
  }

  test("retireClusterDelta: add-then-retire equals the rebuild on the " +
      "surviving union (the live pipeline's steady-state cycle)") {
    import spark.implicits._
    val baseDocs = Seq(1L, 2L, 3L, 10L, 11L)
      .map(i => (i, s"d$i", "en", "s")).toDF("doc_id", "text", "lang", "source")
    val basePairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val baseLabels = Dedup.nearDupClusters(baseDocs, basePairs)
    // arrivals: 40 joins {1,2,3} via 2; then retention expires 2 (the
    // bridge AND 40's only link into the old component) and 10
    val deltaDocs = Seq(40L).toDF("doc_id")
    val deltaPairs = Seq((40L, 2L)).toDF("id_a", "id_b")
    val merged = Dedup.mergeClusterDelta(baseLabels, deltaDocs, deltaPairs)
    val allPairs = basePairs.unionByName(deltaPairs)
    val expired = Seq(2L, 10L).toDF("doc_id")
    val got = Dedup.retireClusterDelta(merged, allPairs, expired)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val rebuilt = Dedup.nearDupClusters(
      baseDocs.unionByName(deltaDocs.select(col("doc_id"), lit("t").as("text"),
        lit("en").as("lang"), lit("s").as("source")))
        .filter(!col("doc_id").isin(2L, 10L)),
      allPairs.filter(!col("id_a").isin(2L, 10L) && !col("id_b").isin(2L, 10L)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == rebuilt)
    assert(got == Map(1L -> 1L, 3L -> 3L, 40L -> 40L, 11L -> 11L))
  }

  test("shingles: distinct n-grams; short docs degrade to whole-doc shingle") {
    import spark.implicits._
    val df = Seq("a b c d", "a b", "x").toDF("text")
    val got = df.select(Dedup.shingles(col("text"), 3)).collect()
      .map(_.getSeq[String](0).toSet)
    assert(got(0) == Set("a b c", "b c d"))
    assert(got(1) == Set("a b")) // fewer tokens than n
    assert(got(2) == Set("x"))
  }

  test("historyDedupBloom: keeps exactly the unseen texts; bloom is in the plan") {
    import spark.implicits._
    val history = Seq(
      (100L, "seen text one", "en", "h"), (101L, "seen text two", "en", "h"))
      .toDF("doc_id", "text", "lang", "source")
    val incoming = Seq(
      (1L, "seen text one", "en", "i"),   // duplicate of history → dropped
      (2L, "brand new text a", "en", "i"),
      (3L, "seen text two", "en", "i"),   // duplicate → dropped
      (4L, "brand new text b", "en", "i"))
      .toDF("doc_id", "text", "lang", "source")
    val out = Dedup.historyDedupBloom(spark, incoming, history)
    assert(out.queryExecution.executedPlan.toString.contains("might_contain"))
    assert(out.collect().map(_.getLong(0)).toSeq == Seq(2L, 4L))
  }

  test("charJaccardPairsPersisted: identical rows to the lazy pairs; memoized") {
    val dir = SparkTestBase.sfDir
    val docs = graft.Tables.documents(spark, dir)
    val lazyRows = Dedup.charJaccardPairs(docs, 0.9).collect().toSeq
    val persisted = Dedup.charJaccardPairsPersisted(spark, dir, docs, 0.9)
    assert(persisted.orderBy(col("source"), col("id_a"), col("id_b"))
      .collect().toSeq == lazyRows)
    // downstream closure over the persisted table = closure over lazy pairs
    val viaTable = Dedup.nearDupClusters(docs,
      Dedup.charJaccardPairsPersisted(spark, dir, docs, 0.9)).collect().toSeq
    val viaLazy = Dedup.nearDupClusters(docs,
      Dedup.charJaccardPairs(docs, 0.9)).collect().toSeq
    assert(viaTable == viaLazy)
  }

  test("historyDedupBloom: empty history (NULL bloom) keeps the whole batch") {
    import spark.implicits._
    // bootstrap case: no accumulated corpus yet. The bloom aggregate over
    // zero rows is NULL; NULL must read as "definitely unseen", not drop
    // every row (the pre-fix behavior).
    val history = Seq.empty[(Long, String, String, String)]
      .toDF("doc_id", "text", "lang", "source")
    val incoming = Seq(
      (1L, "first ever doc", "en", "i"), (2L, "second ever doc", "en", "i"))
      .toDF("doc_id", "text", "lang", "source")
    val out = Dedup.historyDedupBloom(spark, incoming, history)
    assert(out.collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
    // all-NULL history texts behave the same (nothing was inserted)
    val nullHist = Seq((9L, null: String, "en", "h"))
      .toDF("doc_id", "text", "lang", "source")
    val out2 = Dedup.historyDedupBloom(spark, incoming, nullHist)
    assert(out2.collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
  }
  test("degreeDistribution: hand-checked degree histogram") {
    import spark.implicits._
    // edges 1-2, 1-3, 4-5: degrees 1->2, {2,3,4,5}->1
    val pairs = Seq((1L, 2L), (1L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val out = Dedup.degreeDistribution(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
    assert(out == Seq(1L -> 4L, 2L -> 1L))
  }

  test("shingleContainment: short-in-long quote scores asymmetrically") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b c", "s0"),          // 2-shingles: {a b, b c}
      (2L, "a b c d e f", "s0"),    // {a b, b c, c d, d e, e f}
      (3L, "a b c", "s1"))           // other source block -> no pair
      .map { case (id, t, src) => (id, t, "en", src) }
      .toDF("doc_id", "text", "lang", "source")
    val out = Dedup.shingleContainment(d, 2, 300000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(out == Seq(
      (1L, 2L, 2L, 2L, 1000000000L),   // doc 1 fully contained in doc 2
      (2L, 1L, 2L, 5L, 400000000L)))   // reverse direction is weak
  }

  test("bandIndexHealthGauge: template flood fires batch concentration, " +
      "a hot standing bucket fires the collision signal, in-distribution " +
      "stays quiet — each signal's blind spot covered by the other") {
    import org.apache.spark.sql.functions._
    val fix = graft.Tables.documents(spark, SparkTestBase.sfDir)
    val base = fix.filter(col("doc_id") % 7 =!= 0)
    val delta = fix.filter(col("doc_id") % 7 === 0)
    val refB = delta.filter(col("doc_id") % 2 === 0)
    val newB = delta.filter(col("doc_id") % 2 =!= 0)
    val template =
      lit("click here to unsubscribe from this newsletter and follow our updates")
    // in-distribution: quiet (the driver row's case)
    val quiet = Dedup.bandIndexHealthGauge(spark, SparkTestBase.sfDir,
      base, refB, newB).head()
    assert(!quiet.getBoolean(6), s"in-distribution batch alerted: $quiet")
    // template flood: every arrival shares one text — concentration hits
    // 1e9 while the CLEAN index gives the collision signal nothing (its
    // blind spot)
    val flood = Dedup.bandIndexHealthGauge(spark, SparkTestBase.sfDir,
      base, refB, newB.withColumn("text", template)).head()
    assert(flood.getBoolean(6) && flood.getLong(3) == 1000000000L,
      s"template flood must fire batch concentration: $flood")
    assert(flood.getLong(5) <= quiet.getLong(5),
      s"collision signal should NOT see the flood on a clean index: $flood")
    // hot standing bucket brushed by ~11% of the batch (newB ids are odd
    // multiples of 7, so the brush predicate must hit odd ids — % 9
    // selects the multiples of 63): concentration stays under threshold
    // (ITS blind spot), collisions must fire
    val hotBase = base.withColumn("text",
      when(col("doc_id") % 20 === 0, template).otherwise(col("text")))
    val brush = newB.withColumn("text",
      when(col("doc_id") % 9 === 0, template).otherwise(col("text")))
    val hot = Dedup.bandIndexHealthGauge(spark, SparkTestBase.sfDir,
      hotBase, refB, brush, suffix = "_hotspec").head()
    assert(hot.getBoolean(6) && hot.getLong(3) <= 200000000L,
      s"hot standing bucket must fire via collisions, not concentration: $hot")
    assert(hot.getLong(5) > 16000000000L,
      s"collision rate must cross the threshold: $hot")
  }

  test("minHashPairsCapped: the flood's hot buckets stop pairing; organic " +
      "pairs survive; capped is a subset of uncapped") {
    import spark.implicits._
    // a 40-copy template flood (ids 100-139) over the organic corpus —
    // every flood bucket holds 40 > cap members; organic near-dup
    // buckets hold ≤ 2
    val flood = (100L until 140L).map(id =>
      (id, "please click here to unsubscribe from this mailing list now",
        "en", "s9"))
    val corpus = docs.unionByName(
      flood.toDF("doc_id", "text", "lang", "source"))
    val uncapped = Dedup.minHashPairs(corpus)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Dedup.minHashPairsCapped(corpus, cap = 16)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.subsetOf(uncapped))
    // the flood paired quadratically uncapped, not at all capped
    assert(uncapped.count(p => p._1 >= 100L) == 40 * 39 / 2)
    assert(capped.forall(p => p._1 < 100L && p._2 < 100L))
    // organic pairs are untouched: (0,1) exact, (2,3) near
    assert(capped.contains((0L, 1L)) && capped.contains((2L, 3L)))
    // a cap ABOVE every occupancy degrades to the plain operator
    val wide = Dedup.minHashPairsCapped(corpus, cap = 1000)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(wide == uncapped)
  }

  test("hammingPairs128Capped: over-cap band buckets stop pairing; " +
      "organic families survive; wide cap degrades to the plain operator") {
    import spark.implicits._
    // a 10-copy identical-fingerprint flood (every band bucket holds all
    // 10) over two organic 3-member families with distinct hash words
    val flood = (100L until 110L).map(i => (i, 0xAAAA5555L, 0x1234ABCDL))
    val famA = (0L until 3L).map(i => (i, 0x11112222L, 0x33334444L))
    val famB = (10L until 13L).map(i => (i, 0x55556666L, 0x77778888L))
    val hashed = (flood ++ famA ++ famB).toDF("doc_id", "sh0", "sh1")
    val capped = Dedup.hammingPairs128Capped(hashed, maxHamming = 3, cap = 4)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val organic = (for { a <- 0L until 3L; b <- 0L until 3L if a < b }
      yield (a, b)).toSet ++
      (for { a <- 10L until 13L; b <- 10L until 13L if a < b }
        yield (a, b)).toSet
    assert(capped == organic,
      s"capped pair set wrong: $capped")
    val wide = Dedup.hammingPairs128Capped(hashed, maxHamming = 3,
        cap = 1000)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = Dedup.hammingPairs128(hashed, maxHamming = 3)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(wide == uncapped)
    assert(uncapped.count(p => p._1 >= 100L) == 10 * 9 / 2)
  }
}
