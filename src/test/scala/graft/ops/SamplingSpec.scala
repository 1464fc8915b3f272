package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class SamplingSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private lazy val docs = {
    import spark.implicits._
    (0 until 200).map(i => (i.toLong, s"document body number $i with words", "en", s"src${i % 4}"))
      .toDF("doc_id", "text", "lang", "source")
  }

  test("assignSplit is content-deterministic: identical under repartition/rerun") {
    val a = Sampling.assignSplit(docs).orderBy("doc_id").collect().map(_.getString(2))
    val b = Sampling.assignSplit(docs.repartition(7)).orderBy("doc_id").collect().map(_.getString(2))
    assert(a.toSeq == b.toSeq)
  }

  test("byte-identical duplicates land in the same split (no leakage)") {
    import spark.implicits._
    val dup = Seq((1L, "same exact text", "en", "a"), (2L, "same exact text", "en", "b"))
      .toDF("doc_id", "text", "lang", "source")
    val splits = Sampling.assignSplit(dup).collect().map(_.getString(2)).distinct
    assert(splits.length == 1)
  }

  test("split percentages roughly honored and every doc assigned") {
    val out = Sampling.assignSplit(docs, trainPct = 80, valPct = 10).collect()
    assert(out.length == 200)
    val train = out.count(_.getString(2) == "train")
    assert(train > 120 && train < 200, s"train=$train of 200 at 80pct")
    assert(out.forall(r => Set("train", "val", "test")(r.getString(2))))
  }

  test("mixSources keeps listed sources at their rate, drops unlisted") {
    val kept = Sampling.mixSources(docs,
      Map("src0" -> 1000000L, "src1" -> 0L, "src2" -> 500000L)).collect()
    assert(kept.count(_.getAs[String]("source") == "src0") == 50) // rate 1.0: all
    assert(!kept.exists(_.getAs[String]("source") == "src1"))     // rate 0
    assert(!kept.exists(_.getAs[String]("source") == "src3"))     // unlisted
    val s2 = kept.count(_.getAs[String]("source") == "src2")
    assert(s2 > 5 && s2 < 45, s"src2 kept $s2 of 50 at rate 0.5")
  }

  test("assignSplit rejects bad percentages") {
    intercept[IllegalArgumentException] { Sampling.assignSplit(docs, 95, 10) }
  }

  test("crossSplitLeakage counts planted near-dups that straddle splits") {
    import spark.implicits._
    // deterministic search: a one-token variant of `base` that the LSH
    // detector pairs with it AND that hashes to a different split
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    def report(v: String) = {
      val d = Seq((1L, base), (2L, v)).toDF("doc_id", "text")
        .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      Sampling.crossSplitLeakage(d, 50, 25).collect()
        .map(r => (r.getAs[String]("split_a"), r.getAs[String]("split_b"),
          r.getAs[Long]("n_pairs")))
    }
    val rep = (1 to 40).iterator
      .map(i => report(base.replace("today", s"tok$i")))
      .find(r => r.exists { case (a, b, _) => a != b })
      .getOrElse(fail("no variant produced a detected cross-split pair in 40 tries"))
    val cross = rep.filter { case (a, b, _) => a != b }
    assert(cross.length == 1 && cross(0)._3 == 1L)
  }

  test("evalSample: k per lang, content-deterministic, stable across runs") {
    val s1 = Sampling.evalSample(docs, k = 3).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("doc_id"), r.getAs[Int]("rnk")))
    val byLang = s1.groupBy(_._1)
    assert(byLang.values.forall(_.length <= 3))
    assert(byLang.values.forall(g => g.map(_._3).sorted.toSeq == (1 to g.length)))
    val s2 = Sampling.evalSample(docs, k = 3).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("doc_id"), r.getAs[Int]("rnk")))
    assert(s1.toSeq == s2.toSeq)
  }

  test("exact duplicates can never straddle a split (content-hash law)") {
    import spark.implicits._
    val d = (1L to 50L).map(i => (i, s"identical text payload ${i % 5}"))
      .toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
    val s = Sampling.assignSplit(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split"))
    val byText = s.groupBy(_._1 % 5).values
    assert(byText.forall(g => g.map(_._2).distinct.size == 1))
  }

  test("trainOrder is a content-keyed permutation: dense 1..n, stable") {
    val out = Sampling.trainOrder(docs).collect()
    assert(out.length == 200)
    // positions are exactly 1..n (a permutation, no gaps or dups)
    assert(out.map(_.getAs[Long]("pos")).sorted.toSeq == (1L to 200L))
    // ordering follows (fp, doc_id)
    val sorted = out.sortBy(_.getAs[Long]("pos"))
    val keys = sorted.map(r => (r.getAs[Long]("fp"), r.getAs[Long]("doc_id")))
    assert(keys.toSeq == keys.sortBy(identity).toSeq)
    // re-running yields the identical order (reproducibility contract)
    val again = Sampling.trainOrder(docs).collect().sortBy(_.getAs[Long]("pos"))
    assert(again.map(_.getAs[Long]("doc_id")).toSeq ==
      sorted.map(_.getAs[Long]("doc_id")).toSeq)
  }

  test("domainCap: per-source ceiling, quality-ordered, small sources intact") {
    import spark.implicits._
    // srcA: 30 docs of growing length; srcB: 3 docs — cap 5 keeps the 5
    // LONGEST of A and all of B
    val rows = (0 until 30).map(i =>
      (i.toLong, ("w " * (i + 1)).trim, "en", "srcA")) ++
      (100 until 103).map(i => (i.toLong, "a b c", "en", "srcB"))
    val d = rows.toDF("doc_id", "text", "lang", "source")
    val out = Sampling.domainCap(d, cap = 5).collect()
    val byl = out.groupBy(_.getAs[String]("source"))
    assert(byl("srcA").length == 5)
    // the longest docs (ids 25..29) survive, rank 1 = longest
    assert(byl("srcA").map(_.getAs[Long]("doc_id")).toSet == Set(25L, 26L, 27L, 28L, 29L))
    assert(byl("srcA").minBy(_.getAs[Int]("rnk")).getAs[Long]("doc_id") == 29L)
    assert(byl("srcB").length == 3)
  }

  test("importanceWeights matches a brute-force JVM replica") {
    val target = Seq("src1")
    val b = 256
    def features(text: String): Seq[String] = {
      val tk = text.trim.split("\\s+").filter(_.nonEmpty).toSeq
      tk ++ tk.sliding(2).filter(_.size == 2).map(_.mkString(" "))
    }
    def bucket(f: String): Int =
      (graft.functions.SimHash64.fnv1a64(f.getBytes("UTF-8")) & (b - 1)).toInt
    val rows = docs.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(3)))
    val (tOcc, rOcc) = rows.partition(r => target.contains(r._3))
    val cT = tOcc.flatMap(r => features(r._2)).groupBy(bucket).view.mapValues(_.length.toLong).toMap
    val cR = rOcc.flatMap(r => features(r._2)).groupBy(bucket).view.mapValues(_.length.toLong).toMap
    val (nT, nR) = (cT.values.sum, cR.values.sum)
    def ppbT(k: Int) = (cT.getOrElse(k, 0L) + 1) * 1000000000L / (nT + b)
    def ppbR(k: Int) = (cR.getOrElse(k, 0L) + 1) * 1000000000L / (nR + b)
    val expect = rOcc.map { case (id, text, _) =>
      val bs = features(text).map(bucket)
      val score = bs.map(k => ppbT(k) - ppbR(k)).sum
      id -> (bs.length.toLong, score, score / bs.length)
    }.toMap
    val out = Sampling.importanceWeights(docs, target, b).collect()
    assert(out.length == expect.size)
    out.foreach { r =>
      val got = (r.getAs[Long]("n_feats"), r.getAs[Long]("score_ppb"),
        r.getAs[Long]("mean_ppb"))
      assert(got == expect(r.getAs[Long]("doc_id")),
        s"doc ${r.getAs[Long]("doc_id")}: got $got want ${expect(r.getAs[Long]("doc_id"))}")
    }
  }

  test("importanceWeights: target docs and empty docs produce no row") {
    import spark.implicits._
    val d = Seq(
      (1L, "alpha beta", "en", "tgt"),
      (2L, "alpha beta", "en", "raw"),
      (3L, "   ", "en", "raw"),
      (4L, "gamma delta epsilon", "en", "raw"))
      .toDF("doc_id", "text", "lang", "source")
    val out = Sampling.importanceWeights(d, Seq("tgt"), 64).collect()
    assert(out.map(_.getLong(0)).toSet == Set(2L, 4L))
    // doc 2 shares every feature with the target; doc 4 shares none —
    // the shared-evidence doc must score strictly higher per feature
    val byId = out.map(r => r.getLong(0) -> r.getAs[Long]("mean_ppb")).toMap
    assert(byId(2L) > byId(4L))
  }

  test("importanceWeightsLlr matches a brute-force JVM replica of the fixed-point log") {
    val target = Seq("src1")
    val b = 256
    def features(text: String): Seq[String] = {
      val tk = text.trim.split("\\s+").filter(_.nonEmpty).toSeq
      tk ++ tk.sliding(2).filter(_.size == 2).map(_.mkString(" "))
    }
    def bucket(f: String): Int =
      (graft.functions.SimHash64.fnv1a64(f.getBytes("UTF-8")) & (b - 1)).toInt
    def l2(x: Long): Long = { // the table-based fixed-point log2
      val e = 63 - java.lang.Long.numberOfLeadingZeros(x)
      val m = (if (e >= 8) x >> (e - 8) else x << (8 - e)) - 256
      e * 1000000000L + Sampling.Log2Table(m.toInt)
    }
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1), r.getString(3)))
    val (tOcc, rOcc) = rows.partition(r => target.contains(r._3))
    val cT = tOcc.flatMap(r => features(r._2)).groupBy(bucket).view.mapValues(_.length.toLong).toMap
    val cR = rOcc.flatMap(r => features(r._2)).groupBy(bucket).view.mapValues(_.length.toLong).toMap
    val (nT, nR) = (cT.values.sum, cR.values.sum)
    val l0 = l2(nT + b) - l2(nR + b)
    val expect = rOcc.map { case (id, text, _) =>
      val bs = features(text).map(bucket)
      val s = bs.map(k => l2(cT.getOrElse(k, 0L) + 1) - l2(cR.getOrElse(k, 0L) + 1)).sum
      id -> (bs.length.toLong, s - bs.length * l0)
    }.toMap
    val out = Sampling.importanceWeightsLlr(docs, target, b).collect()
    assert(out.length == expect.size)
    out.foreach { r =>
      val got = (r.getAs[Long]("n_feats"), r.getAs[Long]("score_llr"))
      assert(got == expect(r.getAs[Long]("doc_id")),
        s"doc ${r.getAs[Long]("doc_id")}: got $got want ${expect(r.getAs[Long]("doc_id"))}")
    }
  }

  test("LLR vs linear: a rare-but-discriminative feature outranks absolute mass") {
    import spark.implicits._
    // One-token documents so each scoring doc carries EXACTLY one feature
    // occurrence (no bigram cross-talk). Counts: "rare" appears 7× in
    // target, 1× in raw (doc 10 itself); "common" 40× in target, 12× in
    // raw (10 filler + doc 11). With B = 4096 the Laplace denominators
    // nearly cancel, so per-feature: linear ≈ (8 − 2) vs (41 − 13) —
    // absolute MASS prefers the common doc; LLR ≈ log2(8/2) = 2.0 vs
    // log2(41/13) ≈ 1.66 — relative ODDS prefer the rare doc. The
    // documented ranking delta between the two scorers.
    val d = (
      (100L until 107L).map(i => (i, "rare", "en", "tgt")) ++
      (110L until 150L).map(i => (i, "common", "en", "tgt")) ++
      (200L until 211L).map(i => (i, "common", "en", "raw")) ++
      Seq((10L, "rare", "en", "raw"), (11L, "common", "en", "raw")))
      .toDF("doc_id", "text", "lang", "source")
    def rank(df: org.apache.spark.sql.DataFrame, score: String): Seq[Long] =
      df.orderBy(col(score).desc, col("doc_id")).select("doc_id")
        .collect().map(_.getLong(0)).toSeq
    val lin = Sampling.importanceWeights(d, Seq("tgt"), 4096)
      .filter(col("doc_id").isin(10L, 11L))
    val llr = Sampling.importanceWeightsLlr(d, Seq("tgt"), 4096)
      .filter(col("doc_id").isin(10L, 11L))
    assert(rank(llr, "score_llr").head == 10L,
      "LLR must prefer the rare-feature doc")
    assert(rank(lin, "score_ppb").head == 11L,
      "the linear score prefers absolute mass — the delta under test")
  }

  test("importanceWeightsIncremental: arrival scores bit-identical to the " +
      "full recompute's delta slice — the merged counts ARE the model") {
    val fixture = graft.Tables.documents(spark, SparkTestBase.sfDir)
    val isDelta = col("doc_id") % 7 === 0
    val incr = Sampling.importanceWeightsIncremental(spark,
      SparkTestBase.sfDir, fixture.filter(!isDelta), fixture.filter(isDelta),
      buckets = 256)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val full = Sampling.importanceWeights(fixture, buckets = 256)
      .filter(col("doc_id") % 7 === 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(incr.nonEmpty, "no raw delta documents scored")
    // exact row-for-row equality proves the count merge reproduced the
    // full-corpus model: a base-side miscount would shift every ppb
    assert(incr.toSeq == full.toSeq)
  }

  test("importanceResample keeps the per-source ceil quota, ranked by score then doc_id") {
    val target = Seq("src1")
    val out = Sampling.importanceResample(docs, target, buckets = 256,
      keepPerMille = 300).collect()
    // every scored doc is raw; 50 per raw source -> ceil(50*0.3) = 15 each
    val bySrc = out.groupBy(_.getAs[String]("source"))
    assert(bySrc.keySet == Set("src0", "src2", "src3"))
    bySrc.foreach { case (src, rows) =>
      assert(rows.length == 15, s"$src kept ${rows.length}")
      // ranks are 1..quota, and scores are non-increasing along the rank
      val byRk = rows.sortBy(_.getAs[Long]("rk"))
      assert(byRk.map(_.getAs[Long]("rk")).toSeq == (1L to 15L))
      val scores = byRk.map(_.getAs[Long]("score_ppb")).toSeq
      assert(scores == scores.sorted(Ordering[Long].reverse), s"$src not ranked by score")
    }
    // the cut is the same set a full sort of the weights frame would keep
    val all = Sampling.importanceWeights(docs, target, 256)
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("score_ppb")))
    val expectKept = all.groupBy(_._1).values.flatMap(rows =>
      rows.sortBy(r => (-r._3, r._2)).take(15).map(_._2).toSeq).toSet
    assert(out.map(_.getAs[Long]("doc_id")).toSet == expectKept)
  }
}
