package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class CleanPipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the river bank today", "en", "s0"),
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today", "en", "s0"), // exact dup of 0
      (2L, "the quick brown fox jumps over the lazy dog near the river bank tomorrow", "en", "s0"), // near dup of 0
      (3L, "too short", "en", "s0"), // quality: < 5 tokens
      (4L, "!!! ??? ... ;;; ::: !!! ??? ... too much punctuation here !!!", "en", "s1"), // quality: punct
      (5L, "a perfectly reasonable document with enough words to pass the gates", "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
  }

  test("stages tag drops in cost order; survivors keep NULL reason") {
    val res = CleanPipeline.clean(docs,
      CleanPipeline.Thresholds(minTokens = 5, maxPunctRatio = 0.2, nearDupJaccard = 0.5))
    val reasons = res.collect()
      .map(r => r.getLong(0) -> Option(r.getString(3)).getOrElse("kept")).toMap
    assert(reasons(0L) == "kept")
    assert(reasons(1L) == "exact_dup")
    assert(reasons(2L) == "near_dup")
    assert(reasons(3L) == "quality")
    assert(reasons(4L) == "quality")
    assert(reasons(5L) == "kept")
  }

  test("attrition counts partition the corpus") {
    val res = CleanPipeline.clean(docs,
      CleanPipeline.Thresholds(minTokens = 5, maxPunctRatio = 0.2, nearDupJaccard = 0.5))
    val att = CleanPipeline.attrition(res).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(att.values.sum == docs.count())
    assert(att("kept") == 2L)
  }

  test("runs on the fixture corpus without dropping everything") {
    val res = CleanPipeline.clean(graft.Tables.documents(spark, SparkTestBase.sfDir))
    val kept = res.filter(col("drop_reason").isNull).count()
    assert(kept > 0 && kept <= res.count())
  }
}
