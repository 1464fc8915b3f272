package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class ContaminationSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("overlapping trigram is counted, disjoint docs score zero") {
    // train doc 1 shares exactly one distinct trigram ("b c d") with eval;
    // train doc 2 shares nothing
    val train = docs(
      1L -> "a b c d e", // trigrams: {a b c, b c d, c d e}
      2L -> "x y z w")   // trigrams: {x y z, y z w}
    val eval = docs(10L -> "q b c d r") // trigrams: {q b c, b c d, c d r}
    val got = Contamination.benchmarkOverlap(train, eval, n = 3).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_shingles"),
        r.getAs[Long]("n_contaminated"), r.getAs[Double]("contamination"))).toMap
    assert(got(1L) == ((3L, 1L, 1.0 / 3.0)))
    assert(got(2L) == ((2L, 0L, 0.0)))
  }

  test("full containment scores 1.0; short docs fall back to whole-doc shingle") {
    val train = docs(1L -> "p q", 2L -> "a b c d")
    val eval = docs(10L -> "p q", 11L -> "z a b c d z")
    val got = Contamination.benchmarkOverlap(train, eval, n = 3).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("contamination")).toMap
    // doc 1: single whole-doc shingle "p q" == eval 10's whole-doc...
    // eval 10 has len<3 -> shingle "p q" -> hit
    assert(got(1L) == 1.0)
    // doc 2 trigrams {a b c, b c d} both inside eval 11's trigram set
    assert(got(2L) == 1.0)
  }

  test("every train doc appears in the report exactly once") {
    val train = docs((1L to 20L).map(i => i -> s"w$i only words w$i again"): _*)
    val eval = docs(100L -> "nothing shared at all here")
    val res = Contamination.benchmarkOverlap(train, eval).collect()
    assert(res.length == 20)
    assert(res.forall(_.getAs[Long]("n_contaminated") == 0L))
  }

  private def srcDocs(rows: (Long, String, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "source", "text")
  }

  test("sourceOverlap counts rare shared shingles; boilerplate is dropped") {
    // The boilerplate line appears in one doc per source (df=3 > maxDf=2 →
    // all its shingles dropped); a and b share exactly one rare shingle.
    val d = srcDocs(
      (1L, "a", "rare overlap text uniqA"),
      (2L, "b", "rare overlap text uniqB"),
      (3L, "c", "totally different content here"),
      (4L, "a", "the same boilerplate line"),
      (5L, "b", "the same boilerplate line"),
      (6L, "c", "the same boilerplate line"))
    val r = Contamination.sourceOverlap(d, n = 3, maxDf = 2).collect()
      .map(x => (x.getAs[String]("source_a"), x.getAs[String]("source_b"),
        x.getAs[Long]("shared_shingles"))).toSet
    assert(r.exists { case (a, b, _) => a == "a" && b == "b" })
    assert(!r.exists { case (a, b, _) => b == "c" || a == "c" })
    // a∩b: "rare overlap text" (df=2 ≤ 2 → kept); boilerplate trigrams gone
    val ab = r.find { case (a, b, _) => a == "a" && b == "b" }.get._3
    assert(ab == 1L)
  }
}
