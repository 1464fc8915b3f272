package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class FunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("VectorFunctions: dot/norm/cosine match scalar math") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    val r = df.select(
      VectorFunctions.dot(col("a"), col("b")),
      VectorFunctions.normSq(col("a")),
      VectorFunctions.cosine(col("a"), col("b"))).collect().head
    assert(r.getDouble(0) == 32.0)
    assert(r.getDouble(1) == 14.0)
    assert(math.abs(r.getDouble(2) - 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))) < 1e-15)
  }

  test("SimHash64: identical inputs → identical hash; permutation-invariant-ish votes") {
    import spark.implicits._
    val df = Seq(
      Seq("a", "b", "c"),
      Seq("a", "b", "c"),
      Seq("c", "b", "a"), // simhash is bag-of-tokens: order must not matter
      Seq("x", "y", "z")).toDF("toks")
    val hs = df.select(SimHash64.simhash64(col("toks"))).collect().map(_.getLong(0))
    assert(hs(0) == hs(1))
    assert(hs(0) == hs(2))
    assert(hs(0) != hs(3))
  }

  test("SimHash64: near-identical token sets land at small hamming distance") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"tok$i")
    val near = base.updated(5, "CHANGED")
    val df = Seq(base, near).toDF("toks")
    val hs = df.select(SimHash64.simhash64(col("toks"))).collect().map(_.getLong(0))
    val hamming = java.lang.Long.bitCount(hs(0) ^ hs(1))
    assert(hamming <= 16, s"hamming=$hamming")
  }

  test("TokenFingerprint64: order-sensitive rolling hash") {
    import spark.implicits._
    val df = Seq(Seq("a", "b"), Seq("b", "a"), Seq("a", "b")).toDF("toks")
    val fps = df.select(TokenFingerprint64.tokenFingerprint64(col("toks"))).collect().map(_.getLong(0))
    assert(fps(0) == fps(2) && fps(0) != fps(1))
  }

  test("JsonExtractString: ClickHouse empty-string semantics") {
    import spark.implicits._
    val df = Seq("""{"user":"jane"}""", """{"other":1}""", "not json", "").toDF("j")
    val got = df.select(JsonExtractString.jsonExtractString(col("j"), "user")).collect()
      .map(_.getString(0))
    assert(got.toSeq == Seq("jane", "", "", ""))
  }

  test("expressions survive codegen and SQL registration paths") {
    import spark.implicits._
    // wide plan to force whole-stage codegen around the expression
    val df = (1 to 100).map(i => Seq(s"a$i", s"b$i")).toDF("toks")
    val n = df.select(SimHash64.simhash64(col("toks")).as("h"))
      .filter(col("h") =!= 0L).count()
    assert(n == 100)
  }
}
