package graft

import org.apache.spark.sql.{AnalysisException, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** [[GraftExtensions]]: a session built with the extensions class resolves
  * the sketch kernels from SQL text and carries the injected rule/strategy
  * — the `spark.sql.extensions=graft.GraftExtensions` deployment path. */
class GraftExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {
  private val base = SparkTestBase.spark

  private lazy val ext: SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
  }

  override def afterAll(): Unit = {
    SparkSession.setDefaultSession(base)
    SparkSession.setActiveSession(base)
    super.afterAll()
  }

  test("simhash64 is SQL-callable and equals the Column-API expression") {
    import org.apache.spark.sql.functions.{array, lit}
    val viaSql = ext.sql(
      "SELECT simhash64(array('the', 'cat', 'sat')) AS h").collect()(0).getLong(0)
    val viaApi = ext.range(1)
      .select(functions.SimHash64.simhash64(array(lit("the"), lit("cat"), lit("sat"))).as("h"))
      .collect()(0).getLong(0)
    assert(viaSql == viaApi)
  }

  test("parameterized kernels take INT literals; non-literals are rejected") {
    val r = ext.sql(
      "SELECT minhash_sig(word_shingles('a b c d', 2), 8) AS sig").collect()(0)
    assert(r.getSeq[Long](0).size == 8)
    val err = intercept[Exception] {
      ext.sql("SELECT minhash_sig(word_shingles('a b', 1), CAST(rand()*4 AS INT) + 1)")
        .collect()
    }
    assert(err.isInstanceOf[AnalysisException] ||
      err.getMessage.contains("INT literal"))
  }

  test("vec_dot and char-set kernels resolve from SQL") {
    val d = ext.sql(
      """SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |               array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d,
        |       char_set_jaccard('abc', 'bcd') AS j,
        |       mask_jaccard(char_set_mask('abc'), char_set_mask('abc')) AS jm
        |""".stripMargin).collect()(0)
    assert(d.getAs[Double]("d") == 11.0)
    assert(d.getAs[Double]("j") == 0.5) // |{b,c}| / |{a,b,c,d}|
    assert(d.getAs[Double]("jm") == 1.0)
  }

  test("DESCRIBE FUNCTION works for injected kernels") {
    val desc = ext.sql("DESCRIBE FUNCTION simhash64").collect().map(_.getString(0)).mkString("\n")
    assert(desc.contains("simhash64"))
  }

  test("splitmix64 is SQL-callable and matches the reference sequence") {
    // splitmix64(0) is a published test vector of the Steele/Lea/Flood
    // generator: first output from seed 0
    val h = ext.sql("SELECT splitmix64(CAST(0 AS BIGINT)) AS h").collect()(0).getLong(0)
    assert(h == 0xE220A8397B1DCDAFL)
    assert(graft.functions.Splitmix64.hash(0L) == h)
  }

  test("optimizer rule and planner strategy ride the extensions class") {
    assert(ext.sessionState.planner.strategies
      .exists(_.getClass.getName.contains("AsOfJoinStrategy")))
    val batches = ext.sessionState.optimizer.batches.flatMap(_.rules)
    assert(batches.exists(_.ruleName.contains("NanosTimestampPushdown")))
  }

  // ── bloom runtime filter ──────────────────────────────────────────

  test("bloom filter prunes non-joining fact rows with zero false negatives") {
    import org.apache.spark.sql.functions.col
    GraftExtensions.register(base) // runtime-registration path
    import base.implicits._
    // fact: keys 0..9999; dim keeps multiples of 100 (1% selective)
    (0L until 10000L).toDF("k").createOrReplaceTempView("bf_fact")
    (0L until 10000L by 100L).toDF("d").createOrReplaceTempView("bf_dim")
    val pruned = base.sql(
      """SELECT k FROM bf_fact
        |WHERE bloom_might_contain((SELECT bloom_build(d, 1024) FROM bf_dim), k)
        |""".stripMargin)
    val survivors = pruned.collect().map(_.getLong(0)).toSet
    // no false negatives: every real dim key survives
    (0L until 10000L by 100L).foreach(d => assert(survivors.contains(d)))
    // real pruning: at 1% selectivity the filter must drop the bulk
    assert(survivors.size < 2000, s"${survivors.size} rows survived — no pruning")
    // exact join after the prefilter equals the plain join
    val withBloom = base.sql(
      """SELECT k FROM bf_fact JOIN bf_dim ON k = d
        |WHERE bloom_might_contain((SELECT bloom_build(d, 1024) FROM bf_dim), k)
        |""".stripMargin).collect().map(_.getLong(0)).sorted.toSeq
    val plain = base.sql("SELECT k FROM bf_fact JOIN bf_dim ON k = d")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(withBloom == plain)
  }

  test("bloom functions also resolve via the extensions-built session") {
    val n = ext.sql(
      """SELECT count(*) AS n FROM range(1000)
        |WHERE bloom_might_contain(
        |  (SELECT bloom_build(id * 10, 256) FROM range(10)), id)
        |""".stripMargin).collect()(0).getLong(0)
    // keys 0,10,..,90 of range(0..999): ≥ the 10 true positives, and far
    // fewer than the full 1000 — i.e. the probe actually filtered
    assert(n >= 10 && n < 300, s"survivor count $n")
  }
}
