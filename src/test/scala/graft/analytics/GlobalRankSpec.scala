package graft.analytics

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** [[GlobalRank]] vs the single-partition window builtin it replaces —
  * NTILE arithmetic (cut boundary, GREATEST guard) across the shapes the
  * builtin defines: total < n, total % n != 0, heavy ties, n = 1, empty. */
class GlobalRankSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def df(values: Seq[(Double, Long)]) = {
    import spark.implicits._
    values.toDF("v", "id")
  }

  private def check(values: Seq[(Double, Long)], n: Int): Unit = {
    val d = df(values)
    val got = GlobalRank.withNtile(d, n, Seq(col("v").desc, col("id").asc), "bucket")
      .orderBy(col("id")).select("id", "bucket").collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = d
      .withColumn("bucket", ntile(n).over(Window.orderBy(col("v").desc, col("id").asc)).cast("long"))
      .orderBy(col("id")).select("id", "bucket").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == want.toSeq, s"ntile($n) over ${values.size} rows")
  }

  test("ntile matches builtin when total divides evenly") {
    check((1 to 12).map(i => (i.toDouble, i.toLong)), 4)
  }

  test("ntile matches builtin when total % n != 0 (uneven buckets)") {
    check((1 to 10).map(i => (i.toDouble, i.toLong)), 4)
    check((1 to 11).map(i => (i.toDouble, i.toLong)), 3)
  }

  test("ntile with total < n gives each row its own bucket") {
    check(Seq((5.0, 1L), (3.0, 2L)), 4)
  }

  test("ntile with heavy ties still assigns by row number (tie-break col)") {
    check(Seq.fill(9)(7.0).zipWithIndex.map { case (v, i) => (v, i.toLong) }, 4)
  }

  test("ntile n=1 puts everything in bucket 1") {
    check((1 to 5).map(i => (i.toDouble, i.toLong)), 1)
  }

  test("ntile on empty input returns empty") {
    val d = df(Seq.empty)
    assert(GlobalRank.withNtile(d, 4, Seq(col("v").desc, col("id")), "bucket").count() == 0)
  }

  test("ntile rejects n < 1") {
    intercept[IllegalArgumentException] {
      GlobalRank.withNtile(df(Seq((1.0, 1L))), 0, Seq(col("v")), "bucket")
    }
  }

  test("input with _gr_ columns is rejected rather than silently clobbered") {
    import spark.implicits._
    val d = Seq((1.0, 1L)).toDF("v", "_gr_rank")
    intercept[IllegalArgumentException] {
      GlobalRank.withNtile(d, 2, Seq(col("v")), "bucket")
    }
  }

  test("global row number matches builtin row_number over total order") {
    val d = df((1 to 100).map(i => ((i % 7).toDouble, i.toLong)))
    val got = GlobalRank.withRowNumber(d, Seq(col("v").asc, col("id").asc), "rn")
      .orderBy(col("id")).select("id", "rn").collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = d
      .withColumn("rn", row_number().over(Window.orderBy(col("v").asc, col("id").asc)).cast("long"))
      .orderBy(col("id")).select("id", "rn").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == want.toSeq)
  }

  test("ranking uses more than one partition (the point of the construction)") {
    val d = df((1 to 1000).map(i => (i.toDouble, i.toLong)))
    val parted = d.repartitionByRange(4, col("v")).withColumn("p", spark_partition_id())
    assert(parted.select("p").distinct().count() > 1)
  }

  test("adaptive running totals: small domain equals the bucketed construction") {
    val d = df((1 to 200).map(i => ((i % 13).toDouble, i.toLong)))
      .withColumn("c", col("id") % 5 + 1L)
    def run(f: org.apache.spark.sql.DataFrame) = f
      .orderBy(col("id")).select("id", "cum")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val fast = run(GlobalRank.withRunningTotalsLongAdaptive(d, Nil,
      Seq(col("v").asc, col("id").asc), Seq(col("c") -> "cum")))
    val slow = run(GlobalRank.withRunningTotalsLong(d, Nil,
      Seq(col("v").asc, col("id").asc), Seq(col("c") -> "cum")))
    assert(fast == slow)
  }

  test("adaptive running totals: above-threshold domain flips to the bucketed path, same rows") {
    // 70k distinct rows > SmallDomainRows — the adaptive call must route
    // through the range-partitioned stitch and still agree with it
    val d = spark.range(70000).select(col("id"),
      (col("id") % 3).cast("string").as("g"), lit(1L).as("c"))
    def run(f: org.apache.spark.sql.DataFrame) = f
      .orderBy(col("id")).select("id", "cum")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val adaptive = run(GlobalRank.withRunningTotalsLongAdaptive(d, Seq("g"),
      Seq(col("id").asc), Seq(col("c") -> "cum")))
    val direct = run(GlobalRank.withRunningTotalsLong(d, Seq("g"),
      Seq(col("id").asc), Seq(col("c") -> "cum")))
    assert(adaptive == direct)
    // spot-check semantics: per-group cumulative count of 1s = rank in group
    assert(adaptive.take(6).map(_._2) == Seq(1L, 1L, 1L, 2L, 2L, 2L))
  }

  /** Rank family vs the builtin single-partition window it replaces:
    * peers defined by the value column only (id is the tie-break), so
    * dense_rank collapses tied values, percent_rank uses the peer group's
    * min row number, cume_dist its max. */
  private def checkFamily(values: Seq[(Double, Long)]): Unit = {
    val d = df(values)
    val got = GlobalRank.withRankFamily(d,
        valueSort = Seq(col("v").desc), valueNames = Seq("v"), tieBreak = Seq(col("id")))
      .orderBy(col("id"))
      .select("id", "rank", "dense_rank", "percent_rank", "cume_dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    val w = Window.orderBy(col("v").desc)
    val want = d
      .withColumn("rank", rank().over(w).cast("long"))
      .withColumn("dense_rank", dense_rank().over(w).cast("long"))
      .withColumn("percent_rank", percent_rank().over(w))
      .withColumn("cume_dist", cume_dist().over(w))
      .orderBy(col("id"))
      .select("id", "rank", "dense_rank", "percent_rank", "cume_dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == want.toSeq, s"rank family over ${values.size} rows")
  }

  test("rank family matches builtins with ties (dense collapse, peer min/max)") {
    checkFamily(Seq((9.0, 1L), (7.0, 2L), (7.0, 3L), (7.0, 4L), (3.0, 5L), (3.0, 6L), (1.0, 7L)))
  }

  test("rank family with all-distinct values degenerates to row numbers") {
    checkFamily((1 to 50).map(i => (i.toDouble, i.toLong)))
  }

  test("rank family with all rows tied: one peer group") {
    checkFamily(Seq.fill(8)(4.0).zipWithIndex.map { case (v, i) => (v, i.toLong) })
  }

  test("rank family single row: percent_rank 0 (total=1 guard)") {
    checkFamily(Seq((2.0, 1L)))
  }

  test("rank family on empty input returns empty") {
    val d = df(Seq.empty)
    assert(GlobalRank.withRankFamily(d, Seq(col("v").desc), Seq("v"), Seq(col("id"))).count() == 0)
  }

  test("rank family at scale shape: many partitions, values spanning ranges") {
    checkFamily((1 to 2000).map(i => ((i % 13).toDouble, i.toLong)))
  }
}
