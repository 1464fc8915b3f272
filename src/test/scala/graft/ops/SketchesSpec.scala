package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class SketchesSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("count-min never undercounts, even at a width forcing heavy collisions") {
    import spark.implicits._
    // zipf-ish: key k appears ~300/k times
    val rows = (1 to 40).flatMap(k => Seq.fill(300 / k)(s"key$k")).toDF("k")
    val exact = rows.groupBy(col("k")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val width = 8 // 40 keys into 8 buckets: collisions guaranteed
    val cms = Sketches.countMinTable(rows, "k", depth = 3, width = width)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    def h(key: String, i: Int): Long = {
      val est = rows.filter(col("k") === key)
        .select(pmod(xxhash64(col("k"), lit(i)), lit(width.toLong))).head.getLong(0)
      est
    }
    exact.foreach { case (key, n) =>
      val est = (0 until 3).map(i => cms((i, h(key, i)))).min
      assert(est >= n, s"$key: est $est < exact $n — CMS must never undercount")
    }
    // total mass per hash row is conserved (cells partition the stream)
    val total = rows.count()
    (0 until 3).foreach { i =>
      assert(cms.collect { case ((h0, _), c) if h0 == i => c }.sum == total)
    }
  }

  test("heavyHitters: reported set is exactly the >=phi*N tokens and the sandwich holds") {
    val docs = graft.Tables.documents(spark, SparkTestBase.sfDir)
    val out = Sketches.heavyHitters(docs, phi = 0.01).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Boolean]("cms_ok")))
  }
}
