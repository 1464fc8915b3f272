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

  // ── KMV theta sketch ──────────────────────────────────────────────

  private def ev(rows: Seq[(String, Long)]) = {
    import spark.implicits._
    rows.zipWithIndex.map { case ((t, u), i) =>
      (i.toLong, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), u, t, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("kmv: exhaustive regime (n_union < k) returns the exact intersection") {
    // 30 users in A, 30 in B, 10 common — well under k=64, so the sketch
    // holds every value and est must equal exact
    val rows = (0L until 30L).map(u => ("a", u)) ++ (20L until 50L).map(u => ("b", u))
    val out = Sketches.kmvIntersections(ev(rows), k = 64).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_exact") == 10L)
    assert(r.getAs[Double]("est") == 10.0)
    assert(r.getAs[Boolean]("ok"))
  }

  test("kmv: saturated regime estimates within the verdict bound") {
    // 500 users per type, 250 common — sketches saturate at k=64
    val rows = (0L until 500L).map(u => ("a", u)) ++ (250L until 750L).map(u => ("b", u))
    val out = Sketches.kmvIntersections(ev(rows), k = 64).collect()
    val r = out.head
    assert(r.getAs[Long]("n_exact") == 250L)
    // union of two saturated k-sketches ranks past k (up to 2k)
    assert(r.getAs[Int]("n_union") > 64)
    assert(r.getAs[Boolean]("ok"),
      s"est ${r.getAs[Double]("est")} outside ±50% of 250")
  }

  test("kmv: disjoint sets estimate zero") {
    val rows = (0L until 200L).map(u => ("a", u)) ++ (1000L until 1200L).map(u => ("b", u))
    val r = Sketches.kmvIntersections(ev(rows), k = 64).collect().head
    assert(r.getAs[Long]("n_exact") == 0L)
    assert(r.getAs[Double]("est") == 0.0)
  }

  test("kmv: deterministic under repartition") {
    val rows = (0L until 300L).flatMap(u => Seq(("a", u % 97), ("b", u % 89), ("c", u % 83)))
    val base = ev(rows)
    val x = Sketches.kmvIntersections(base, k = 32).collect().toSeq
    val y = Sketches.kmvIntersections(base.repartition(7), k = 32).collect().toSeq
    assert(x == y)
  }
}
