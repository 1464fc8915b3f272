package graft.props

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.SparkTestBase
import graft.analytics.RangeJoin

/** Law: the bucketed interval join equals the brute-force non-equi join
  * for EVERY bucket width — correctness must not depend on the tuning
  * knob (only efficiency may). Generators produce clustered and sparse
  * timestamps, zero-length and reversed intervals, and widths from 1
  * second to far beyond the data span. */
object RangeJoinProps extends Properties("RangeJoin") {
  lazy val spark = SparkTestBase.spark

  private val base = 1700000000000L
  private val genCase: Gen[(List[(Long, Long)], List[(Long, Long, Long)], Long)] = for {
    nPts <- Gen.choose(1, 40)
    // offsets in minutes over ~3 days, clustered by a coarse grid choice
    pts <- Gen.listOfN(nPts, Gen.choose(0L, 4000L))
    nIvs <- Gen.choose(1, 12)
    ivs <- Gen.listOfN(nIvs, for {
      s <- Gen.choose(0L, 4000L)
      len <- Gen.oneOf(Gen.const(0L), Gen.choose(-300L, 1500L)) // incl. reversed
    } yield (s, s + len))
    width <- Gen.oneOf(1L, 60L, 3600L, 86400L, 10L * 86400L)
  } yield (
    pts.zipWithIndex.map { case (m, i) => (i.toLong, m) },
    ivs.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) },
    width)

  property("bucketed == brute force for any bucket width") =
    forAll(genCase) { case (pts, ivs, width) =>
      import spark.implicits._
      val points = pts.map { case (id, m) => (id, new Timestamp(base + m * 60000L)) }
        .toDF("pid", "t")
      val intervals = ivs.map { case (id, s, e) =>
        (id, new Timestamp(base + s * 60000L), new Timestamp(base + e * 60000L))
      }.toDF("iid", "s", "e")
      val got = RangeJoin.pointInInterval(points, intervals, "t", "s", "e", width)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = points.crossJoin(intervals)
        .where(col("t") >= col("s") && col("t") <= col("e"))
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      got == want
    }
}
