package graft.props

import java.sql.Timestamp

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.SparkTestBase
import graft.analytics.{Anomaly, Stats, TimeSeries}
import graft.ops.TextAnalysis

/** Property laws for the round-6 exact-statistics kernels: on random
  * small inputs (ties, constant series, gaps, empty-ish corners all
  * reachable) each distributed construction must equal a driver-side
  * brute-force reference computed with plain Scala collections — the
  * same discipline RankAndDedupProps applies to the rank family. */
object StatsProps extends Properties("Stats") {
  lazy val spark = SparkTestBase.spark

  /** events frame from (type, value-cents) pairs; ts constant (unused). */
  private def ev(rows: List[(String, Long)]) = {
    import spark.implicits._
    rows.zipWithIndex.map { case ((t, c), i) =>
      (i.toLong, Timestamp.valueOf("2024-01-01 00:00:00"), 1L, t, c / 100.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  // small value domain so ties across and within samples are the norm
  private val genTwoSamples: Gen[(List[Long], List[Long])] = for {
    na <- Gen.choose(1, 40)
    nb <- Gen.choose(1, 40)
    a <- Gen.listOfN(na, Gen.choose(0L, 9L))
    b <- Gen.listOfN(nb, Gen.choose(0L, 9L))
  } yield (a, b)

  property("ksTest == brute-force floor-div ECDF max") =
    forAll(genTwoSamples) { case (a, b) =>
      val rows = a.map(("a", _)) ++ b.map(("b", _))
      val r = Stats.ksTest(ev(rows), "a", "b").collect().head
      val dom = (a ++ b).distinct.sorted
      val want = dom.map { v =>
        val ca = a.count(_ <= v).toLong
        val cb = b.count(_ <= v).toLong
        math.abs(ca * 1000000000L / a.size - cb * 1000000000L / b.size)
      }.max
      (r.getLong(0), r.getLong(1), r.getLong(2)) == ((a.size.toLong, b.size.toLong, want))
    }

  property("mannWhitneyU == brute-force doubled midranks; U_a + U_b = 2 n_a n_b") =
    forAll(genTwoSamples) { case (a, b) =>
      val rows = a.map(("a", _)) ++ b.map(("b", _))
      val all = (a ++ b).sorted
      // doubled midrank of value v: 2p + t + 1 (p strictly-smaller count)
      def mid2(v: Long) = 2L * all.count(_ < v) + all.count(_ == v) + 1L
      val r2a = a.map(mid2).sum
      val u2a = r2a - a.size.toLong * (a.size + 1)
      val r = Stats.mannWhitneyU(ev(rows), "a", "b").collect().head
      val swapped = Stats.mannWhitneyU(ev(rows), "b", "a").collect().head
      (r.getLong(2), r.getLong(3)) == ((r2a, u2a)) &&
        r.getLong(3) + swapped.getLong(3) == 2L * a.size * b.size
    }

  private val genCorpus: Gen[List[String]] = for {
    nDocs <- Gen.choose(1, 15)
    docs <- Gen.listOfN(nDocs, for {
      len <- Gen.choose(0, 8)
      toks <- Gen.listOfN(len, Gen.oneOf("x", "y", "z"))
    } yield toks.mkString(" "))
  } yield docs

  property("repeatedNgramStats(n=2) == brute-force sliding bigrams") =
    forAll(genCorpus) { docs =>
      import spark.implicits._
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t, "en", "s") }
        .toDF("doc_id", "text", "lang", "source")
      val grams = docs.zipWithIndex.flatMap { case (t, i) =>
        val tk = t.split("\\s+").filter(_.nonEmpty)
        tk.sliding(2).filter(_.length == 2).map(g => (i.toLong, g.mkString(" "))).toList
      }
      val global = grams.groupBy(_._2).view.mapValues(_.size).toMap
      val want = grams.groupBy(_._1).map { case (id, gs) =>
        val dup = gs.count(g => global(g._2) >= 2).toLong
        (id, gs.size.toLong, dup, dup * 1000000000L / gs.size)
      }.toList.sortBy(_._1)
      val got = TextAnalysis.repeatedNgramStats(df, 2).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toList
      got == want
    }

  private val genSeries: Gen[List[Int]] = for {
    n <- Gen.choose(1, 30)
    xs <- Gen.listOfN(n, Gen.choose(1, 6))
  } yield xs

  /** counts(i) events in hour i (one type) — mirrors AnomalySpec.hourly. */
  private def hourly(counts: List[Int]) = {
    import spark.implicits._
    counts.zipWithIndex.flatMap { case (c, h) =>
      (0 until c).map(j => ((h * 1000 + j).toLong,
        new Timestamp(Timestamp.valueOf("2024-01-01 00:00:00").getTime
          + h * 3600000L), 1L, "view", 1.0, "{}"))
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  property("cusumShift == brute-force prefix-sum-minus-running-min peak") =
    forAll(genSeries) { xs =>
      val m = xs.size.toLong
      val t = xs.map(_.toLong).sum
      val s = xs.map(x => m * x - t).scanLeft(0L)(_ + _).tail
      val runmin = s.scanLeft(Long.MaxValue)(math.min).tail
      val cusum = s.zip(runmin).map { case (si, mi) => si - mi }
      val peak = cusum.max
      val peakIdx = cusum.indexOf(peak) // earliest on ties
      val r = Anomaly.cusumShift(hourly(xs)).collect().head
      r.getLong(1) == m && r.getLong(2) == peak &&
        r.getTimestamp(3).getTime ==
          Timestamp.valueOf("2024-01-01 00:00:00").getTime + peakIdx * 3600000L
    }

  property("lagAutocorr r is within [-1, 1] and lag-0 self-check gives 1") =
    forAll(genSeries.suchThat(_.size >= 3)) { xs =>
      val out = TimeSeries.lagAutocorr(hourly(xs), 1).collect()
      out.isEmpty || {
        val r = out.head.getAs[Double]("r")
        r >= -1.0000000001 && r <= 1.0000000001
      }
    }
}
