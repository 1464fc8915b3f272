package graft.props

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.SparkTestBase
import graft.analytics.GlobalRank
import graft.ops.TextAnalysis

/** Property-based laws for the hand-rolled scalable constructions: on
  * random small frames (where the naive spellings are safe) the
  * range-partitioned rank family must equal Spark's own global window
  * functions EXACTLY, and spanDedup must equal a driver-side brute-force
  * reference. These guard the constructions' arithmetic (offset sums,
  * peer-group min/max, first-owner ordering) against every shape a
  * generator can produce — ties, all-equal values, singletons, empties.
  */
object RankAndDedupProps extends Properties("RankAndDedup") {
  lazy val spark = SparkTestBase.spark

  private val genRows: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(1, 60)
    // values from a tiny domain so peer groups (ties) are common
    vs <- Gen.listOfN(n, Gen.choose(0L, 7L))
  } yield vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }

  property("withRankFamily == SQL window functions (desc order, ties everywhere)") =
    forAll(genRows) { rows =>
      import spark.implicits._
      val df = rows.toDF("id", "v")
      val got = GlobalRank.withRankFamily(df,
        valueSort = Seq(col("v").desc), valueNames = Seq("v"),
        tieBreak = Seq(col("id")))
        .select("id", "v", "rank", "dense_rank", "percent_rank", "cume_dist")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5))).sortBy(_._1)
      val w = Window.orderBy(col("v").desc)
      val want = df
        .withColumn("rank", rank().over(w).cast("long"))
        .withColumn("dense_rank", dense_rank().over(w).cast("long"))
        .withColumn("percent_rank", percent_rank().over(w))
        .withColumn("cume_dist", cume_dist().over(w))
        .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("v"),
          r.getAs[Long]("rank"), r.getAs[Long]("dense_rank"),
          r.getAs[Double]("percent_rank"), r.getAs[Double]("cume_dist"))).sortBy(_._1)
      got.sameElements(want)
    }

  property("withNtile == SQL NTILE for random n") =
    forAll(genRows, Gen.choose(1, 9)) { (rows, n) =>
      import spark.implicits._
      val df = rows.toDF("id", "v")
      val got = GlobalRank.withNtile(df, n, Seq(col("v"), col("id")), "nt")
        .select("id", "nt").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      val want = df
        .withColumn("nt", ntile(n).over(Window.orderBy(col("v"), col("id"))).cast("long"))
        .select("id", "nt").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      got.sameElements(want)
    }

  property("withRunningTotalLong == SQL cumulative window") =
    forAll(genRows) { rows =>
      import spark.implicits._
      val df = rows.toDF("id", "v")
      val got = GlobalRank.withRunningTotalLong(df, Seq(col("id")), col("v"), "cum")
        .select("id", "cum").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      val want = df
        .withColumn("cum", sum(col("v")).over(Window.orderBy(col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select("id", "cum").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      got.sameElements(want)
    }

  private val genDocs: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(1, 12)
    // 3-word vocabulary and short docs force plenty of shared spans
    docs <- Gen.listOfN(n, Gen.listOf(Gen.oneOf("a", "b", "c")).map(_.mkString(" ")))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  property("spanDedup == brute-force first-occurrence reference") =
    forAll(genDocs, Gen.choose(1, 4)) { (docs, width) =>
      import spark.implicits._
      val got = TextAnalysis.spanDedup(docs.toDF("doc_id", "text"), width)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      // reference: enumerate spans in (doc_id, span_idx) order, first
      // occurrence of each distinct span is kept
      val spansOf = docs.sortBy(_._1).map { case (id, t) =>
        val tk = t.trim.split("\\s+").toSeq
        id -> tk.grouped(width).map(_.mkString(" ")).filter(_.trim.nonEmpty).toSeq
      }
      val seen = scala.collection.mutable.Set[String]()
      val want = spansOf.map { case (id, spans) =>
        val kept = spans.count(s => seen.add(s))
        (id, spans.length.toLong, kept.toLong)
      }.sortBy(_._1)
      got.map(t => (t._1, t._2, t._3)).sameElements(want)
    }
  property("shingleContainment == brute-force distinct-shingle sets") =
    forAll(Gen.listOfN(8, for {
      n <- Gen.choose(0, 7)
      ws <- Gen.listOfN(n, Gen.oneOf("p", "q", "r"))
    } yield ws.mkString(" "))) { texts =>
      import spark.implicits._
      val df = texts.zipWithIndex.map { case (t, i) => (i + 1L, t, "en", "s") }
        .toDF("doc_id", "text", "lang", "source")
      def sh(s: String): Set[String] = {
        val t = s.trim.split("\\s+").filter(_.nonEmpty)
        if (t.length < 2) Set.empty
        else t.sliding(2).map(_.mkString(" ")).toSet
      }
      val sets = texts.zipWithIndex.map { case (s, i) => (i + 1L, sh(s)) }
        .filter(_._2.nonEmpty)
      val want = (for {
        (ia, sa) <- sets; (ib, sbb) <- sets if ia != ib
        inter = (sa & sbb).size.toLong if inter > 0
        ppb = inter * 1000000000L / sa.size if ppb >= 300000000L
      } yield (ia, ib, inter, sa.size.toLong, ppb)).toList.sortBy(t => (t._1, t._2))
      val got = graft.ops.Dedup.shingleContainment(df, 2, 300000000L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toList
      got == want
    }

}

/** Incremental-merge law on random graphs: for ANY base edge set, ANY
  * delta (edges may touch base docs, delta docs, or bridge the two) and
  * BOTH resolution paths (driver union-find / distributed star rounds),
  * [[graft.ops.Dedup.mergeClusterDelta]] over union-find-derived base
  * labels must equal the full rebuild's minimal labels. Its own
  * Properties object: each case runs Spark jobs, so the case budget is
  * tuned separately from the cheap rank laws above (the distributed path
  * draws less often — star convergence costs several jobs per case). */
object MergeDeltaProps extends Properties("MergeDelta") {
  lazy val spark = SparkTestBase.spark

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(25)

  /** Minimal-label components by JVM union-find — the independent
    * reference the incremental merge must land on. */
  private def ufLabels(nodes: Set[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.HashMap[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      r
    }
    for ((a, b) <- edges) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    nodes.iterator.map(n => n -> find(n)).toMap
  }

  property("mergeClusterDelta == full-rebuild labels for ANY base/delta split (both paths)") =
    forAll(for {
      n <- Gen.choose(2, 20)
      nBase <- Gen.choose(1, n - 1)
      baseE <- Gen.listOf(for {
        a <- Gen.choose(0L, nBase - 1L); b <- Gen.choose(0L, nBase - 1L)
      } yield (a, b))
      deltaE <- Gen.listOf(for { // delta edges may touch ANY doc
        a <- Gen.choose(0L, n - 1L); b <- Gen.choose(0L, n - 1L)
      } yield (a, b))
      dist <- Gen.frequency(4 -> false, 1 -> true)
    } yield (n, nBase, baseE.filter(e => e._1 != e._2).take(12),
      deltaE.filter(e => e._1 != e._2).take(12), dist)) {
      case (n, nBase, baseE, deltaE, dist) =>
        import spark.implicits._
        val baseNodes = (0L until nBase.toLong).toSet
        val allNodes = (0L until n.toLong).toSet
        val baseLabels = ufLabels(baseNodes, baseE).toSeq
          .toDF("doc_id", "cluster_id")
        val deltaDocs = (nBase.toLong until n.toLong).toDF("doc_id")
        val deltaPairs =
          if (deltaE.isEmpty) Seq.empty[(Long, Long)].toDF("id_a", "id_b")
          else deltaE.toDF("id_a", "id_b")
        val got = graft.ops.Dedup.mergeClusterDelta(baseLabels, deltaDocs,
          deltaPairs, driverEdgeLimit = if (dist) 0 else 200000)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        got == ufLabels(allNodes, baseE ++ deltaE)
    }
}

/** Retirement law on random graphs — the dual of [[MergeDeltaProps]]: for
  * ANY edge set, ANY expired subset (bridges, whole components, isolated
  * nodes) and BOTH resolution paths,
  * [[graft.ops.Dedup.retireClusterDelta]] over union-find-derived labels
  * must equal the rebuild's minimal labels on (nodes − expired, edges
  * among survivors) — including the component SPLITS that make removal
  * harder than the merge. The add-then-retire composition (a merge
  * followed by a retirement, the live pipeline's steady-state cycle) is
  * pinned by the DedupSpec case; this pins the removal step alone against
  * an independent reference. */
object RetireDeltaProps extends Properties("RetireDelta") {
  lazy val spark = SparkTestBase.spark

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(25)

  private def ufLabels(nodes: Set[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.HashMap[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      r
    }
    for ((a, b) <- edges) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    nodes.iterator.map(n => n -> find(n)).toMap
  }

  property("retireClusterDelta == rebuild on survivors for ANY expired subset (both paths)") =
    forAll(for {
      n <- Gen.choose(2, 20)
      edges <- Gen.listOf(for {
        a <- Gen.choose(0L, n - 1L); b <- Gen.choose(0L, n - 1L)
      } yield (a, b))
      expired <- Gen.someOf(0L until n.toLong)
      dist <- Gen.frequency(4 -> false, 1 -> true)
    } yield (n, edges.filter(e => e._1 != e._2).take(14),
      expired.toSet, dist)) {
      case (n, edges, expired, dist) =>
        import spark.implicits._
        val nodes = (0L until n.toLong).toSet
        val labels = ufLabels(nodes, edges).toSeq.toDF("doc_id", "cluster_id")
        val pairs =
          if (edges.isEmpty) Seq.empty[(Long, Long)].toDF("id_a", "id_b")
          else edges.toDF("id_a", "id_b")
        val expiredDf =
          if (expired.isEmpty) Seq.empty[Long].toDF("doc_id")
          else expired.toSeq.toDF("doc_id")
        val got = graft.ops.Dedup.retireClusterDelta(labels, pairs,
          expiredDf, driverEdgeLimit = if (dist) 0 else 200000)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        val surviving = edges.filter(e =>
          !expired.contains(e._1) && !expired.contains(e._2))
        got == ufLabels(nodes -- expired, surviving)
    }
}
