package graft.analytics

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class GraphSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def frame(docIds: Seq[Long], pairs: Seq[(Long, Long)]) = {
    import spark.implicits._
    (docIds.map(id => (id, s"t$id", "en", "s")).toDF("doc_id", "text", "lang", "source"),
      pairs.toDF("id_a", "id_b"))
  }

  /** Reference replica of the integer recurrence (adjacency maps on the
    * driver) — the Spark result must equal this bit-for-bit. */
  private def refRanks(pairs: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val adj = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val deg = adj.view.mapValues(_.size.toLong).toMap
    var pr = adj.keys.map(_ -> 1000000000L).toMap
    for (_ <- 1 to iters) {
      val in = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      for ((u, ns) <- adj; v <- ns) in(v) += pr(u) / deg(u)
      pr = adj.keys.map(n => n -> (150000000L + 85L * in(n) / 100L)).toMap
    }
    pr
  }

  test("pageRankPpb: matches the driver replica of the integer recurrence") {
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L))
    val (docs, pdf) = frame(Seq(1L, 2L, 3L, 4L, 5L, 6L), pairs)
    val out = Graph.pageRankPpb(docs, pdf, iters = 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ref = refRanks(pairs, 5)
    for ((n, r) <- ref) assert(out(n) == r, s"node $n")
    // the hub of the path 1-2-3 is strictly more central than its leaves
    assert(out(2L) > out(1L) && out(1L) == out(3L))
    // isolated doc 6 takes the dangling rank
    assert(out(6L) == 150000000L)
    assert(out.size == 6)
  }

  test("triangleStats: hand-checked triangle + pendant node") {
    // triangle 1-2-3, pendant 4 hanging off 3, isolated doc 5
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
    val (docs, pdf) = frame(Seq(1L, 2L, 3L, 4L, 5L), pairs)
    val out = Graph.triangleStats(docs, pdf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(1L) == ((2L, 1L, 1000000000L)))
    assert(out(2L) == ((2L, 1L, 1000000000L)))
    assert(out(3L) == ((3L, 1L, 333333333L))) // 2*1e9 / (3*2), floored
    assert(out(4L) == ((1L, 0L, 0L)))         // pendant: deg 1, no triangle
    assert(!out.contains(5L))                 // isolated docs are not nodes
  }

  test("centralSurvivors: hub wins its family; singleton survives itself") {
    // path 1-2-3: one family labeled min=1, hub 2 is most central;
    // doc 9 is isolated -> its own family at the dangling rank
    val pairs = Seq((1L, 2L), (2L, 3L))
    val (docs, pdf) = frame(Seq(1L, 2L, 3L, 9L), pairs)
    val out = Graph.centralSurvivors(docs, pdf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val ref = refRanks(pairs, 5)
    assert(out(1L) == ((2L, ref(2L), 3L))) // family rep = hub 2, 3 members
    assert(out(9L) == ((9L, 150000000L, 1L)))
    assert(out.size == 2)
  }

  test("triangleStatsCapped: clique closed form is bit-identical to enumeration") {
    // K4 clique (closed form path), a non-clique dense component
    // (4-cycle + two chords... here 5 edges on 4 nodes ≠ C(4,2)=6 →
    // enumerated), a chain, and a pendant — with cap ABOVE every
    // component size the output must equal pure enumeration exactly
    val pairs = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), // K4
      (10L, 11L), (11L, 12L), (12L, 13L), (10L, 13L), (10L, 12L), // chorded cycle
      (20L, 21L), (21L, 22L)) //                                     chain
    val docIds = Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 13L, 20L, 21L, 22L, 99L)
    val (docs, pdf) = frame(docIds, pairs)
    val labels = graft.ops.Dedup.nearDupClusters(docs, pdf)
    val byEnum = Graph.triangleStats(docs, pdf).collect().map(_.toSeq).toSeq
    val byCap = Graph.triangleStatsCapped(docs, pdf, labels, cap = 24)
      .collect().map(_.toSeq).toSeq
    assert(byCap == byEnum)
    // sanity: the K4 rows really did come out as C(3,2)=3 triangles, coeff 1e9
    val k4 = byCap.filter(r => Set(1L, 2L, 3L, 4L)(r.head.asInstanceOf[Long]))
    assert(k4.forall(r => r(2) == 3L && r(3) == 1000000000L))
  }

  test("triangleStatsCapped: oversize incomplete family takes the clique credit") {
    // chorded 4-cycle (NOT complete: node 10 and 12 have deg 3, nodes 11
    // and 13 deg 2; true triangles: 10-11-12 and 10-12-13). With cap = 3
    // the 4-member family is over cap → every node gets C(deg,2) and
    // coeff exactly 1e9; the separate K3 (= complete) is closed-form
    // regardless of cap and stays exact.
    val pairs = Seq(
      (10L, 11L), (11L, 12L), (12L, 13L), (10L, 13L), (10L, 12L),
      (30L, 31L), (30L, 32L), (31L, 32L)) // K3
    val (docs, pdf) = frame(Seq(10L, 11L, 12L, 13L, 30L, 31L, 32L), pairs)
    val labels = graft.ops.Dedup.nearDupClusters(docs, pdf)
    val out = Graph.triangleStatsCapped(docs, pdf, labels, cap = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(10L) == ((3L, 3L, 1000000000L))) // credit C(3,2)=3 (true: 2)
    assert(out(11L) == ((2L, 1L, 1000000000L))) // credit C(2,2)=1 (true: 1)
    assert(out(12L) == ((3L, 3L, 1000000000L)))
    assert(out(13L) == ((2L, 1L, 1000000000L)))
    // K3 is exactly complete → exact closed form survives any cap
    assert(out(30L) == ((2L, 1L, 1000000000L)))
    assert(out(31L) == ((2L, 1L, 1000000000L)))
    assert(out(32L) == ((2L, 1L, 1000000000L)))
  }

  test("pageRankPpb: symmetric pair ranks are equal; rank mass stays bounded") {
    val pairs = Seq((10L, 20L))
    val (docs, pdf) = frame(Seq(10L, 20L), pairs)
    val out = Graph.pageRankPpb(docs, pdf, iters = 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // deg-1 twins exchange their full rank every round → fixed point is
    // 150_000_000 + 85% of the previous rank; after 5 rounds from 1e9:
    // r = 0.85^5 + 0.15 * (1 + .85 + .85^2 + .85^3 + .85^4), in exact ppb
    var r = 1000000000L
    for (_ <- 1 to 5) r = 150000000L + 85L * r / 100L
    assert(out(10L) == r && out(20L) == r)
  }
}
