package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestBase, Tables}

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private lazy val emb = Tables.embeddings(spark, SparkTestBase.sfDir)

  test("bruteForceTopK: k rows per probe, cosine descending, no self-match") {
    val res = Similarity.bruteForceTopK(emb, Seq(0L, 1L, 2L), 5).collect()
    assert(res.length == 15)
    val byProbe = res.groupBy(_.getAs[Long]("probe_id"))
    byProbe.foreach { case (probe, rows) =>
      assert(rows.length == 5)
      assert(!rows.exists(_.getAs[Long]("vec_id") == probe))
      val cosines = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("cosine"))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b })
      assert(cosines.forall(c => c >= -1.0000001 && c <= 1.0000001))
    }
  }

  test("lshTopK: recall against brute force is substantial") {
    val exact = Similarity.bruteForceTopK(emb, Seq(0L, 1L, 2L, 3L, 4L), 5).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("vec_id"))).toSet
    val approx = Similarity.lshTopK(emb, Seq(0L, 1L, 2L, 3L, 4L), 5).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("vec_id"))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.3, s"LSH recall too low: $recall")
    // approximate neighbors it does return must be genuinely computed
    assert(approx.nonEmpty)
  }

  test("ivfTopK: substantial recall, exact cosines on returned rows") {
    val probes = Seq(0L, 1L, 2L, 3L, 4L)
    val exact = Similarity.bruteForceTopK(emb, probes, 5).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("vec_id"), r.getAs[Double]("cosine")))
    val approx = Similarity.ivfTopK(emb, probes, 5, nCentroids = 16, nProbe = 4).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("vec_id"), r.getAs[Double]("cosine")))
    val exactSet = exact.map(t => (t._1, t._2)).toSet
    val approxSet = approx.map(t => (t._1, t._2)).toSet
    val recall = exactSet.intersect(approxSet).size.toDouble / exactSet.size
    assert(recall >= 0.3, s"IVF recall too low: $recall")
    // cosines on overlapping results agree exactly with brute force
    val exactCos = exact.map(t => (t._1, t._2) -> t._3).toMap
    approx.foreach { case (p, v, c) =>
      exactCos.get((p, v)).foreach(e => assert(e == c))
    }
  }

  test("embeddingNearDupPairs: ordered pairs above threshold only") {
    val res = Similarity.embeddingNearDupPairs(emb, 0.4).collect()
    assert(res.forall(r => r.getAs[Long]("id_a") < r.getAs[Long]("id_b")))
    assert(res.forall(_.getAs[Double]("cosine") >= 0.4))
  }
}
