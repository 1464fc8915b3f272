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

  test("embeddingNearDupPairs: ordered pairs above threshold only") {
    val res = Similarity.embeddingNearDupPairs(emb, 0.4).collect()
    assert(res.forall(r => r.getAs[Long]("id_a") < r.getAs[Long]("id_b")))
    assert(res.forall(_.getAs[Double]("cosine") >= 0.4))
  }
}
