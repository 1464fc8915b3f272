package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestBase, Tables}

class QualityGateSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("adaptiveQualityGate: threshold is the exact discrete p25 per source, counts consistent") {
    val docs = Tables.documents(spark, SparkTestBase.sfDir)
    val out = TextAnalysis.adaptiveQualityGate(docs, 0.25).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("thr"), r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept"), r.getAs[Long]("n_dropped"))).toMap
    assert(out.nonEmpty)

    // brute-force discrete quantile from the raw texts
    val raw = docs.select("source", "text").collect()
      .map(r => (r.getString(0), {
        val t = r.getString(1).trim
        if (t.isEmpty) 0L else t.split("\\s+").length.toLong
      }))
    raw.groupBy(_._1).foreach { case (src, rows) =>
      val sorted = rows.map(_._2).sorted
      val expectThr = sorted(math.ceil(0.25 * sorted.length).toInt - 1)
      val (thr, nDocs, nKept, nDropped) = out(src)
      assert(thr == expectThr, s"$src: thr $thr != $expectThr")
      assert(nDocs == sorted.length.toLong)
      assert(nKept == sorted.count(_ >= expectThr).toLong)
      assert(nDropped == nDocs - nKept)
      // the gate keeps at least (1-p) of the docs by construction
      assert(nKept.toDouble / nDocs >= 1.0 - 0.25 - 1.0 / sorted.length)
    }
  }
}
