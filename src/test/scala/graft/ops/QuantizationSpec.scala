package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestBase, Tables}

class QuantizationSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("codes stay in [-127,127] and zero vectors quantize to zeros") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f)),
      (2L, Array(0.0f, 0.0f, 0.0f)),
      (3L, Array(1e-8f, -1e-8f, 1e-8f))
    ).toDF("vec_id", "embedding")
    val out = Quantization.quantizeSummary(df).collect()
    val byId = out.map(r => r.getAs[Long]("vec_id") -> r).toMap
    assert(byId(2L).getAs[Double]("scale") == 0.0)
    assert(byId(2L).getAs[Long]("q_l1") == 0L)
    out.foreach { r =>
      assert(r.getAs[Int]("q_min") >= -127 && r.getAs[Int]("q_max") <= 127)
    }
    // the max-|x| component always hits ±127
    assert(byId(1L).getAs[Int]("q_min") == -127)
  }

  test("int8TopK recovers >=0.9 of the exact top-k on the fixture") {
    val emb = Tables.embeddings(spark, SparkTestBase.sfDir)
    val probes = 0L until 10L
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("vec_id"))).toSet
    val truth = pairs(Similarity.bruteForceTopK(emb, probes, 5))
    val got = pairs(Similarity.int8TopK(emb, probes, 5))
    assert(truth.nonEmpty)
    val recall = (truth intersect got).size.toDouble / truth.size
    assert(recall >= 0.9, s"int8 recall: $recall")
  }

  test("dequantized vectors keep >=0.999 cosine vs the originals on the fixture") {
    val emb = Tables.embeddings(spark, SparkTestBase.sfDir)
    val withQ = emb
      .withColumn("scale", Quantization.maxAbs(col("embedding")))
      .withColumn("q", Quantization.quantize(col("embedding"), col("scale")))
      .withColumn("deq", Quantization.dequantize(col("q"), col("scale")))
    val cos = withQ.select(
      graft.functions.VectorFunctions.cosine(col("embedding"), col("deq")).as("cos"))
    val minCos = cos.agg(min(col("cos"))).head.getDouble(0)
    assert(minCos >= 0.999, s"min cosine after int8 round-trip: $minCos")
  }
}
