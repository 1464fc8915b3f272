package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class ZOrderLayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val d = SparkTestBase.sfDir

  test("zorder2 interleaves bits: locality and determinism") {
    import spark.implicits._
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 3L), (65535L, 65535L))
      .toDF("a", "b")
      .select(ZOrderLayout.zorder2(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0))
    // (0,0)=0, (1,0)=1, (0,1)=2, (1,1)=3, (2,3)=0b1110=14, full 16-bit pair
    assert(rows.toSeq == Seq(0L, 1L, 2L, 3L, 14L, 4294967295L))
  }

  test("z-ordered layout skips files on BOTH dimensions; linear sort only on one") {
    val li = spark.read.parquet(s"$d/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_quantity")
    val linDir = Files.createTempDirectory("zlin").toString
    val zDir = Files.createTempDirectory("zz").toString
    li.repartitionByRange(16, col("l_orderkey")).sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet(linDir)
    ZOrderLayout.writeZOrdered(li, zDir, "l_orderkey", "l_partkey", 16)

    def env(p: String) = ZOrderLayout.fileEnvelopes(spark, p, "l_orderkey", "l_partkey")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val linE = env(linDir)
    val zE = env(zDir)
    assert(linE.length == 16 && zE.length == 16)

    def avgCand(e: Array[(Long, Long, Long, Long)], onA: Boolean, vs: Seq[Long]) =
      vs.map(v => ZOrderLayout.candidateFiles(e, onA, v)).sum.toDouble / vs.size
    val partkeys = (10L until 200L by 20L).toSeq
    val orderkeys = (50L until 1450L by 150L).toSeq

    // the single-column sort cannot skip anything for the OTHER column...
    val linPart = avgCand(linE, onA = false, partkeys)
    assert(linPart >= 15.0, s"linear layout unexpectedly pruned partkey probes: $linPart")
    // ...while the z-curve keeps both envelopes tight: point probes on the
    // secondary column touch a small fraction of files (measured ~4.7/16)
    val zPart = avgCand(zE, onA = false, partkeys)
    assert(zPart <= 8.0, s"z-order partkey skipping too weak: $zPart files of 16")
    // and the z-curve's price on the leading column stays bounded
    val zOrd = avgCand(zE, onA = true, orderkeys)
    assert(zOrd <= 8.0, s"z-order orderkey envelope too loose: $zOrd files of 16")
    val linOrd = avgCand(linE, onA = true, orderkeys)
    assert(linOrd <= 2.0)
  }

  test("rank normalization keeps skipping alive under heavy skew; linear collapses") {
    import spark.implicits._
    // 90% of colA mass sits in [0,100) with outliers up to 1e9: linear
    // min/max scaling maps the whole dense cluster to ONE scaled value, so
    // the curve cannot discriminate inside it and every file's envelope
    // covers the cluster — rank normalization spreads it across the scale
    val n = 20000
    val rows = (0 until n).map { i =>
      val a = if (i % 10 != 0) (i * 37) % 100
        else ((i.toLong * 2654435761L) % 1000000000L)
      val b = (i.toLong * 48271) % 100000L
      (a.toLong, b)
    }
    val df = rows.toDF("a", "b")
    val linDir = java.nio.file.Files.createTempDirectory("zskewlin").toString
    val rankDir = java.nio.file.Files.createTempDirectory("zskewrank").toString
    ZOrderLayout.writeZOrdered(df, linDir, "a", "b", 16)
    ZOrderLayout.writeZOrderedByRank(df, rankDir, "a", "b", 16)
    def env(p: String) = ZOrderLayout.fileEnvelopes(spark, p, "a", "b")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    def avgCand(e: Array[(Long, Long, Long, Long)], onA: Boolean, vs: Seq[Long]) =
      vs.map(v => ZOrderLayout.candidateFiles(e, onA, v)).sum.toDouble / vs.size
    val dense = Seq(3L, 17L, 42L, 67L, 88L)
    val linDense = avgCand(env(linDir), onA = true, dense)
    val rankDense = avgCand(env(rankDir), onA = true, dense)
    assert(linDense >= 15.0, s"linear layout unexpectedly pruned the dense cluster: $linDense")
    assert(rankDense <= 9.0, s"rank z-order skipping under skew too weak: $rankDense of 16")
  }
}
