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
}
