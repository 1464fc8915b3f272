package graft.analytics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class SkewJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("salted join equals the plain join on a skewed dataset") {
    import spark.implicits._
    // 90% of rows share one hot key
    val large = (1 to 5000).map(i => (i.toLong, if (i % 10 == 0) i.toLong % 7 else 0L))
      .toDF("row_id", "k")
    val small = Seq((0L, "hot"), (1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")

    val plain = large.join(small, "k").select("row_id", "k", "v")
    val salted = SkewJoin.saltedJoin(large, small, "k", "row_id", 8)
      .select("row_id", "k", "v")
    assert(plain.count() == salted.count())
    assert(plain.exceptAll(salted).count() == 0)
    assert(salted.exceptAll(plain).count() == 0)
    // the salt scattered the hot key across multiple subkeys
    val saltSpread = large.filter(col("k") === 0L)
      .withColumn("_salt", pmod(xxhash64(col("row_id")), lit(8L)))
      .select("_salt").distinct().count()
    assert(saltSpread > 1)
  }
}
