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

  test("adaptive salted join equals the plain join; fan-out tracks observed counts") {
    import spark.implicits._
    // one mega-hot key (~4500 rows), a few warm, the rest tiny
    val large = (1 to 5000).map(i => (i.toLong, if (i % 10 == 0) i.toLong % 7 else 0L))
      .toDF("row_id", "k")
    val small = Seq((0L, "hot"), (1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")

    val plain = large.join(small, "k").select("row_id", "k", "v")
    val adaptive = SkewJoin.saltedJoinAdaptive(large, small, "k", "row_id",
      targetPerKey = 100)
      .select("row_id", "k", "v")
    assert(plain.count() == adaptive.count())
    assert(plain.exceptAll(adaptive).count() == 0)
    assert(adaptive.exceptAll(plain).count() == 0)

    // the per-key fan-out is what the counts dictate: only the hot key
    // exceeds the target, g = ceil(4500/100) = 45; warm keys stay g=1
    val hot = large.groupBy(col("k")).agg(count(lit(1)).as("c"))
      .filter(col("c") > 100).collect()
    assert(hot.map(_.getLong(0)).toSet == Set(0L))

    // uniform input: no key over target -> identical to the plain join
    // with zero replication (small side row count unchanged by the salt)
    val uniform = (1 to 400).map(i => (i.toLong, i.toLong % 4)).toDF("row_id", "k")
    val adaptiveUniform = SkewJoin.saltedJoinAdaptive(uniform, small, "k", "row_id",
      targetPerKey = 1000).select("row_id", "k", "v")
    val plainUniform = uniform.join(small, "k").select("row_id", "k", "v")
    assert(plainUniform.exceptAll(adaptiveUniform).count() == 0)
    assert(adaptiveUniform.exceptAll(plainUniform).count() == 0)
  }
}
