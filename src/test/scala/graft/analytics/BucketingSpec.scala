package graft.analytics

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestBase, Tables}

class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("bucketed fact-fact join plans with zero shuffle exchanges") {
    val li = Tables.lineitem(spark, SparkTestBase.sfDir)
    val o = Tables.orders(spark, SparkTestBase.sfDir)
    val joined = Bucketing.colocatedOrderJoin(spark, li, o, buckets = 8)

    // the join itself: no exchange on either side — bucketed scans feed
    // the sort-merge join directly
    val exchanges = joined.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty,
      s"expected shuffle-free bucketed join, found ${exchanges.length} exchanges")

    // and it computes the same answer as the plain shuffled join
    val got = joined.agg(count(lit(1)), sum(col("o_totalprice"))).collect().head
    val want = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .agg(count(lit(1)), sum(col("o_totalprice"))).collect().head
    assert(got.getLong(0) == want.getLong(0))
    assert(math.abs(got.getDouble(1) - want.getDouble(1)) < 1e-6 * math.abs(want.getDouble(1)))
  }
}
