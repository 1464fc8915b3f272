package graft

import org.scalatest.funsuite.AnyFunSuite

/** Partitioning-invariance receipts: the oracle-parity design (decimal
  * sums, integer moment statistics, identical IEEE trees, total ORDER
  * BYs) promises results that do not depend on HOW the data was split.
  * This spec re-runs a sample of queries — one per determinism-sensitive
  * family — under different `spark.sql.shuffle.partitions` settings and
  * asserts row-for-row equality, which is exactly the property that lets
  * the same query hash-match on a 32-thread laptop and a 1000-executor
  * cluster (where AQE re-plans, partial aggregates associate differently,
  * and task order is arbitrary). */
class DeterminismSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val d = SparkTestBase.sfDir

  private val sample = Seq(
    "q1_pricing",          // decimal-exact money aggregation
    "q_rate_anomaly",      // integer moments -> IEEE doubles
    "q_spend_ranks",       // range-partitioned rank family
    "q_embedding_quantize",// per-row IEEE quantization
    "q_sequence_count",    // window cumsums + min
    "q_heavy_hitters",     // count-min cells + sandwich verdict
    "q_bm25",              // fixed-association IEEE score tree + top-k
    "q_kmv_intersect",     // order-statistic sketch (k-minimums, theta)
    "q_cramers_v",         // chi-square via the (rt,ct)-sorted fold
    "q_pagerank",          // iterative integer Pregel rounds
    "q_hybrid_rrf"         // two ranked legs + integer fusion
  )

  test("query results are invariant to the shuffle partition count") {
    val key = "spark.sql.shuffle.partitions"
    val orig = spark.conf.get(key)
    try {
      for (name <- sample) {
        val runs = Seq("3", "13").map { parts =>
          spark.conf.set(key, parts)
          SparkEntry.queries(name)(spark, d).collect().map(_.toString).toSeq
        }
        assert(runs.head == runs(1),
          s"$name differs between 3 and 13 shuffle partitions")
        assert(runs.head.nonEmpty, s"$name returned no rows")
      }
    } finally spark.conf.set(key, orig)
  }
}
