package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-soak harness: replicate the bench fixtures N× with disjoint key
  * spaces, run the headline queries at 1× and N×, and print one JSON line
  * per (scale, query) with the elapsed seconds — the evidence base for
  * SCALE.md's does-the-plan-survive-a-scale-up curves.
  *
  * Replication offsets every surrogate/foreign key by `copy × 10¹⁰` so the
  * N× corpus has N× distinct customers/orders/users/documents rather than
  * N identical copies of each row — selectivities and group counts scale
  * the way a bigger dataset's would, which is what the curves are supposed
  * to measure. Dimension tables (region, nation) are not replicated, as in
  * any real star schema growth. events.ts is read raw (nanos long) and
  * kept raw so the written parquet round-trips through [[Tables.events]].
  *
  * Usage: `runMain graft.Soak [factor] [baseDir] [outDir] [all|linear]` —
  * `linear` restricts to [[linearHeadline]] (used at 100×, where the
  * quadratic-OUTPUT dedup tiers would measure answer size, not plans).
  */
object Soak {

  private val Off = 10000000000L // > any fixture key; copy i adds i*Off

  /** Key columns to offset, per table. */
  private val keyCols: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  private def replicate(df: DataFrame, keys: Seq[String], n: Int): DataFrame =
    (0 until n).map { i =>
      keys.foldLeft(df)((d, k) => d.withColumn(k, col(k) + lit(i * Off)))
    }.reduce(_ unionByName _)

  /** The queries whose scale behavior the curves track: one per plan
    * family (scan+topK, broadcast-join agg, shuffle agg, window/session,
    * global rank, text agg, hash dedup, banded LSH dedup, blocked
    * quadratic dedup, brute/bucketed ANN, as-of merge, full pipeline). */
  val headline: Seq[String] = Seq(
    "q_logs_flagship", "q1_pricing", "q5_local_supplier", "q8_market_share",
    "q_rollup_revenue", "q_sessionize", "q_ntile_spend", "q_token_freq",
    "q_dedup_exact", "q_dedup_minhash", "q_dedup_char_jaccard",
    "q_dedup_clusters", "q_knn_bruteforce", "q_knn_lsh", "q_knn_ivf",
    "q_dedup_embedding_lsh", "q_asof_join_exec", "q_pipeline_clean",
    "q_data_split")

  /** The subset whose work scales linearly in the data (excludes the
    * dedup tiers whose OUTPUT grows quadratically under replication) —
    * used for the 100× run, where a quadratic-output query would measure
    * answer size, not plan quality. */
  val linearHeadline: Seq[String] = Seq(
    "q_logs_flagship", "q1_pricing", "q5_local_supplier", "q8_market_share",
    "q_rollup_revenue", "q_sessionize", "q_ntile_spend", "q_token_freq",
    "q_dedup_exact", "q_knn_bruteforce", "q_knn_lsh", "q_knn_ivf",
    "q_asof_join_exec", "q_data_split")

  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val baseDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(2).getOrElse("target/scale")
    val queries = if (args.lift(3).contains("linear")) linearHeadline else headline
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", s"${4 * 1024 * 1024}")
      .config("spark.sql.files.openCostInBytes", s"${512 * 1024}")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    // ── build the N× fixture set ──
    for (t <- Seq("region", "nation")) // dims: single copy
      spark.read.parquet(s"$baseDir/$t.parquet")
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    for ((t, keys) <- keyCols) {
      val base = spark.read.parquet(s"$baseDir/$t.parquet") // events stays raw nanos
      replicate(base, keys, factor)
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    }

    def run(tag: String, dir: String): Unit =
      for (name <- queries) {
        val t0 = System.nanoTime()
        try {
          SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
          val sec = (System.nanoTime() - t0) / 1e9
          println(f"""SOAK {"scale":"$tag","query":"$name","sec":$sec%.2f}""")
        } catch {
          case e: Throwable =>
            println(s"""SOAK {"scale":"$tag","query":"$name","error":"${e.getClass.getSimpleName}"}""")
        }
      }

    run("1x", baseDir)   // warm + baseline
    run(s"${factor}x", outDir)
    spark.stop()
  }
}
