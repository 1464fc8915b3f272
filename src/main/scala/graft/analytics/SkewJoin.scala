package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * A hash-partitioned join sends every row of a hot key to one task; with
  * real-world zipfian keys (one user producing 10% of 100 TB of events)
  * that task runs hours while the rest idle. Salting splits each hot key
  * into `saltFactor` subkeys: the large side scatters uniformly
  * (deterministic hash of its row identity), the small side replicates
  * `saltFactor`-fold so every subkey can still match.
  *
  * AQE's skew-join handles sort-merge skew automatically when statistics
  * surface it; this utility is for the cases AQE can't see (skew appearing
  * mid-pipeline, aggregation-free joins feeding further wide ops) and
  * documents the technique as a first-class operator.
  */
object SkewJoin {

  /** Inner equi-join of `large` and `small` on `key`, salted `saltFactor`
    * ways. `large` must have a column `idCol` (any per-row value — used
    * only to scatter deterministically). Result columns = join output
    * minus the salt bookkeeping. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      idCol: String, saltFactor: Int): DataFrame = {
    val saltedLarge = large.withColumn("_salt",
      pmod(xxhash64(col(idCol)), lit(saltFactor.toLong)).cast("int"))
    val saltedSmall = small
      .withColumn("_salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedLarge
      .join(saltedSmall, Seq(key, "_salt"))
      .drop("_salt")
  }

  /** [[saltedJoin]] with the salt factor derived PER KEY from observed
    * counts — the broadcast-stats pattern
    * [[graft.ops.Dedup.charJaccardPairs]] uses for its sub-block grid. A
    * constant factor gets both regimes wrong: uniform keys pay
    * factor-fold dim replication for nothing, and a truly hot key still
    * lands |key|/factor rows on one task (unbounded as data grows). Here
    * each key's salt fan-out is g = ceil(|key| / targetPerKey), so
    * per-task rows for ANY key are bounded by ~targetPerKey at any scale,
    * and keys at or under the target pay no replication at all (g = 1).
    *
    * The stats pass keeps only keys OVER the target — with zipfian skew
    * that is a handful of rows however large the corpus, so it broadcasts;
    * the count aggregation itself is map-side combinable. Everything else
    * (deterministic hash scatter, small-side explode) matches
    * [[saltedJoin]]; the join result is identical for any g. */
  def saltedJoinAdaptive(large: DataFrame, small: DataFrame, key: String,
      idCol: String, targetPerKey: Long = 1L << 20): DataFrame = {
    require(targetPerKey >= 1, s"targetPerKey must be positive: $targetPerKey")
    val hot = large.groupBy(col(key))
      .agg(count(lit(1)).as("_kc"))
      .filter(col("_kc") > targetPerKey)
      .select(col(key),
        ceil(col("_kc").cast("double") / targetPerKey).cast("long").as("_g"))
    val saltedLarge = large.join(broadcast(hot), Seq(key), "left_outer")
      .withColumn("_gl", coalesce(col("_g"), lit(1L)))
      .withColumn("_salt", pmod(xxhash64(col(idCol)), col("_gl")).cast("int"))
      .drop("_g", "_gl")
    val saltedSmall = small.join(broadcast(hot), Seq(key), "left_outer")
      .withColumn("_gs", coalesce(col("_g"), lit(1L)))
      .withColumn("_salt",
        explode(sequence(lit(0), (col("_gs") - 1L).cast("int"))))
      .drop("_g", "_gs")
    saltedLarge
      .join(saltedSmall, Seq(key, "_salt"))
      .drop("_salt")
  }
}
