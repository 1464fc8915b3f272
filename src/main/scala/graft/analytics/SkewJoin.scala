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
}
