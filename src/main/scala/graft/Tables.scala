package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-provided parquet fixtures (TESTDATA.md).
  *
  * All readers are plain `spark.read.parquet` so Catalyst keeps full
  * pushdown/pruning freedom; the only special case is `events`, whose
  * parquet `ts` physical type has drifted across fixture generations and is
  * therefore probed, not assumed.
  */
object Tables {
  private def p(dir: String, name: String) = s"$dir/$name.parquet"

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(p(dir, name))

  /** `events` with ts normalized to millisecond-precision TimestampType.
    *
    * The driver has shipped this fixture in two physical shapes — INT64
    * TIMESTAMP(NANOS) (rounds 1-5) and INT64 TIMESTAMP(MICROS) (round 6+)
    * — so the loader probes the schema Spark actually decoded and accepts
    * BOTH permanently, plus the adjusted-to-UTC micros variant for good
    * measure:
    *
    *  - `LongType`: the nanos shape, readable only as a raw long
    *    (`spark.sql.legacy.parquet.nanosAsLong`); integer `div` (not
    *    double `/`) truncates to ms exactly — double division would round
    *    the ~1.7e18-magnitude mantissa across a millisecond boundary.
    *  - `TimestampNTZType`: the micros shape (isAdjustedToUTC=false);
    *    `date_trunc('millisecond', ts)` — the analyzer inserts an
    *    NTZ→session-zone cast, so the derived column is TimestampType.
    *  - `TimestampType`: micros with isAdjustedToUTC=true; same trunc.
    *
    * Either way the result is millisecond-truncated TimestampType, matching
    * the reference's `DateTime64(3,'UTC')` storage precision
    * (internal/db/db.go:42); oracle SQL applies the same
    * `date_trunc('milliseconds', ts)` in DuckDB. Any OTHER decoded type is
    * fixture drift — fail loudly naming it (see FixtureDriftSpec, the
    * tripwire that diagnoses the next driver-side regeneration in one
    * line).
    *
    * ts-range predicates on the derived column are rewritten to bounds on
    * the raw scan column ([[graft.plans.NanosTimestampPushdown]]) so they
    * reach parquet `PushedFilters` and prune row groups on every shape.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // Required to decode the nanos shape at all; a no-op for micros files.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.plans.NanosTimestampPushdown.install(spark)
    val raw = spark.read.parquet(p(dir, "events"))
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_millis(expr("ts div 1000000")))
      case TimestampNTZType | TimestampType =>
        raw.withColumn("ts", date_trunc("millisecond", col("ts")).cast(TimestampType))
      case other =>
        throw new IllegalStateException(
          s"fixture drift: events.ts decoded as $other (expected LongType " +
            s"nanos, TimestampNTZType, or TimestampType) in ${p(dir, "events")}")
    }
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(p(dir, "lineitem"))
  def orders(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(p(dir, "orders"))
  def customer(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(p(dir, "customer"))
  def supplier(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(p(dir, "supplier"))
  def part(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(p(dir, "part"))
  def nation(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(p(dir, "nation"))
  def region(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(p(dir, "region"))
  def documents(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(p(dir, "documents"))
  def embeddings(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(p(dir, "embeddings"))
}
