package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet fixtures (TESTDATA.md).
  *
  * All readers are plain `spark.read.parquet` so Catalyst keeps full
  * pushdown/pruning freedom; the only special case is `events`, whose
  * parquet ts column is INT64 TIMESTAMP(NANOS) — a physical type Spark's
  * parquet reader rejects outright ([PARQUET_TYPE_ILLEGAL]).
  */
object Tables {
  private def p(dir: String, name: String) = s"$dir/$name.parquet"

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(p(dir, name))

  /** `events` with ts normalized to millisecond-precision TimestampType.
    *
    * The file stores nanosecond timestamps; we read them as raw Long nanos
    * (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to milliseconds,
    * matching the reference's `DateTime64(3,'UTC')` storage precision
    * (internal/db/db.go:42). Integer `div` (not double `/`) keeps the
    * ~1.7e18-magnitude nanos exact — double division would round the
    * mantissa and can shift a value across a millisecond boundary.
    * Oracle SQL on the same file uses `date_trunc('milliseconds', ts)`.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // ts-range predicates on the derived column are rewritten to raw-nanos
    // bounds so they push into the parquet scan (row-group pruning).
    graft.plans.NanosTimestampPushdown.install(spark)
    spark.read.parquet(p(dir, "events"))
      .withColumn("ts", timestamp_millis(expr("ts div 1000000")))
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
