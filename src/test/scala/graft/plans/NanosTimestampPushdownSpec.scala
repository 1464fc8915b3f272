package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestBase, Tables}

class NanosTimestampPushdownSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def ts(s: String) = to_timestamp(lit(s))

  /** Tiny nanos-timestamp parquet with values straddling ms boundaries. */
  private lazy val dir: String = {
    val d = Files.createTempDirectory("nanos").toString
    // write int64 nanos via a long column renamed after: simplest is to
    // write longs and read them with the same loader path the fixture uses
    import spark.implicits._
    val base = java.time.Instant.parse("2024-01-10T00:00:00Z").toEpochMilli * 1000000L
    Seq(
      (1L, base - 1L), // 1ns before the boundary → truncates below
      (2L, base), //      exactly on it
      (3L, base + 999999L), // same ms
      (4L, base + 1000000L)) // next ms
      .toDF("event_id", "ts")
      .withColumn("user_id", lit(0L)).withColumn("event_type", lit("x"))
      .withColumn("value", lit(0.0)).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  /** The same four boundary-straddling rows in the micros (TIMESTAMP_NTZ)
    * physical shape the round-6+ fixture ships: micros offsets around the
    * same instant, written as parquet timestamp[us] isAdjustedToUTC=false.
    */
  private lazy val microsDir: String = {
    val d = Files.createTempDirectory("micros").toString
    import spark.implicits._
    val base = java.time.Instant.parse("2024-01-10T00:00:00Z").toEpochMilli * 1000L
    Seq(
      (1L, base - 1L), // 1µs before the boundary → truncates below
      (2L, base), //      exactly on it
      (3L, base + 999L), // same ms
      (4L, base + 1000L)) // next ms
      .toDF("event_id", "us")
      .withColumn("ts", timestamp_micros(col("us")).cast("timestamp_ntz"))
      .drop("us")
      .withColumn("user_id", lit(0L)).withColumn("event_type", lit("x"))
      .withColumn("value", lit(0.0)).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  private def ids(df: org.apache.spark.sql.DataFrame) =
    df.select(col("event_id")).collect().map(_.getLong(0)).toSet

  private def boundaryLaws(evDir: String): Unit = {
    val ev = Tables.events(spark, evDir)
    val boundary = ts("2024-01-10 00:00:00")
    assert(ids(ev.filter(col("ts") >= boundary)) == Set(2L, 3L, 4L))
    assert(ids(ev.filter(col("ts") > boundary)) == Set(4L))
    assert(ids(ev.filter(col("ts") < boundary)) == Set(1L))
    assert(ids(ev.filter(col("ts") <= boundary)) == Set(1L, 2L, 3L))
    assert(ids(ev.filter(col("ts") === boundary)) == Set(2L, 3L))
    // literal-on-left forms
    assert(ids(ev.filter(boundary <= col("ts"))) == Set(2L, 3L, 4L))
    assert(ids(ev.filter(boundary > col("ts"))) == Set(1L))
    // off-boundary literal: equality is provably empty, ranges still exact
    val offB = ts("2024-01-10 00:00:00.0005")
    assert(ids(ev.filter(col("ts") === offB)).isEmpty)
    assert(ids(ev.filter(col("ts") > offB)) == Set(4L))
    assert(ids(ev.filter(col("ts") < offB)) == Set(1L, 2L, 3L))
  }

  private def pushedBound(evDir: String): Unit = {
    val ev = Tables.events(spark, evDir)
    val plan = ev.filter(col("ts") >= ts("2024-01-10 00:00:00"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(ts,"), s"no pushed ts bound in:\n$plan")
  }

  test("nanos shape: rewritten bounds are exact at millisecond boundaries") {
    boundaryLaws(dir)
  }

  test("nanos shape: range predicate lands in the parquet PushedFilters") {
    pushedBound(dir)
  }

  test("micros shape: rewritten bounds are exact at millisecond boundaries") {
    boundaryLaws(microsDir)
  }

  test("micros shape: range predicate lands in the parquet PushedFilters") {
    pushedBound(microsDir)
  }

  test("micros shape: loader normalizes ts to ms-truncated TimestampType") {
    val ev = Tables.events(spark, microsDir)
    assert(ev.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    // rows 2 and 3 (base, base+999µs) collapse to the same millisecond
    val distinct = ev.select(col("ts")).distinct().count()
    assert(distinct == 3L, s"expected 3 distinct ms-truncated values, got $distinct")
  }
}
