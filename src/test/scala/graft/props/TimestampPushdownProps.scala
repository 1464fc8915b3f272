package graft.props

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.{SparkTestBase, Tables}

/** Property invariants for the ts-range pushdown rewrite
  * ([[graft.plans.NanosTimestampPushdown]]) on BOTH fixture shapes: for
  * RANDOM sub-millisecond timestamps and RANDOM microsecond-precision
  * literals, every comparison operator filtered through the rewritten
  * plan must equal the reference predicate computed on the driver over
  * the ms-truncated values — the rewrite claims EXACTNESS at ms
  * boundaries (ceil/floor integer math), which off-boundary literals
  * stress far harder than the hand-picked boundary cases in
  * NanosTimestampPushdownSpec.
  *
  * minSuccessful lowered to 10: each case writes a fresh parquet fixture
  * in each physical shape and runs 12 filtered counts against it.
  */
object TimestampPushdownProps extends Properties("TimestampPushdown") {
  lazy val spark = SparkTestBase.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  // a ±2-day window around a fixed instant, microsecond resolution
  private val BaseUs = java.time.Instant.parse("2024-01-10T00:00:00Z")
    .toEpochMilli * 1000L
  private val genUs: Gen[Long] = Gen.choose(-2L * 86400000000L, 2L * 86400000000L)
    .map(BaseUs + _)

  private val genRows: Gen[List[Long]] =
    Gen.nonEmptyListOf(genUs).map(_.distinct.take(40))

  // literals land ON a millisecond boundary half the time, so the `=`
  // rewrite's aligned branch (range [L, L+1ms)) is exercised, not just
  // its provably-empty off-boundary branch
  private val genLit: Gen[Long] =
    Gen.oneOf(genUs, genUs.map(us => (us / 1000L) * 1000L))

  /** Writes the SAME logical rows in all three physical shapes the
    * loader accepts: raw nanos long, micros timestamp_ntz
    * (isAdjustedToUTC=false), and micros timestamp (adjusted=true). */
  private def writeAll(usRows: List[Long]): Seq[String] = {
    import spark.implicits._
    val base = usRows.zipWithIndex.map { case (us, i) => (i.toLong, us) }
      .toDF("event_id", "us")
      .withColumn("user_id", lit(0L)).withColumn("event_type", lit("x"))
      .withColumn("value", lit(0.0)).withColumn("props", lit("{}"))
    val dNanos = Files.createTempDirectory("prop_nanos").toString
    base.withColumn("ts", col("us") * 1000L).drop("us")
      .write.mode("overwrite").parquet(s"$dNanos/events.parquet")
    val dMicros = Files.createTempDirectory("prop_micros").toString
    base.withColumn("ts", timestamp_micros(col("us")).cast("timestamp_ntz")).drop("us")
      .write.mode("overwrite").parquet(s"$dMicros/events.parquet")
    val dTz = Files.createTempDirectory("prop_tz").toString
    base.withColumn("ts", timestamp_micros(col("us"))).drop("us")
      .write.mode("overwrite").parquet(s"$dTz/events.parquet")
    Seq(dNanos, dMicros, dTz)
  }

  private def msOf(us: Long): Long = Math.floorDiv(us, 1000L)

  property("rewritten filters == driver reference on ms-truncated values, all three shapes") =
    forAll(genRows, genLit) { (usRows, litUs) =>
      val dirs = writeAll(usRows)
      val truth = usRows.zipWithIndex.map { case (us, i) => i.toLong -> msOf(us) }
      val litCol = timestamp_micros(lit(litUs))
      val ops: Seq[(String, Long => Boolean, org.apache.spark.sql.Column => org.apache.spark.sql.Column)] = Seq(
        (">=", ms => ms * 1000L >= litUs, c => c >= litCol),
        (">", ms => ms * 1000L > litUs, c => c > litCol),
        ("<", ms => ms * 1000L < litUs, c => c < litCol),
        ("<=", ms => ms * 1000L <= litUs, c => c <= litCol),
        ("=", ms => ms * 1000L == litUs, c => c === litCol),
        ("lit<=", ms => litUs <= ms * 1000L, c => litCol <= c))
      val ok = dirs.forall { dir =>
        val ev = Tables.events(spark, dir)
        ops.forall { case (_, ref, mk) =>
          val want = truth.collect { case (id, ms) if ref(ms) => id }.toSet
          val got = ev.filter(mk(col("ts"))).select(col("event_id"))
            .collect().map(_.getLong(0)).toSet
          got == want
        }
      }
      ok
    }
}
