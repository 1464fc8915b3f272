package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Largest-Triangle-Three-Buckets downsampling of a time series — the
  * standard dashboard decimator (Steinarsson, "Downsampling Time Series for
  * Visual Representation", U. Iceland 2013; shipped by ClickHouse as the
  * `largestTriangleThreeBuckets` aggregate): per time bucket keep the ONE
  * point forming the largest triangle with its neighbor buckets, which
  * preserves spikes and shape far better than avg/max decimation.
  *
  * This is the PARALLEL variant: the triangle anchors are the neighbor
  * buckets' AVERAGE points rather than the previously-selected point.
  * Canonical LTTB threads a selected-point recurrence through every bucket
  * (inherently sequential — the thesis §4.2 discusses exactly this
  * anchor-average relaxation); anchoring on averages drops the chain, so
  * each bucket's argmax is an independent map-side-combinable aggregate and
  * the whole decimation is two narrow passes over the stream. First/last
  * non-empty buckets pin the series' first/last point, as LTTB requires.
  *
  * Exactness: the argmax compares triangle areas as cross products of
  * (epoch-second, cent) integer coordinates, scaled by the neighbor-bucket
  * counts to clear the average's denominators — DECIMAL(38,0) arithmetic,
  * no floating point, so ties and near-ties resolve identically in any
  * engine (tie-break: smaller ts, then event_id).
  *
  * Scale: series bounds are a 5-row aggregate broadcast back; bucket stats
  * are |series|×|buckets| rows (window over ~120 rows for neighbors) and
  * broadcast; the per-bucket argmax is `min(struct(...))` — an associative
  * grouped aggregate, NOT a per-bucket window — so a bucket with a billion
  * points still combines map-side. One shuffle of bucket-stat partials plus
  * one of argmax partials; the raw stream is never globally sorted. */
object Lttb {

  private val Dec = DecimalType(38, 0)

  /** Downsample `events.value` by event_type into `nBuckets` equal-width
    * time buckets. Output: one chosen (ts, value) per non-empty bucket. */
  def downsample(events: DataFrame, nBuckets: Int = 24): DataFrame = {
    require(nBuckets >= 2, "need at least first/last buckets")

    val pts = events.select(
      col("event_type").as("series"),
      col("event_id"),
      col("ts"),
      unix_micros(col("ts")).as("x"),
      round(col("value") * 100).cast("long").as("y"),
      col("value"))

    // Per-series time bounds: tiny aggregate, broadcast back. Integer
    // width = floor(span/n)+1 guarantees bucket ids land in [0, n) with no
    // floating-point division anywhere near the 10¹⁵-magnitude micros.
    val bounds = pts.groupBy(col("series").as("b_series"))
      .agg(min(col("x")).as("xmin"), max(col("x")).as("xmax"))
      .withColumn("width", expr(s"(xmax - xmin) DIV $nBuckets + 1"))

    val bucketed = pts
      .join(broadcast(bounds), col("series") === col("b_series"))
      .withColumn("bucket", expr("CAST((x - xmin) DIV width AS INT)"))
      .drop("b_series", "xmin", "xmax", "width")

    // Bucket stats (sum-x, sum-y, count) + neighbor stats via lag/lead over
    // the per-series bucket list — a frame of |series|×nBuckets rows, so
    // the window is over a broadcast-sized frame, never over raw points.
    val wS = Window.partitionBy(col("s_series")).orderBy(col("s_bucket"))
    val stats = bucketed.groupBy(col("series").as("s_series"), col("bucket").as("s_bucket"))
      // cast BEFORE summing: Σx of epoch-micros overflows BIGINT at ~5k
      // rows per bucket × 10× replication; decimal partials never do.
      .agg(sum(col("x").cast(Dec)).as("sx"), sum(col("y").cast(Dec)).as("sy"),
        count(lit(1)).cast(Dec).as("cnt"))
      .withColumn("psx", lag(col("sx"), 1).over(wS))
      .withColumn("psy", lag(col("sy"), 1).over(wS))
      .withColumn("pc", lag(col("cnt"), 1).over(wS))
      .withColumn("nsx", lead(col("sx"), 1).over(wS))
      .withColumn("nsy", lead(col("sy"), 1).over(wS))
      .withColumn("nc", lead(col("cnt"), 1).over(wS))
      .drop("sx", "sy")

    // Scaled double-area of triangle (prev-avg, candidate, next-avg):
    //   |(x·pc − psx)(nsy·pc − psy·nc) − (nsx·pc − psx·nc)(y·pc − psy)|
    // = pc²·nc · area² — positive-scaled, so argmax is unchanged.
    val joined = bucketed.join(broadcast(stats),
      col("series") === col("s_series") && col("bucket") === col("s_bucket"))
    val xd = col("x").cast(Dec)
    val yd = col("y").cast(Dec)
    val area2 = abs(
      (xd * col("pc") - col("psx")) * (col("nsy") * col("pc") - col("psy") * col("nc")) -
      (col("nsx") * col("pc") - col("psx") * col("nc")) * (yd * col("pc") - col("psy")))

    // One comparable sort key: first bucket → earliest point; last bucket →
    // latest point; interior → largest area. min(struct) is the argmin.
    val c1 = when(col("pc").isNull, xd)
      .when(col("nc").isNull, -xd)
      .otherwise(-area2)
    val c2 = when(col("pc").isNull || col("nc").isNull, col("event_id").cast(Dec))
      .otherwise(xd)
    val chosen = joined
      .select(col("series"), col("bucket"),
        struct(c1.as("c1"), c2.as("c2"), col("event_id").cast(Dec).as("c3"),
          col("ts").as("ts"), col("value").as("value")).as("cand"))
      .groupBy(col("series"), col("bucket"))
      .agg(min(col("cand")).as("best"))
      .select(col("series").as("event_type"), col("bucket"),
        col("best.ts").as("ts"), col("best.value").as("value"))
      .orderBy(col("event_type"), col("bucket"))
    chosen
  }
}
