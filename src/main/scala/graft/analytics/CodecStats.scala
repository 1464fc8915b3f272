package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Storage-codec sizing analytics: what a delta / delta-of-delta +
  * zigzag-varint time-series codec (the byte-aligned cousin of ClickHouse
  * DoubleDelta and Gorilla, Pelkonen et al. VLDB'15) would compress each
  * user's series to — computed as PURE COLUMN ARITHMETIC, no bytes
  * materialized. Timestamps take delta-of-delta (regular cadence → ~1
  * byte/sample), values take first-order delta.
  *
  * The per-value byte cost is the closed form of
  * [[graft.functions.VarintCodec.byteCost]] (zigzag then ceil(bits/7)),
  * property-tested equal to real encoded lengths — which is what makes
  * this frame an honest size model AND lets an independent SQL engine
  * verify it exactly. The codec-plan question "is this column worth
  * DoubleDelta?" becomes a query over group rows: one user-keyed
  * exchange, lag windows, map-side-combinable sums. */
object CodecStats {

  /** Zigzag fold in column arithmetic (|v| ≪ 2⁶², which deltas of
    * epoch-ms and cents always satisfy). */
  private def zz(v: Column): Column =
    when(v >= 0, v * 2).otherwise(v * -2 - 1)

  /** LEB128 byte count of the zigzag code: ceil(used-bits/7), min 1. */
  private def cost(v: Column): Column = {
    val z = zz(v)
    when(z < (1L << 7), 1)
      .when(z < (1L << 14), 2)
      .when(z < (1L << 21), 3)
      .when(z < (1L << 28), 4)
      .when(z < (1L << 35), 5)
      .when(z < (1L << 42), 6)
      .when(z < (1L << 49), 7)
      .when(z < (1L << 56), 8)
      .otherwise(9)
      .cast("long")
  }

  /** Per-user codec sizing frame: (user_id, n_samples, raw_bytes,
    * enc_ts_bytes, enc_val_bytes, compression_ratio). */
  def deltaEncodingStats(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val streams = events
      .select(col("user_id"), col("ts"), col("event_id"),
        unix_millis(col("ts")).as("x"),
        round(col("value") * 100).cast("long").as("c"))
      .withColumn("px", lag(col("x"), 1).over(w))
      .withColumn("ppx", lag(col("x"), 2).over(w))
      .withColumn("pc", lag(col("c"), 1).over(w))
      .withColumn("ts_stream",
        when(col("px").isNull, col("x"))                        // head: raw value
          .when(col("ppx").isNull, col("x") - col("px"))        // second: first delta
          .otherwise((col("x") - col("px")) - (col("px") - col("ppx")))) // dod
      .withColumn("val_stream",
        when(col("pc").isNull, col("c")).otherwise(col("c") - col("pc")))
    streams
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_samples"),
        (count(lit(1)) * 16L).as("raw_bytes"),
        sum(cost(col("ts_stream"))).as("enc_ts_bytes"),
        sum(cost(col("val_stream"))).as("enc_val_bytes"))
      .withColumn("compression_ratio",
        (col("raw_bytes")).cast("double") / (col("enc_ts_bytes") + col("enc_val_bytes")))
      .orderBy(col("user_id"))
  }
}
