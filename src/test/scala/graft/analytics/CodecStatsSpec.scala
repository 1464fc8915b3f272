package graft.analytics

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.functions.VarintCodec

/** [[CodecStats]]' column-arithmetic size model vs the REAL encoder: the
  * per-user byte totals must equal `encodeSeries(...).length` exactly —
  * the frame is a size model, not an estimate. */
class CodecStatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("stats equal real encoded lengths (regular cadence + a jump)") {
    import spark.implicits._
    val times = Seq("2024-01-01 00:00:00", "2024-01-01 00:01:00",
      "2024-01-01 00:02:00", "2024-01-01 00:03:00", "2024-01-02 07:11:13")
    val vals = Seq(10.00, 10.50, 10.50, 9.75, 480.02)
    val df = times.zip(vals).zipWithIndex.map { case ((t, v), i) =>
      (i.toLong, ts(t), 7L, "view", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

    val r = CodecStats.deltaEncodingStats(df).collect()(0)
    val msSeries = times.map(ts(_).getTime)
    val centsSeries = vals.map(v => math.round(v * 100))
    assert(r.getAs[Long]("enc_ts_bytes") ==
      VarintCodec.encodeSeries(msSeries, dod = true).length.toLong)
    assert(r.getAs[Long]("enc_val_bytes") ==
      VarintCodec.encodeSeries(centsSeries).length.toLong)
    assert(r.getAs[Long]("raw_bytes") == 16L * times.size)
    assert(r.getAs[Double]("compression_ratio") > 1.0)
  }

  test("regular cadence compresses to ~1 byte/sample on the ts stream") {
    import spark.implicits._
    val df = (0 until 200).map { i =>
      (i.toLong, new Timestamp(1700000000000L + i * 60000L), 1L, "view", 5.00, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = CodecStats.deltaEncodingStats(df).collect()(0)
    // ts: head (6 B) + first delta (3 B) + 198 zero dods (1 B each);
    // values: head 500 cents (2 B) + 199 zero deltas (1 B each)
    assert(r.getAs[Long]("enc_ts_bytes") == 6L + 3L + 198L)
    assert(r.getAs[Long]("enc_val_bytes") == 2L + 199L)
    assert(r.getAs[Double]("compression_ratio") == 3200.0 / 408.0)
  }
}
