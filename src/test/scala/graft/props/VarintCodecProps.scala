package graft.props

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.VarintCodec._

/** Codec laws that tie [[graft.analytics.CodecStats]]' SQL cost model to
  * real bytes: zigzag is a bijection, byteCost equals the true encoded
  * length, and both series layouts roundtrip exactly. */
object VarintCodecProps extends Properties("VarintCodec") {

  // magnitudes the delta streams can produce (epoch-ms heads ~2^41, deltas
  // small) — everything the cost CASE's 2^56 top bracket still covers
  private val genVal: Gen[Long] = Gen.oneOf(
    Gen.choose(-1000000L, 1000000L),
    Gen.choose(-(1L << 45), 1L << 45),
    Gen.oneOf(0L, 1L, -1L, 127L, 128L, -128L, 8191L, 8192L, (1L << 41)))

  property("zigzag bijection") = forAll(genVal) { v =>
    unzigzag(zigzag(v)) == v
  }

  property("byteCost == real encoded length") = forAll(genVal) { v =>
    byteCost(v) == encode(v).length
  }

  property("single varint decode inverts encode") = forAll(genVal) { v =>
    decode(encode(v), 0) == ((v, encode(v).length))
  }

  private val genSeries: Gen[List[Long]] =
    Gen.listOfN(30, genVal).flatMap(l => Gen.choose(0, 30).map(l.take))

  property("delta series roundtrips") = forAll(genSeries) { vs =>
    decodeSeries(encodeSeries(vs)) == vs
  }

  property("delta-of-delta series roundtrips") = forAll(genSeries) { vs =>
    decodeSeries(encodeSeries(vs, dod = true), dod = true) == vs
  }

  property("dod beats plain delta on a regular-cadence series") = {
    val regular = (0 until 100).map(i => 1700000000000L + i * 60000L)
    val dodBytes = encodeSeries(regular, dod = true).length
    val deltaBytes = encodeSeries(regular).length
    org.scalacheck.Prop(dodBytes < deltaBytes) :| s"dod=$dodBytes delta=$deltaBytes"
  }
}
