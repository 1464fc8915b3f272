package graft.functions

/** Zigzag-varint codec for the delta time-series encoding
  * ([[graft.analytics.CodecStats]]): the LEB128 variable-length integer
  * with zigzag sign folding that delta/delta-of-delta time-series codecs
  * build on (ClickHouse's DoubleDelta and Gorilla-style codecs are the
  * bit-level cousins; Facebook's Gorilla paper, Pelkonen et al. VLDB'15).
  *
  * Plain-JVM encode/decode used by the spec-level roundtrip law; the
  * CLUSTER-side artifact is [[byteCost]]'s closed form, which
  * [[graft.analytics.CodecStats]] evaluates as pure column arithmetic —
  * the law `byteCost(v) == encode(v).length` (property-tested) is what
  * lets the oracle-checked SQL cost model stand in for real bytes. */
object VarintCodec {

  /** Zigzag fold: small-magnitude signed values → small unsigned codes. */
  def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)

  def unzigzag(z: Long): Long = (z >>> 1) ^ -(z & 1L)

  /** LEB128 byte length of the zigzag code: ceil(bits/7), min 1. */
  def byteCost(v: Long): Int = {
    val z = zigzag(v)
    val bits = 64 - java.lang.Long.numberOfLeadingZeros(z)
    math.max(1, (bits + 6) / 7)
  }

  /** LEB128-encode the zigzag code (7 data bits per byte, MSB = more). */
  def encode(v: Long): Array[Byte] = {
    var z = zigzag(v)
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    do {
      val b = (z & 0x7fL).toInt
      z >>>= 7
      out += (if (z != 0) (b | 0x80) else b).toByte
    } while (z != 0)
    out.toArray
  }

  /** Decode one varint from `bytes` at `off`; returns (value, bytesRead). */
  def decode(bytes: Array[Byte], off: Int): (Long, Int) = {
    var z = 0L
    var shift = 0
    var i = off
    var more = true
    while (more) {
      val b = bytes(i)
      z |= (b & 0x7fL) << shift
      shift += 7
      more = (b & 0x80) != 0
      i += 1
    }
    (unzigzag(z), i - off)
  }

  /** Encode a full series: head value, then first-order deltas — or, with
    * `dod`, head + first delta + delta-of-deltas — each zigzag-varint'd
    * and concatenated. */
  def encodeSeries(values: Seq[Long], dod: Boolean = false): Array[Byte] = {
    if (values.isEmpty) return Array.empty
    val deltas = values.zip(values.drop(1)).map { case (a, b) => b - a }
    val stream =
      if (dod && deltas.nonEmpty)
        values.head +: deltas.head +:
          deltas.zip(deltas.drop(1)).map { case (a, b) => b - a }
      else values.head +: deltas
    stream.flatMap(encode).toArray
  }

  /** Inverse of [[encodeSeries]]. */
  def decodeSeries(bytes: Array[Byte], dod: Boolean = false): Seq[Long] = {
    val raw = scala.collection.mutable.ArrayBuffer.empty[Long]
    var off = 0
    while (off < bytes.length) {
      val (v, n) = decode(bytes, off)
      raw += v
      off += n
    }
    if (raw.isEmpty) return Seq.empty
    // raw = [v0, d1, dod2, dod3, …] (dod) or [v0, d1, d2, …] (plain)
    val deltas: Seq[Long] =
      if (dod && raw.size > 2) raw(1) +: raw.drop(2).toSeq.scanLeft(raw(1))(_ + _).tail
      else raw.drop(1).toSeq
    deltas.scanLeft(raw.head)(_ + _)
  }
}
