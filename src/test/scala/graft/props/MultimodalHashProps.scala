package graft.props

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.ops.Multimodal

/** The two multimodal-dedup invariants, property-pinned on transforms
  * chosen to be BIT-EXACT (no tolerance, no flake risk):
  *
  *  - pHash: for integer GRAY rasters, a uniform brightness shift leaves
  *    the hash identical — mean-centering subtracts sum/1024 (a
  *    power-of-two divide, exact in binary floating point), so shifted
  *    rasters center to bit-identical DCT inputs.
  *  - audio fingerprint: scaling PCM by a power-of-two gain multiplies
  *    every double in the FFT by an exact exponent shift, so all band
  *    energies scale by exactly gain² and the 64 comparison bits cannot
  *    move.
  *
  * The fixture specs (`MultimodalSpec`) cover the *generic* integer-gain
  * / jitter cases on deterministic corpora; these laws cover arbitrary
  * random content where only the exactly-invariant transforms are safe
  * to assert. */
object MultimodalHashProps extends Properties("MultimodalHash") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(40)

  private def grayImage(pix: Array[Int], shift: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(32, 32,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var i = 0
    while (i < 1024) {
      val g = pix(i) + shift
      img.setRGB(i % 32, i / 32, (g << 16) | (g << 8) | g)
      i += 1
    }
    img
  }

  // gray values in [40, 215]: shifts of ±40 can never clamp
  private val genRaster: Gen[Array[Int]] =
    Gen.containerOfN[Array, Int](1024, Gen.chooseNum(40, 215))

  property("pHash is exactly invariant under uniform brightness shift") =
    forAll(genRaster, Gen.chooseNum(-40, 40)) { (pix, shift) =>
      Multimodal.pHash128(grayImage(pix, 0)) ==
        Multimodal.pHash128(grayImage(pix, shift))
    }

  property("pHash of the inverted raster differs (not a constant function)") =
    forAll(genRaster) { pix =>
      val inv = pix.map(255 - _)
      // identical only in the measure-zero symmetric case; random rasters
      // must separate — guards against a degenerate all-zero/all-one hash
      val (a0, a1) = Multimodal.pHash128(grayImage(pix, 0))
      val (b0, b1) = Multimodal.pHash128(grayImage(inv, 0))
      java.lang.Long.bitCount(a0 ^ b0) + java.lang.Long.bitCount(a1 ^ b1) > 0
    }

  private def pcmBytes(samples: Array[Int], gain: Int): Array[Byte] = {
    val out = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      val s = (samples(i) * gain).toShort
      out(2 * i) = (s & 0xff).toByte
      out(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  // samples in [-4000, 4000]: ×8 stays well inside 16-bit range
  private val genPcm: Gen[Array[Int]] =
    Gen.containerOfN[Array, Int](2048, Gen.chooseNum(-4000, 4000))

  property("audio fingerprint is exactly invariant under power-of-two gain") =
    forAll(genPcm, Gen.oneOf(2, 4, 8)) { (samples, gain) =>
      Multimodal.audioFp128(pcmBytes(samples, 1), bigEndian = false) ==
        Multimodal.audioFp128(pcmBytes(samples, gain), bigEndian = false)
    }

  property("audio fingerprint reads big- and little-endian PCM identically") =
    forAll(genPcm) { samples =>
      val le = pcmBytes(samples, 1)
      val be = new Array[Byte](le.length)
      var i = 0
      while (i < le.length) { be(i) = le(i ^ 1); i += 1 } // swap byte pairs
      Multimodal.audioFp128(le, bigEndian = false) ==
        Multimodal.audioFp128(be, bigEndian = true)
    }
}
