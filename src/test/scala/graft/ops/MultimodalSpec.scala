package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestBase, Tables}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private lazy val media =
    Multimodal.mediaFromDocuments(spark, Tables.documents(spark, SparkTestBase.sfDir))

  test("mediaFromDocuments: kind cycles by id, payload is the text bytes") {
    val rows = media.collect()
    assert(rows.nonEmpty)
    rows.take(9).foreach { r =>
      val expected = (r.media_id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      assert(r.kind == expected)
      assert(r.payload.nonEmpty)
    }
  }

  test("imageFeatures: text payloads quarantine as undecodable, deterministically") {
    val feats = Multimodal.imageFeatures(media).collect()
    assert(feats.nonEmpty)
    // the documents-derived payloads are utf-8 text — no installed reader
    // accepts them, so every row takes the (-1, -1, decoded=false) branch
    assert(feats.forall(f => f.width == -1 && f.height == -1 && !f.decoded && f.n_bytes > 0))
    val again = Multimodal.imageFeatures(media).collect()
    assert(feats.sortBy(_.media_id).toSeq == again.sortBy(_.media_id).toSeq)
  }

  test("imageFeatures: REAL decode — generated PNGs yield actual pixel dimensions") {
    import spark.implicits._
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until w).foreach(x => (0 until h).foreach(y => img.setRGB(x, y, (x * 31 + y) & 0xffffff)))
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    val rows = Seq(
      Multimodal.MediaRow(0L, "image", png(17, 9), "s"),
      Multimodal.MediaRow(3L, "image", png(128, 64), "s"),
      Multimodal.MediaRow(6L, "image", "not an image".getBytes("UTF-8"), "s"))
    val feats = Multimodal.imageFeatures(rows.toDS()).collect().sortBy(_.media_id)
    assert(feats.map(f => (f.media_id, f.width, f.height, f.decoded)).toSeq ==
      Seq((0L, 17, 9, true), (3L, 128, 64, true), (6L, -1, -1, false)))
    // content hash still covers the raw bytes on both branches
    assert(feats.forall(_.n_bytes > 0))
  }

  test("sampleFrames: text payloads quarantine as one undecodable row each") {
    val frames = Multimodal.sampleFrames(media, stride = 2, maxFrames = 3).collect()
    assert(frames.nonEmpty)
    // utf-8 text is not a video container: exactly one quarantine row per
    // video doc, hash = payload FNV (the oracle-checkable branch)
    assert(frames.forall(f => f.frame_idx == -1 && !f.decoded))
    assert(frames.map(_.media_id).distinct.length == frames.length)
  }

  test("sampleFrames: REAL decode — animated GIF frame count, stride and cap") {
    val gifs = Multimodal.videoGifMedia(
      spark, Tables.documents(spark, SparkTestBase.sfDir))
    val frames = Multimodal.sampleFrames(gifs, stride = 2, maxFrames = 3).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.decoded))
    val byMedia = frames.groupBy(_.media_id)
    byMedia.foreach { case (id, fs) =>
      val nFrames = (1 + id % 7).toInt // fixture construction
      val want = (0 until nFrames by 2).take(3).toSet
      assert(fs.map(_.frame_idx).toSet == want, s"media $id")
    }
    // pixel hashes: stable across runs, distinct across frames (each frame
    // is a different web-safe color so palette quantization is exact)
    val again = Multimodal.sampleFrames(gifs, stride = 2, maxFrames = 3).collect()
    assert(frames.sortBy(f => (f.media_id, f.frame_idx)).toSeq ==
      again.sortBy(f => (f.media_id, f.frame_idx)).toSeq)
    val multi = byMedia.values.filter(_.length > 1)
    assert(multi.nonEmpty)
    multi.foreach(fs => assert(fs.map(_.frame_hash).distinct.length == fs.length))
  }

  test("audioFeatures: text payloads all quarantine (real codec, no audio headers)") {
    val feats = Multimodal.audioFeatures(media).collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      assert(f.media_id % 3 == 1) // the audio kind
      assert(f.sample_rate == -1 && f.n_samples == -1L && f.duration_s == -1.0)
      assert(!f.decoded && f.n_bytes > 0)
    }
  }

  test("audioFeatures: REAL decode — generated WAVs yield actual rate and frames") {
    import spark.implicits._
    import javax.sound.sampled._
    def wav(rate: Float, frames: Int): Array[Byte] = {
      val fmt = new AudioFormat(rate, 16, 1, true, false)
      val pcm = new Array[Byte](frames * fmt.getFrameSize)
      pcm.indices.foreach(i => pcm(i) = ((i * 37) & 0x7f).toByte)
      val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
      val baos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, baos)
      baos.toByteArray
    }
    val rows = Seq(
      Multimodal.MediaRow(1L, "audio", wav(8000f, 1600), "s"),
      Multimodal.MediaRow(4L, "audio", wav(44100f, 4410), "s"),
      Multimodal.MediaRow(7L, "audio", "not audio".getBytes("UTF-8"), "s"))
    val feats = Multimodal.audioFeatures(rows.toDS()).collect().sortBy(_.media_id)
    assert(feats.map(f => (f.media_id, f.sample_rate, f.n_samples, f.decoded)).toSeq ==
      Seq((1L, 8000, 1600L, true), (4L, 44100, 4410L, true), (7L, -1, -1L, false)))
    assert(math.abs(feats(0).duration_s - 0.2) < 1e-9)
    assert(math.abs(feats(1).duration_s - 0.1) < 1e-9)
  }

  test("payloadMeta: byte length matches utf-8 encoding") {
    import org.apache.spark.sql.functions._
    val meta = Multimodal.payloadMeta(media.toDF())
    val docs = Tables.documents(spark, SparkTestBase.sfDir)
      .select(col("doc_id").as("media_id"), octet_length(col("text")).cast("long").as("want"))
    val joined = meta.join(docs, "media_id")
    assert(joined.filter(col("n_bytes") =!= col("want")).count() == 0)
  }

  test("pHash: brightness-shift invariant within a pattern, far across patterns") {
    import org.apache.spark.sql.functions._
    val hashes = Multimodal.pHashes(
        Multimodal.imagePngMedia(spark, Tables.documents(spark, SparkTestBase.sfDir)))
      .collect()
    assert(hashes.nonEmpty && hashes.forall(_.decoded)) // PNGs all decode
    val byClass = hashes.groupBy(_.media_id % 5)
    // within a pattern class: different payload bytes (different jitter),
    // ONE hash — the DC-only brightness invariance
    byClass.foreach { case (cls, rows) =>
      assert(rows.map(r => (r.ph0, r.ph1)).distinct.length == 1,
        s"pattern class $cls hashes diverged")
    }
    // across classes: every pair of class hashes is far (> the banding's
    // complete-recall radius), so the pair frame is exactly within-class
    val classHash = byClass.map { case (c, rows) => c -> (rows.head.ph0, rows.head.ph1) }
    for ((c1, h1) <- classHash; (c2, h2) <- classHash if c1 < c2) {
      val hamming = java.lang.Long.bitCount(h1._1 ^ h2._1) +
        java.lang.Long.bitCount(h1._2 ^ h2._2)
      assert(hamming > 3, s"classes $c1/$c2 too close: hamming $hamming")
    }
    // a non-image payload quarantines instead of throwing
    import spark.implicits._
    val junk = Seq(Multimodal.MediaRow(99L, "image",
      "not a png".getBytes("UTF-8"), "s")).toDS()
    val q = Multimodal.pHashes(junk).collect()
    assert(q.length == 1 && !q.head.decoded && q.head.ph0 == 0L && q.head.ph1 == 0L)
  }

  test("audio fingerprint: gain-invariant within a waveform, far across waveforms") {
    import org.apache.spark.sql.functions._
    val fps = Multimodal.audioFingerprints(
        Multimodal.audioWavMedia(spark, Tables.documents(spark, SparkTestBase.sfDir)))
      .collect()
    assert(fps.nonEmpty && fps.forall(_.decoded)) // WAVs all decode
    val byClass = fps.groupBy(_.media_id % 5)
    // within a waveform class: different gain (different payload bytes),
    // ONE fingerprint — band-energy ratios survive volume changes
    byClass.foreach { case (cls, rows) =>
      assert(rows.map(r => (r.afp0, r.afp1)).distinct.length == 1,
        s"waveform class $cls fingerprints diverged")
    }
    val classFp = byClass.map { case (c, rows) => c -> (rows.head.afp0, rows.head.afp1) }
    for ((c1, f1) <- classFp; (c2, f2) <- classFp if c1 < c2) {
      val hamming = java.lang.Long.bitCount(f1._1 ^ f2._1) +
        java.lang.Long.bitCount(f1._2 ^ f2._2)
      assert(hamming > 3, s"waveforms $c1/$c2 too close: hamming $hamming")
    }
    // a non-audio payload quarantines instead of throwing
    import spark.implicits._
    val junk = Seq(Multimodal.MediaRow(99L, "audio",
      "not a wav".getBytes("UTF-8"), "s")).toDS()
    val q = Multimodal.audioFingerprints(junk).collect()
    assert(q.length == 1 && !q.head.decoded && q.head.afp0 == 0L && q.head.afp1 == 0L)
  }

  test("video near-dup fixture: lossless GIF round-trip, shared frames hash-equal") {
    val frames = Multimodal.framePHashes(
        Multimodal.videoNearDupMedia(spark, Tables.documents(spark, SparkTestBase.sfDir)),
        stride = 1, maxFrames = 8)
      .collect()
    assert(frames.nonEmpty && frames.forall(_.decoded)) // every GIF decodes
    val byMedia = frames.groupBy(_.media_id)
    // 4 shared frames + 1 unique tail, always
    byMedia.foreach { case (id, fs) =>
      assert(fs.map(_.frame_idx).sorted.toSeq == Seq(0, 1, 2, 3, 4), s"media $id")
    }
    // same class (media_id % 5): frames 0..3 hash identically across docs
    // even at different brightness (the indexed-palette GIF encode is
    // lossless, so the DC-only-shift invariance survives the container)
    val byClassFrame = frames.filter(_.frame_idx < 4)
      .groupBy(f => (f.media_id % 5, f.frame_idx))
    byClassFrame.foreach { case ((cls, fi), fs) =>
      assert(fs.map(f => (f.ph0, f.ph1)).distinct.length == 1,
        s"class $cls frame $fi hashes diverged")
    }
    // unique tail frames: one hash per doc, never shared
    val tails = frames.filter(_.frame_idx == 4).map(f => (f.ph0, f.ph1))
    assert(tails.distinct.length == tails.length, "tail frames collided")
  }

  test("resizeImages: exact box average, PNG round-trip, quarantine") {
    import spark.implicits._
    val pngMedia = Multimodal.imagePngMedia(spark, Tables.documents(spark, SparkTestBase.sfDir))
    val rows = Multimodal.resizeImages(pngMedia).collect()
    assert(rows.nonEmpty && rows.forall(_.decoded))
    // closed-form check: recompute one doc's digests from patternImage's
    // formula (gray = 78 + fnv(cls+1, x, y) mod 101 + jitter)
    val r0 = rows.minBy(_.media_id)
    val cls = (r0.media_id % 5).toInt
    val jitter = (((r0.media_id / 5) % 5).toInt - 2) * 5
    def gray(x: Int, y: Int): Long = {
      val mixed = graft.functions.SimHash64.fnv1a64(
        Array((cls + 1).toByte, x.toByte, y.toByte))
      78L + java.lang.Long.remainderUnsigned(mixed, 101L) + jitter
    }
    var sum = 0L; var fp = 0L
    for (yo <- 0 until 8; xo <- 0 until 8) {
      var s = 0L
      for (y <- yo * 4 until yo * 4 + 4; x <- xo * 4 until xo * 4 + 4) s += gray(x, y)
      val px = s / 16; sum += px; fp = fp * 31L + px
    }
    assert(r0.out_sum == sum && r0.out_fp == fp)
    // the re-encoded payload is a REAL PNG of the digested raster
    val im = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r0.out_png))
    assert(im.getWidth == 8 && im.getHeight == 8)
    var rsum = 0L; var rfp = 0L
    for (y <- 0 until 8; x <- 0 until 8) {
      val px = (im.getRGB(x, y) & 0xff).toLong; rsum += px; rfp = rfp * 31L + px
    }
    assert(rsum == r0.out_sum && rfp == r0.out_fp)
    // quarantine: undecodable payload, and a non-divisible target
    val junk = Seq(Multimodal.MediaRow(99L, "image", Array[Byte](1, 2, 3), "s")).toDS()
    assert(!Multimodal.resizeImages(junk).collect().head.decoded)
    assert(!Multimodal.resizeImages(pngMedia, outW = 7, outH = 7).collect().head.decoded)
  }

  test("resampleAudio: exact block average, WAV round-trip, quarantine") {
    import spark.implicits._
    val wavs = Multimodal.audioWavMedia(spark, Tables.documents(spark, SparkTestBase.sfDir))
    val rows = Multimodal.resampleAudio(wavs).collect()
    assert(rows.nonEmpty && rows.forall(_.decoded))
    val r0 = rows.minBy(_.media_id)
    assert(r0.in_rate == 8000 && r0.out_rate == 2000 &&
      r0.in_frames == 2048 && r0.out_frames == 512)
    // closed-form check from classWaveform's formula
    val cls = (r0.media_id % 5).toInt
    val gain = 1 + ((r0.media_id / 5) % 5).toInt
    def sample(i: Int): Long = {
      val mixed = graft.functions.SimHash64.fnv1a64(
        Array((cls + 1).toByte, (i >> 8).toByte, i.toByte))
      (java.lang.Long.remainderUnsigned(mixed, 12001L) - 6000L) * gain
    }
    var sum = 0L; var fp = 0L
    for (j <- 0 until 512) {
      val s = (0 until 4).map(t => sample(j * 4 + t)).sum
      val px = s / 4L; sum += px; fp = fp * 31L + px
    }
    assert(r0.out_sum == sum && r0.out_fp == fp)
    // the re-encoded payload is a REAL WAV of the digested samples
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(r0.out_wav))
    assert(math.round(ais.getFormat.getSampleRate) == 2000)
    val pcm = ais.readAllBytes()
    assert(pcm.length == 512 * 2)
    var rsum = 0L; var rfp = 0L
    for (i <- 0 until 512) {
      val v = (((pcm(2 * i + 1) << 8) | (pcm(2 * i) & 0xff)).toShort).toLong
      rsum += v; rfp = rfp * 31L + v
    }
    assert(rsum == r0.out_sum && rfp == r0.out_fp)
    // quarantine: junk payload, and a factor the clip doesn't divide by
    val junk = Seq(Multimodal.MediaRow(99L, "audio", Array[Byte](9, 9), "s")).toDS()
    assert(!Multimodal.resampleAudio(junk).collect().head.decoded)
    assert(!Multimodal.resampleAudio(wavs, factor = 3).collect().head.decoded)
  }

  test("videoFpPairs: frame vote = 4 within class, nothing across") {
    import spark.implicits._
    val pairs = Multimodal.videoFpPairs(
        Multimodal.framePHashes(
          Multimodal.videoNearDupMedia(spark, Tables.documents(spark, SparkTestBase.sfDir)),
          stride = 1, maxFrames = 8)
          .filter(_.decoded).toDF(),
        maxHamming = 3, minFrames = 3)
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      val (a, b, n) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(a % 5 == b % 5 && a % 3 == 2 && b % 3 == 2, s"cross-class pair ($a,$b)")
      assert(n == 4L, s"pair ($a,$b) matched $n frames, want 4")
    }
  }

  test("pHashClustersPersisted: identical rows to the lazy CC build") {
    import org.apache.spark.sql.functions.{col, lit, pmod}
    val dir = SparkTestBase.sfDir
    val docs = Tables.documents(spark, dir)
    val lazyLabels = graft.ops.Dedup.nearDupClusters(
      docs.filter(pmod(col("doc_id"), lit(3)) === 1).select(col("doc_id")),
      graft.ops.Dedup.hammingPairs128(
        Multimodal.pHashes(Multimodal.imagePngMedia(spark, docs))
          .filter(_.decoded).toDF()
          .select(col("media_id").as("doc_id"),
            col("ph0").as("sh0"), col("ph1").as("sh1")),
        maxHamming = 3)).collect().toSeq
    val persisted = Multimodal.pHashClustersPersisted(spark, dir, docs)
      .orderBy(col("doc_id")).collect().toSeq
    assert(persisted == lazyLabels)
    assert(persisted.nonEmpty)
  }
}
