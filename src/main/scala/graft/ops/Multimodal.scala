package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns next to typed metadata, processed per-partition in
  * batches — the Scala analogue of a Pandas-UDF `mapInPandas` stage.
  *
  * TWO of the three decodes are real, on plain JDK alone: IMAGE via
  * `javax.imageio` (PNG/JPEG/GIF/BMP → actual pixel dimensions) and AUDIO
  * via `javax.sound.sampled` (WAV/AIFF/AU headers → actual sample rate and
  * frame count), both quarantining undecodable payloads as
  * `decoded = false` rows instead of failing the batch. Video frame
  * extraction needs native demuxers this container does not ship, so that
  * one kernel remains STUBBED with a deterministic fake. Everything
  * Spark-side — schema, encoders, batch iteration shape, partitioning —
  * is real and tested; swapping the stub for a real codec changes only
  * the function body marked `// STUB` (the image/audio paths show the
  * shape).
  */
object Multimodal {

  /** A media row: opaque payload + envelope metadata. */
  final case class MediaRow(
      media_id: Long,
      kind: String, // "image" | "audio" | "video"
      payload: Array[Byte],
      source: String)

  /** Decoded image features. `decoded` distinguishes a real codec parse
    * from an undecodable payload (width/height = -1). */
  final case class ImageFeatures(
      media_id: Long,
      width: Int,
      height: Int,
      n_bytes: Long,
      content_hash: Long,
      decoded: Boolean)

  /** Sampled video frame reference. `decoded` distinguishes a real
    * multi-frame container parse from an undecodable payload (one
    * quarantine row with frame_idx = -1, frame_hash = payload hash). */
  final case class FrameSample(
      media_id: Long,
      frame_idx: Int,
      frame_hash: Long,
      decoded: Boolean)

  /** Decoded audio envelope metadata. `decoded` distinguishes a real codec
    * parse from an undecodable payload (rate/samples/duration = -1). */
  final case class AudioFeatures(
      media_id: Long,
      sample_rate: Int,
      n_samples: Long,
      duration_s: Double,
      n_bytes: Long,
      content_hash: Long,
      decoded: Boolean)

  /** Deterministic 64-bit hash of a byte payload (FNV-1a). */
  private def contentHash(bytes: Array[Byte]): Long =
    graft.functions.SimHash64.fnv1a64(bytes)

  /** Image decode + feature extraction, batch-per-partition.
    *
    * Rows are processed in fixed-size batches inside each partition — the
    * shape a real vectorized codec call wants (and the Scala analogue of a
    * Pandas-UDF `mapInPandas` stage, whose contract is also
    * iterator-of-batches → iterator-of-batches). The decode is REAL:
    * plain-JDK `javax.imageio` parses PNG/JPEG/GIF/BMP payloads into
    * actual width/height (no native libraries needed). A payload no
    * installed reader recognizes yields (-1, -1, decoded = false) — the
    * quarantine row a 100 TB ingest keeps rather than throwing away a
    * whole batch over one corrupt file.
    */
  def imageFeatures(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image").mapPartitions { rows =>
      // in-memory decode only: the default ImageIO path spills a temp file
      // per read, which would put a disk write in every task's hot loop
      javax.imageio.ImageIO.setUseCache(false)
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val h = contentHash(r.payload)
          val img =
            try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload)))
            catch { case _: Exception => None }
          img match {
            case Some(im) =>
              ImageFeatures(r.media_id, im.getWidth, im.getHeight,
                r.payload.length.toLong, h, decoded = true)
            case None =>
              ImageFeatures(r.media_id, -1, -1, r.payload.length.toLong, h, decoded = false)
          }
        }
      }
    }
  }

  /** One resized image: container metadata, the EXACT-integer raster
    * digests the oracle replicates (`out_sum` = Σ resized pixels,
    * `out_fp` = the h·31+px rolling hash over the resized raster in
    * (row, col) order, both wrapping BIGINT), and the re-encoded PNG
    * payload. Quarantine rows: (-1, -1) input dims, zero digests,
    * empty payload, decoded = false. */
  final case class ResizedImage(media_id: Long, in_w: Int, in_h: Int,
      out_w: Int, out_h: Int, out_sum: Long, out_fp: Long,
      out_png: Array[Byte], decoded: Boolean)

  /** REAL image resize — the multimodal preprocessing step a training
    * pipeline runs before feature extraction: decode (javax.imageio),
    * box-average resample to `outW`×`outH` with EXACT INTEGER arithmetic
    * (per output pixel: sum the source block's gray values, floor-divide
    * by the block area — no floating point, so the resized raster is a
    * pure integer function of the input raster on every JVM), re-encode
    * as a real PNG. Inputs whose dimensions are not multiples of the
    * target (or that fail to decode) quarantine rather than silently
    * interpolating — fractional-block resampling would need float
    * kernels and break the exactness contract; a production pipeline
    * pads first.
    *
    * The digest columns make the operator hash-checkable at PIXEL level:
    * the fixture rasters are closed-form in doc_id
    * ([[imagePngMedia]]/patternImage: gray = 78 + fnv(cls+1, x, y) mod
    * 101 + jitter), so the DuckDB oracle recomputes every source pixel,
    * every block sum, and both digests independently — unlike the
    * class-structure oracles of the pair tiers, this one would catch a
    * single wrong pixel. The PNG payload is real output (the spec
    * decodes it and re-derives the digests); only the digest columns
    * ride the gate, since container bytes are encoder-specific.
    *
    * Scale shape: per-row codec work in `mapPartitions` — embarrassingly
    * parallel, no shuffle at all; callers repartition off single-file
    * fixtures exactly as the other codec stages do. */
  def resizeImages(media: Dataset[MediaRow], outW: Int = 8, outH: Int = 8,
      batchSize: Int = 64): Dataset[ResizedImage] = {
    import media.sparkSession.implicits._
    require(outW > 0 && outH > 0, "target dimensions must be positive")
    media.filter(_.kind == "image").mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val img =
            try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload)))
            catch { case _: Exception => None }
          img match {
            case Some(im) if im.getWidth % outW == 0 && im.getHeight % outH == 0 =>
              val (w, h) = (im.getWidth, im.getHeight)
              val (bw, bh) = (w / outW, h / outH)
              val out = new java.awt.image.BufferedImage(outW, outH,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              var sum = 0L
              var fp = 0L
              var yo = 0
              while (yo < outH) {
                var xo = 0
                while (xo < outW) {
                  var s = 0L
                  var y = yo * bh
                  while (y < (yo + 1) * bh) {
                    var x = xo * bw
                    while (x < (xo + 1) * bw) {
                      s += (im.getRGB(x, y) & 0xff) // gray fixtures: b = g = r
                      x += 1
                    }
                    y += 1
                  }
                  val px = s / (bw.toLong * bh) // floor — integers only
                  sum += px
                  fp = fp * 31L + px
                  val g = px.toInt
                  out.setRGB(xo, yo, (g << 16) | (g << 8) | g)
                  xo += 1
                }
                yo += 1
              }
              ResizedImage(r.media_id, w, h, outW, outH, sum, fp,
                pngBytes(out), decoded = true)
            case _ =>
              ResizedImage(r.media_id, -1, -1, outW, outH, 0L, 0L,
                Array.empty[Byte], decoded = false)
          }
        }
      }
    }
  }

  /** Audio envelope decode, batch-per-partition like [[imageFeatures]].
    * The decode is REAL: plain-JDK `javax.sound.sampled` parses WAV/AIFF/AU
    * container headers into the actual sample rate and frame count (header
    * read only — the PCM body is never pulled through the task). A payload
    * no installed provider recognizes yields (-1, -1, -1.0,
    * decoded = false) — the same quarantine contract as the image path. */
  def audioFeatures(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "audio").mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val h = contentHash(r.payload)
          val parsed =
            try {
              val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
                new java.io.ByteArrayInputStream(r.payload))
              val rate = aff.getFormat.getSampleRate
              val frames = aff.getFrameLength.toLong
              if (rate > 0 && frames >= 0) Some((rate.toInt, frames)) else None
            } catch { case _: Exception => None }
          parsed match {
            case Some((rate, frames)) =>
              AudioFeatures(r.media_id, rate, frames, frames.toDouble / rate,
                r.payload.length.toLong, h, decoded = true)
            case None =>
              AudioFeatures(r.media_id, -1, -1L, -1.0,
                r.payload.length.toLong, h, decoded = false)
          }
        }
      }
    }
  }

  /** Video frame sampling: every `stride`-th frame up to `maxFrames`,
    * decoded FOR REAL via `javax.imageio` reader iteration — plain JDK
    * decodes multi-frame containers (animated GIF) frame by frame:
    * `getNumImages(true)` reads the actual frame count from the container
    * and `reader.read(i)` decodes frame i's pixels, which are hashed into
    * `frame_hash`. A payload no installed reader recognizes (an MP4, say —
    * native demuxers don't ship in plain JDK) yields ONE quarantine row
    * (frame_idx = -1, frame_hash = payload hash, decoded = false) — the
    * same keep-don't-throw contract as the image and audio paths. */
  def sampleFrames(media: Dataset[MediaRow], stride: Int, maxFrames: Int): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap { r =>
        val h = contentHash(r.payload)
        val decodedFrames =
          try {
            val iis = javax.imageio.ImageIO.createImageInputStream(
              new java.io.ByteArrayInputStream(r.payload))
            val readers = javax.imageio.ImageIO.getImageReaders(iis)
            if (readers.hasNext) {
              val reader = readers.next()
              try {
                reader.setInput(iis)
                // allowSearch = true: walk the container to the real count
                val n = reader.getNumImages(true)
                if (n >= 1)
                  Some((0 until n by stride).take(maxFrames).map { i =>
                    val img = reader.read(i)
                    FrameSample(r.media_id, i, pixelHash(img), decoded = true)
                  })
                else None
              } finally reader.dispose()
            } else None
          } catch { case _: Exception => None }
        decodedFrames match {
          case Some(fs) => fs.iterator
          case None =>
            Iterator.single(FrameSample(r.media_id, -1, h, decoded = false))
        }
      }
    }
  }

  /** Deterministic hash of a decoded frame's pixel content (ARGB
    * row-major), independent of the BufferedImage's internal raster
    * layout. */
  private def pixelHash(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth
    val argb = img.getRGB(0, 0, w, img.getHeight, null, 0, w)
    val bb = java.nio.ByteBuffer.allocate(argb.length * 4)
    bb.asIntBuffer().put(argb)
    graft.functions.SimHash64.fnv1a64(bb.array())
  }

  /** Per-frame 128-bit perceptual hash of a decoded video frame —
    * [[FrameSample]]'s shape with the pixel hash replaced by the
    * near-dup-capable [[pHash128]]. Quarantine rows: frame_idx = -1,
    * hash 0, decoded = false. */
  final case class FramePHash(media_id: Long, frame_idx: Int,
      ph0: Long, ph1: Long, decoded: Boolean)

  /** Video frame walk like [[sampleFrames]], but each decoded frame is
    * perceptually hashed ([[pHash128]]) instead of pixel-hashed — the
    * fingerprint stage of the video near-dup tier. Codec work rides the
    * scan (embarrassingly parallel); only (media_id, frame_idx, two
    * hash words) rows leave the task — payloads never shuffle. */
  def framePHashes(media: Dataset[MediaRow], stride: Int,
      maxFrames: Int): Dataset[FramePHash] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap { r =>
        val decodedFrames =
          try {
            val iis = javax.imageio.ImageIO.createImageInputStream(
              new java.io.ByteArrayInputStream(r.payload))
            val readers = javax.imageio.ImageIO.getImageReaders(iis)
            if (readers.hasNext) {
              val reader = readers.next()
              try {
                reader.setInput(iis)
                val n = reader.getNumImages(true)
                if (n >= 1)
                  Some((0 until n by stride).take(maxFrames).map { i =>
                    val (h0, h1) = pHash128(reader.read(i))
                    FramePHash(r.media_id, i, h0, h1, decoded = true)
                  })
                else None
              } finally reader.dispose()
            } else None
          } catch { case _: Exception => None }
        decodedFrames match {
          case Some(fs) => fs.iterator
          case None =>
            Iterator.single(FramePHash(r.media_id, -1, 0L, 0L, decoded = false))
        }
      }
    }
  }

  /** Video near-duplicate pairs by FRAME VOTE — the standard video
    * near-dup shape composed from parts this engine already has: sample
    * frames → per-frame perceptual hash ([[framePHashes]]) → banded
    * hamming join over the frame hashes
    * ([[graft.ops.Dedup.hammingPairs128]] with `frame_idx` threaded
    * through as join payload) → count DISTINCT matched min-side frames
    * per pair, keep pairs agreeing on ≥ `minFrames`. Counting frame
    * indices rather than matched hash values keeps the vote honest on
    * real footage: repeated still frames within one video (identical
    * hashes) vote once per frame slot they actually fill, and one frame
    * matching two near-identical-but-distinct hashes of the other video
    * votes once, not twice. Only (frame-hash band, id, hash words,
    * frame_idx) rows shuffle — never frames or payloads — and the final
    * vote is one keyed distinct-count over the (already sparse) match
    * rows. */
  def videoFpPairs(frames: DataFrame, maxHamming: Int = 3,
      minFrames: Int = 3): DataFrame =
    graft.ops.Dedup.hammingPairs128Unordered(
      frames.select(col("media_id").as("doc_id"),
        col("ph0").as("sh0"), col("ph1").as("sh1"), col("frame_idx")),
      maxHamming, extra = Seq("frame_idx"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(countDistinct(col("frame_idx_a")).as("n_frames"))
      .filter(col("n_frames") >= minFrames)
      .orderBy(col("id_a"), col("id_b"))

  /** Synthetic REAL-GIF corpus for the video near-dup tier (doc_id % 3
    * == 2, the same id stripe as [[videoGifMedia]] — a near-dup-
    * STRUCTURED alternative to that fixture's frame-count oracle): each
    * video carries 4 CLASS-SHARED content frames (class = doc_id % 5,
    * frame textures seeded by (class, frame)) plus ONE doc-unique tail
    * frame, all 32×32 grayscale textures at a per-document BRIGHTNESS
    * offset. Frames are TYPE_BYTE_INDEXED over an explicit 256-gray
    * palette, so the GIF encode is LOSSLESS (the JDK writer keeps an
    * indexed image's own color table; RGB input would be quantized to
    * the default web-safe palette, breaking the DC-only-shift
    * invariance). Same-class videos therefore share 4 frame pHashes
    * exactly (brightness cancels in the mean-centered hash) while the
    * unique tail frame never matches — the frame-vote pair frame is an
    * exact function of doc_id classes for the DuckDB oracle
    * (n_frames = 4 per same-class pair). */
  def videoNearDupMedia(spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    documents.select(col("doc_id"), col("source"))
      .filter(pmod(col("doc_id"), lit(3)) === 2)
      .repartition(spark.sparkContext.defaultParallelism) // codec stage
      .as[(Long, String)]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (docId, source) =>
          val cls = (docId % 5).toInt
          val jitter = (((docId / 5) % 5).toInt - 2) * 5 // −10..+10
          // shared seeds 0..79 (class·16 + frame); unique seeds ≥ 10⁶ —
          // disjoint ranges, so no texture ever repeats across roles
          val frames = (0 until 4).map(f =>
            textureImageIndexed(cls * 16L + f, jitter)) :+
            textureImageIndexed(1000000L + docId, jitter)
          MediaRow(docId, "video", animatedGifOf(frames), source)
        }
      }
  }

  /** The texture family's per-pixel gray: FNV-mix (seed, x, y), map into
    * [78, 178], add the brightness jitter. ONE definition shared by the
    * RGB and indexed renderers — the cross-fixture claim that video
    * frame content matches the scale soak's texture family rests on the
    * two renderers producing identical rasters, so they must not carry
    * separate copies of this formula. `sb` is the caller's scratch
    * 10-byte buffer (reused across pixels).
    *
    * The splitmix64 FINALIZER after the FNV fold is load-bearing for
    * cross-seed independence, not decoration: raw FNV-1a differences
    * between two seeds propagate AFFINELY through the trailing small
    * (x, y) bytes — when the two post-seed states agree on their low 5
    * bits, every pixel's hash differs by the SAME constant, and if that
    * constant ≡ 0 (mod 101) the two seeds render IDENTICAL rasters
    * (measured: ~1 per few thousand family pairs in the true-growth
    * corpora, each collision welding two unrelated families into one
    * pHash class). Full avalanche breaks the affine structure, making
    * whole-raster collisions ~101⁻¹⁰²⁴ instead of structural. */
  private def textureGray(sb: java.nio.ByteBuffer, seed: Long,
      x: Int, y: Int, jitter: Int): Int = {
    sb.clear()
    sb.putLong(seed).put(x.toByte).put(y.toByte)
    val mixed = graft.functions.SimHash64.mix64(
      graft.functions.SimHash64.fnv1a64(sb.array()))
    78 + java.lang.Long.remainderUnsigned(mixed, 101L).toInt + jitter
  }

  /** [[textureImage]] rendered as TYPE_BYTE_INDEXED over an explicit
    * full 256-gray palette — the raster shape GIF encodes losslessly
    * (the writer copies an indexed image's color table verbatim). */
  private[graft] def textureImageIndexed(seed: Long, jitter: Int): java.awt.image.BufferedImage = {
    val n = 32
    val grays = Array.tabulate(256)(i => i.toByte)
    val icm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
    val img = new java.awt.image.BufferedImage(n, n,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
    val raster = img.getRaster
    val sb = java.nio.ByteBuffer.allocate(10)
    var y = 0
    while (y < n) {
      var x = 0
      while (x < n) {
        raster.setSample(x, y, 0, textureGray(sb, seed, x, y, jitter))
        x += 1
      }
      y += 1
    }
    img
  }

  /** Encode arbitrary frames as a real animated GIF (JDK writer,
    * sequence API) — the frame-content twin of [[animatedGif]]. */
  private[graft] def animatedGifOf(frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach { img =>
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    baos.toByteArray
  }

  /** DataFrame-level metadata extraction over a binary payload column —
    * the no-decode fast path (byte length + md5), fully oracle-checkable
    * since both engines hash the same bytes. */
  def payloadMeta(media: DataFrame): DataFrame =
    media.select(
      col("media_id"),
      col("kind"),
      octet_length(col("payload")).cast("long").as("n_bytes"),
      md5(col("payload")).as("content_md5"))

  /** Video fixture with REAL multi-frame payloads: every `video`-kind
    * document (doc_id % 3 == 2) carries an actual animated GIF, encoded
    * per-row with the JDK GIF writer's sequence API, with
    * `1 + doc_id % 7` frames of 8×8 pixels. The frame count is a pure
    * function of doc_id, so a SQL oracle can predict exactly what the
    * REAL container decode must find — the decode is honest, the
    * expectation is still hash-checkable. Frame pixels are flat
    * GIF-palette-safe colors (web-safe cube, exactly representable in the
    * encoder's palette) derived from (doc_id, frame), so frame hashes are
    * deterministic too (asserted in MultimodalSpec, not SQL-predictable).
    * Per-row encode work rides inside `mapPartitions` — embarrassingly
    * parallel, no shuffle. */
  def videoGifMedia(spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    documents.select(col("doc_id"), col("source"))
      .filter(pmod(col("doc_id"), lit(3)) === 2)
      .as[(Long, String)]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (docId, source) =>
          val nFrames = (1 + docId % 7).toInt
          MediaRow(docId, "video", animatedGif(docId, nFrames), source)
        }
      }
  }

  /** Encode an n-frame 8×8 animated GIF (JDK writer, sequence API). */
  private def animatedGif(seed: Long, nFrames: Int): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      (0 until nFrames).foreach { f =>
        val img = new java.awt.image.BufferedImage(8, 8,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        // web-safe color (6×6×6 cube, channel values k·51): survives GIF
        // palette quantization bit-exactly, keeping frame hashes stable
        val mix = seed * 31 + f
        val rgb = ((mix % 6) * 51 << 16 | ((mix / 6) % 6) * 51 << 8 |
          ((mix / 36) % 6) * 51).toInt
        (0 until 8).foreach(y => (0 until 8).foreach(x => img.setRGB(x, y, rgb)))
        writer.writeToSequence(
          new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    baos.toByteArray
  }

  /** Build a synthetic media table from `documents` (text bytes as payload)
    * — fixture glue so multimodal plumbing is exercisable on the shipped
    * test data without binary fixtures. */
  def mediaFromDocuments(spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    documents.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      to_binary(col("text"), lit("utf-8")).as("payload"),
      col("source"))
      .as[MediaRow]
  }

  /** 128-bit perceptual hash of a decoded image, carried as two BIGINT
    * words ([[graft.ops.Dedup.hammingPairs128]]'s input shape).
    * `decoded = false` quarantines undecodable payloads (hash 0). */
  final case class PHashRow(media_id: Long, ph0: Long, ph1: Long, decoded: Boolean)

  /** Synthetic REAL-PNG corpus for the perceptual-dedup tier (doc_id % 3
    * == 1, disjoint from the GIF video tier's % 3 == 2): each document
    * renders one of five 32×32 grayscale pseudorandom TEXTURES
    * (`doc_id % 5`, [[patternImage]]'s FNV-mixed rasters with base gray
    * in [78, 178]) at a per-document BRIGHTNESS offset (`(doc_id / 5) %
    * 5` → −10..+10 gray levels — never clamping, since 68..188 stays
    * inside [0, 255]). PNG is
    * lossless, so the decode returns the exact raster — and a uniform
    * brightness shift moves ONLY the DCT DC coefficient, leaving every AC
    * coefficient bit-identical: same-pattern documents get the SAME
    * perceptual hash (hamming 0) from genuinely different payload bytes,
    * which is precisely the near-dup-but-not-byte-dup structure a pHash
    * screen exists to catch. The pair set is therefore an exact function
    * of doc_id classes — the DuckDB oracle predicts it without decoding
    * a pixel. */
  def imagePngMedia(spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    documents.select(col("doc_id"), col("source"))
      .filter(pmod(col("doc_id"), lit(3)) === 1)
      // the fixture often arrives as ONE parquet file; per-row codec work
      // (PNG encode here, decode+DCT downstream) must not inherit that
      // single partition — spread it across the cluster before the
      // mapPartitions stage
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, String)]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (docId, source) =>
          val cls = (docId % 5).toInt
          val jitter = (((docId / 5) % 5).toInt - 2) * 5 // −10..+10
          MediaRow(docId, "image", pngBytes(patternImage(cls, jitter)), source)
        }
      }
  }

  /** One of five fixed 32×32 grayscale TEXTURES — a deterministic
    * pseudorandom raster per class (FNV-mixed (cls, x, y) → gray in
    * [78, 178]). Pseudorandom content is the robust choice for a
    * sign-based hash: geometric patterns (ramps, checkers) concentrate
    * their energy in a few DCT coefficients and can collide in the SIGN
    * domain (a horizontal and a vertical ramp hash identically when the
    * shared-texture signs dominate), while independent rasters give
    * sign-generic coefficients everywhere — expected cross-class hamming
    * ≈ 64 of the 128 bits. `jitter` (±10, never clamping) stays a pure
    * constant brightness shift, which the mean-centered hash cancels
    * exactly. */
  private def patternImage(cls: Int, jitter: Int): java.awt.image.BufferedImage = {
    val n = 32
    val img = new java.awt.image.BufferedImage(n, n,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < n) {
      var x = 0
      while (x < n) {
        val mixed = graft.functions.SimHash64.fnv1a64(
          Array((cls + 1).toByte, x.toByte, y.toByte))
        val base = 78 + (java.lang.Long.remainderUnsigned(mixed, 101L)).toInt
        val g = base + jitter
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    img
  }

  /** [[patternImage]] with a FULL 64-bit seed (the class-byte variant
    * caps families at 256 — fine for the 5-class fixture, useless for a
    * TRUE-growth corpus whose family count grows with n). Same FNV
    * texture construction and [78, 178] range; used by the scale soak's
    * generated image corpora and the video fixture's frame content. */
  private[graft] def textureImage(seed: Long, jitter: Int): java.awt.image.BufferedImage = {
    val n = 32
    val img = new java.awt.image.BufferedImage(n, n,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val sb = java.nio.ByteBuffer.allocate(10)
    var y = 0
    while (y < n) {
      var x = 0
      while (x < n) {
        val g = textureGray(sb, seed, x, y, jitter)
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    img
  }

  private[graft] def pngBytes(img: java.awt.image.BufferedImage): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Decode + 128-bit perceptual hash, batch-per-partition like
    * [[imageFeatures]]. Real codec parse (javax.imageio); undecodable
    * payloads quarantine as (0, 0, decoded = false). Feed the decoded
    * rows to [[graft.ops.Dedup.hammingPairs128]] for the banded near-dup
    * join — only (id, hash-words) rows ever shuffle, payloads stay in
    * the scan. */
  def pHashes(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[PHashRow] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image").mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val img =
            try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload)))
            catch { case _: Exception => None }
          img match {
            case Some(im) =>
              val (h0, h1) = pHash128(im)
              PHashRow(r.media_id, h0, h1, decoded = true)
            case None => PHashRow(r.media_id, 0L, 0L, decoded = false)
          }
        }
      }
    }
  }

  /** One-time-per-JVM PERSISTED pHash near-dup pair table — the
    * [[graft.ops.Dedup.charJaccardPairsPersisted]] economics applied to
    * the image tier: the expensive artifact of an image near-dup pass is
    * the decode → DCT pHash → banded-hamming pair generation, and a real
    * pipeline materializes it once at ingest, then runs clusters,
    * survivor lists and audits as cheap reads over it. Rows are exactly
    * the lazy `q_phash_pairs` frame, so readers share its closed-form
    * oracle. */
  def pHashPairsPersisted(spark: SparkSession, dir: String,
      documents: => DataFrame): DataFrame =
    graft.sources.ManagedTable.persisted(spark,
      "phash_pairs_" + graft.sources.ManagedTable.tag(dir)) {
      import spark.implicits._
      graft.ops.Dedup.hammingPairs128(
        pHashes(imagePngMedia(spark, documents))
          .filter(_.decoded).toDF()
          .select(col("media_id").as("doc_id"),
            col("ph0").as("sh0"), col("ph1").as("sh1")),
        maxHamming = 3)
    }

  /** One-time-per-JVM PERSISTED image-family label table (connected
    * components over [[pHashPairsPersisted]]) — the image twin of
    * [[graft.ops.Dedup.nearDupClustersPersisted]]: a reader of image
    * families must not pay per-query PNG decode plus O(log n) CC
    * re-convergence when the labeling is an ingest-side derivation.
    * Rows are exactly the lazy build's output, so readers share its
    * oracle. */
  def pHashClustersPersisted(spark: SparkSession, dir: String,
      documents: => DataFrame): DataFrame =
    graft.sources.ManagedTable.persisted(spark,
      "phash_clusters_" + graft.sources.ManagedTable.tag(dir)) {
      graft.ops.Dedup.nearDupClusters(
        documents.filter(pmod(col("doc_id"), lit(3)) === 1)
          .select(col("doc_id")),
        pHashPairsPersisted(spark, dir, documents))
    }

  /** 128-bit spectral audio fingerprint of a decoded clip, as two BIGINT
    * words ([[graft.ops.Dedup.hammingPairs128]]'s input shape).
    * `decoded = false` quarantines undecodable payloads (fp 0). */
  final case class AudioFpRow(media_id: Long, afp0: Long, afp1: Long, decoded: Boolean)

  /** Synthetic REAL-WAV corpus for the audio near-dup tier (doc_id % 3
    * == 0, disjoint from the PNG % 3 == 1 and GIF % 3 == 2 tiers): each
    * document renders one of five fixed pseudorandom PCM waveforms
    * (`doc_id % 5` — FNV-mixed (class, sample) → 16-bit samples in
    * [−6000, 6000]) at a per-document integer GAIN (`1 + (doc_id / 5) %
    * 5`, peaks ≤ 30000 so nothing clips). WAV/PCM is lossless and the
    * gain is an exact integer multiply, so same-class clips are the same
    * signal at different loudness — the invariance class a spectral
    * fingerprint must collapse ([[audioFingerprints]]) — from genuinely
    * different payload bytes. The pair frame is again an exact function
    * of doc_id classes for the DuckDB oracle. */
  def audioWavMedia(spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    documents.select(col("doc_id"), col("source"))
      .filter(pmod(col("doc_id"), lit(3)) === 0)
      .repartition(spark.sparkContext.defaultParallelism) // codec stage
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (docId, source) =>
          val cls = (docId % 5).toInt
          val gain = 1 + ((docId / 5) % 5).toInt // 1..5, exact multiply
          MediaRow(docId, "audio", wavBytes(classWaveform(cls, gain)), source)
        }
      }
  }

  /** TRUE-GROWTH media corpora for the scale soak — same codec paths,
    * role stripes and invariance classes as the 5-class fixtures, but
    * family id = `doc_id DIV block` with the full-64-bit-seed texture /
    * waveform generators, so family HEIGHT stays constant (~block/3
    * members after the mod-3 stripe filter) at ANY corpus size and
    * near-dup pair output grows LINEARLY with n. The replication soak
    * cannot measure this regime: replicating the 5-class fixture grows
    * every class with the corpus, which grows within-class pairs
    * quadratically — an output artifact, not a plan property. Seed
    * ranges (1.0e9 / 1.1e9 / 2.0e9 + fam·16 / 3.0e9 + doc) are disjoint
    * from each other and from the fixtures', so no texture or waveform
    * ever repeats across roles. */
  def imagePngMediaTrueGrowth(spark: SparkSession, documents: DataFrame,
      block: Int = 15): Dataset[MediaRow] = {
    import spark.implicits._
    documents.select(col("doc_id"), col("source"))
      .filter(pmod(col("doc_id"), lit(3)) === 1)
      .repartition(spark.sparkContext.defaultParallelism) // codec stage
      .as[(Long, String)]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (docId, source) =>
          val fam = 1000000000L + docId / block
          val jitter = (((docId / 5) % 5).toInt - 2) * 5 // −10..+10
          MediaRow(docId, "image", pngBytes(textureImage(fam, jitter)), source)
        }
      }
  }

  /** [[imagePngMediaTrueGrowth]] for the audio tier: per-family seeded
    * waveform at a per-document gain (the loudness-invariance class). */
  def audioWavMediaTrueGrowth(spark: SparkSession, documents: DataFrame,
      block: Int = 15): Dataset[MediaRow] = {
    import spark.implicits._
    documents.select(col("doc_id"), col("source"))
      .filter(pmod(col("doc_id"), lit(3)) === 0)
      .repartition(spark.sparkContext.defaultParallelism) // codec stage
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (docId, source) =>
          val fam = 1100000000L + docId / block
          val gain = 1 + ((docId / 5) % 5).toInt // 1..5, exact multiply
          MediaRow(docId, "audio", wavBytes(seededWaveform(fam, gain)), source)
        }
      }
  }

  /** [[imagePngMediaTrueGrowth]] for the video tier: 4 family-shared
    * frames + one doc-unique tail per video (the frame-vote class). */
  def videoNearDupMediaTrueGrowth(spark: SparkSession, documents: DataFrame,
      block: Int = 15): Dataset[MediaRow] = {
    import spark.implicits._
    documents.select(col("doc_id"), col("source"))
      .filter(pmod(col("doc_id"), lit(3)) === 2)
      .repartition(spark.sparkContext.defaultParallelism) // codec stage
      .as[(Long, String)]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (docId, source) =>
          val fam = docId / block
          val jitter = (((docId / 5) % 5).toInt - 2) * 5 // −10..+10
          val frames = (0 until 4).map(f =>
            textureImageIndexed(2000000000L + fam * 16 + f, jitter)) :+
            textureImageIndexed(3000000000L + docId, jitter)
          MediaRow(docId, "video", animatedGifOf(frames), source)
        }
      }
  }

  private val FpSamples = 2048

  /** Fixed pseudorandom waveform per class, scaled by an integer gain. */
  private def classWaveform(cls: Int, gain: Int): Array[Short] = {
    val out = new Array[Short](FpSamples)
    var i = 0
    while (i < FpSamples) {
      val mixed = graft.functions.SimHash64.fnv1a64(
        Array((cls + 1).toByte, (i >> 8).toByte, i.toByte))
      val base = java.lang.Long.remainderUnsigned(mixed, 12001L).toInt - 6000
      out(i) = (base * gain).toShort // |base·gain| ≤ 30000 < 32768
      i += 1
    }
    out
  }

  /** [[classWaveform]] with a full 64-bit seed (the class byte caps
    * families at 256) — the scale soak's generated audio corpora. The
    * splitmix64 finalizer breaks raw FNV's affine cross-seed correlation
    * (see the textureGray doc: without it, seed pairs with matching
    * low state bits shift every sample's hash by one constant, and a
    * constant ≡ 0 mod 12001 welds two families into one waveform). */
  private[graft] def seededWaveform(seed: Long, gain: Int): Array[Short] = {
    val out = new Array[Short](FpSamples)
    val sb = java.nio.ByteBuffer.allocate(10)
    var i = 0
    while (i < FpSamples) {
      sb.clear()
      sb.putLong(seed).put((i >> 8).toByte).put(i.toByte)
      val mixed = graft.functions.SimHash64.mix64(
        graft.functions.SimHash64.fnv1a64(sb.array()))
      val base = java.lang.Long.remainderUnsigned(mixed, 12001L).toInt - 6000
      out(i) = (base * gain).toShort // |base·gain| ≤ 30000 < 32768
      i += 1
    }
    out
  }

  /** Encode 16-bit mono 8 kHz PCM as a real WAV container (JDK writer). */
  private[graft] def wavBytes(samples: Array[Short]): Array[Byte] =
    wavBytesAt(samples, 8000f)

  /** [[wavBytes]] at an arbitrary sample rate — the resample tier's
    * re-encode. */
  private[graft] def wavBytesAt(samples: Array[Short], rate: Float): Array[Byte] = {
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) { // little-endian per the format below
      pcm(2 * i) = (samples(i) & 0xff).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** Decode + 128-bit spectral fingerprint, batch-per-partition like the
    * other codecs. Real container decode (javax.sound.sampled PCM frame
    * read); undecodable payloads quarantine as (0, 0, decoded = false).
    * Feed decoded rows to [[graft.ops.Dedup.hammingPairs128]] — the same
    * banded near-dup join the image tier uses. */
  /** One resampled clip: container metadata, the exact-integer PCM
    * digests the oracle replicates (`out_sum` = Σ resampled samples,
    * `out_fp` = the h·31+s rolling hash over them in order, wrapping
    * BIGINT), and the re-encoded WAV payload at the reduced rate.
    * Quarantine rows: (-1, -1) rates, zero digests, empty payload,
    * decoded = false. */
  final case class ResampledAudio(media_id: Long, in_rate: Int, out_rate: Int,
      in_frames: Int, out_frames: Int, out_sum: Long, out_fp: Long,
      out_wav: Array[Byte], decoded: Boolean)

  /** REAL audio downsample — [[resizeImages]]' twin for the audio tier:
    * decode the WAV container (javax.sound.sampled), box-average every
    * `factor` consecutive 16-bit samples with EXACT INTEGER arithmetic
    * (TRUNCATING division of the block sum — the shared semantics of
    * JVM `/` and DuckDB `//` for negative sums; floor division would
    * silently disagree between the engines on every negative
    * non-divisible block), re-encode a real WAV at rate / factor. Clips whose frame count or rate is not a multiple
    * of the factor (or that fail to decode, or are not 16-bit mono)
    * quarantine rather than silently windowing — fractional blocks need
    * float kernels and would break the exactness contract.
    *
    * Like the image tier, the fixture waveforms are closed-form in
    * doc_id ([[audioWavMedia]]/classWaveform: sample i =
    * (fnv(cls+1, i div 256, i mod 256) mod 12001 − 6000) · gain), so
    * the DuckDB oracle recomputes every source sample, every block
    * average, and both digests independently — sample-level hash
    * checking. Per-row codec work in `mapPartitions`, no shuffle. */
  def resampleAudio(media: Dataset[MediaRow], factor: Int = 4,
      batchSize: Int = 64): Dataset[ResampledAudio] = {
    import media.sparkSession.implicits._
    require(factor > 0, "decimation factor must be positive")
    media.filter(_.kind == "audio").mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val parsed =
            try {
              val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
                new java.io.ByteArrayInputStream(r.payload))
              val fmt = ais.getFormat
              if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1) None
              else Some((ais.readAllBytes(), fmt.isBigEndian,
                math.round(fmt.getSampleRate)))
            } catch { case _: Exception => None }
          parsed match {
            case Some((bytes, bigEndian, rate))
                if (bytes.length / 2) % factor == 0 && rate % factor == 0 &&
                  bytes.length >= 2 =>
              val n = bytes.length / 2
              val outN = n / factor
              val out = new Array[Short](outN)
              var sum = 0L
              var fp = 0L
              var j = 0
              while (j < outN) {
                var s = 0L
                var t = 0
                while (t < factor) {
                  val i = j * factor + t
                  val (lo, hi) = if (bigEndian) (bytes(2 * i + 1), bytes(2 * i))
                                 else (bytes(2 * i), bytes(2 * i + 1))
                  s += ((hi << 8) | (lo & 0xff)).toShort
                  t += 1
                }
                val px = s / factor // truncating, like the oracle's //
                out(j) = px.toShort
                sum += px
                fp = fp * 31L + px
                j += 1
              }
              ResampledAudio(r.media_id, rate, rate / factor, n, outN,
                sum, fp, wavBytesAt(out, (rate / factor).toFloat), decoded = true)
            case _ =>
              ResampledAudio(r.media_id, -1, -1, 0, 0, 0L, 0L,
                Array.empty[Byte], decoded = false)
          }
        }
      }
    }
  }

  def audioFingerprints(media: Dataset[MediaRow],
      batchSize: Int = 64): Dataset[AudioFpRow] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "audio").mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val pcm =
            try {
              val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
                new java.io.ByteArrayInputStream(r.payload))
              val fmt = ais.getFormat
              if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1) None
              else Some((ais.readAllBytes(), fmt.isBigEndian))
            } catch { case _: Exception => None }
          pcm match {
            case Some((bytes, bigEndian)) =>
              val (f0, f1) = audioFp128(bytes, bigEndian)
              AudioFpRow(r.media_id, f0, f1, decoded = true)
            case None => AudioFpRow(r.media_id, 0L, 0L, decoded = false)
          }
        }
      }
    }
  }

  /** Chromaprint-style 128-bit spectral fingerprint: the first 2048
    * samples (zero-padded if shorter) → radix-2 FFT → 129 adjacent 7-bin
    * band energies over bins 1..903 — strictly inside the positive
    * half-spectrum (bins 1..1023 for n = 2048; DC and the Nyquist bin
    * are skipped, and no band ever sums conjugate-mirrored bins) →
    * bit i = energy(i) > energy(i+1). Band-energy RATIOS are what
    * survive volume changes: scaling the signal scales every energy by
    * gain², so the 128 comparison bits are gain-invariant — the
    * [[audioWavMedia]] fixture's loudness variants hash identically
    * while different waveforms give sign-generic spectra (expected
    * hamming ≈ 64). 128 bits feed 4×32-bit band keys downstream, the
    * corpus-scale shape (a 64-bit fingerprint's 4×16 banding has only
    * 2¹⁶ buckets — random collisions grow n²/65,536; 2³² buckets make
    * them vanishingly rare). */
  private[graft] def audioFp128(pcm: Array[Byte], bigEndian: Boolean): (Long, Long) = {
    val n = FpSamples
    val re = new Array[Double](n)
    val im = new Array[Double](n)
    val nSamples = math.min(n, pcm.length / 2)
    var i = 0
    while (i < nSamples) {
      val (lo, hi) = if (bigEndian) (pcm(2 * i + 1), pcm(2 * i))
        else (pcm(2 * i), pcm(2 * i + 1))
      re(i) = ((hi << 8) | (lo & 0xff)).toShort.toDouble
      i += 1
    }
    fftInPlace(re, im)
    // 129 bands × 7 bins over bins 1..903 (positive half only, DC skipped)
    val bands = new Array[Double](129)
    var b = 0
    while (b < 129) {
      var acc = 0.0
      var k = 1 + b * 7
      val end = k + 7
      while (k < end) { acc += re(k) * re(k) + im(k) * im(k); k += 1 }
      bands(b) = acc
      b += 1
    }
    var w0 = 0L
    var w1 = 0L
    var j = 0
    while (j < 128) {
      if (bands(j) > bands(j + 1)) {
        if (j < 64) w0 |= (1L << j) else w1 |= (1L << (j - 64))
      }
      j += 1
    }
    (w0, w1)
  }

  /** Iterative radix-2 Cooley-Tukey FFT (in place, n = 2^k). */
  private def fftInPlace(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    // bit-reversal permutation
    var j = 0
    var i = 1
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val (wr, wi) = (math.cos(ang), math.sin(ang))
      var base = 0
      while (base < n) {
        var cr = 1.0
        var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val (ur, ui) = (re(base + k), im(base + k))
          val vr = re(base + k + len / 2) * cr - im(base + k + len / 2) * ci
          val vi = re(base + k + len / 2) * ci + im(base + k + len / 2) * cr
          re(base + k) = ur + vr; im(base + k) = ui + vi
          re(base + k + len / 2) = ur - vr; im(base + k + len / 2) = ui - vi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr; cr = ncr
          k += 1
        }
        base += len
      }
      len <<= 1
    }
  }

  /** Classic DCT perceptual hash, MEAN-CENTERED 128-bit variant: luma →
    * 32×32 block-average → subtract the raster mean → 2-D DCT-II → the
    * low-frequency 8×16 corner (128 coefficients) → bit i = coefficient
    * > median of the 128. Pure deterministic double math (same bits on
    * every JVM). The mean-centering is what makes brightness invariance
    * EXACT rather than noise-bounded: for integer gray rasters the mean
    * is sum/1024 (a power-of-two divide — exact in binary floating
    * point), so a raster and its uniformly-shifted copy center to
    * BIT-IDENTICAL inputs and necessarily hash identically — the
    * invariance the [[imagePngMedia]] fixture exercises, with no
    * reliance on coefficient-vs-median gaps exceeding accumulation
    * noise. 128 bits (not the classic 64) so the banded-hamming join
    * downstream gets 4 independent 32-bit band keys — the corpus-scale
    * candidate-volume fix ([[graft.ops.Dedup.hammingPairs128]]). */
  /** DCT-II cosine tables for [[pHash128]] (n = 32): DctCosY(u)(y) and
    * DctCosX(v)(x) hold the exact doubles the former inline
    * `math.cos((2·y+1)·u·π/(2·n))` produced — the expression below is
    * character-identical, so table lookup cannot change a single bit of
    * any coefficient. Built once per JVM (~768 cosines) instead of
    * ~262,144 math.cos calls per frame. */
  private val DctCosY: Array[Array[Double]] = {
    val n = 32
    Array.tabulate(8, n)((u, y) => math.cos((2 * y + 1) * u * math.Pi / (2.0 * n)))
  }
  private val DctCosX: Array[Array[Double]] = {
    val n = 32
    Array.tabulate(16, n)((v, x) => math.cos((2 * x + 1) * v * math.Pi / (2.0 * n)))
  }

  private[graft] def pHash128(im: java.awt.image.BufferedImage): (Long, Long) = {
    val n = 32
    // block-average the luma down to n×n (identity for n×n inputs).
    // One bulk getRGB fetches the whole ARGB raster (a single
    // color-model conversion) instead of a per-pixel virtual call —
    // identical ints, so identical luma doubles in identical order.
    val g = Array.ofDim[Double](n, n)
    val (w, h) = (im.getWidth, im.getHeight)
    val argb = im.getRGB(0, 0, w, h, null, 0, w)
    var by = 0
    while (by < n) {
      var bx = 0
      while (bx < n) {
        val (x0, x1) = ((bx * w) / n, math.max((bx * w) / n + 1, ((bx + 1) * w) / n))
        val (y0, y1) = ((by * h) / n, math.max((by * h) / n + 1, ((by + 1) * h) / n))
        var sum = 0.0
        var cnt = 0
        var y = y0
        while (y < y1) {
          val row = y * w
          var x = x0
          while (x < x1) {
            val rgb = argb(row + x)
            // integer ITU-R 601 luma: deterministic, no float rounding
            sum += (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
              (rgb & 0xff) * 114) / 1000.0
            cnt += 1
            x += 1
          }
          y += 1
        }
        g(by)(bx) = sum / cnt
        bx += 1
      }
      by += 1
    }
    // mean-center: kills the DC term exactly (n² = 1024 is a power of
    // two, so the mean — and hence every centered value — is exact for
    // integer-luma rasters)
    var total = 0.0
    var cy = 0
    while (cy < n) {
      var cx = 0
      while (cx < n) { total += g(cy)(cx); cx += 1 }
      cy += 1
    }
    val mean = total / (n * n)
    cy = 0
    while (cy < n) {
      var cx = 0
      while (cx < n) { g(cy)(cx) -= mean; cx += 1 }
      cy += 1
    }
    // 2-D DCT-II of the 8×16 low-frequency corner only (O(n² · 128)).
    // The cosine factors come from [[DctCosY]]/[[DctCosX]] — per-JVM
    // tables of the IDENTICAL math.cos expressions (same argument
    // arithmetic, so the same doubles bit-for-bit): computing ~262k
    // cosines per frame inline was ~90% of the hash's CPU (r16 bench:
    // the video tier spends its time here, not in the codec walk).
    // Accumulation order and multiply association are unchanged, so
    // every coefficient — and hence every hash bit — is bit-identical.
    val dct = Array.ofDim[Double](8, 16)
    var u = 0
    while (u < 8) {
      val cy = DctCosY(u)
      var v = 0
      while (v < 16) {
        val cx = DctCosX(v)
        var acc = 0.0
        var y = 0
        while (y < n) {
          val gy = g(y)
          val cyy = cy(y)
          var x = 0
          while (x < n) {
            acc += gy(x) * cyy * cx(x)
            x += 1
          }
          y += 1
        }
        dct(u)(v) = acc
        v += 1
      }
      u += 1
    }
    // the (0,0) coefficient is exactly 0 after centering — include it in
    // the median pool like any other coefficient (128 values, lower median)
    val all = (for { uu <- 0 until 8; vv <- 0 until 16 }
      yield dct(uu)(vv)).sorted
    val median = all(63)
    var w0 = 0L
    var w1 = 0L
    var i = 0
    for { uu <- 0 until 8; vv <- 0 until 16 } {
      if (dct(uu)(vv) > median) {
        if (i < 64) w0 |= (1L << i) else w1 |= (1L << (i - 64))
      }
      i += 1
    }
    (w0, w1)
  }
}
