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
}
