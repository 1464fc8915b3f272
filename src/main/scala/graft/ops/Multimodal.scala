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

  /** Sampled video frame reference. */
  final case class FrameSample(
      media_id: Long,
      frame_idx: Int,
      frame_hash: Long)

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

  /** Video frame sampling: every `stride`-th frame up to `maxFrames`.
    * Frame count is stub-derived from payload size (≈ one frame per 4 KiB);
    * a real decoder would read container metadata. */
  def sampleFrames(media: Dataset[MediaRow], stride: Int, maxFrames: Int): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").mapPartitions { rows =>
      rows.flatMap { r =>
        // STUB: replace with container demux + frame decode.
        val h = contentHash(r.payload)
        val nFrames = math.max(1, r.payload.length / 4096)
        (0 until nFrames by stride).take(maxFrames).iterator.map { i =>
          FrameSample(r.media_id, i, h ^ (i.toLong * 0x9e3779b97f4a7c15L))
        }
      }
    }
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
