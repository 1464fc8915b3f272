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

  test("imageFeatures: deterministic stub features for image rows only") {
    val feats = Multimodal.imageFeatures(media).collect()
    assert(feats.nonEmpty)
    assert(feats.forall(f => f.width >= 64 && f.height >= 64 && f.n_bytes > 0))
    // re-running yields identical features (stub is deterministic)
    val again = Multimodal.imageFeatures(media).collect()
    assert(feats.sortBy(_.media_id).toSeq == again.sortBy(_.media_id).toSeq)
  }

  test("sampleFrames: stride and cap respected") {
    val frames = Multimodal.sampleFrames(media, stride = 2, maxFrames = 3).collect()
    assert(frames.nonEmpty)
    val byMedia = frames.groupBy(_.media_id)
    byMedia.values.foreach { fs =>
      assert(fs.length <= 3)
      assert(fs.map(_.frame_idx).forall(_ % 2 == 0))
    }
  }

  test("audioFeatures: audio rows only, duration consistent with rate") {
    val feats = Multimodal.audioFeatures(media).collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      assert(f.media_id % 3 == 1) // the audio kind
      assert(Set(8000, 16000, 24000, 32000)(f.sample_rate))
      assert(math.abs(f.duration_s - f.n_samples.toDouble / f.sample_rate) == 0.0)
    }
  }

  test("payloadMeta: byte length matches utf-8 encoding") {
    import org.apache.spark.sql.functions._
    val meta = Multimodal.payloadMeta(media.toDF())
    val docs = Tables.documents(spark, SparkTestBase.sfDir)
      .select(col("doc_id").as("media_id"), octet_length(col("text")).cast("long").as("want"))
    val joined = meta.join(docs, "media_id")
    assert(joined.filter(col("n_bytes") =!= col("want")).count() == 0)
  }
}
