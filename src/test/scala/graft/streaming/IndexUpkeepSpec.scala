package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.ops.Similarity

/** The live half of the persisted-IVF economics: vectors streamed after
  * the index build must land in the cluster-partitioned assignment table
  * (fixed-centroid assignment — FAISS add-after-train) and be visible to
  * the very next probe query, and the grown table must be EXACTLY what a
  * batch fixed-centroid assignment of the full corpus yields — append
  * upkeep loses nothing to micro-batch boundaries. */
class IndexUpkeepSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("streamed vectors join the index; table equals fixed-centroid batch assignment") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val all = graft.Tables.embeddings(spark, SparkTestBase.sfDir)
      .select(col("vec_id"), col("embedding"))
    val base = all.filter(col("vec_id") % 4 =!= 0)
    val arriving = all.filter(col("vec_id") % 4 === 0)
      .as[(Long, Array[Float])].collect()
    assert(arriving.nonEmpty)

    // index trained + materialized over the BASE corpus only
    val (cName, aName) = Similarity.ivfIndexTableNames(
      spark, "upkeep_spec", base, nCentroids = 16, lloydIters = 1)
    val centroids = spark.table(cName)
    val nBase = spark.table(aName).count()

    val ckpt = java.nio.file.Files.createTempDirectory("upkeep_ckpt").toString
    val mem = MemoryStream[(Long, Array[Float])]
    val q = IndexUpkeep.ivfUpkeepStream(
      mem.toDF().toDF("vec_id", "embedding"), centroids, aName, ckpt)
    try {
      arriving.grouped(math.max(1, arriving.length / 3)).foreach { b =>
        mem.addData(b.toSeq); q.processAllAvailable()
      }
    } finally q.stop()

    // the micro-batch writes go through the stream's cloned session; a
    // reader session drops its cached file listing explicitly (the same
    // refresh any external-writer table needs)
    spark.catalog.refreshTable(aName)
    val grown = spark.table(aName)
    assert(grown.count() == nBase + arriving.length)

    // the grown table == one-shot fixed-centroid assignment of the FULL
    // corpus (same centroids): nothing lost or relabeled across batches
    val oneShot = Similarity.assignToCentroids(all, centroids)
      .select(col("vec_id"), col("cluster"))
    val streamedView = grown.select(col("vec_id"), col("cluster"))
    assert(oneShot.exceptAll(streamedView).count() == 0)
    assert(streamedView.exceptAll(oneShot).count() == 0)

    // freshness: a probe query through the SAME persisted read path sees
    // the streamed vectors (probe itself is a streamed id)
    val probeId = arriving.head._1
    val topk = Similarity.ivfTopKPersisted(spark, "upkeep_spec", base,
      Seq(probeId), k = 5, nCentroids = 16, nProbe = 4, lloydIters = 1)
    val rows = topk.collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Long]("probe_id") == probeId))
  }
}
