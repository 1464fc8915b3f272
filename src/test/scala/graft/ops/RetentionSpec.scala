package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** [[Dedup.expireRows]]' exactness contract, pinned per persisted index
  * artifact: each is a PER-DOCUMENT derivation independent of the rest of
  * the corpus, so "index of (corpus − expired)" must equal "index minus
  * expired rows" — the property that makes TTL on the index layer one
  * broadcast anti-join instead of a rebuild. The corpus-level statistics
  * that are NOT per-document (BM25's df/N/Σdl) recompose at serve time,
  * gated end-to-end by q_bm25_retire's filtered-corpus oracle. */
class RetentionSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private lazy val docs = graft.Tables.documents(spark, SparkTestBase.sfDir)
  private lazy val expired =
    docs.filter(col("doc_id") % 11 === 0).select(col("doc_id"))
  private lazy val survivors = docs.filter(col("doc_id") % 11 =!= 0)

  private def setEqual(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  test("band-signature index: expiry equals the survivors' index") {
    val pruned = Dedup.expireRows(Dedup.minHashBanded(docs), "doc_id", expired)
    assert(setEqual(pruned, Dedup.minHashBanded(survivors)))
    assert(pruned.filter(col("doc_id") % 11 === 0).isEmpty)
  }

  test("BM25 postings + doclen: expiry equals the survivors' index frames") {
    val (p, d) = Search.indexFrames(docs)
    val (ps, ds) = Search.indexFrames(survivors)
    assert(setEqual(Dedup.expireRows(p, "doc_id", expired), ps))
    assert(setEqual(Dedup.expireRows(d, "doc_id", expired), ds))
  }

  test("IVF assignment under FIXED centroids: expiry equals the survivors' " +
      "assignment (the centroids deliberately stay — train-once contract)") {
    val emb = graft.Tables.embeddings(spark, SparkTestBase.sfDir)
    val expiredVecs = emb.filter(col("vec_id") % 11 === 0).select(col("vec_id"))
    // any fixed centroid frame exercises the contract; a hash-ranked
    // sample keeps the spec free of the persisted-index machinery
    val cents = emb.orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(8)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
      .withColumn("c_nsq",
        graft.functions.VectorFunctions.normSq(col("c_emb")))
      .localCheckpoint(true)
    val pruned = Dedup.expireRows(
      Similarity.assignToCentroids(emb, cents), "vec_id", expiredVecs)
    val rebuilt = Similarity.assignToCentroids(
      emb.filter(col("vec_id") % 11 =!= 0), cents)
    assert(setEqual(pruned.select(col("vec_id"), col("cluster")),
      rebuilt.select(col("vec_id"), col("cluster"))))
  }

  test("128-bit fingerprint index: expiry equals the survivors' fingerprints") {
    // simhash128 stands in for the media tiers' (doc_id, sh0, sh1) shape —
    // identical per-document independence, no codec cost in the spec
    def fp(d: DataFrame) = d.select(col("doc_id"),
      graft.functions.SimHash64.simhash64(Dedup.tokens(col("text"))).as("sh0"),
      graft.functions.SimHash64.simhashMix64(Dedup.tokens(col("text"))).as("sh1"))
    assert(setEqual(Dedup.expireRows(fp(docs), "doc_id", expired),
      fp(survivors)))
  }
}
