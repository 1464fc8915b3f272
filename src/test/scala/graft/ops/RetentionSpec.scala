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

  test("minHashPairsIncremental(expiredIds): a retired base doc can no " +
      "longer pair with arrivals; survivors still can") {
    import spark.implicits._
    // base: 1 and 2 share (near-)identical text; delta doc 100 re-sends it.
    // Without retirement the arrival pairs with BOTH; retiring 1 must
    // drop exactly the (1, 100) pair — the serving-path TTL bite.
    val t = "the quick brown fox jumps over the lazy dog again and again"
    val base = Seq((1L, t, "en", "s"), (2L, t + " x", "en", "s"),
      (3L, "completely unrelated words that share nothing at all here", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val delta = Seq((100L, t, "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val dir = "retspec_minhash" // keys the persisted tables for this corpus
    def pairs(expired: Option[org.apache.spark.sql.DataFrame]) =
      Dedup.minHashPairsIncremental(spark, dir, base, delta,
        expiredIds = expired)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val all = pairs(None)
    assert(all.contains((1L, 100L)) && all.contains((2L, 100L)),
      s"fixture must pair the arrival with both base docs, got $all")
    val retired = pairs(Some(Seq(1L).toDF("doc_id")))
    assert(retired == all - ((1L, 100L)),
      s"retiring doc 1 must drop exactly its pair: $retired")
  }

  test("semanticDedupPairsIncremental(expiredIds): a retired base vector " +
      "can no longer pair with arrivals; survivors still can") {
    import spark.implicits._
    def v(x: Double, y: Double) = Array(x.toFloat, y.toFloat, 0f, 0f)
    // base: 1 and 2 point the same way; delta 100 re-sends that direction.
    // nCentroids = 1 puts everything in one cluster, so the pair set is
    // exactly the over-threshold cosine pairs — no seeding sensitivity.
    val base = Seq((1L, v(1, 0), 0), (2L, v(0.995, 0.1), 0), (3L, v(0, 1), 1))
      .toDF("vec_id", "embedding", "label")
    val delta = Seq((100L, v(1, 0.05), 0)).toDF("vec_id", "embedding", "label")
    def pairs(e: Option[org.apache.spark.sql.DataFrame]) =
      Similarity.semanticDedupPairsIncremental(spark, "retspec_semdedup",
        base, delta, 0.9, nCentroids = 1, expiredIds = e)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val all = pairs(None)
    assert(all.contains((1L, 100L)) && all.contains((2L, 100L)),
      s"fixture must pair the arrival with both aligned base vectors: $all")
    val retired = pairs(Some(Seq(1L).toDF("vec_id")))
    assert(retired == all - ((1L, 100L)),
      s"retiring vector 1 must drop exactly its pair: $retired")
  }

  test("physical rewrite (ManagedTable.rewriteExpired): the rewritten " +
      "table equals the serve-time anti-join, layout preserved") {
    val tag = "retspec_rw"
    val (p, _) = Search.indexFrames(docs)
    graft.sources.ManagedTable.write(p, s"bm25_postings_$tag",
      partitionCol = Some("shard"))
    graft.sources.ManagedTable.rewriteExpired(spark, s"bm25_postings_$tag",
      "doc_id", expired, partitionCol = Some("shard"))
    val rewritten = spark.table(s"bm25_postings_$tag")
    // rows: exactly the anti-join's (which RetentionSpec already pins
    // equal to the survivors' rebuild)
    assert(setEqual(
      rewritten.select(p.columns.map(col): _*),
      Dedup.expireRows(p, "doc_id", expired)))
    // layout: still shard-partitioned (serve-time pruning must survive),
    // and re-running the same rewrite is an idempotent no-op
    assert(spark.sql(s"SHOW PARTITIONS bm25_postings_$tag").count() > 1,
      "rewrite lost the shard partitioning")
    graft.sources.ManagedTable.rewriteExpired(spark, s"bm25_postings_$tag",
      "doc_id", expired, partitionCol = Some("shard"))
    assert(setEqual(
      spark.table(s"bm25_postings_$tag").select(p.columns.map(col): _*),
      Dedup.expireRows(p, "doc_id", expired)),
      "re-running the rewrite changed rows")
  }

  test("minHashPairsIncrementalRewritten: the rewritten-index serve " +
      "equals the serve-time anti-join bit-for-bit") {
    import spark.implicits._
    val t = "the quick brown fox jumps over the lazy dog again and again"
    val base = Seq((1L, t, "en", "s"), (2L, t + " x", "en", "s"),
      (3L, "completely unrelated words that share nothing at all here", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val delta = Seq((100L, t, "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val expired1 = Seq(1L).toDF("doc_id")
    val dir = "retspec_minhash_rw"
    val antiJoin = Dedup.minHashPairsIncremental(spark, dir, base, delta,
      expiredIds = Some(expired1))
    val rewritten = Dedup.minHashPairsIncrementalRewritten(spark, dir,
      base, delta, expiredIds = expired1)
    assert(setEqual(rewritten, antiJoin))
    assert(rewritten.collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet == Set((2L, 100L)),
      "retired doc 1 must be gone from the rewritten index's pairs")
    // the rewritten copies physically dropped the expired rows
    assert(spark.table("minhash_bands_3_64_16_rwret_retspec_minhash_rw")
      .filter(col("doc_id") === 1L).isEmpty)
    assert(spark.table("minhash_doctext_rwret_retspec_minhash_rw")
      .filter(col("doc_id") === 1L).isEmpty)
  }

  test("semanticDedupPairsIncrementalRewritten: the rewritten-assignment " +
      "serve equals the serve-time anti-join bit-for-bit") {
    import spark.implicits._
    def v(x: Double, y: Double) = Array(x.toFloat, y.toFloat, 0f, 0f)
    val base = Seq((1L, v(1, 0), 0), (2L, v(0.995, 0.1), 0), (3L, v(0, 1), 1))
      .toDF("vec_id", "embedding", "label")
    val delta = Seq((100L, v(1, 0.05), 0)).toDF("vec_id", "embedding", "label")
    val expired1 = Seq(1L).toDF("vec_id")
    val dir = "retspec_semdedup_rw"
    val antiJoin = Similarity.semanticDedupPairsIncremental(spark, dir,
      base, delta, 0.9, nCentroids = 1, expiredIds = Some(expired1))
    val rewritten = Similarity.semanticDedupPairsIncrementalRewritten(spark,
      dir, base, delta, 0.9, expiredIds = expired1, nCentroids = 1)
    assert(setEqual(rewritten, antiJoin))
    assert(rewritten.collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet == Set((2L, 100L)),
      "retired vector 1 must be gone from the rewritten assignment's pairs")
    assert(spark.table("ivf_assign_1_2_rwret_retspec_semdedup_rw")
      .filter(col("vec_id") === 1L).isEmpty)
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
