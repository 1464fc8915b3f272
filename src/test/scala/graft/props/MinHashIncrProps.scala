package graft.props

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.SparkTestBase
import graft.ops.Dedup

/** Incremental-MinHash decomposition law on random corpora: for ANY
  * document set and ANY base/delta split,
  * [[graft.ops.Dedup.minHashPairsIncremental]] (persisted-band-index
  * between-join ∪ delta self-join, endpoint-only verify) must equal the
  * full [[Dedup.minHashPairs]] run restricted to delta-touching pairs —
  * signatures are corpus-independent, so this is an exact equality, not
  * a recall statement. What the law pins is the composition: no pair
  * double-emitted across the legs, no candidate lost between the index
  * and the self-join, the endpoint-pruned verify agreeing with the
  * full-corpus verify on the identical jaccard doubles.
  *
  * Reduced case budget (each trial persists a band index — unique memo
  * dir per trial, or ManagedTable would pin later trials to the first
  * trial's corpus). Texts draw from a tiny vocabulary with long
  * repeated runs so shingle overlap — and therefore band collisions and
  * threshold crossings — are common rather than adversarially rare. */
object MinHashIncrProps extends Properties("MinHashIncr") {
  lazy val spark = SparkTestBase.spark

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(10)

  private val trial = new AtomicInteger(0)

  private val genText: Gen[String] = for {
    len <- Gen.choose(4, 10)
    toks <- Gen.listOfN(len, Gen.oneOf("alpha", "beta", "gamma", "delta"))
  } yield toks.mkString(" ")

  property("incremental == full run's delta-touching slice for ANY split") =
    forAll(for {
      n <- Gen.choose(3, 14)
      texts <- Gen.listOfN(n, genText)
      nBase <- Gen.choose(1, n - 1)
    } yield (texts, nBase)) { case (texts, nBase) =>
      import spark.implicits._
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t, "en", "s") }
        .toDF("doc_id", "text", "lang", "source")
      val isDelta = col("doc_id") >= nBase.toLong
      val dir = s"mh_prop_trial_${trial.incrementAndGet()}"
      val incr = Dedup.minHashPairsIncremental(spark, dir,
        docs.filter(!isDelta), docs.filter(isDelta))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val full = Dedup.minHashPairs(docs)
        .filter(col("id_a") >= nBase.toLong || col("id_b") >= nBase.toLong)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      incr == full
    }
}
