package graft.props

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.SparkTestBase
import graft.ops.Similarity

/** Incremental-SemDeDup decomposition law on random corpora: for ANY
  * vector set, ANY base/delta split, ANY centroid count and ANY threshold,
  * [[graft.ops.Similarity.semanticDedupPairsIncremental]] (broadcast
  * delta-vs-assignment between-join ∪ delta self-join) must equal the
  * UNDECOMPOSED shape — one [[Similarity.assignToCentroids]] pass over the
  * full corpus against the same persisted base-trained centroids, one
  * cluster-local self-join, filtered to delta-touching pairs. Both sides
  * share the argmax/cosine kernels, so what the law pins is the
  * decomposition itself: canonical (least, greatest) ordering, no pair
  * double-emitted across the two legs, no pair lost at cluster
  * boundaries, ties and thresholds agreeing between the joins.
  *
  * Its own Properties object with a reduced case budget: every case
  * persists a base-trained index (two ManagedTable writes) and runs
  * several jobs. Each trial gets a UNIQUE memo dir — ivfIndexPersisted
  * memoizes per (app, dir, params) and reusing a dir would silently pin
  * every later trial to the first trial's centroids. */
object SemDedupIncrProps extends Properties("SemDedupIncr") {
  lazy val spark = SparkTestBase.spark

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(10)

  private val trial = new AtomicInteger(0)

  // components from a small nonzero grid: no all-zero vectors (a zero
  // norm makes every cosine NaN — legal but vacuous), plenty of exact
  // ties for the argmax tie-order to matter
  private val genVec: Gen[Seq[Float]] = for {
    dim <- Gen.const(4)
    vs <- Gen.listOfN(dim, Gen.oneOf(-1.0f, -0.5f, 0.5f, 1.0f))
  } yield vs

  property("incremental == undecomposed base-trained reference for ANY split") =
    forAll(for {
      n <- Gen.choose(3, 12)
      vecs <- Gen.listOfN(n, genVec)
      nBase <- Gen.choose(1, n - 1)
      k <- Gen.choose(2, 4)
      t <- Gen.oneOf(-0.5, 0.0, 0.3, 0.9)
    } yield (vecs, nBase, k, t)) { case (vecs, nBase, k, t) =>
      val schema = StructType(Seq(
        StructField("vec_id", LongType, nullable = false),
        StructField("embedding", ArrayType(FloatType, containsNull = false))))
      import scala.jdk.CollectionConverters._
      val emb = spark.createDataFrame(
        vecs.zipWithIndex.map { case (v, i) => Row(i.toLong, v) }.asJava, schema)
      val isDelta = col("vec_id") >= nBase.toLong
      val dir = s"prop_trial_${trial.incrementAndGet()}"
      val incr = Similarity.semanticDedupPairsIncremental(spark, dir,
        emb.filter(!isDelta), emb.filter(isDelta), t, nCentroids = k,
        lloydIters = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
      val (cents, _) = Similarity.ivfIndexPersisted(spark, dir,
        emb.filter(!isDelta), nCentroids = k, lloydIters = 1,
        suffix = "_base")
      val assigned = Similarity.assignToCentroids(emb, cents)
      import graft.functions.VectorFunctions.{dot, cosinePrenormed}
      val a = assigned.select(col("cluster"), col("vec_id").as("id_a"),
        col("embedding").as("emb_a"), col("nsq").as("nsq_a"))
      val b = assigned.select(col("cluster"), col("vec_id").as("id_b"),
        col("embedding").as("emb_b"), col("nsq").as("nsq_b"))
      val want = a.join(b, Seq("cluster"))
        .filter(col("id_a") < col("id_b"))
        .withColumn("cosine", cosinePrenormed(
          dot(col("emb_a"), col("emb_b")), col("nsq_a"), col("nsq_b")))
        .filter(col("cosine") >= t)
        .filter(col("id_a") >= nBase.toLong || col("id_b") >= nBase.toLong)
        .select(col("id_a"), col("id_b"),
          col("cluster").cast("long").as("cluster"), col("cosine"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
      incr == want
    }
}
