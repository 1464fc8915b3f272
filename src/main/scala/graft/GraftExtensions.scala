package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions._
import graft.plans.{AsOfJoinStrategy, NanosTimestampPushdown}

/** Library entry point for SQL-first users:
  * `--conf spark.sql.extensions=graft.GraftExtensions` (or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`) wires the
  * whole engine into a plain session — the nanos-timestamp pushdown
  * optimizer rule, the AsOfJoin planner strategy, and every native sketch
  * kernel as a SQL-callable function, so `SELECT simhash64(text) FROM
  * docs` works with no Scala imports. The programmatic `register(spark)`
  * hooks on the rule/strategy objects remain for DataFrame-API callers;
  * injection here is per-session and idempotent by construction (Spark
  * applies an extensions class once per session build). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(name: String, args: Seq[Expression], i: Int): Int =
    args(i) match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"$name: argument ${i + 1} must be an INT literal, got $other")
    }

  private def exact(name: String, n: Int, args: Seq[Expression]): Unit =
    require(args.size == n, s"$name expects $n arguments, got ${args.size}")

  private def info(name: String, cls: Class[_], usage: String) =
    new ExpressionInfo(cls.getName, null, name, usage, "")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => NanosTimestampPushdown)
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)

    e.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", classOf[SimHash64],
        "simhash64(tokens) - 64-bit SimHash of an array<string> token stream"),
      args => { exact("simhash64", 1, args); SimHash64(args.head) }))

    e.injectFunction((FunctionIdentifier("simhash_mix64"),
      info("simhash_mix64", classOf[SimHashMix64],
        "simhash_mix64(tokens) - word 2 of the 128-bit SimHash (splitmix64-mixed bit-vote)"),
      args => { exact("simhash_mix64", 1, args); SimHashMix64(args.head) }))

    e.injectFunction((FunctionIdentifier("token_fingerprint64"),
      info("token_fingerprint64", classOf[TokenFingerprint64],
        "token_fingerprint64(tokens) - order-sensitive rolling-hash fingerprint"),
      args => { exact("token_fingerprint64", 1, args); TokenFingerprint64(args.head) }))

    e.injectFunction((FunctionIdentifier("fnv1a64"),
      info("fnv1a64", classOf[Fnv1a64Str],
        "fnv1a64(str) - FNV-1a 64-bit hash of a string's UTF-8 bytes (oracle-replicable)"),
      args => { exact("fnv1a64", 1, args); Fnv1a64Str(args.head) }))

    e.injectFunction((FunctionIdentifier("splitmix64"),
      info("splitmix64", classOf[Splitmix64],
        "splitmix64(key) - full-avalanche 64-bit value hash (KMV/order-statistic grade)"),
      args => { exact("splitmix64", 1, args); Splitmix64(args.head) }))

    e.injectFunction((FunctionIdentifier("word_shingles"),
      info("word_shingles", classOf[WordShingles],
        "word_shingles(text, n) - n-word shingle set of a string"),
      args => { exact("word_shingles", 2, args)
        WordShingles(args.head, intLit("word_shingles", args, 1)) }))

    e.injectFunction((FunctionIdentifier("minhash_sig"),
      info("minhash_sig", classOf[MinHashSig],
        "minhash_sig(shingles, k) - k-permutation MinHash signature"),
      args => { exact("minhash_sig", 2, args)
        MinHashSig(args.head, intLit("minhash_sig", args, 1)) }))

    e.injectFunction((FunctionIdentifier("hyperplane_sig"),
      info("hyperplane_sig", classOf[HyperplaneSig],
        "hyperplane_sig(vec, table, bits) - random-hyperplane LSH bucket"),
      args => { exact("hyperplane_sig", 3, args)
        HyperplaneSig(args.head, intLit("hyperplane_sig", args, 1),
          intLit("hyperplane_sig", args, 2)) }))

    e.injectFunction((FunctionIdentifier("char_set_jaccard"),
      info("char_set_jaccard", classOf[CharSetJaccard],
        "char_set_jaccard(a, b) - Jaccard similarity of two strings' character sets"),
      args => { exact("char_set_jaccard", 2, args); CharSetJaccard(args.head, args(1)) }))

    e.injectFunction((FunctionIdentifier("char_set_mask"),
      info("char_set_mask", classOf[CharSetMask],
        "char_set_mask(s) - packed character-class bitmask of a string"),
      args => { exact("char_set_mask", 1, args); CharSetMask(args.head) }))

    e.injectFunction((FunctionIdentifier("mask_jaccard"),
      info("mask_jaccard", classOf[MaskJaccard],
        "mask_jaccard(m1, m2) - Jaccard similarity of two char_set_mask values"),
      args => { exact("mask_jaccard", 2, args); MaskJaccard(args.head, args(1)) }))

    e.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", classOf[VecDot],
        "vec_dot(a, b) - dot product of two array<float> vectors"),
      args => { exact("vec_dot", 2, args); VecDot(args.head, args(1)) }))

    e.injectFunction((FunctionIdentifier("arg_max_cosine"),
      info("arg_max_cosine", classOf[ArgMaxCosine],
        "arg_max_cosine(vec, ids, flat) - id of the max-cosine centroid in a broadcast set"),
      args => { exact("arg_max_cosine", 3, args)
        ArgMaxCosine(args.head, args(1), args(2)) }))

    // Runtime-filter pair (the InjectRuntimeFilter construction, exposed
    // as user-callable SQL): build a bloom over xxhash64 of the dim keys,
    // probe it as a scalar subquery on the fact side — the subquery
    // materializes once before the fact stage, so the fact shuffle only
    // carries rows that can possibly join. No driver-side collect in user
    // code; the bloom binary never exceeds numBits/8 bytes.
    e.injectFunction(GraftExtensions.bloomBuildDef)
    e.injectFunction(GraftExtensions.bloomMightContainDef)
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, XxHash64}
  import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

  private def einfo(name: String, cls: Class[_], usage: String) =
    new ExpressionInfo(cls.getName, null, name, usage, "")

  /** `bloom_build(key[, est_items])` — aggregate a bloom filter binary
    * over xxhash64(key); est_items sizes the filter (default 1 M). */
  val bloomBuildDef: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("bloom_build"),
      einfo("bloom_build", classOf[BloomFilterAggregate],
        "bloom_build(key[, est_items]) - bloom-filter binary over xxhash64(key)"),
      args => {
        require(args.size == 1 || args.size == 2,
          s"bloom_build expects 1-2 arguments, got ${args.size}")
        val est: Long = args.drop(1).headOption match {
          case None => 1000000L
          case Some(Literal(v: Int, _)) => v.toLong
          case Some(Literal(v: Long, _)) => v
          case Some(other) => throw new IllegalArgumentException(
            s"bloom_build: est_items must be an integer literal, got $other")
        }
        new BloomFilterAggregate(new XxHash64(Seq(args.head)), est)
          .toAggregateExpression()
      })

  /** `bloom_might_contain(bloom, key)` — probe; false ⇒ key absent. */
  val bloomMightContainDef: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("bloom_might_contain"),
      einfo("bloom_might_contain", classOf[BloomFilterMightContain],
        "bloom_might_contain(bloom, key) - probe a bloom_build filter"),
      args => {
        require(args.size == 2,
          s"bloom_might_contain expects 2 arguments, got ${args.size}")
        BloomFilterMightContain(args.head, new XxHash64(Seq(args(1))))
      })

  /** Idempotently register the SQL functions into an ALREADY-BUILT session
    * (the extensions class covers sessions built with `withExtensions`;
    * this covers the driver's plain sessions). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Seq(bloomBuildDef, bloomMightContainDef).foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
}
