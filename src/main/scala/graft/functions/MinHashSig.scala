package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftGlue
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** k-permutation MinHash signature of a string set, one pass per element
  * (Broder 1997, "On the resemblance and containment of documents").
  *
  * The composed-builtins version (`transform` + `array_min` per hash
  * function) rehashes every shingle k times through interpreted
  * higher-order functions. Here each shingle is hashed once (FNV-1a 64)
  * and the k permutations are derived with a splitmix64-seeded affine
  * family h_i = a_i·h + b_i (wrapping) — the standard universal-hashing
  * construction, O(|set| · k) cheap ALU ops and zero allocation per
  * element.
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSig.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {

  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic affine-permutation parameters; a_i forced odd so the
    * map is a bijection mod 2^64. */
  private def params(k: Int): (Array[Long], Array[Long]) = {
    val a = new Array[Long](k)
    val b = new Array[Long](k)
    var i = 0
    while (i < k) {
      a(i) = splitmix64(2L * i) | 1L
      b(i) = splitmix64(2L * i + 1)
      i += 1
    }
    (a, b)
  }

  // params are tiny; cache per k (k is a plan-time constant, few distinct).
  private val cache = new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()

  def compute(arr: ArrayData, k: Int): ArrayData = {
    val (pa, pb) = cache.computeIfAbsent(k, params)
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = arr.numElements()
    var e = 0
    while (e < n) {
      if (!arr.isNullAt(e)) {
        val h = SimHash64.fnv1a64(arr.getUTF8String(e).getBytes)
        var i = 0
        while (i < k) {
          val v = pa(i) * h + pb(i)
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      e += 1
    }
    new GenericArrayData(mins)
  }

  /** Column wrapper: `minhash_sig(shingles, k)` */
  def minhashSig(shingles: Column, k: Int): Column =
    GraftGlue.toColumn(MinHashSig(GraftGlue.toExpression(shingles), k))
}
