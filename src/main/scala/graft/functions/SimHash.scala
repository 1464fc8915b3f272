package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftGlue
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 64-bit SimHash of a token array — a native Catalyst expression (SURVEY
  * §7.3 custom-`Expression` tier: per-token bit-vote loops are awkward and
  * slow as composed higher-order functions, so this drops one level).
  *
  * Algorithm (Charikar 2002, "Similarity estimation techniques from
  * rounding algorithms"): hash every token to 64 bits; for each bit
  * position, vote +1 if set, −1 if clear, summed over tokens; the SimHash
  * bit is 1 where the vote is positive. Near-duplicate documents differ in
  * few bits (compare with `bit_count(a ^ b)` — hamming distance).
  *
  * Token hashing is FNV-1a 64 over UTF-8 bytes — self-contained,
  * deterministic across JVMs and executors.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash64 expects array<string>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    SimHash64.hashTokens(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.hashTokens($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** The SECOND word of the 128-bit text simhash ([[SimHash64]]'s bit-vote
  * run over `splitmix64(fnv1a64(token))` instead of the raw FNV hash):
  * the splitmix64 finalizer (Steele, Lea & Flood 2014, "Fast splittable
  * pseudorandom number generators" — the mixing function, constants from
  * the published reference implementation) avalanches every input bit
  * into every output bit, so the pair (simhash64, simhash_mix64) behaves
  * as one 128-bit simhash: identical token streams agree on both words,
  * near-duplicates differ in few bits ACROSS the 128, and the 4×32-bit
  * banding of [[graft.ops.Dedup.hammingPairs128]] applies unchanged. */
case class SimHashMix64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash_mix64 expects array<string>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    SimHash64.hashTokensMixed(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.hashTokensMixed($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashMix64 =
    copy(child = newChild)
}

object SimHash64 {

  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L

  /** FNV-1a 64 over a byte slice. */
  def fnv1a64(bytes: Array[Byte]): Long = {
    var h = FnvOffset
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= FnvPrime
      i += 1
    }
    h
  }

  /** Bit-vote SimHash over an ArrayData of UTF8Strings. Null elements are
    * skipped. Called from both interpreted eval and generated code. */
  def hashTokens(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = fnv1a64(arr.getUTF8String(i).getBytes)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** splitmix64 finalizer (mixing constants from Steele/Lea/Flood 2014's
    * reference implementation) — bijective, full-avalanche over 64 bits. */
  def mix64(v: Long): Long = {
    var z = v + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Bit-vote SimHash over `mix64(fnv1a64(token))` — word 2 of the
    * 128-bit text simhash. Same null handling as [[hashTokens]]. */
  def hashTokensMixed(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = mix64(fnv1a64(arr.getUTF8String(i).getBytes))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Column wrapper: `simhash64(tokens)` */
  def simhash64(tokens: Column): Column =
    GraftGlue.toColumn(SimHash64(GraftGlue.toExpression(tokens)))

  /** Column wrapper: `simhash_mix64(tokens)` — word 2 of the 128-bit
    * simhash ([[SimHashMix64]]). */
  def simhashMix64(tokens: Column): Column =
    GraftGlue.toColumn(SimHashMix64(GraftGlue.toExpression(tokens)))
}
