package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftGlue
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Order-sensitive 64-bit document fingerprint — a polynomial rolling hash
  * of the token stream: h ← h·31 + fnv1a64(token), wrapping mod 2^64.
  *
  * A native Catalyst expression rather than composed built-ins because the
  * wraparound multiply is exactly what ANSI-mode long arithmetic forbids in
  * SQL expressions (overflow → error); inside the JVM the wrap is the
  * intended semantics, as in every rolling-hash implementation.
  */
case class TokenFingerprint64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"token_fingerprint64 expects array<string>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    TokenFingerprint64.hashTokens(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenFingerprint64.hashTokens($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenFingerprint64 =
    copy(child = newChild)
}

object TokenFingerprint64 {

  /** Rolling hash over an ArrayData of UTF8Strings; null tokens skipped. */
  def hashTokens(arr: ArrayData): Long = {
    var h = 0L
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        h = h * 31L + SimHash64.fnv1a64(arr.getUTF8String(i).getBytes)
      }
      i += 1
    }
    h
  }

  /** Column wrapper: `token_fingerprint64(tokens)` */
  def tokenFingerprint64(tokens: Column): Column =
    GraftGlue.toColumn(TokenFingerprint64(GraftGlue.toExpression(tokens)))
}

/** FNV-1a over a single string's UTF-8 bytes (Fowler–Noll–Vo, the public
  * 64-bit offset/prime constants) — the scalar hash every fuzzy tier here
  * already builds on per-token ([[SimHash64.fnv1a64]]), exposed as its own
  * expression for HASHED FEATURE BUCKETING (importance weighting, hashed
  * classifiers): the DuckDB oracle replicates the same chain with HUGEINT
  * modular arithmetic, so bucket ids agree bit-for-bit across engines —
  * which Spark's own xxhash64/hash cannot offer. Native expression because
  * the wrapping multiply is what ANSI-mode SQL arithmetic rejects. */
case class Fnv1a64Str(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"fnv1a64 expects STRING, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    SimHash64.fnv1a64(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.fnv1a64(($c).getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Fnv1a64Str =
    copy(child = newChild)
}

object Fnv1a64Str {

  /** Column wrapper: `fnv1a64(str)` */
  def fnv1a64(str: Column): Column =
    GraftGlue.toColumn(Fnv1a64Str(GraftGlue.toExpression(str)))
}

/** splitmix64 finalizer as a value hash (Steele, Lea & Flood, "Fast
  * splittable pseudorandom number generators", OOPSLA 2014) — full
  * avalanche on a 64-bit key, unlike FNV-1a over short strings whose high
  * bits barely mix (measurably non-uniform for small decimal ids, which
  * breaks order-statistic sketches like KMV). Native expression because
  * the wrapping multiplies are exactly what ANSI-mode SQL arithmetic
  * rejects; the DuckDB oracle replicates the same chain with HUGEINT
  * modular arithmetic (OracleSql s1–s4).
  */
case class Splitmix64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"splitmix64 expects BIGINT, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    Splitmix64.hash(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Splitmix64.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Splitmix64 =
    copy(child = newChild)
}

object Splitmix64 {

  def hash(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Column wrapper: `splitmix64(key)` */
  def splitmix64(key: Column): Column =
    GraftGlue.toColumn(Splitmix64(GraftGlue.toExpression(key)))
}
