package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftGlue
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Random-hyperplane (sign-random-projection) LSH signature: `bits`
  * sign-bits of projections onto pseudo-random hyperplanes, packed into a
  * long (Charikar 2002). Hyperplane component for (table, bit, dim) is
  * derived on the fly from splitmix64 — deterministic everywhere, nothing
  * shipped to executors, and one fused pass instead of `bits` interpreted
  * higher-order-function projections.
  */
case class HyperplaneSig(child: Expression, table: Int, bits: Int) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_sig expects array<float|double>, got ${other.catalogString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    HyperplaneSig.compute(input.asInstanceOf[ArrayData], table, bits, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HyperplaneSig.compute($c, $table, $bits, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}

object HyperplaneSig {

  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Uniform hyperplane component in [-1, 1) for (table, bit, dim). */
  private def component(table: Int, bit: Int, dim: Int): Double = {
    val h = splitmix64((table.toLong << 40) ^ (bit.toLong << 20) ^ dim.toLong)
    ((h >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0
  }

  def compute(arr: ArrayData, table: Int, bits: Int, isFloat: Boolean): Long = {
    val n = arr.numElements()
    var sig = 0L
    var b = 0
    while (b < bits) {
      var proj = 0.0
      var i = 0
      while (i < n) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        proj += x * component(table, b, i)
        i += 1
      }
      if (proj >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** Column wrapper: `hyperplane_sig(emb, table, bits)` */
  def hyperplaneSig(emb: Column, table: Int, bits: Int): Column =
    GraftGlue.toColumn(HyperplaneSig(GraftGlue.toExpression(emb), table, bits))
}
