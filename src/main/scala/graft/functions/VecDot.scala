package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftGlue
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Dot product of two numeric arrays as a native Catalyst expression.
  *
  * Replaces the `zip_with` + `aggregate` composition: higher-order
  * functions evaluate a lambda per element with no codegen, which made the
  * pairwise-similarity operators two orders of magnitude slower than a
  * fused loop. Accumulation is double, left-to-right — element i's product
  * added in index order — exactly the fold the HOF version performed and
  * exactly what DuckDB's `list_dot_product` computes on DOUBLE[], so
  * oracle-checked results are unchanged bit-for-bit.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects array<float|double>, got ${l.catalogString}, ${r.catalogString}")
  }

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any =
    VecDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VecDot.dot($a, $b, ${isFloat(left)}, ${isFloat(right)})")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
}

object VecDot {

  /** Sequential double-accumulated dot product. Called from interpreted
    * eval and generated code. */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }

  /** Column wrapper: `vec_dot(a, b)` */
  def vecDot(a: Column, b: Column): Column =
    GraftGlue.toColumn(VecDot(GraftGlue.toExpression(a), GraftGlue.toExpression(b)))
}
