package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftGlue
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a text, in one native pass:
  * whitespace-tokenize, join each n consecutive tokens with single spaces,
  * emit the distinct shingle set (first-occurrence order). Documents with
  * fewer than n tokens degrade to one whole-document shingle.
  *
  * Replaces a transform(sequence)+slice+concat_ws composition whose
  * interpreted evaluation was O(tokens²) with array boxing per document —
  * the dominant cost of the MinHash pipeline's signature side.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordShingles.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {

  def compute(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toString.trim.split("\\s+")
    val out = new java.util.LinkedHashSet[String]()
    if (toks.length < n) {
      out.add(toks.mkString(" "))
    } else {
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i + n <= toks.length) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out.add(sb.toString)
        i += 1
      }
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(arr)
  }

  /** Column wrapper: `word_shingles(text, n)` */
  def wordShingles(text: Column, n: Int): Column =
    GraftGlue.toColumn(WordShingles(GraftGlue.toExpression(text), n))
}
