package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: all sliding character n-grams of a
  * string, as an array.
  *
  * The `transform(sequence(1, length − n + 1), i → substr(...))`
  * composition it replaces runs interpreted per character (≈2000
  * lambda dispatches per 2 KB document — it made the n-gram language
  * ID query ~40× slower than its shuffle cost); this emits one static
  * call slicing the UTF8String directly. Character-based (not byte),
  * matching SQL `substr` semantics. Shorter-than-n input → empty
  * array.
  */
case class CharNgramsExpr(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "char_ngrams: n must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_ngrams requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_ngrams"

  override def nullSafeEval(input: Any): Any =
    CharNgramsExpr.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharNgramsExpr.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): CharNgramsExpr =
    copy(child = newChild)
}

object CharNgramsExpr {

  /** Interpreted + codegen shared kernel. */
  def compute(text: UTF8String, n: Int): GenericArrayData = {
    val chars = text.numChars()
    if (chars < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](chars - n + 1)
    var i = 0
    while (i <= chars - n) {
      out(i) = text.substringSQL(i + 1, n)
      i += 1
    }
    new GenericArrayData(out)
  }
}
