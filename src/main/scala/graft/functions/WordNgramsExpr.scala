package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: all sliding word n-grams of a string
  * (whitespace-tokenized, space-joined), optionally distinct.
  *
  * Replaces the JVM-loop UDFs that fed the dedup shingle / decontam /
  * Gopher-repetition explode paths (`wordShinglesUdf`,
  * `wordNgramsAllUdf`): same kernel, but no UDF encoder boundary, so
  * the projection stays inside whole-stage codegen and feeds `explode`
  * without a serialization hop. Tokenization is `trim.split("\\s+")`
  * with empties dropped — byte-identical to the UDFs it replaces (and
  * to the DuckDB oracles' `string_split_regex(trim(text), '\s+')`).
  *
  * `distinct = true` preserves FIRST-occurrence order (shingle-set
  * semantics for Jaccard/MinHash); `distinct = false` keeps every
  * occurrence (counting semantics for repetition stats). Fewer than
  * `n` tokens → empty array.
  */
case class WordNgramsExpr(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {

  require(n >= 1, "word_ngrams: n must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def nullSafeEval(input: Any): Any =
    WordNgramsExpr.compute(input.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WordNgramsExpr.compute($c, $n, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): WordNgramsExpr =
    copy(child = newChild)
}

object WordNgramsExpr {

  private val WS = Pattern.compile("\\s+")

  /** Interpreted + codegen shared kernel. */
  def compute(text: UTF8String, n: Int, distinct: Boolean): GenericArrayData = {
    val toks0 = WS.split(text.toString.trim)
    // "" splits to [""]; drop empties exactly like the former UDFs
    val toks = if (toks0.length == 1 && toks0(0).isEmpty) Array.empty[String] else toks0
    val nGrams = toks.length - n + 1
    if (nGrams <= 0) return new GenericArrayData(Array.empty[Any])
    if (distinct) {
      val seen = new java.util.LinkedHashSet[String](nGrams * 2)
      var i = 0
      while (i < nGrams) {
        seen.add(joinGram(toks, i, n))
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var j = 0
      while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
      new GenericArrayData(out)
    } else {
      val out = new Array[Any](nGrams)
      var i = 0
      while (i < nGrams) {
        out(i) = UTF8String.fromString(joinGram(toks, i, n))
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  private def joinGram(toks: Array[String], start: Int, n: Int): String = {
    if (n == 1) return toks(start)
    var len = n - 1
    var k = 0
    while (k < n) { len += toks(start + k).length; k += 1 }
    val sb = new java.lang.StringBuilder(len)
    k = 0
    while (k < n) {
      if (k > 0) sb.append(' ')
      sb.append(toks(start + k))
      k += 1
    }
    sb.toString
  }
}
