package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression: a string array reduced to its SORTED
  * DISTINCT 64-bit hash set (FNV-1a over raw UTF-8 bytes, the same
  * hash [[SimHash64Expr]] uses).
  *
  * This is the set-similarity preprocessing step: pairwise Jaccard
  * compares hashed longs instead of strings, and because the output is
  * sorted, the pairwise intersection is an O(n+m) merge
  * ([[SortedIntersectCountExpr]]) instead of a per-pair hash set. The
  * `transform(tokens, xxhash64)` + `array_distinct` composition it
  * replaces runs interpreted per element (higher-order functions don't
  * codegen); this emits one static call over the unsafe array. Null
  * elements are skipped.
  */
case class TokenSetExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_set requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_set"

  override def nullSafeEval(input: Any): Any =
    TokenSetExpr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenSetExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenSetExpr =
    copy(child = newChild)
}

object TokenSetExpr {

  /** Interpreted + codegen shared kernel. */
  def compute(tokens: ArrayData): GenericArrayData = {
    val n = tokens.numElements()
    val hs = new Array[Long](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val bytes = tokens.getUTF8String(i).getBytes
        var h = 0xcbf29ce484222325L
        var j = 0
        while (j < bytes.length) {
          h ^= (bytes(j) & 0xffL)
          h *= 0x100000001b3L
          j += 1
        }
        hs(m) = h
        m += 1
      }
      i += 1
    }
    java.util.Arrays.sort(hs, 0, m)
    // in-place dedup of the sorted prefix
    var w = 0
    i = 0
    while (i < m) {
      if (w == 0 || hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, w))
  }
}

/** Native Catalyst expression: size of the intersection of two SORTED
  * long arrays (as produced by [[TokenSetExpr]]) — a single O(n+m)
  * merge per pair, no allocation. The Jaccard numerator for
  * set-similarity pairwise stages; the union size follows for free as
  * `|a| + |b| − |a∩b|`.
  *
  * Inputs MUST be sorted ascending; [[TokenSetExpr]] guarantees it.
  */
case class SortedIntersectCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  private def ok(dt: DataType): Boolean = dt match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count requires two array<bigint>, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCountExpr.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SortedIntersectCountExpr.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCountExpr =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCountExpr {

  /** Two-pointer merge count over sorted arrays (nulls not expected —
    * [[TokenSetExpr]] output has containsNull = false). */
  def compute(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}
