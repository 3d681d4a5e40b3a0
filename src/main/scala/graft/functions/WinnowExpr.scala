package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: winnowing document fingerprints
  * (Schleimer, Wilkerson, Aiken, "Winnowing: Local Algorithms for
  * Document Fingerprinting", SIGMOD 2003 — the MOSS algorithm).
  *
  * Hash every k-byte gram (FNV-1a 64, the family [[TokenSetExpr]]
  * uses), slide a window of `w` consecutive gram hashes, keep the
  * window minimum (rightmost on ties), emit the SORTED DISTINCT
  * selected hashes. The winnowing guarantee: any byte-identical run of
  * at least `w + k − 1` bytes between two documents shares at least
  * one fingerprint — so plagiarism/near-dup detection needs only a
  * set-overlap ([[SortedIntersectCountExpr]] pairs directly), at
  * ~1/((w+1)/2) the cost of comparing every gram.
  *
  * Texts shorter than `k` bytes hash as a single gram; empty/blank
  * input yields the empty set. Normalize (case, whitespace) BEFORE
  * this expression if matches should survive reformatting.
  */
case class WinnowExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 1, "winnow: k must be >= 1")
  require(w >= 1, "winnow: w must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow"

  override def nullSafeEval(input: Any): Any =
    WinnowExpr.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowExpr.compute($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowExpr =
    copy(child = newChild)
}

object WinnowExpr {

  /** Interpreted + codegen shared kernel. */
  def compute(text: UTF8String, k: Int, w: Int): GenericArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)

    // FNV-1a 64 over bytes [i, i+k) (whole text when shorter than k)
    def gram(i: Int, len: Int): Long = {
      var h = 0xcbf29ce484222325L
      var j = i
      val end = i + len
      while (j < end) {
        h ^= (bytes(j) & 0xffL)
        h *= 0x100000001b3L
        j += 1
      }
      h
    }

    val nGrams = if (n < k) 1 else n - k + 1
    val hs = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) { hs(i) = gram(i, math.min(k, n)); i += 1 }

    // winnow: rightmost minimum of each w-window of gram hashes
    val selected = new java.util.TreeSet[java.lang.Long]()
    if (nGrams <= w) {
      var mi = 0
      var j = 1
      while (j < nGrams) { if (hs(j) <= hs(mi)) mi = j; j += 1 }
      selected.add(hs(mi))
    } else {
      var start = 0
      var mi = -1
      while (start + w <= nGrams) {
        if (mi < start) { // previous min slid out: rescan the window
          mi = start
          var j = start + 1
          while (j < start + w) { if (hs(j) <= hs(mi)) mi = j; j += 1 }
        } else if (hs(start + w - 1) <= hs(mi)) {
          mi = start + w - 1 // new entrant is the (rightmost) min
        }
        selected.add(hs(mi))
        start += 1
      }
    }
    val out = new Array[Long](selected.size)
    val it = selected.iterator()
    var m = 0
    while (it.hasNext) { out(m) = it.next(); m += 1 }
    new GenericArrayData(out)
  }
}
