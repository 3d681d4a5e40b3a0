package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: per-row value counts of a string array,
  * as a `(item, cnt)` struct array sorted by item (binary UTF-8 order —
  * Spark's StringType ordering, so output order is deterministic).
  *
  * The within-row counting primitive for per-row histogram features
  * (token-frequency vectors, per-document gram profiles) where no
  * aggregation boundary is available or wanted. The
  * `aggregate(...)`/`map_concat` higher-order compositions that could
  * express this run interpreted per element and rebuild the
  * accumulator map per step; this is one hash-count pass per row.
  *
  * Deliberately NOT used by the bigram-LM scoring family
  * ([[graft.pipeline.TextAnalysis.bigramCrossEntropy]]): replacing its
  * `explode + groupBy(doc, gram)` with `explode(value_counts(...))`
  * was A/B-measured and LOST on a quiet host — 2.1 vs 1.2 s at sf0.1
  * (transfer scoring, single consumer, so no exchange-reuse
  * confound) and 22.4 vs 18.4 s on the 10× replica corpus. Tungsten's
  * map-side partial aggregation already collapses each document's
  * grams to vocabulary-bounded counts before the exchange (a doc's
  * exploded rows are partition-contiguous), so the shuffle this would
  * avoid is small, and the codegen'd hash aggregate beats a per-row
  * java.util.HashMap on occurrence-count work.
  *
  * Null array → null; null elements are skipped (the engine's gram
  * producers declare containsNull = false).
  */
case class ValueCountsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"value_counts requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "value_counts"

  override def nullSafeEval(input: Any): Any =
    ValueCountsExpr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ValueCountsExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): ValueCountsExpr =
    copy(child = newChild)
}

object ValueCountsExpr {

  /** Interpreted + codegen shared kernel: one hash-count pass, then one
    * sort of the DISTINCT keys (vocabulary-sized, not input-sized). */
  def compute(arr: ArrayData): GenericArrayData = {
    val n = arr.numElements()
    val counts = new java.util.HashMap[UTF8String, Array[Long]]()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val slot = counts.get(s)
        if (slot == null) counts.put(s.clone(), Array(1L)) else slot(0) += 1L
      }
      i += 1
    }
    val keys = counts.keySet().toArray(new Array[UTF8String](counts.size()))
    java.util.Arrays.sort(keys, null)
    val out = new Array[Any](keys.length)
    i = 0
    while (i < keys.length) {
      val k = keys(i)
      out(i) = new GenericInternalRow(
        Array[Any](k, counts.get(k)(0))): InternalRow
      i += 1
    }
    new GenericArrayData(out)
  }
}
