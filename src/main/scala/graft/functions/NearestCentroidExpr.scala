package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: nearest centroid of a double-array
  * column against a FLAT centroid-matrix literal — the k-means /
  * IVF / PQ assignment kernel as one allocation-free loop.
  *
  * The `array_min(array(struct(l2_sq(v, c₀), id₀), …))` composition it
  * replaces materializes k two-field structs plus a k-element array
  * PER ROW before taking the min — at an adaptive cluster count
  * (k ∝ corpus size, [[graft.pipeline.Vec.semDedupPairs]]) that
  * allocation storm made the assignment pass the bottleneck the
  * adaptivity was meant to remove (measured at k=313 on the 10×
  * stress corpus: 10.6 s → sub-second for the identical result).
  *
  * Bit-compatibility contract: per-centroid distance is the SAME
  * left-to-right `Σ(x_i − c_i)²` doubles as [[L2SqExpr]] and the
  * interpreted fold before it; the winner is the lexicographic
  * minimum of (dist, cid) — exactly `array_min` over the structs, and
  * exactly the DuckDB oracle's `row_number() OVER (ORDER BY dist,
  * cl)` replay. Returns `struct(dist: double, cid: int)`; a null
  * array, null element, or dimension mismatch yields null.
  */
case class NearestCentroidExpr(
    child: Expression, cents: Array[Double], ids: Array[Int], dim: Int)
    extends UnaryExpression {

  require(ids.length >= 1, "nearest_centroid: at least one centroid")
  require(cents.length == ids.length * dim,
    "nearest_centroid: flat centroid matrix must be k*dim")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid requires array<double>, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("dist", DoubleType, nullable = false),
    StructField("cid", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_centroid"

  override def nullSafeEval(a: Any): Any =
    NearestCentroidExpr.compute(a.asInstanceOf[ArrayData], cents, ids, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val tmp = ctx.freshName("nc")
      val cRef = ctx.addReferenceObj("cents", cents, "double[]")
      val iRef = ctx.addReferenceObj("ids", ids, "int[]")
      s"""
         |InternalRow $tmp = graft.functions.NearestCentroidExpr.compute($a, $cRef, $iRef, $dim);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp; }
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): NearestCentroidExpr = copy(child = newChild)
}

object NearestCentroidExpr {

  /** Interpreted + codegen shared kernel: argmin over the flat k×dim
    * centroid matrix, lexicographic (dist, cid) tie-break, null on any
    * null element or dimension mismatch. */
  def compute(a: ArrayData, cents: Array[Double], ids: Array[Int],
      dim: Int): InternalRow = {
    if (a.numElements() != dim) return null
    val k = ids.length
    var best = Double.PositiveInfinity
    var bestCid = Integer.MAX_VALUE
    var first = true
    var c = 0
    while (c < k) {
      var s = 0.0
      var i = 0
      val off = c * dim
      while (i < dim) {
        if (a.isNullAt(i)) return null
        val diff = a.getDouble(i) - cents(off + i)
        s += diff * diff
        i += 1
      }
      if (first || s < best || (s == best && ids(c) < bestCid)) {
        best = s; bestCid = ids(c); first = false
      }
      c += 1
    }
    new GenericInternalRow(Array[Any](best, bestCid))
  }
}
