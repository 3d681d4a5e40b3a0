package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
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
  * minimum of (dist, cid) under Spark's TOTAL double ordering
  * (`java.lang.Double.compare`: NaN sorts above +∞, so a NaN distance
  * never beats a finite one) — exactly `array_min` over the structs,
  * and exactly the DuckDB oracle's `row_number() OVER (ORDER BY dist,
  * cl)` replay. Returns `struct(dist: double, cid: int)`. A null
  * array, a null element, or a dimension mismatch nulls EVERY
  * distance equally, and both the old struct ordering (null dist
  * first, tie on cid) and the DuckDB replay (all-NULL dist tie,
  * ORDER BY cl) then assign the LOWEST centroid id — so this kernel
  * returns `struct(null, min cid)` for those rows, never a null
  * struct, exactly like the composition it replaced.
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
    StructField("dist", DoubleType, nullable = true),
    StructField("cid", IntegerType, nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "nearest_centroid"

  // The synthesized case-class equals compares the Array fields by
  // REFERENCE, so two structurally identical instances were never
  // semanticEquals — defeating common-subexpression elimination and
  // plan-fragment reuse (correctness was unaffected; the struct is
  // consumed via a single getField). Compare/hash contents instead.
  override def equals(other: Any): Boolean = other match {
    case o: NearestCentroidExpr =>
      dim == o.dim && child == o.child &&
        java.util.Arrays.equals(cents, o.cents) &&
        java.util.Arrays.equals(ids, o.ids)
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(
    child, Integer.valueOf(dim),
    Integer.valueOf(java.util.Arrays.hashCode(cents)),
    Integer.valueOf(java.util.Arrays.hashCode(ids)))

  override def eval(input: InternalRow): Any =
    NearestCentroidExpr.compute(
      child.eval(input).asInstanceOf[ArrayData], cents, ids, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val cRef = ctx.addReferenceObj("cents", cents, "double[]")
    val iRef = ctx.addReferenceObj("ids", ids, "int[]")
    ev.copy(
      code = code"""
        |${c.code}
        |InternalRow ${ev.value} = graft.functions.NearestCentroidExpr.compute(
        |  ${c.isNull} ? null : ${c.value}, $cRef, $iRef, $dim);
      """.stripMargin,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): NearestCentroidExpr = copy(child = newChild)
}

object NearestCentroidExpr {

  /** Interpreted + codegen shared kernel: argmin over the flat k×dim
    * centroid matrix, lexicographic (dist, cid) tie-break under the
    * TOTAL double order (Double.compare — NaN above +∞, matching
    * Spark's struct min and the SQL ORDER BY replay). A null element
    * or dimension mismatch nulls all distances equally → (null dist,
    * lowest cid), the value the replaced composition produced. */
  def compute(a: ArrayData, cents: Array[Double], ids: Array[Int],
      dim: Int): InternalRow = {
    val k = ids.length
    def allNull: InternalRow = {
      var m = ids(0); var c = 1
      while (c < k) { if (ids(c) < m) m = ids(c); c += 1 }
      new GenericInternalRow(Array[Any](null, m))
    }
    if (a == null || a.numElements() != dim) return allNull
    var i = 0
    while (i < dim) { if (a.isNullAt(i)) return allNull; i += 1 }
    var best = 0.0
    var bestCid = 0
    var first = true
    var c = 0
    while (c < k) {
      var s = 0.0
      i = 0
      val off = c * dim
      while (i < dim) {
        val diff = a.getDouble(i) - cents(off + i)
        s += diff * diff
        i += 1
      }
      val cmp = if (first) -1 else java.lang.Double.compare(s, best)
      if (cmp < 0 || (cmp == 0 && ids(c) < bestCid)) {
        best = s; bestCid = ids(c); first = false
      }
      c += 1
    }
    new GenericInternalRow(Array[Any](best, bestCid))
  }
}
