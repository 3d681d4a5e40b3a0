package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: SQUARED L2 distance of two numeric-array
  * columns in double precision, left-to-right summation.
  *
  * This is the kernel under k-means assignment (`nearestCentroid`), IVF
  * cell routing and PQ codebook training. The `aggregate(zip_with(a, b,
  * (x, y) => (x-y)*(x-y)), 0.0, _+_)` composition it replaces is
  * interpreted per element (Catalyst higher-order functions don't
  * participate in codegen) — at an adaptive cluster count k the
  * assignment pass evaluates k of these folds per row, which turns the
  * clustering scan into the bottleneck exactly when the corpus grows.
  *
  * Bit-compatibility contract: summation is left-to-right over
  * `(a_i - b_i)^2` with per-element exact widening to double — the
  * SAME doubles, in the SAME order, as the interpreted fold and as the
  * DuckDB oracle replay `list_reduce(list_transform(list_zip(a, b),
  * p -> (p[1]-p[2])*(p[1]-p[2])), (x, y) -> x + y)` (modulo DuckDB's
  * zero init, which adds 0.0 + first — exact in IEEE). Mismatched
  * lengths or a null element yield null, matching the fold.
  */
case class L2SqExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  private def tag(dt: DataType): Int = dt match {
    case ArrayType(DoubleType, _)  => 0
    case ArrayType(FloatType, _)   => 1
    case ArrayType(LongType, _)    => 2
    case ArrayType(IntegerType, _) => 3
    case ArrayType(ShortType, _)   => 4
    case ArrayType(ByteType, _)    => 5
    case ArrayType(_: DecimalType, _) => 6
    case _ => -1
  }

  private def elemType(dt: DataType): DataType =
    dt.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult =
    if (tag(left.dataType) >= 0 && tag(right.dataType) >= 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"l2_sq requires numeric arrays, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // length mismatch / null element
  override def prettyName: String = "l2_sq"

  @transient private lazy val (lt, rt) = (tag(left.dataType), tag(right.dataType))

  override def nullSafeEval(a: Any, b: Any): Any =
    L2SqExpr.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], lt, rt,
      elemType(left.dataType), elemType(right.dataType))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("l2sq")
      val ldt = ctx.addReferenceObj("ldt", elemType(left.dataType),
        classOf[DataType].getName)
      val rdt = ctx.addReferenceObj("rdt", elemType(right.dataType),
        classOf[DataType].getName)
      s"""
         |java.lang.Double $tmp = graft.functions.L2SqExpr.compute($a, $b, $lt, $rt, $ldt, $rdt);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2SqExpr =
    copy(left = newLeft, right = newRight)
}

object L2SqExpr {

  /** Interpreted + codegen shared kernel; type tags as in
    * [[DotProductExpr.compute]]. */
  def compute(a: ArrayData, b: ArrayData, lt: Int, rt: Int,
      ldt: DataType, rdt: DataType): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = elem(a, i, lt, ldt) - elem(b, i, rt, rdt)
      s += d * d
      i += 1
    }
    s
  }

  private def elem(arr: ArrayData, i: Int, t: Int, dt: DataType): Double = t match {
    case 0 => arr.getDouble(i)
    case 1 => arr.getFloat(i).toDouble
    case 2 => arr.getLong(i).toDouble
    case 3 => arr.getInt(i).toDouble
    case 4 => arr.getShort(i).toDouble
    case 5 => arr.getByte(i).toDouble
    case _ =>
      val d = dt.asInstanceOf[DecimalType]
      arr.getDecimal(i, d.precision, d.scale).toDouble
  }
}
