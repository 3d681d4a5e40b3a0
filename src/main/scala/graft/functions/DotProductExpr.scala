package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: dot product of two numeric-array columns
  * in double precision, left-to-right summation.
  *
  * This is the kernel under every cosine/norm/LSH-projection in the
  * similarity and embedding-dedup operators. The `aggregate`/`zip_with`
  * composition it replaces is interpreted per element (Catalyst
  * higher-order functions don't participate in codegen), which made the
  * pairwise-verification stage the bench bottleneck; `doGenCode` emits
  * one static call over the unsafe array data — no boxing, no lambda
  * dispatch, stays inside whole-stage codegen.
  *
  * Semantics match the fold it replaces: mismatched lengths or a null
  * element yield null; summation order is left-to-right (bit-identical
  * to the DuckDB oracle's sequential `list_dot_product`). Float/int
  * elements are widened to double exactly, per element.
  */
case class DotProductExpr(left: Expression, right: Expression)
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
      s"dot_product requires numeric arrays, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // length mismatch / null element
  override def prettyName: String = "dot_product"

  @transient private lazy val (lt, rt) = (tag(left.dataType), tag(right.dataType))

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProductExpr.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], lt, rt,
      elemType(left.dataType), elemType(right.dataType))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dot")
      val ldt = ctx.addReferenceObj("ldt", elemType(left.dataType),
        classOf[DataType].getName)
      val rdt = ctx.addReferenceObj("rdt", elemType(right.dataType),
        classOf[DataType].getName)
      s"""
         |java.lang.Double $tmp = graft.functions.DotProductExpr.compute($a, $b, $lt, $rt, $ldt, $rdt);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

object DotProductExpr {

  /** Interpreted + codegen shared kernel. Type tags: 0=double, 1=float,
    * 2=long, 3=int, 4=short, 5=byte, 6=decimal (element DataType used
    * only for the decimal path). Returns null (boxed) on length
    * mismatch or null element, matching the zip_with/aggregate fold
    * this replaces. */
  def compute(a: ArrayData, b: ArrayData, lt: Int, rt: Int,
      ldt: DataType, rdt: DataType): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += elem(a, i, lt, ldt) * elem(b, i, rt, rdt)
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
