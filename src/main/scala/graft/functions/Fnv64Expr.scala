package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: FNV-1a 64-bit hash of a string column's
  * raw UTF-8 bytes — the SAME hash every other kernel in this package
  * uses internally ([[TokenSetExpr]], [[SimHash64Expr]],
  * [[MinHashSigExpr]], [[WinnowExpr]]), exposed as a scalar.
  *
  * Exists for one reason `xxhash64` cannot serve: FNV-1a is a
  * byte-at-a-time fold of two 64-bit constants, so an external SQL
  * engine can REPLAY it exactly (DuckDB: a `list_reduce` over
  * character codes in 128-bit arithmetic mod 2^64) — which is what
  * lets the fingerprint/winnow/minhash query family carry full DuckDB
  * oracles instead of rows-only checks. Wrap-around multiplication is
  * deliberate and ANSI-safe here: the kernel works on raw longs, not
  * SQL integer ops. */
case class Fnv64Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"fnv64 requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "fnv64"

  override def nullSafeEval(input: Any): Any =
    Fnv64Expr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fnv64Expr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Fnv64Expr =
    copy(child = newChild)
}

object Fnv64Expr {

  /** Interpreted + codegen shared kernel. */
  def compute(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var j = 0
    while (j < bytes.length) {
      h ^= (bytes(j) & 0xffL)
      h *= 0x100000001b3L
      j += 1
    }
    h
  }
}
