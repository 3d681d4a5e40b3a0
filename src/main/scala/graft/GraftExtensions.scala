package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.SimHash64Expr

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions for SQL use. Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`;
  * `SELECT simhash64(tokens) ...` then resolves like a builtin. The
  * DataFrame API (graft.functions.simhash64) works without
  * registration. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64Expr].getName, "simhash64"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SimHash64Expr(exprs.head)))
  }
}

object GraftExtensions {
  /** Register the same functions on an already-running session (the
    * extensions mechanism only fires at session construction). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.GraftColumnBridge.registerTempFunction(
      spark, "simhash64", exprs => SimHash64Expr(exprs.head))
}
