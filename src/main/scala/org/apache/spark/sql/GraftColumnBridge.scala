package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ catalyst-Expression bridge for the engine's native
  * expressions. Spark 4 made `ExpressionUtils` private[sql]; this
  * one-file shim in the sql package is the conventional way for
  * external libraries to lift a custom `Expression` into the public
  * `Column` API without registering it in a FunctionRegistry. */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a temp SQL function on a LIVE session (the
    * SparkSessionExtensions path only applies at session build time —
    * getOrCreate on an existing session silently skips it). */
  def registerTempFunction(
      spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
