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

  /** Rebuild `df` — whose analyzed plan must be a `LogicalRDD` leaf,
    * e.g. a `localCheckpoint` result — over `f(backing RDD)`,
    * preserving the leaf's partitioning/ordering/stats via
    * `LogicalRDD.fromDataset` (the same constructor
    * `Dataset.checkpoint` itself uses, so iteration joins keep seeing
    * the pinned hash layout). No leaf → `df` unchanged. */
  def mapCheckpointRdd(
      df: DataFrame,
      f: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow]
        => org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow])
      : DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    ds.queryExecution.analyzed
      .collectFirst { case l: execution.LogicalRDD => l.rdd } match {
      case Some(r) =>
        classic.Dataset.ofRows(ds.sparkSession,
          execution.LogicalRDD.fromDataset(f(r), ds, isStreaming = false))
      case None => df
    }
  }
}
