package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: multi-dimensional clustering for scan
  * pruning. At 100 TB the cheapest predicate is the one that never
  * reads the file: parquet footers keep per-file min/max for every
  * column, and the planner skips files whose range misses the filter.
  * A sort on one column makes THAT column's ranges tight and every
  * other column's ranges full-width; interleaving the bits of two
  * columns (a Z-order / Morton curve) makes BOTH columns' per-file
  * ranges tight at once — the standard layout trick (Delta
  * OPTIMIZE ZORDER, Hudi clustering) for tables filtered on more
  * than one dimension.
  */
object Layout {

  /** Morton/Z-value of two non-negative ints: bit `i` of `x` lands at
    * output bit `2i`, bit `i` of `y` at `2i + 1`. Pure literal bit
    * arithmetic — a codegen'd scan-bound projection, replayable
    * verbatim by any SQL engine with shift/AND operators. Inputs must
    * be in `[0, 2^bits)`; callers bucket first ([[zValueBucketed]]
    * does the min-max bucketing). */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "zValue: bits in [1, 31]")
    (0 until bits).map { i =>
      shiftleft(shiftright(x.cast("long"), i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Z-order the frame on two integer columns: range-partition by the
    * interleaved z-value and sort within partitions, so every output
    * file covers a small square-ish tile of (x, y) space — both
    * columns' parquet min/max stats become selective. This is the
    * write-side half; the read-side payoff is automatic (file skip on
    * either column's predicate). */
  def zorderBy(
      df: DataFrame, xCol: String, yCol: String, bits: Int,
      numPartitions: Int): DataFrame = {
    require(numPartitions >= 1, "zorderBy: numPartitions >= 1")
    df.withColumn("__z", zValue(col(xCol), col(yCol), bits))
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
