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

  /** Footer-pruning simulator: given a layout expressed as a "file"
    * assignment column, compute the per-file min/max stats a parquet
    * footer would hold for `xCol`/`yCol` and evaluate the conjunctive
    * 2-D range predicate `x ∈ [xLo,xHi] ∧ y ∈ [yLo,yHi]` the way a
    * scan planner does: a file is READ iff BOTH columns' ranges
    * intersect the predicate (either miss skips the file). Returns a
    * single row `(n_files, files_read, rows_scanned, rows_matched)` —
    * the exact I/O a layout buys, without writing a byte.
    *
    * Scale shape: one file-keyed aggregate (map-side combined) + a
    * one-row fold over the file-sized stats table. */
  def skipStats(
      df: DataFrame, fileCol: String, xCol: String, yCol: String,
      xLo: Long, xHi: Long, yLo: Long, yHi: Long): DataFrame = {
    val matched = col(xCol).between(xLo, xHi) && col(yCol).between(yLo, yHi)
    df.groupBy(col(fileCol))
      .agg(count(lit(1)).as("__n"),
        min(col(xCol)).as("__minx"), max(col(xCol)).as("__maxx"),
        min(col(yCol)).as("__miny"), max(col(yCol)).as("__maxy"),
        sum(when(matched, 1L).otherwise(0L)).as("__m"))
      .select(lit(1).as("__g"), col("__n"), col("__m"),
        (col("__minx") <= xHi && col("__maxx") >= xLo &&
          col("__miny") <= yHi && col("__maxy") >= yLo).as("__read"))
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("n_files"),
        sum(when(col("__read"), 1L).otherwise(0L)).as("files_read"),
        sum(when(col("__read"), col("__n")).otherwise(0L))
          .as("rows_scanned"),
        coalesce(sum(col("__m")), lit(0L)).as("rows_matched"))
      .drop("__g")
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
