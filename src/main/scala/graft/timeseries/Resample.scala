package graft.timeseries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regularization and gap-filling — the operations qctimeseries users
  * perform right after `qc_apply_flags` turns bad points into NA:
  * resample the irregular series onto a fixed grid, then fill gaps.
  *
  * Scale shapes: resample is one tumbling-window group-by (map-side
  * combined); ffill and interpolation are keyed windows (one shuffle on
  * the key, or on a caller-supplied coarse bucket when there is no
  * series key — the same trade-off as QcAuto's rolling frames).
  */
object Resample {

  /** Tumbling resample: mean/min/max/count of `v` per `widthSecs`
    * bucket keyed by `keys`. Empty buckets are absent (outer-join a
    * calendar spine if a dense grid is needed). */
  def resampleMean(
      df: DataFrame,
      t: String,
      v: String,
      widthSecs: Long,
      keys: Seq[String] = Nil): DataFrame = {
    val bucket = (floor(col(t).cast("double") / widthSecs).cast("long") * widthSecs)
    df.groupBy((keys.map(col) :+ bucket.as("bucket_start_s")): _*)
      .agg(
        avg(col(v)).as("v_mean"),
        min(col(v)).as("v_min"),
        max(col(v)).as("v_max"),
        count(col(v)).as("n"))
  }

  /** Dense variant of [[resampleMean]]: empty buckets are materialized
    * (n = 0, null aggregates) by outer-joining a generated calendar
    * spine covering [min(t), max(t)]. The spine is tiny (one row per
    * bucket) and generated with `sequence` — no driver loop; the join
    * broadcasts the aggregated (small) side onto the spine. */
  def resampleDense(
      df: DataFrame,
      t: String,
      v: String,
      widthSecs: Long): DataFrame = {
    val agg = resampleMean(df, t, v, widthSecs)
    val spine = df
      .agg(
        (floor(min(col(t)).cast("double") / widthSecs).cast("long") * widthSecs)
          .as("__lo"),
        (floor(max(col(t)).cast("double") / widthSecs).cast("long") * widthSecs)
          .as("__hi"))
      .select(explode(sequence(col("__lo"), col("__hi"), lit(widthSecs)))
        .as("bucket_start_s"))
    spine.join(agg, Seq("bucket_start_s"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
  }

  /** OHLC (open/high/low/close) tumbling resample — the bar-chart
    * aggregation every market-data and telemetry pipeline asks of a
    * time-series engine: per `widthSecs` bucket and key, the first
    * value, max, min, last value, and count.
    *
    * Open/close are the first/last NON-NULL observation (market-data
    * convention: a bar whose earliest row is a null reading still
    * opens at its first real value) under `(t, orderCols)` order —
    * `orderCols` should make the order total (at tied timestamps
    * open/close are otherwise arbitrary). Buckets with only null
    * values report n = 0 with null open/high/low/close.
    *
    * The null-skipping first/last fold and the final aggregate share
    * ONE hash exchange on (keys, bucket) and ONE in-partition sort:
    * the groupBy keys equal the window partition keys, and both
    * directions read off the same ascending order (`last` ignoreNulls
    * gives the close). */
  def ohlc(
      df: DataFrame,
      t: String,
      v: String,
      widthSecs: Long,
      keys: Seq[String] = Nil,
      orderCols: Seq[String] = Nil): DataFrame = {
    require(widthSecs > 0, "ohlc: widthSecs must be > 0")
    val bucket = (floor(col(t).cast("double") / widthSecs).cast("long") * widthSecs)
    val withB = df.withColumn("__bucket", bucket)
    val full = Window.partitionBy((keys :+ "__bucket").map(col): _*)
      .orderBy((t +: orderCols).map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    withB
      .withColumn("__open", first(col(v), ignoreNulls = true).over(full))
      .withColumn("__close", last(col(v), ignoreNulls = true).over(full))
      .groupBy(keys.map(col) :+ col("__bucket").as("bucket_start_s"): _*)
      .agg(
        max(col("__open")).as("open"),
        max(col(v)).as("high"),
        min(col(v)).as("low"),
        max(col("__close")).as("close"),
        count(col(v)).as("n"))
  }

  /** Forward fill: nulls in `v` replaced by the last preceding non-null
    * value within the same key partition, in `(t, orderCols)` order. */
  def ffill(
      df: DataFrame,
      t: String,
      v: String,
      keys: Seq[String] = Nil,
      orderCols: Seq[String] = Nil,
      outCol: String = "v_ffill"): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((t +: orderCols).map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(outCol, last(col(v), ignoreNulls = true).over(w))
  }

  /** Linear interpolation: nulls in `v` replaced by the time-weighted
    * line between the previous and next non-null observations within
    * the key partition; leading/trailing gaps stay null (no
    * extrapolation). */
  def interpolateLinear(
      df: DataFrame,
      t: String,
      v: String,
      keys: Seq[String] = Nil,
      orderCols: Seq[String] = Nil,
      outCol: String = "v_interp"): DataFrame = {
    val ord = (t +: orderCols).map(col)
    val back = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val tNum = col(t).cast("double")
    val obs = when(col(v).isNotNull, struct(tNum.as("t"), col(v).as("v")))
    val prev = last(obs, ignoreNulls = true).over(back)
    val next = first(obs, ignoreNulls = true).over(fwd)
    val interp =
      when(col(v).isNotNull, col(v))
        .when(prev.isNotNull && next.isNotNull &&
          next("t") > prev("t"),
          prev("v") + (next("v") - prev("v")) *
            (tNum - prev("t")) / (next("t") - prev("t")))
    df.withColumn(outCol, interp)
  }
}
