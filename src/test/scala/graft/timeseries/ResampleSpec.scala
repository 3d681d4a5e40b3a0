package graft.timeseries

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val series = Seq(
    (0L, ts("2024-01-01 00:00:00"), Some(10.0)),
    (1L, ts("2024-01-01 00:10:00"), None),
    (2L, ts("2024-01-01 00:20:00"), None),
    (3L, ts("2024-01-01 00:30:00"), Some(40.0)),
    (4L, ts("2024-01-01 01:05:00"), Some(50.0)),
    (5L, ts("2024-01-01 01:10:00"), None) // trailing gap
  ).toDF("id", "t", "v")

  test("resampleMean: hourly buckets aggregate non-null values only") {
    val out = Resample.resampleMean(series, "t", "v", 3600L)
      .orderBy("bucket_start_s")
      .select("v_mean", "n").as[(Double, Long)].collect()
    assert(out.length == 2)
    assert(out(0) == ((25.0, 2L)), "hour 0: mean(10, 40), nulls excluded")
    assert(out(1) == ((50.0, 1L)))
  }

  test("resampleDense materializes empty buckets with n = 0") {
    // 10-min grid over 00:00..01:10 → 8 buckets; 00:40 and 00:50 have
    // no rows at all and must still appear
    val out = Resample.resampleDense(series, "t", "v", 600L)
      .orderBy("bucket_start_s")
      .select("n").as[Long].collect().toSeq
    assert(out.length == 8)
    assert(out.count(_ == 0L) >= 2, s"empty buckets materialized, got $out")
    assert(out.sum == 3, "non-null observation count preserved")
  }

  test("ffill carries the last observation forward, leading nulls stay") {
    val withLeading = Seq((0L, ts("2024-01-01 00:00:00"), Option.empty[Double]))
      .toDF("id", "t", "v").unionByName(series.withColumn("id", col("id") + 1))
    val out = Resample.ffill(withLeading, "t", "v", orderCols = Seq("id"))
      .orderBy("id").select("v_ffill").as[Option[Double]].collect().toSeq
    assert(out == Seq(None, Some(10.0), Some(10.0), Some(10.0), Some(40.0),
      Some(50.0), Some(50.0)))
  }

  test("interpolateLinear: time-weighted between neighbours, no extrapolation") {
    val out = Resample.interpolateLinear(series, "t", "v", orderCols = Seq("id"))
      .orderBy("id").select("v_interp").as[Option[Double]].collect().toSeq
    // gap 00:00(10) → 00:30(40): 00:10 → 20, 00:20 → 30; trailing stays null
    assert(out == Seq(Some(10.0), Some(20.0), Some(30.0), Some(40.0),
      Some(50.0), None))
  }

  test("keyed interpolation does not leak across keys") {
    val two = series.withColumn("k", lit("a")).unionByName(
      Seq((9L, ts("2024-01-01 00:15:00"), Option.empty[Double]))
        .toDF("id", "t", "v").withColumn("k", lit("b")))
    val out = Resample.interpolateLinear(two, "t", "v", keys = Seq("k"),
        orderCols = Seq("id"))
      .filter(col("k") === "b").select("v_interp").as[Option[Double]].head()
    assert(out.isEmpty, "isolated key has no neighbours → null")
  }

  test("ohlc: open/close skip null readings, all-null buckets stay null") {
    val bars = Seq(
      (1L, "s", ts("2024-01-01 00:00:00"), Option.empty[Double]), // null first
      (2L, "s", ts("2024-01-01 00:20:00"), Some(5.0)),
      (3L, "s", ts("2024-01-01 00:40:00"), Option.empty[Double]), // null last
      (4L, "s", ts("2024-01-01 01:10:00"), Option.empty[Double])  // all-null bar
    ).toDF("id", "sym", "t", "v")
    val out = Resample.ohlc(bars, "t", "v", 3600L, keys = Seq("sym"),
        orderCols = Seq("id"))
      .orderBy("bucket_start_s")
      .select("open", "high", "low", "close", "n")
      .as[(Option[Double], Option[Double], Option[Double], Option[Double], Long)]
      .collect().toSeq
    assert(out == Seq(
      (Some(5.0), Some(5.0), Some(5.0), Some(5.0), 1L),
      (None, None, None, None, 0L)))
  }

  test("ohlc: first/max/min/last per bucket, ties broken by orderCols") {
    val bars = Seq(
      // hour 0: open=10 (t=00:00), close=30 (tied ts at 00:50 → higher id wins)
      (1L, "s", ts("2024-01-01 00:00:00"), 10.0),
      (2L, "s", ts("2024-01-01 00:20:00"), 99.0),
      (3L, "s", ts("2024-01-01 00:50:00"), 5.0),
      (4L, "s", ts("2024-01-01 00:50:00"), 30.0), // same ts as id 3
      // hour 1: single row — open = close
      (5L, "s", ts("2024-01-01 01:10:00"), 42.0)
    ).toDF("id", "sym", "t", "v")
    val out = Resample.ohlc(bars, "t", "v", 3600L, keys = Seq("sym"),
        orderCols = Seq("id"))
      .orderBy("bucket_start_s")
      .select("open", "high", "low", "close", "n")
      .as[(Double, Double, Double, Double, Long)].collect().toSeq
    assert(out == Seq((10.0, 99.0, 5.0, 30.0, 4L), (42.0, 42.0, 42.0, 42.0, 1L)))
  }

  test("ohlc shares one exchange across both window passes and the agg") {
    val bars = Seq((1L, "s", ts("2024-01-01 00:00:00"), 1.0))
      .toDF("id", "sym", "t", "v")
    val plan = Resample.ohlc(bars, "t", "v", 3600L, Seq("sym"), Seq("id"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 1, s"expected a single hash exchange, plan:\n$plan")
  }
}
