package graft.qc

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class QcPlotFeedSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (0L, Timestamp.valueOf("2024-01-01 00:00:00"), Some(1.0), 1, Some(9.0)),
    (1L, Timestamp.valueOf("2024-01-01 01:00:00"), None, -1, Some(8.0)),
    (2L, Timestamp.valueOf("2024-01-01 02:00:00"), Some(3.0), -2, None),
    (3L, Timestamp.valueOf("2024-01-01 03:00:00"), Some(Double.NaN), -1, Some(7.0))
  ).toDF(".rowid", "t", "y", "y_qcflag", "z")

  test("P7 hideBad / P8 nonMissing / P9 flagClass row sets") {
    assert(QcPlotFeed.hideBad(df, "y").count() == 1)
    assert(QcPlotFeed.nonMissing(df, "y", "t")
      .select(FlagSchema.qcol(".rowid")).as[Long].collect().toSet == Set(0L, 2L))
    assert(QcPlotFeed.flagClass(df, "y", -2)
      .select(FlagSchema.qcol(".rowid")).as[Long].collect().toSeq == Seq(2L))
  }

  test("P10 secondaryOverlay: flag column optional") {
    // z has no z_qcflag → only the non-missing filter applies
    assert(QcPlotFeed.secondaryOverlay(df, "z").count() == 3)
    val withFlag = df.withColumn("z_qcflag",
      when(FlagSchema.qcol(".rowid") === 0, -2).otherwise(0))
    assert(QcPlotFeed.secondaryOverlay(withFlag, "z").count() == 2,
      "own flag >= 0 filter kicks in once the flag column exists")
  }

  test("P11 secondaryChoices excludes time/y/flags/helpers") {
    val extended = df.withColumn("win_id", lit(0L)).withColumn("w", lit(1.0))
    assert(QcPlotFeed.secondaryChoices(extended, "t", "y").toSet == Set("z", "w"))
  }

  test("P12 byIds selects exactly the brushed rows") {
    assert(QcPlotFeed.byIds(df, Seq(1L, 3L)).count() == 2)
  }

  test("M4 downsample keeps exactly first/last/min/max rows per bucket") {
    def ts(min: Int) = new Timestamp(86400000L + min * 60000L)
    val series = Seq(
      // bucket 0 (first hour, 10-min cadence): first=0, last=50,
      // min at 20 (-5.0), max at 30 (99.0); 10 and 40 interior → dropped
      (1L, ts(0), 10.0), (2L, ts(10), 20.0), (3L, ts(20), -5.0),
      (4L, ts(30), 99.0), (5L, ts(40), 30.0), (6L, ts(50), 25.0),
      // bucket 1: two rows, both extremes
      (7L, ts(60), 1.0), (8L, ts(70), 2.0),
      // nulls: one interior, one AT a bucket's opening slot — neither
      // may survive (a null can't be drawn, so it can't claim
      // first/last either; row 10 cedes bucket 2's opening to row 11)
      (9L, ts(45), Double.NaN),
      (10L, ts(120), Double.NaN),
      (11L, ts(130), 5.0)
    ).toDF("id", "t", "v")
      .withColumn("v", when(isnan(col("v")), lit(null)).otherwise(col("v")))
    val kept = QcPlotFeed.m4Downsample(series, "t", "v", widthSecs = 3600L)
      .select("id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 3L, 4L, 6L, 7L, 8L, 11L))
  }

  test("M4 downsample is partition-layout invariant") {
    def ts(min: Int) = new Timestamp(86400000L + min * 60000L)
    val series = (0 until 500).map(i => (i.toLong, ts(i), (i * 37 % 101).toDouble))
      .toDF("id", "t", "v")
    def run(df: org.apache.spark.sql.DataFrame) =
      QcPlotFeed.m4Downsample(df, "t", "v", widthSecs = 1800L)
        .select("id").as[Long].collect().sorted.toSeq
    assert(run(series) == run(series.repartition(11)))
  }

  test("M4 pixel-identity: per bucket, kept rows preserve min/max/first/last") {
    def ts(min: Int) = new Timestamp(86400000L + min * 60000L)
    val series = (0 until 1000).map(i =>
        (i.toLong, ts(i), ((i * 73) % 997).toDouble))
      .toDF("id", "t", "v")
    val width = 3600L
    // the implementation's exact bucketing (ms-keyed, epoch-aligned)
    val bucket = floor(
      floor(unix_micros(col("t")) / lit(1000.0)) / lit(width * 1000.0))
      .cast("long").as("b")
    val kept = QcPlotFeed.m4Downsample(series, "t", "v", width)
      .select(col("id"), col("t"), col("v"), bucket)
    val full = series.select(col("v"), col("t"), bucket)
    def profile(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("b").agg(min("v"), max("v"), min("t"), max("t"))
        .collect().map(r => r.getLong(0) ->
          (r.getDouble(1), r.getDouble(2), r.getTimestamp(3), r.getTimestamp(4)))
        .toMap
    assert(profile(kept) == profile(full),
      "a line render of the kept rows must match the full series")
    assert(kept.count() < 200, "and actually decimate (<= 4ish per bucket)")
  }

  test("windowLabels: display-tz rendering is DST-correct for named zones") {
    // US spring-forward 2024-03-10: 07:00 UTC is the EST→EDT jump, so
    // the 02:00-02:59 local hour does not exist
    def ts(iso: String) =
      java.sql.Timestamp.from(java.time.Instant.parse(iso))
    val rows = Seq(
      (0L, ts("2024-03-10T06:30:00Z")), // EST (UTC-5) → 01:30
      (1L, ts("2024-03-10T07:30:00Z")), // EDT (UTC-4) → 03:30, never 02:30
      (2L, ts("2024-07-01T12:00:00Z")) // deep summer, EDT → 08:00
    ).toDF("id", "t")
    val labels = QcPlotFeed.windowLabels(rows, "t", "America/New_York")
      .orderBy("id").select("t_label").as[String].collect().toSeq
    assert(labels == Seq(
      "2024-03-10 01:30", "2024-03-10 03:30", "2024-07-01 08:00"))
    // and a fixed-offset zone renders as a plain shift
    val off = QcPlotFeed.windowLabels(rows, "t", "+05:30", "lbl")
      .orderBy("id").select("lbl").as[String].collect().toSeq
    assert(off.head == "2024-03-10 12:00")
  }

  test("U1 rawCleanUnion doubles rows with panel discriminator and strict mask") {
    val u = QcPlotFeed.rawCleanUnion(df)
    assert(u.count() == 8)
    val cleanVals = u.filter(col("panel") === "clean")
      .orderBy(FlagSchema.qcol(".rowid"))
      .select("y").as[Option[Double]].collect().toSeq
    assert(cleanVals.head.contains(1.0) && cleanVals.tail.forall(_.isEmpty),
      "clean panel masks flag < 1")
  }
}
