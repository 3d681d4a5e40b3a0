package graft.qc

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class QcWindowsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def series = Seq(
    (0L, ts("2024-01-01 00:00:00"), Some(1.0)),
    (1L, ts("2024-01-01 05:00:00"), Some(2.0)),
    (2L, ts("2024-01-01 23:59:59"), None),
    (3L, ts("2024-01-02 00:00:00"), Some(3.0)),
    (4L, ts("2024-01-04 12:00:00"), Some(4.0)), // day 3 window is empty
    (5L, ts("2024-01-05 00:00:00"), None)       // window with only-missing y
  ).toDF("id", "t", "y")

  test("W1 withRowId: dense, 0-based, ordered by (t, id); matches a global sort") {
    val shuffled = series.repartition(3) // scramble physical order
    val out = QcWindows.withRowId(shuffled, Seq("t", "id"))
      .select(col("id"), FlagSchema.qcol(".rowid"))
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(out.map(_._2).toSeq == Seq(0L, 1L, 2L, 3L, 4L, 5L))
  }

  test("W2 withWinId: origin at global min time, 24h buckets") {
    val out = QcWindows.withWinId(series, "t", 24.0)
      .select("id", "win_id").as[(Long, Long)].collect().sortBy(_._1)
    assert(out.map(_._2).toSeq == Seq(0L, 0L, 0L, 1L, 3L, 4L))
  }

  test("W2 explicit t0 overrides the data minimum") {
    val out = QcWindows.withWinId(series, "t", 24.0,
        t0 = Some(ts("2023-12-31 00:00:00")))
      .select("id", "win_id").as[(Long, Long)].collect().sortBy(_._1)
    assert(out.map(_._2).toSeq == Seq(1L, 1L, 1L, 2L, 4L, 5L))
  }

  test("A6+W3 windowCatalog: windows without any non-missing y are dropped; survivors densely renumbered") {
    val wdf = QcWindows.withWinId(series, "t", 24.0)
    val cat = QcWindows.windowCatalog(wdf, "t", "y")
      .select("win_id", "win_dense", "n_rows")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // win 0 (3 rows, has y), win 1 (1 row), win 3 (1 row); win 4 only-null y → dropped
    assert(cat.toSeq == Seq((0L, 0L, 3L), (1L, 1L, 1L), (3L, 2L, 1L)))
  }

  test("A6 include-set: windows must also contain a flag from the include set") {
    val flagged = QcFlags.addFlags(series, Seq("y"))
      .withColumn("y_qcflag",
        when(col("id") === 0, lit(1)).otherwise(col("y_qcflag")))
    val wdf = QcWindows.withWinId(flagged, "t", 24.0)
    val cat = QcWindows.windowCatalog(wdf, "t", "y", include = Seq(1))
      .select("win_id").as[Long].collect().toSeq
    assert(cat == Seq(0L), "only window 0 contains an approved flag")
  }

  test("withDenseId joins the dense id and drops excluded windows' rows") {
    val wdf = QcWindows.withWinId(series, "t", 24.0)
    val cat = QcWindows.windowCatalog(wdf, "t", "y")
    val dense = QcWindows.withDenseId(wdf, cat)
    assert(dense.count() == 5, "row of the y-less window 4 dropped")
    val k1 = QcWindows.slice(dense, 1L).select("id").as[Long].collect().toSeq
    assert(k1 == Seq(3L))
  }

  test("parseEpoch: ms-vs-s heuristic (reference qc_window_app.R:349-352)") {
    val df = Seq(1704067200.0, 1704067200123.0).toDF("x")
    val out = df.select(QcWindows.parseEpoch(col("x"))).as[Timestamp].collect()
    assert(out(0) == ts("2024-01-01 00:00:00"))
    assert(out(1) == Timestamp.valueOf("2024-01-01 00:00:00.123"))
  }

  test("A5/A8/W4: min time, padded y range, x range arithmetic") {
    assert(QcWindows.minTime(series, "t") == ts("2024-01-01 00:00:00"))
    val r = QcWindows.yRangePadded(series, "y").as[(Double, Double)].head()
    assert(math.abs(r._1 - (1.0 - 0.06)) < 1e-9 &&
      math.abs(r._2 - (4.0 + 0.06)) < 1e-9)
    val (lo, hi) = QcWindows.windowXRange(ts("2024-01-01 00:00:00"), 24.0, 1, pad = 0.0)
    assert(lo == ts("2024-01-02 00:00:00") && hi == ts("2024-01-03 00:00:00"))
  }
}
