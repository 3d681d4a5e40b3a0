package graft.qc

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** End-to-end session replay of the vignette workflow
  * (overall_workflow.Rmd: add flags → M7 sweeps → progress → apply →
  * export) on a synthetic ibutton-like series. */
class QcSessionSpec extends SparkSpec {
  import spark.implicits._

  private def mkSeries = {
    val rnd = new scala.util.Random(42)
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    (0 until 400).map { i =>
      val v = if (i % 50 == 3) None
      else Some(20 + 5 * math.sin(i / 10.0) + rnd.nextGaussian())
      (new Timestamp(t0 + i * 3600L * 1000), v)
    }.toDF("DateTime", "temp")
  }

  test("open validates inputs") {
    intercept[IllegalArgumentException] {
      QcSession.open(mkSeries, "temp", "DateTime") // no flags yet
    }
    intercept[IllegalArgumentException] {
      QcSession.open(mkSeries.withColumn("DateTime", lit("notatime")), "temp", "DateTime")
    }
  }

  test("full interactive replay: windows, M7 sweep, progress, done") {
    val flagged = QcFlags.addFlags(mkSeries, Seq("temp"))
    var s = QcSession.open(flagged, "temp", "DateTime", winHrs = 100.0)
    assert(s.windowCount == 4, "400 hourly points / 100h windows")
    assert(s.render().count() == 100)

    // window 0: brush two points then M7 (flag selection, approve rest)
    val ids = s.render().select(FlagSchema.qcol(".rowid")).as[Long]
      .collect().sorted.take(2)
    s = s.flagAndNext(ids.toSeq)
    assert(s.cursor == 1)

    // windows 1..3: approve everything unflagged
    for (_ <- 1 to 3) { s = s.approveUnflagged(); s = s.next }

    val prog = QcProgress.summary(s.done()).collect()(0)
    assert(prog.getAs[Double]("pct_checked") == 100.0,
      "every non-missing point approved or flagged")
    assert(prog.getAs[Double]("pct_flagged") == 0.5, "2 of 400 brushed")
    val missing = prog.getAs[Double]("pct_missing")
    assert(missing == 2.0, s"8 of 400 missing, got $missing")

    // apply + verify masking
    val clean = QcFlags.applyFlags(s.done())
    assert(clean.filter(col("temp").isNull).count() == 10, "8 NA + 2 flagged")
  }

  test("rewindow recomputes the catalog at a new width") {
    val flagged = QcFlags.addFlags(mkSeries, Seq("temp"))
    val s = QcSession.open(flagged, "temp", "DateTime", winHrs = 100.0)
    val r = s.rewindow(50.0)
    assert(r.windowCount == 8)
    assert(r.cursor == 0)
  }

  test("include-filter navigation only reaches windows with matching flags") {
    val flagged = QcFlags.addFlags(mkSeries, Seq("temp"))
    var s = QcSession.open(flagged, "temp", "DateTime", winHrs = 100.0)
    // approve window 0 fully, then restrict navigation to unchecked
    s = s.approveUnflagged()
    val restricted = s.rewindow(100.0, include = Seq(FlagSchema.Unchecked))
    assert(restricted.windowCount == 3, "window 0 has no unchecked flags left")
  }
}
