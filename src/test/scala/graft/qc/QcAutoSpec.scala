package graft.qc

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class QcAutoSpec extends SparkSpec {
  import spark.implicits._
  import FlagSchema._

  private def series(vals: Seq[Double]) = {
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    vals.zipWithIndex
      .map { case (v, i) => (i.toLong, new Timestamp(t0 + i * 60000L), v) }
      .toDF("id", "t", "v")
  }

  test("flagSpikes: a lone outlier is flagged, steady neighbours are not") {
    val vals = Seq.fill(20)(10.0).updated(10, 500.0) ++
      Seq.tabulate(20)(i => 10.0 + 0.1 * i)
    val flagged = QcFlags.addFlags(series(vals), Seq("v"))
    val out = QcAuto.flagSpikes(flagged, "v", Seq("t", "id"),
        bucket = lit(0), halfWindow = 5, z = 3.0)
      .filter(col("v_qcflag") === ManualFlag).select("id").as[Long].collect()
    assert(out.toSeq == Seq(10L), s"only the planted spike, got ${out.toSeq}")
  }

  test("flagFlatlines: runs >= minRun flagged, shorter runs untouched, OrigNA immune") {
    val vals = Seq(1.0, 2.0, 7.0, 7.0, 7.0, 7.0, 3.0, 5.0, 5.0, 4.0)
    val withNa = series(vals)
      .withColumn("v", when(col("id") === 8, lit(null)).otherwise(col("v")))
    val flagged = QcFlags.addFlags(withNa, Seq("v"))
    val out = QcAuto.flagFlatlines(flagged, "v", Seq("t", "id"),
        bucket = lit(0), minRun = 4)
      .select("id", "v_qcflag").as[(Long, Int)].collect().sortBy(_._1)
    assert(out.filter(_._2 == ManualFlag).map(_._1).toSeq == Seq(2L, 3L, 4L, 5L),
      "exactly the 4-run of 7.0s")
    assert(out(8)._2 == OrigNA, "missing row keeps OrigNA")
  }

  test("flagFlatlines: a missing value neither extends nor bridges a run") {
    val vals = Seq(7.0, 7.0, -1.0, 8.0) // -1 placeholder, nulled below
    val withNa = series(vals)
      .withColumn("v", when(col("id") === 2, lit(null)).otherwise(col("v")))
    val flagged = QcFlags.addFlags(withNa, Seq("v"))
    val out = QcAuto.flagFlatlines(flagged, "v", Seq("t", "id"),
        bucket = lit(0), minRun = 3)
      .filter(col("v_qcflag") === ManualFlag).count()
    assert(out == 0, "only 2 consecutive identical non-missing values — not a 3-run")
  }

  test("flagMadOutliers: robust to the outlier itself; MAD=0 groups flag nothing") {
    // 20 values near 10 plus one gross outlier: mean/std would be
    // dragged, the median/MAD is not
    val vals = (0 until 20).map(i => 10.0 + (i % 5) * 0.1) :+ 1000.0
    val df = QcFlags.addFlags(series(vals), Seq("v"))
    val out = QcAuto.flagMadOutliers(df, "v", lit(0))
    val flagged = out.filter(col("v_qcflag") === ManualFlag)
      .select("id").as[Long].collect().toSeq
    assert(flagged == Seq(20L), s"only the outlier: $flagged")

    // constant series → MAD 0 → nothing flagged, no division blow-up
    val const = QcFlags.addFlags(series(Seq.fill(10)(7.0) :+ 7.0), Seq("v"))
    assert(QcAuto.flagMadOutliers(const, "v", lit(0))
      .filter(col("v_qcflag") === ManualFlag).count() == 0)

    // null bucket: rows survive unflagged, never dropped
    val withNullBucket = QcFlags.addFlags(series(vals), Seq("v"))
      .withColumn("site", when(col("id") === 5L, lit(null)).otherwise(lit(0)))
    val out2 = QcAuto.flagMadOutliers(withNullBucket, "v", col("site"))
    assert(out2.count() == vals.length, "a detector never deletes rows")
    assert(out2.filter(col("id") === 5L)
      .select("v_qcflag").as[Int].head() == Unchecked)
  }

  test("flagRange flags outside [lo, hi] only") {
    val flagged = QcFlags.addFlags(series(Seq(5.0, 50.0, 500.0)), Seq("v"))
    val out = QcAuto.flagRange(flagged, "v", 10.0, 100.0)
      .select("id", "v_qcflag").as[(Long, Int)].collect().sortBy(_._1)
    assert(out.map(_._2).toSeq == Seq(ManualFlag, Unchecked, ManualFlag))
  }

  test("flagSteps: level shift flagged at the boundary, guards hold") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    // 40 points: flat 10.0 then flat 60.0 from index 20 — one clean step
    val rows = (0 until 40).map(i =>
      (i.toLong, new java.sql.Timestamp(t0 + i * 60000L),
        if (i < 20) 10.0 else 60.0))
    val df = QcFlags.addFlags(rows.toDF("id", "ts", "v"), Seq("v"))
    val out = QcAuto.flagSteps(df, "v", Seq("ts", "id"),
        bucket = org.apache.spark.sql.functions.to_date(
          org.apache.spark.sql.functions.col("ts")),
        halfWindow = 6, minShift = 30.0)
      .filter(org.apache.spark.sql.functions.col("v_qcflag") === FlagSchema.ManualFlag)
      .select("id").as[Long].collect().sorted
    assert(out.nonEmpty, "the planted step must be detected")
    assert(out.forall(i => i >= 14 && i <= 25),
      s"only boundary rows flagged, got ${out.toSeq}")
    assert(out.contains(20L), "the first row of the new level is flagged")
  }

  test("flagSeasonalResiduals: learns the rhythm, flags only the surprise") {
    import java.sql.Timestamp
    // two alternating hourly levels (10 vs 100) — a global z-score
    // would treat every hour-1 row as a shift; the diurnal profile
    // absorbs the rhythm, so only the +500 plant at id 13 flags
    val rows = (0 until 48).map { i =>
      val hr = i % 2
      val base = if (hr == 0) 10.0 else 100.0
      val v = base + (i % 5) * 0.5 + (if (i == 13) 500.0 else 0.0)
      (i.toLong, Timestamp.valueOf(f"2024-01-01 0$hr%d:15:00"), v)
    }.toDF("id", "t", "v")
    val flagged = QcFlags.addFlags(rows, Seq("v"))
    val out = QcAuto.flagSeasonalResiduals(flagged, "v", "t", lit(0))
      .filter(col("v_qcflag") === ManualFlag)
      .select("id").as[Long].collect().toSeq
    assert(out == Seq(13L), s"got $out")
    // a detector never deletes rows
    assert(QcAuto.flagSeasonalResiduals(flagged, "v", "t", lit(0))
      .count() == 48)
  }
}
