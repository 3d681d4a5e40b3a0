package graft.qc

import graft.SparkSpec
import org.apache.spark.sql.Row

/** P1-P6 semantics locked to the reference (R/qc_flags.R, R/qc_plots.R:52). */
class QcFlagsSpec extends SparkSpec {
  import spark.implicits._

  private def base =
    Seq((1L, Some(1.0)), (2L, None), (3L, Some(Double.NaN)), (4L, Some(4.0)))
      .toDF("id", "v")

  test("P1 addFlags: null AND NaN both map to OrigNA (-1), else Unchecked (0)") {
    val out = QcFlags.addFlags(base, Seq("v"))
      .select("id", "v_qcflag").as[(Long, Int)].collect().sortBy(_._1)
    assert(out.map(_._2).toSeq == Seq(0, -1, -1, 0))
  }

  test("P1 addFlags: default vars = all numeric non-flag columns") {
    val df = base.withColumn("s", org.apache.spark.sql.functions.lit("x"))
    val out = QcFlags.addFlags(df)
    assert(out.columns.toSet == Set("id", "v", "s", "id_qcflag", "v_qcflag"))
  }

  test("P1 addFlags: existing flag column errors without overwrite, and " +
    "overwrite preserves column POSITION (qc_flags.R:77-84)") {
    val once = QcFlags.addFlags(base, Seq("v"))
    val extended = once.withColumn("w", org.apache.spark.sql.functions.lit(1.0))
    intercept[IllegalArgumentException] {
      QcFlags.addFlags(extended, Seq("v"))
    }
    val over = QcFlags.addFlags(extended, Seq("v"), overwrite = true)
    assert(over.columns.toSeq == Seq("id", "v", "v_qcflag", "w"),
      "overwritten flag column must keep its original position")
  }

  test("P1 addFlags: non-numeric var rejected even if named like a flag") {
    val df = base.withColumn("x_qcflag", org.apache.spark.sql.functions.lit("oops"))
    intercept[IllegalArgumentException] {
      QcFlags.addFlags(df, Seq("x_qcflag"), requireNumeric = true)
    }
  }

  test("P3 removeFlags drops flags; P4 transfer copies them") {
    val flagged = QcFlags.addFlags(base, Seq("v"))
    assert(QcFlags.removeFlags(flagged).columns.toSeq == Seq("id", "v"))
    val t = QcFlags.transfer(flagged, "v", "id")
    assert(t.columns.contains("id_qcflag"))
    val same = t.filter(t("id_qcflag") =!= t("v_qcflag")).count()
    assert(same == 0)
  }

  test("P5 applyFlags masks flag < 0 ONLY (unchecked passes); P6 cleanForPlot masks flag < 1") {
    val df = Seq(
      (1L, 10.0, 1), (2L, 20.0, 0), (3L, 30.0, -1), (4L, 40.0, -2))
      .toDF("id", "v", "v_qcflag")
    val p5 = QcFlags.applyFlags(df, dropFlags = false)
      .select("id", "v").as[(Long, Option[Double])].collect().sortBy(_._1)
    assert(p5.map(_._2).toSeq == Seq(Some(10.0), Some(20.0), None, None))
    val p6 = QcFlags.cleanForPlot(df)
      .select("id", "v").as[(Long, Option[Double])].collect().sortBy(_._1)
    assert(p6.map(_._2).toSeq == Seq(Some(10.0), None, None, None))
  }

  test("P13 isFlaggedDf suffix sniffing; P2 numericCols excludes flag cols") {
    assert(!FlagSchema.isFlaggedDf(base))
    val flagged = QcFlags.addFlags(base, Seq("v"))
    assert(FlagSchema.isFlaggedDf(flagged))
    assert(FlagSchema.numericCols(flagged) == Seq("id", "v"))
  }

  test("dotted column names survive (ADVICE r1: backtick quoting)") {
    val df = Seq((1L, Some(2.0)), (2L, None)).toDF("id", "a.b")
    val out = QcFlags.addFlags(df, Seq("a.b"))
    assert(out.columns.contains("a.b_qcflag"))
    val masked = QcFlags.applyFlags(out)
    assert(masked.columns.toSeq == Seq("id", "a.b"))
  }
}
