package graft.qc

import graft.SparkSpec

/** A1-A4: the denominators are the subtle part (R/qc_summary.R:68-92):
  * %checked is over NON-MISSING values; the four class percentages are
  * over ALL rows. */
class QcProgressSpec extends SparkSpec {
  import spark.implicits._

  // 8 rows: 2 approved, 2 unchecked, 2 missing(-1), 2 flagged(-2)
  private def df = Seq(
    (1L, Some(1.0), 1), (2L, Some(2.0), 1),
    (3L, Some(3.0), 0), (4L, Some(4.0), 0),
    (5L, None, -1), (6L, Some(Double.NaN), -1),
    (7L, Some(7.0), -2), (8L, Some(8.0), -2)
  ).toDF("id", "v", "v_qcflag")

  test("A1 summary: totals and all five percentages") {
    val r = QcProgress.summary(df).collect()(0)
    assert(r.getAs[String]("variable") == "v")
    assert(r.getAs[Long]("total") == 6, "total = non-missing count (NaN counts as missing)")
    // checked = approved+flagged (4) over non-missing (6) = 66.67
    assert(r.getAs[Double]("pct_checked") == 66.67)
    assert(r.getAs[Double]("pct_approved") == 25.0)
    assert(r.getAs[Double]("pct_unchecked") == 25.0)
    assert(r.getAs[Double]("pct_missing") == 25.0)
    assert(r.getAs[Double]("pct_flagged") == 25.0)
  }

  test("A1: percentages sum to ~100") {
    val r = QcProgress.summary(df).collect()(0)
    val sum = Seq("pct_approved", "pct_unchecked", "pct_missing", "pct_flagged")
      .map(r.getAs[Double]).sum
    assert(math.abs(sum - 100.0) < 0.05)
  }

  test("A1: all-missing variable gets null pct_checked (R NA_real_)") {
    val empty = Seq((1L, Option.empty[Double], -1)).toDF("id", "v", "v_qcflag")
    val r = QcProgress.summary(empty).collect()(0)
    assert(r.isNullAt(r.fieldIndex("pct_checked")))
  }

  test("A4 hideComplete filters fully-checked variables") {
    val done = Seq((1L, Some(1.0), 1), (2L, Some(2.0), -2)).toDF("id", "v", "v_qcflag")
    assert(QcProgress.summary(done, hideComplete = true).count() == 0)
    assert(QcProgress.summary(df, hideComplete = true).count() == 1)
  }

  test("A2/A3 consistency: NA-vs-flag mismatch and out-of-domain flags surface") {
    val bad = Seq(
      (1L, Option.empty[Double], 0), // NA but flag 0 → inconsistent
      (2L, Some(2.0), 7)             // out-of-domain flag
    ).toDF("id", "v", "v_qcflag")
    val r = QcProgress.consistency(bad).collect()(0)
    assert(r.getAs[Long]("na_count") == 1 && r.getAs[Long]("flag_na_count") == 0)
    assert(!r.getAs[Boolean]("na_consistent"))
    assert(r.getAs[scala.collection.Seq[Int]]("bad_flags").toSeq == Seq(7))
  }

  test("agreement: hand-computed Cohen's kappa; degenerate marginals null") {
    val df = Seq(
      (1L, 1, 1), (2L, 1, 0), (3L, 0, 0), (4L, -1, -1)
    ).toDF("id", "a_qcflag", "b_qcflag")
    val r = QcProgress.agreement(df, "a_qcflag", "b_qcflag").collect()(0)
    assert(r.getAs[Long]("n") == 4 && r.getAs[Long]("n_agree") == 3)
    assert(math.abs(r.getAs[Double]("po") - 0.75) < 1e-15)
    // marginals a: {1:.5, 0:.25, -1:.25}, b: {1:.25, 0:.5, -1:.25}
    // pe = .5·.25 + .25·.5 + .25·.25 = .3125
    assert(math.abs(r.getAs[Double]("pe") - 0.3125) < 1e-15)
    assert(math.abs(r.getAs[Double]("kappa") - 0.4375 / 0.6875) < 1e-15)
    // identical constant flaggers: po = pe = 1 → kappa undefined
    val const = Seq((1L, 1, 1), (2L, 1, 1)).toDF("id", "a_qcflag", "b_qcflag")
    val rc = QcProgress.agreement(const, "a_qcflag", "b_qcflag").collect()(0)
    assert(rc.isNullAt(rc.fieldIndex("kappa")))
  }
}
