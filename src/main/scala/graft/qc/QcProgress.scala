package graft.qc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A1-A4: per-variable QC progress aggregation — the Spark equivalent of
  * qctimeseries R/qc_summary.R.
  *
  * The reference loops variables and scans the table once per variable
  * (R/qc_summary.R:45-93). Here all variables are folded into ONE
  * multi-expression hash aggregate — a single scan + a single (tiny,
  * one-row) exchange regardless of variable count, then the one-row
  * result is reshaped to one row per variable with `inline`. At 100 TB
  * this is a full-scan job whose cost is the scan itself; the aggregate
  * state is a few longs per variable, map-side combined.
  */
object QcProgress {

  import FlagSchema._

  /** Output columns. The reference's tibble contract
    * (R/qc_summary.R:84-92) uses R-only names like `%approved(1)`;
    * these are the SQL-safe equivalents, same order, same semantics:
    * variable, total (= count of NON-missing values), pct_checked
    * (share of non-missing values with flag not in {0,-1}), and
    * pct_approved / pct_unchecked / pct_missing / pct_flagged (shares
    * of ALL rows with flag = 1 / 0 / -1 / -2), all rounded to 2dp. */
  val Columns: Seq[String] = Seq("variable", "total", "pct_checked",
    "pct_approved", "pct_unchecked", "pct_missing", "pct_flagged")

  /** A1 + A4 `qc_progress` (R/qc_summary.R:38-97). One row per flagged
    * variable. `hideComplete` keeps only rows with pct_checked < 100
    * (R/qc_summary.R:95-97). Zero-valid-value variables get null
    * pct_checked (R's NA_real_, R/qc_summary.R:72-77). */
  def summary(
      df: DataFrame,
      vars: Seq[String] = Nil,
      suffix: String = AutoSuffix,
      hideComplete: Boolean = false): DataFrame = {
    val sfx = resolveSuffix(df, suffix)
    val vs = if (vars.isEmpty) flaggedVars(df, sfx) else vars
    require(vs.nonEmpty, "summary: no flagged variables found")

    // coalesce: sum over ZERO rows is null in SQL, but R's sum(logical)
    // is 0 — without this, an empty table yields null totals instead of
    // R's 0-total / NaN-percentage contract
    def cif(c: Column): Column = coalesce(sum(when(c, 1L).otherwise(0L)), lit(0L))

    val aggs = count(lit(1)).as("__n_all") +: vs.flatMap { v =>
      val f = qcol(flagCol(v, sfx))
      val miss = QcFlags.isMissing(df, v)
      Seq(
        cif(miss).as(s"__na@$v"),
        cif(f === Approved).as(s"__ap@$v"),
        cif(f === Unchecked).as(s"__un@$v"),
        cif(f === OrigNA).as(s"__fn@$v"),
        cif(f === ManualFlag).as(s"__fl@$v"),
        // %checked numerator: non-missing AND flag not in {Unchecked, OrigNA}
        // (R/qc_summary.R:73-74; null flags excluded like R's na.rm)
        cif(f =!= Unchecked && f =!= OrigNA && !miss).as(s"__ck@$v"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)

    val nAll = col("__n_all")
    // bround = HALF_EVEN, matching R's IEEE round(x, 2) (ADVICE r1).
    // Every denominator is null-guarded: ANSI mode (Spark 4 default)
    // raises DIVIDE_BY_ZERO even for doubles, so R's 0/0 = NaN is not
    // reachable — a 0-row table yields null percentages instead
    // (pct_checked's null additionally matches R's explicit NA_real_
    // branch for n_valid == 0, R/qc_summary.R:72-77).
    def pct(n: Column, d: Column): Column =
      bround(lit(100.0) * n / when(d > 0, d), 2)

    val rows = vs.map { v =>
      val nValid = nAll - col(s"__na@$v")
      struct(
        lit(v).as("variable"),
        nValid.as("total"),
        pct(col(s"__ck@$v"), nValid).as("pct_checked"),
        pct(col(s"__ap@$v"), nAll).as("pct_approved"),
        pct(col(s"__un@$v"), nAll).as("pct_unchecked"),
        pct(col(s"__fn@$v"), nAll).as("pct_missing"),
        pct(col(s"__fl@$v"), nAll).as("pct_flagged"))
    }
    val res = one.select(inline(array(rows: _*)))
    if (hideComplete) res.filter(col("pct_checked") < 100) else res
  }

  /** A2 + A3 consistency checks (R/qc_summary.R:51-66), as data instead
    * of R warnings: one row per variable with the NA-vs-flag(-1) counts
    * and any flag values outside the legal domain. Same single-pass
    * shape as [[summary]]. */
  def consistency(
      df: DataFrame,
      vars: Seq[String] = Nil,
      suffix: String = AutoSuffix): DataFrame = {
    val sfx = resolveSuffix(df, suffix)
    val vs = if (vars.isEmpty) flaggedVars(df, sfx) else vars
    require(vs.nonEmpty, "consistency: no flagged variables found")
    val aggs = vs.flatMap { v =>
      val f = qcol(flagCol(v, sfx))
      Seq(
        coalesce(sum(when(QcFlags.isMissing(df, v), 1L).otherwise(0L)), lit(0L))
          .as(s"__na@$v"),
        coalesce(sum(when(f === OrigNA, 1L).otherwise(0L)), lit(0L))
          .as(s"__fn@$v"),
        sort_array(collect_set(when(!f.isin(Domain.map(lit): _*), f)))
          .as(s"__bad@$v"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = vs.map { v =>
      struct(
        lit(v).as("variable"),
        col(s"__na@$v").as("na_count"),
        col(s"__fn@$v").as("flag_na_count"),
        (col(s"__na@$v") === col(s"__fn@$v")).as("na_consistent"),
        filter(col(s"__bad@$v"), _.isNotNull).as("bad_flags"))
    }
    one.select(inline(array(rows: _*)))
  }

  /** Pluggable sink for the A2/A3 warnings that `qc_progress` emits as
    * R `warning()`s (R/qc_summary.R:51-66). Spark has no warning
    * condition system, so the channel is explicit: a reporter. */
  trait Reporter { def warn(message: String): Unit }

  object Reporter {
    /** Default: route to log4j at WARN, like a console R session. */
    object Log extends Reporter {
      private lazy val logger =
        org.apache.log4j.Logger.getLogger("graft.qc.QcProgress")
      def warn(message: String): Unit = logger.warn(message)
    }
    /** Collecting reporter for programmatic consumption / tests. */
    final class Buffering extends Reporter {
      private val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      def warn(message: String): Unit = synchronized { buf += message }
      def messages: Seq[String] = synchronized { buf.toList }
    }
  }

  /** [[summary]] with the reference's warn-and-continue semantics
    * (R/qc_summary.R:51-66): before summarising, run [[consistency]]
    * and surface NA-mismatch (A2) and out-of-domain flag values (A3)
    * through `reporter`, then return the summary regardless. The
    * consistency result is one row per variable — collecting it is
    * model-sized, not data-sized. */
  def summaryWithChecks(
      df: DataFrame,
      vars: Seq[String] = Nil,
      suffix: String = AutoSuffix,
      hideComplete: Boolean = false,
      reporter: Reporter = Reporter.Log): DataFrame = {
    val sfx = resolveSuffix(df, suffix)
    // driver-sized by construction: one row per checked variable
    consistency(df, vars, sfx).collect().foreach { r =>
      val v = r.getAs[String]("variable")
      if (!r.getAs[Boolean]("na_consistent"))
        reporter.warn(
          s"$v: NA count (${r.getAs[Long]("na_count")}) != flag==-1 count " +
            s"(${r.getAs[Long]("flag_na_count")}) — values were modified " +
            "after qc_add_flags (R/qc_summary.R:51-59)")
      val bad = r.getAs[scala.collection.Seq[Int]]("bad_flags")
      if (bad.nonEmpty)
        reporter.warn(
          s"$v: flag values outside {-2,-1,0,1}: ${bad.mkString(", ")} " +
            "(R/qc_summary.R:60-66)")
    }
    summary(df, vars, sfx, hideComplete)
  }

  /** Inter-flagger agreement between two flag columns over the closed
    * domain {-2,-1,0,1} — the calibration check between a manual QC
    * pass and an automated detector (or two reviewers): observed
    * agreement `po`, chance agreement `pe` from the marginals, and
    * Cohen's kappa `(po−pe)/(1−pe)` (null when pe = 1, i.e. both
    * flaggers are constant and identical). ONE hash aggregate pass,
    * one-row output — the A1 shape; flags outside the domain
    * contribute to `n`/`po` but not to `pe`'s marginals.
    *
    * The arithmetic keeps a fixed left-to-right operand order so the
    * result is bit-identical across engines computing the same
    * formula — no rounding needed. */
  def agreement(df: DataFrame, flagA: String, flagB: String): DataFrame = {
    val a = qcol(flagA)
    val b = qcol(flagB)
    def cnt(c: Column): Column = sum(when(c, 1L).otherwise(0L))
    val aggs =
      Seq(count(lit(1)).as("__n"), cnt(a === b).as("__agree")) ++
        Domain.flatMap { k =>
          Seq(cnt(a === k).as(s"__a$k"), cnt(b === k).as(s"__b$k"))
        }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val n = col("__n").cast("double")
    val po = col("__agree").cast("double") / n
    val pe = Domain.map { k =>
      (col(s"__a$k").cast("double") / n) * (col(s"__b$k").cast("double") / n)
    }.reduce(_ + _)
    one.select(
      col("__n").as("n"), col("__agree").as("n_agree"),
      po.as("po"), pe.as("pe"),
      when(pe < 1.0, (po - pe) / (lit(1.0) - pe)).as("kappa"))
  }
}
