package graft.qc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType, IntegerType}

/** Flag lifecycle operators — the Spark equivalents of
  * qctimeseries R/qc_flags.R.
  *
  * Each operator is a pure `DataFrame => DataFrame` transform built as a
  * single `select` projection (one Project node, fully whole-stage
  * codegen'd; no shuffle). At 100 TB these are embarrassingly parallel
  * narrow maps — the scan dominates, so the only scale concerns are
  * column pruning (callers should select needed columns first) and
  * keeping the masks inside codegen, which `when`/`isnull` are.
  */
object QcFlags {

  import FlagSchema._

  /** "Missing" test matching R's `is.na` on doubles: R's is.na covers
    * both NA and NaN (SURVEY §1.3), Spark's isnull does not cover NaN —
    * so for floating-point columns test both. */
  private[graft] def isMissing(df: DataFrame, v: String): Column =
    df.schema(v).dataType match {
      case DoubleType | FloatType => qcol(v).isNull || isnan(qcol(v))
      case _                      => qcol(v).isNull
    }

  /** P1/P2 `qc_add_flags` (R/qc_flags.R:20-93): for each selected numeric
    * variable `v`, append an IntegerType column `v + suffix` valued
    * [[FlagSchema.OrigNA]] where the value is missing, else
    * [[FlagSchema.Unchecked]].
    *
    * @param vars variables to flag; empty = all numeric non-flag columns
    *             (R/qc_flags.R:31-35)
    * @param overwrite replace existing flag columns instead of erroring
    *                  (R/qc_flags.R:60-66)
    * @param requireNumeric error on non-numeric vars (R/qc_flags.R:47-56)
    */
  def addFlags(
      df: DataFrame,
      vars: Seq[String] = Nil,
      suffix: String = AutoSuffix,
      overwrite: Boolean = false,
      requireNumeric: Boolean = true): DataFrame = {
    // AutoSuffix here implements the reference's attr-merge on repeated
    // calls (qc_flags.R:87-92): a second addFlags on an already-flagged
    // table reuses the carried suffix, so the generations agree.
    val sfx = resolveSuffix(df, suffix)
    addFlagsResolved(df, vars, sfx, overwrite, requireNumeric)
  }

  private def addFlagsResolved(
      df: DataFrame,
      vars: Seq[String],
      suffix: String,
      overwrite: Boolean,
      requireNumeric: Boolean): DataFrame = {
    require(suffix.nonEmpty, "addFlags: suffix must be a non-empty string")
    val names = df.schema.fieldNames.toSeq
    val selected =
      if (vars.isEmpty) {
        val nc = numericCols(df, suffix)
        require(nc.nonEmpty, "addFlags: no numeric columns found; supply vars")
        nc
      } else {
        val unknown = vars.filterNot(names.contains)
        require(unknown.isEmpty, s"addFlags: columns not found: ${unknown.mkString(", ")}")
        vars
      }
    if (requireNumeric) {
      // Test the ACTUAL DataType of each selected column (qc_flags.R:47-56);
      // a non-numeric column is rejected even if its name ends in suffix.
      val nonNum = selected.filterNot { v =>
        df.schema(v).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]
      }
      require(nonNum.isEmpty, s"addFlags: non-numeric vars: ${nonNum.mkString(", ")}")
    }
    val newFlagNames = selected.map(flagCol(_, suffix))
    val existing = newFlagNames.filter(names.contains)
    require(existing.isEmpty || overwrite,
      s"addFlags: flag columns already exist: ${existing.mkString(", ")} (set overwrite=true)")

    // In-place overwrite preserving column position, like the reference's
    // data.table::set (qc_flags.R:77-84); only genuinely-new flag columns
    // are appended at the end. Each flag column is stamped with the
    // qc_vars/qc_suffix Metadata (qc_flags.R:87-90) so downstream
    // operators can resolve the suffix without being told.
    val flagExprs: Map[String, (String, Column)] = selected.map { v =>
      flagCol(v, suffix) ->
        (v, when(isMissing(df, v), lit(OrigNA)).otherwise(lit(Unchecked))
          .cast(IntegerType))
    }.toMap
    val inPlace = names.map { n =>
      flagExprs.get(n)
        .map { case (v, c) => c.as(n, flagMeta(v, suffix)) }
        .getOrElse(qcol(n))
    }
    val appended = newFlagNames.filterNot(names.contains).map { n =>
      val (v, c) = flagExprs(n)
      c.as(n, flagMeta(v, suffix))
    }
    df.select(inPlace ++ appended: _*)
  }

  /** P3 `qc_remove_flags` (R/qc_flags.R:107-145): drop flag columns for
    * `vars` (empty = all), preserving column order. Non-strict by
    * default: missing requested flags are ignored. */
  def removeFlags(
      df: DataFrame,
      vars: Seq[String] = Nil,
      suffix: String = AutoSuffix,
      strict: Boolean = false): DataFrame = {
    val sfx = resolveSuffix(df, suffix)
    val present = flagCols(df, sfx)
    if (present.isEmpty) return df
    val target = if (vars.isEmpty) present else vars.map(flagCol(_, sfx))
    val missing = target.filterNot(df.schema.fieldNames.contains)
    require(missing.isEmpty || !strict,
      s"removeFlags: not found: ${missing.mkString(", ")}")
    val rm = target.toSet
    if (!present.exists(rm.contains)) df
    else df.select(df.schema.fieldNames.filterNot(rm.contains).map(qcol).toSeq: _*)
  }

  /** P4 `qc_transfer` (R/qc_flags.R:159-182): copy the flag column of
    * `from` onto `to` (overwriting or creating `to + suffix`). */
  def transfer(
      df: DataFrame,
      from: String,
      to: String,
      suffix: String = AutoSuffix): DataFrame = {
    val sfx = resolveSuffix(df, suffix)
    val src = flagCol(from, sfx)
    val dst = flagCol(to, sfx)
    require(df.schema.fieldNames.contains(src), s"transfer: flag column not found: $src")
    // restamp rather than inherit: the copied column's base is `to`
    df.withColumn(dst, qcol(src)).withMetadata(dst, flagMeta(to, sfx))
  }

  /** P5 `qc_apply_flags` (R/qc_flags.R:193-219): for each flag column
    * whose base variable exists, null out the value where `flag < 0`
    * (masks OrigNA and ManualFlag; Unchecked passes through — the
    * permissive mask). Optionally drop the flag columns afterwards. */
  def applyFlags(
      df: DataFrame,
      suffix: String = AutoSuffix,
      dropFlags: Boolean = true): DataFrame = {
    val sfx = resolveSuffix(df, suffix)
    val fcols = flagCols(df, sfx)
    require(fcols.nonEmpty, s"applyFlags: no columns end with '$sfx'")
    maskWhere(df, lit(0), sfx, dropFlags)
  }

  /** P6 clean-series mask (R/qc_plots.R:52): null out values where
    * `flag < 1` — ALSO masks Unchecked. The strict mask used for the
    * "clean" panel of check plots. Distinct from [[applyFlags]]'s `< 0`
    * threshold by design (SURVEY §7.6.5). */
  def cleanForPlot(
      df: DataFrame,
      suffix: String = AutoSuffix,
      dropFlags: Boolean = false): DataFrame =
    maskWhere(df, lit(Approved), resolveSuffix(df, suffix), dropFlags)

  /** Shared mask builder: null each flagged variable where its flag is
    * strictly below `threshold`. One projection over all variables. */
  private def maskWhere(
      df: DataFrame, threshold: Column, suffix: String,
      dropFlags: Boolean): DataFrame = {
    val names = df.schema.fieldNames.toSeq
    val nameSet = names.toSet
    val fcols = flagCols(df, suffix)
    val maskedVars = fcols.map(_.dropRight(suffix.length)).filter(nameSet.contains).toSet
    val dropped = if (dropFlags) fcols.toSet else Set.empty[String]
    val out = names.filterNot(dropped.contains).map { n =>
      if (maskedVars.contains(n))
        when(qcol(flagCol(n, suffix)) < threshold, lit(null)).otherwise(qcol(n)).as(n)
      else qcol(n)
    }
    df.select(out: _*)
  }
}
