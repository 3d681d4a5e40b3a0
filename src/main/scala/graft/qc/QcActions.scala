package graft.qc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** M1-M8: the interactive flag-mutation algebra — the Spark equivalents
  * of the qc_window_app button handlers (R/qc_window_app.R:359-419).
  *
  * The reference mutates a data.table by reference; here every action is
  * a pure `DataFrame => DataFrame` that rewrites ONE flag column with a
  * `when`-guarded projection — narrow, shuffle-free, whole-stage
  * codegen'd. Scopes are arbitrary `Column` predicates; a brushed
  * id-selection is either an `isin` literal list (small sets → Catalyst
  * InSet) or a broadcast-joined id table (large sets,
  * [[scopeFromIds]]), per SURVEY §4.2.
  *
  * Engine laws (property-tested in QcActionsSpec):
  *   - OrigNA (-1) is written only by addFlags and never overwritten by
  *     any action here (every action guards `flag =!= -1` except M7's
  *     selection write, whose rows are never OrigNA by construction —
  *     NA points are unplottable hence unselectable, SURVEY §2.6).
  *   - actions write only into {Approved, Unchecked, ManualFlag}.
  *   - actions touch flag columns only, never values.
  */
object QcActions {

  import FlagSchema._

  /** Core conditional flag update: set `v`'s flag to `newFlag` where
    * `scope && guard`, leaving all other rows' flags untouched. */
  def setFlag(
      df: DataFrame,
      v: String,
      scope: Column,
      newFlag: Int,
      guard: Column,
      suffix: String = AutoSuffix): DataFrame = {
    val f = flagCol(v, resolveSuffix(df, suffix))
    require(df.schema.fieldNames.contains(f), s"setFlag: no flag column $f")
    // keepMeta: the when-projection drops the qc_vars/qc_suffix column
    // Metadata (only bare attribute references carry it); re-attach
    keepMeta(df,
      df.withColumn(f,
        when(scope && guard, lit(newFlag)).otherwise(qcol(f)).cast(IntegerType)),
      f)
  }

  /** The standard guard: never touch the original-NA marker
    * (R/qc_window_app.R:360-362 `flag != -1`). */
  private def notOrigNA(v: String, suffix: String): Column =
    qcol(flagCol(v, suffix)) =!= OrigNA

  /** Scope from an id table (large brushed selections): broadcast
    * left-join membership test on `idCol`. Returns (augmented df,
    * membership column); the `__sel` helper column remains on the
    * augmented df — prefer [[withIds]], which drops it after the
    * action runs. */
  def withIdScope(
      df: DataFrame,
      ids: DataFrame,
      idCol: String = QcWindows.RowIdCol): (DataFrame, Column) = {
    val marked = df.join(
      broadcast(ids.select(qcol(idCol)).distinct.withColumn("__sel", lit(true))),
      Seq(idCol), "left")
    (marked, coalesce(col("__sel"), lit(false)))
  }

  /** Run one action against an id-table scope and clean up the helper
    * column — the composable form of [[withIdScope]]:
    * {{{ QcActions.withIds(df, idsDf)(QcActions.flagSelected(_, "v", _)) }}} */
  def withIds(
      df: DataFrame,
      ids: DataFrame,
      idCol: String = QcWindows.RowIdCol)(
      action: (DataFrame, Column) => DataFrame): DataFrame = {
    val (marked, scope) = withIdScope(df, ids, idCol)
    action(marked, scope).drop("__sel")
  }

  /** M1 Flag Selected (R/qc_window_app.R:384): brushed set → ManualFlag,
    * guarded. */
  def flagSelected(df: DataFrame, v: String, scope: Column,
      suffix: String = AutoSuffix): DataFrame = {
    val sfx = resolveSuffix(df, suffix)
    setFlag(df, v, scope, ManualFlag, notOrigNA(v, sfx), sfx)
  }

  /** M2 Approve Selected (R/qc_window_app.R:385). */
  def approveSelected(df: DataFrame, v: String, scope: Column,
      suffix: String = AutoSuffix): DataFrame = {
    val sfx = resolveSuffix(df, suffix)
    setFlag(df, v, scope, Approved, notOrigNA(v, sfx), sfx)
  }

  /** M3 Unflag Selected (R/qc_window_app.R:386). */
  def unflagSelected(df: DataFrame, v: String, scope: Column,
      suffix: String = AutoSuffix): DataFrame = {
    val sfx = resolveSuffix(df, suffix)
    setFlag(df, v, scope, Unchecked, notOrigNA(v, sfx), sfx)
  }

  /** M4 Flag ENTIRE Window (R/qc_window_app.R:389-393): `windowScope`
    * is the current window's predicate (e.g. `col("win_dense") === k`). */
  def flagWindow(df: DataFrame, v: String, windowScope: Column,
      suffix: String = AutoSuffix): DataFrame = {
    val sfx = resolveSuffix(df, suffix)
    setFlag(df, v, windowScope, ManualFlag, notOrigNA(v, sfx), sfx)
  }

  /** M5 Approve ALL Unflagged in window (R/qc_window_app.R:394-398):
    * guard is `flag == 0 && !is.na(y)` — approves only unchecked,
    * non-missing points. Idempotent. */
  def approveUnflagged(df: DataFrame, v: String, windowScope: Column,
      suffix: String = AutoSuffix): DataFrame = {
    val sfx = resolveSuffix(df, suffix)
    setFlag(df, v, windowScope, Approved,
      qcol(flagCol(v, sfx)) === Unchecked && !QcFlags.isMissing(df, v),
      sfx)
  }

  /** M6 Reset Window (R/qc_window_app.R:399-403). */
  def resetWindow(df: DataFrame, v: String, windowScope: Column,
      suffix: String = AutoSuffix): DataFrame = {
    val sfx = resolveSuffix(df, suffix)
    setFlag(df, v, windowScope, Unchecked, notOrigNA(v, sfx), sfx)
  }

  /** M7 "Flag Selected & Approve Unflagged & Next" — the workhorse
    * (R/qc_window_app.R:406-413, overall_workflow.Rmd:248-250):
    * 1. brushed selection → ManualFlag, UNGUARDED (selected points are
    *    plotted points, which are never OrigNA);
    * 2. the rest of the window (window ∖ selection) where
    *    `flag == 0 && !is.na(y)` → Approved.
    * One projection, two chained `when`s — selection wins. */
  def flagAndApproveRest(
      df: DataFrame,
      v: String,
      selection: Column,
      windowScope: Column,
      suffix: String = AutoSuffix): DataFrame = {
    val f = flagCol(v, resolveSuffix(df, suffix))
    require(df.schema.fieldNames.contains(f), s"flagAndApproveRest: no flag column $f")
    keepMeta(df,
      df.withColumn(f,
        when(selection, lit(ManualFlag))
          .when(windowScope && qcol(f) === Unchecked && !QcFlags.isMissing(df, v),
            lit(Approved))
          .otherwise(qcol(f)).cast(IntegerType)),
      f)
  }

  /** M8 Reset ALL (R/qc_window_app.R:417-419): whole-table reset to
    * Unchecked, OrigNA immune. Idempotent. */
  def resetAll(df: DataFrame, v: String,
      suffix: String = AutoSuffix): DataFrame = {
    val sfx = resolveSuffix(df, suffix)
    setFlag(df, v, lit(true), Unchecked, notOrigNA(v, sfx), sfx)
  }
}
