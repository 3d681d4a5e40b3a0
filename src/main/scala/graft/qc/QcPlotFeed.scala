package graft.qc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** P7-P12 + U1: the data-derivation operators embedded in the
  * reference's plotting/app layer (R/qc_window_app.R:251-326,
  * R/qc_plots.R:45-56, R/ts_viewer.R:264-314). The pixels are out of
  * scope; these produce exactly the row sets each trace/panel renders.
  * All are narrow filters/projections — shuffle-free.
  */
object QcPlotFeed {

  import FlagSchema._

  /** P7: hide-flagged base filter (`hide_bad`,
    * R/qc_window_app.R:255): keep rows whose flag is not bad. */
  def hideBad(df: DataFrame, v: String,
      suffix: String = DefaultSuffix): DataFrame =
    df.filter(qcol(flagCol(v, suffix)) >= 0)

  /** P8: non-missing filter (R/qc_window_app.R:256, 284): drop rows
    * with missing y or missing time before plotting. */
  def nonMissing(df: DataFrame, y: String, t: String): DataFrame =
    df.filter(!QcFlags.isMissing(df, y) && qcol(t).isNotNull)

  /** P9: per-flag-class partition (R/qc_window_app.R:293-295): the rows
    * of one flag class (approved === 1, bad === -2, ...). */
  def flagClass(df: DataFrame, v: String, flagValue: Int,
      suffix: String = DefaultSuffix): DataFrame =
    df.filter(qcol(flagCol(v, suffix)) === flagValue)

  /** P10: secondary-overlay filter (R/qc_window_app.R:304-312): rows
    * where the secondary variable is non-missing AND (if it has a flag
    * column) its own flag >= 0 — independent of hide_bad. */
  def secondaryOverlay(df: DataFrame, v2: String,
      suffix: String = DefaultSuffix): DataFrame = {
    val f2 = flagCol(v2, suffix)
    val flagOk =
      if (df.schema.fieldNames.contains(f2)) qcol(f2) >= 0 else lit(true)
    df.filter(!QcFlags.isMissing(df, v2) && flagOk)
  }

  /** P11: candidate secondary-variable names for the UI selector
    * (R/qc_window_app.R:203-206): every column except the time column,
    * the primary y, flag columns, and engine-internal helpers.
    * Driver-side name arithmetic — no data pass. */
  def secondaryChoices(df: DataFrame, t: String, y: String,
      suffix: String = DefaultSuffix): Seq[String] =
    df.schema.fieldNames.toSeq.filterNot { n =>
      n == t || n == y || n.endsWith(suffix) ||
        n == QcWindows.RowIdCol || n == QcWindows.WinIdCol ||
        n == QcWindows.WinDenseCol || n.startsWith("__")
    }

  /** P12: row subset by brushed id set (R/qc_window_app.R:211-213). */
  def byIds(df: DataFrame, ids: Seq[Long],
      idCol: String = QcWindows.RowIdCol): DataFrame =
    df.filter(selScope(ids, idCol))

  /** Brushed-selection scope predicate (small sets → Catalyst InSet; for
    * large selections use [[QcActions.withIdScope]]'s broadcast join). */
  def selScope(ids: Seq[Long], idCol: String = QcWindows.RowIdCol): Column =
    qcol(idCol).isin(ids.map(java.lang.Long.valueOf): _*)

  /** Long-format melt of all flagged variables — the batch-plot feed
    * (`qc_save_all_plots_png`'s per-variable panel loop,
    * R/qc_plots.R:131-177, flattened to one relation): one row per
    * (id, variable) with the value and its flag. */
  def meltVars(
      df: DataFrame,
      idCols: Seq[String],
      vars: Seq[String] = Nil,
      suffix: String = DefaultSuffix): DataFrame = {
    val vs = if (vars.isEmpty) flaggedVars(df, suffix) else vars
    require(vs.nonEmpty, "meltVars: no flagged variables")
    vs.map { v =>
      df.select(idCols.map(qcol) ++ Seq(
        lit(v).as("variable"),
        qcol(v).cast("double").as("value"),
        qcol(flagCol(v, suffix)).as("flag")): _*)
    }.reduce(_.unionByName(_))
  }

  /** U1: raw ⊎ clean unpivot (R/qc_plots.R:45-56): the check-plot feed —
    * the raw series and the strict-masked clean series (P6, `flag < 1`
    * → null) stacked with a `panel` discriminator. */
  def rawCleanUnion(df: DataFrame, suffix: String = DefaultSuffix): DataFrame = {
    val raw = df.withColumn("panel", lit("raw"))
    val clean = QcFlags.cleanForPlot(df, suffix).withColumn("panel", lit("clean"))
    raw.unionByName(clean)
  }
}
