package graft.qc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Flag-column data model shared by every QC operator.
  *
  * Domain and naming follow the reference implementation
  * (qctimeseries R/qc_flags.R:3-4, R/qc_summary.R:4-5): one integer
  * flag column per QC'd variable, named `<var><suffix>`, with the
  * closed domain {1 = approved, 0 = unchecked, -1 = original NA,
  * -2 = manual flag}.
  *
  * The reference carries the flagged-variable list as data.frame
  * attributes `qc_vars`/`qc_suffix` (R/qc_flags.R:87-90). Spark column
  * metadata does not reliably survive arbitrary transforms, so —
  * like the reference's own fallback (R/qc_flags.R:223-234,
  * R/qc_plots.R:143-145) — the authoritative source here is the
  * naming convention: a variable is flagged iff both `v` and
  * `v + suffix` are columns.
  */
object FlagSchema {
  /** Flag value: human-approved data point. */
  val Approved: Int = 1
  /** Flag value: not yet checked (the initial state for non-NA points). */
  val Unchecked: Int = 0
  /** Flag value: value was NA at flag-initialization time. Written only by
    * [[QcFlags.addFlags]] and never overwritten by any action (M1-M8). */
  val OrigNA: Int = -1
  /** Flag value: manually flagged bad. */
  val ManualFlag: Int = -2

  /** The closed flag domain (R/qc_summary.R:60). */
  val Domain: Seq[Int] = Seq(ManualFlag, OrigNA, Unchecked, Approved)

  /** Default flag-column suffix (R/qc_flags.R:22). */
  val DefaultSuffix: String = "_qcflag"

  /** Flag-column name for a variable. */
  def flagCol(v: String, suffix: String = DefaultSuffix): String = v + suffix

  /** Column reference by exact name, backtick-quoted so names containing
    * dots (common in data exported from R, the reference's domain) are
    * not parsed as struct-field access. */
  def qcol(n: String): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.col("`" + n.replace("`", "``") + "`")

  private def isNumeric(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _              => false
  }

  /** All numeric columns of `df` that are not themselves flag columns —
    * the reference's `vars = NULL` default (R/qc_flags.R:31-35). */
  def numericCols(df: DataFrame, suffix: String = DefaultSuffix): Seq[String] =
    df.schema.fields.toSeq
      .filter(f => isNumeric(f.dataType) && !f.name.endsWith(suffix))
      .map(_.name)

  /** Variables that currently carry a flag column: every column name
    * ending with `suffix` whose base column also exists
    * (R/qc_plots.R:139-146). */
  def flaggedVars(df: DataFrame, suffix: String = DefaultSuffix): Seq[String] = {
    val names = df.schema.fieldNames
    val nameSet = names.toSet
    names.toSeq
      .filter(n => n.endsWith(suffix) && n.length > suffix.length)
      .map(_.dropRight(suffix.length))
      .filter(nameSet.contains)
  }

  /** All columns ending with `suffix` (flag columns, whether or not the
    * base variable survives) — matches qc_apply_flags's discovery
    * (R/qc_flags.R:196). */
  def flagCols(df: DataFrame, suffix: String = DefaultSuffix): Seq[String] =
    df.schema.fieldNames.toSeq.filter(n =>
      n.endsWith(suffix) && n.length > suffix.length)

  /** Schema predicate: does this df look like a qc_add_flags result?
    * (R/qc_flags.R:223-234, suffix-sniffing branch). */
  def isFlaggedDf(df: DataFrame, suffix: String = DefaultSuffix): Boolean =
    flagCols(df, suffix).nonEmpty
}
