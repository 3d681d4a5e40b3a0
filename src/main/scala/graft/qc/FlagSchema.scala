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
  * attributes `qc_vars`/`qc_suffix` (R/qc_flags.R:87-90). The Spark
  * equivalent is column `Metadata` stamped on each flag column by
  * [[QcFlags.addFlags]] ([[MetaBaseKey]]/[[MetaSuffixKey]]), which
  * survives any transform that carries the attribute by reference and
  * is re-attached by the mutation operators that rewrite flag columns.
  * Consumers resolve the effective suffix with [[resolveSuffix]]:
  * explicit argument > carried metadata > [[DefaultSuffix]] — so a
  * custom-suffix user threads the suffix exactly once, at addFlags.
  * The naming convention (a variable is flagged iff both `v` and
  * `v + suffix` are columns) remains the fallback, mirroring the
  * reference's own attribute-less branch (R/qc_flags.R:223-234,
  * R/qc_plots.R:143-145).
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

  /** Sentinel suffix value meaning "resolve from column metadata, then
    * fall back to [[DefaultSuffix]]" — the `qc_suffix` attribute lookup
    * of the reference (R/qc_flags.R:223-227). The default for every
    * consumer operator, so custom-suffix tables work untreaded. */
  val AutoSuffix: String = ""

  /** Metadata key on a flag column naming its base variable — the
    * per-column equivalent of the reference's `qc_vars` attr
    * (R/qc_flags.R:87-88). */
  val MetaBaseKey: String = "graft.qc.base"

  /** Metadata key on a flag column recording the suffix it was created
    * with — the `qc_suffix` attr (R/qc_flags.R:89-90). */
  val MetaSuffixKey: String = "graft.qc.suffix"

  /** The Metadata blob [[QcFlags.addFlags]] stamps on flag columns. */
  def flagMeta(base: String, suffix: String): Metadata =
    new MetadataBuilder()
      .putString(MetaBaseKey, base)
      .putString(MetaSuffixKey, suffix)
      .build()

  /** Distinct suffixes carried by flag-column metadata (schema-only
    * inspection; no job). */
  def metaSuffixes(df: DataFrame): Seq[String] =
    df.schema.fields.toSeq.collect {
      case f if f.metadata.contains(MetaSuffixKey) =>
        f.metadata.getString(MetaSuffixKey)
    }.distinct

  /** Resolve the effective flag suffix: a non-empty explicit `suffix`
    * wins; otherwise the (unique) metadata-carried suffix; otherwise
    * [[DefaultSuffix]]. Ambiguity (two flag generations with different
    * suffixes on one table) must be broken explicitly. */
  def resolveSuffix(df: DataFrame, suffix: String = AutoSuffix): String =
    if (suffix.nonEmpty) suffix
    else metaSuffixes(df) match {
      case Seq(s) => s
      case Seq()  => DefaultSuffix
      case many =>
        throw new IllegalArgumentException(
          s"resolveSuffix: table carries multiple flag suffixes " +
            s"(${many.mkString(", ")}); pass one explicitly")
    }

  /** Re-attach `orig`'s column metadata for `n` onto `out` — used by
    * operators that rewrite a flag column with a `when` projection
    * (which would otherwise drop the Metadata, since only plain
    * attribute references carry it through an Alias). */
  def keepMeta(orig: DataFrame, out: DataFrame, n: String): DataFrame = {
    val m = orig.schema(n).metadata
    if (m == Metadata.empty) out else out.withMetadata(n, m)
  }

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
  def numericCols(df: DataFrame, suffix: String = AutoSuffix): Seq[String] = {
    val sfx = resolveSuffix(df, suffix)
    df.schema.fields.toSeq
      .filter(f => isNumeric(f.dataType) && !f.name.endsWith(sfx))
      .map(_.name)
  }

  /** Variables that currently carry a flag column: every column name
    * ending with the resolved suffix whose base column also exists
    * (R/qc_plots.R:139-146). Equivalent to the reference's `qc_vars`
    * attr read with the sniffing fallback — the metadata informs the
    * suffix, the live schema is authoritative for membership (so
    * dropped variables disappear, like the reference's re-sniff). */
  def flaggedVars(df: DataFrame, suffix: String = AutoSuffix): Seq[String] = {
    val sfx = resolveSuffix(df, suffix)
    val names = df.schema.fieldNames
    val nameSet = names.toSet
    names.toSeq
      .filter(n => n.endsWith(sfx) && n.length > sfx.length)
      .map(_.dropRight(sfx.length))
      .filter(nameSet.contains)
  }

  /** All columns ending with the resolved suffix (flag columns, whether
    * or not the base variable survives) — matches qc_apply_flags's
    * discovery (R/qc_flags.R:196). */
  def flagCols(df: DataFrame, suffix: String = AutoSuffix): Seq[String] = {
    val sfx = resolveSuffix(df, suffix)
    df.schema.fieldNames.toSeq.filter(n =>
      n.endsWith(sfx) && n.length > sfx.length)
  }

  /** Schema predicate: does this df look like a qc_add_flags result?
    * (R/qc_flags.R:223-234, suffix-sniffing branch). */
  def isFlaggedDf(df: DataFrame, suffix: String = AutoSuffix): Boolean =
    flagCols(df, suffix).nonEmpty
}
