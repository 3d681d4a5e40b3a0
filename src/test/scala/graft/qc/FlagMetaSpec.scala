package graft.qc

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** qc_vars/qc_suffix carriage as column Metadata (qc_flags.R:87-92) and
  * the A2/A3 warning channel (qc_summary.R:51-66).
  *
  * The contract under test: a user who picks a custom suffix at
  * addFlags threads it exactly ONCE — every downstream operator
  * (actions, masks, progress, plot feeds, window catalog) resolves it
  * from the carried Metadata, surviving filters, projections, joins,
  * and the flag-rewriting actions themselves.
  */
class FlagMetaSpec extends SparkSpec {

  import FlagSchema._

  private def base: DataFrame = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, Some(10.0), Some(1.0)),
      (2L, None, Some(2.0)),
      (3L, Some(30.0), None),
      (4L, Some(40.0), Some(4.0))
    ).toDF("id", "temp", "rh")
  }

  test("addFlags stamps base + suffix metadata on each flag column") {
    val f = QcFlags.addFlags(base, vars = Seq("temp", "rh"), suffix = "_chk")
    val m = f.schema("temp_chk").metadata
    assert(m.getString(MetaBaseKey) == "temp")
    assert(m.getString(MetaSuffixKey) == "_chk")
    assert(metaSuffixes(f) == Seq("_chk"))
    assert(resolveSuffix(f) == "_chk")
  }

  test("resolveSuffix falls back to DefaultSuffix on unstamped tables") {
    assert(resolveSuffix(base) == DefaultSuffix)
    // suffix-sniffing fallback still works on a metadata-less flagged df
    val sniffed = base.withColumn("temp_qcflag", lit(0))
    assert(flaggedVars(sniffed) == Seq("temp"))
  }

  test("explicit suffix always wins over metadata") {
    val f = QcFlags.addFlags(base, vars = Seq("temp", "rh"), suffix = "_chk")
    assert(resolveSuffix(f, "_other") == "_other")
  }

  test("two flag generations with different suffixes must be disambiguated") {
    val f1 = QcFlags.addFlags(base, vars = Seq("temp"), suffix = "_a")
    val f2 = QcFlags.addFlags(f1, vars = Seq("rh"), suffix = "_b")
    intercept[IllegalArgumentException] { resolveSuffix(f2) }
    // explicit still fine
    assert(flaggedVars(f2, "_a") == Seq("temp"))
  }

  test("repeated addFlags reuses the carried suffix (attr merge, qc_flags.R:87-92)") {
    val f1 = QcFlags.addFlags(base, vars = Seq("temp"), suffix = "_chk")
    val f2 = QcFlags.addFlags(f1, vars = Seq("rh")) // no suffix threaded
    assert(f2.columns.contains("rh_chk"))
    assert(flaggedVars(f2).toSet == Set("temp", "rh"))
  }

  test("metadata survives filter/select/join and flag-rewriting actions") {
    val f = QcFlags.addFlags(base, vars = Seq("temp", "rh"), suffix = "_chk")
    val transformed = f
      .filter(col("id") =!= 99L)
      .select(f.columns.map(col).toIndexedSeq: _*)
      .join(base.select(col("id")), Seq("id"))
    assert(resolveSuffix(transformed) == "_chk")
    // actions rewrite the flag column with a when() projection —
    // keepMeta must re-attach the stamp
    val acted = QcActions.flagSelected(transformed, "temp", col("id") === 1L)
    assert(resolveSuffix(acted) == "_chk")
    assert(acted.schema("temp_chk").metadata.getString(MetaBaseKey) == "temp")
    val m7 = QcActions.flagAndApproveRest(acted, "temp", col("id") === 4L, lit(true))
    assert(resolveSuffix(m7) == "_chk")
  }

  test("custom-suffix end-to-end without re-threading the suffix") {
    val f = QcFlags.addFlags(base, vars = Seq("temp", "rh"), suffix = "_chk")

    // M1: flag id=1 on temp — suffix resolved from metadata
    val acted = QcActions.flagSelected(f, "temp", col("id") === 1L)
    assert(acted.filter(col("id") === 1L).select("temp_chk").head.getInt(0)
      == ManualFlag)

    // M5: approve unflagged — still no suffix argument
    val approved = QcActions.approveUnflagged(acted, "temp", lit(true))
    assert(approved.filter(col("id") === 4L).select("temp_chk").head.getInt(0)
      == Approved)

    // A1: progress summary resolves the suffix too
    val prog = QcProgress.summary(approved)
    assert(prog.select("variable").collect().map(_.getString(0)).toSet
      == Set("temp", "rh"))
    val tempRow = prog.filter(col("variable") === "temp").head
    assert(tempRow.getAs[Long]("total") == 3L) // one NA

    // P5: apply-flags mask — id=1 (manual-flagged) nulled, flags dropped
    val masked = QcFlags.applyFlags(approved)
    assert(!masked.columns.exists(_.endsWith("_chk")))
    assert(masked.filter(col("id") === 1L).head.isNullAt(1))

    // transfer: new flag column restamped with base=rh2
    val t = QcFlags.transfer(approved.withColumn("rh2", col("rh")), "rh", "rh2")
    assert(t.schema("rh2_chk").metadata.getString(MetaBaseKey) == "rh2")
    assert(t.schema("rh2_chk").metadata.getString(MetaSuffixKey) == "_chk")
  }

  test("plot feeds and window catalog resolve the carried suffix") {
    val f = QcFlags.addFlags(base, vars = Seq("temp", "rh"), suffix = "_chk")
    val acted = QcActions.flagSelected(f, "temp", col("id") === 4L)
    assert(QcPlotFeed.hideBad(acted, "temp").count() == 2) // id2 OrigNA, id4 flagged out... ids 1,3 stay
    assert(QcPlotFeed.flagClass(acted, "temp", ManualFlag).count() == 1)
    assert(QcPlotFeed.secondaryChoices(acted, "id", "temp") == Seq("rh"))
    val melted = QcPlotFeed.meltVars(acted, Seq("id"))
    assert(melted.count() == 8)
    assert(QcPlotFeed.rawCleanUnion(acted).count() == 8)
  }

  test("summaryWithChecks surfaces A2/A3 warnings through the reporter") {
    val f = QcFlags.addFlags(base, vars = Seq("temp", "rh"), suffix = "_chk")
    // seed an A2 inconsistency: null out a value AFTER flag init
    val inconsistent = f.withColumn("temp",
      when(col("id") === 1L, lit(null)).otherwise(col("temp")))
    // seed an A3 domain violation on rh's flag
    val outOfDomain = inconsistent.withColumn("rh_chk",
      when(col("id") === 3L, lit(7)).otherwise(col("rh_chk")).cast("int"))

    val rep = new QcProgress.Reporter.Buffering
    val prog = QcProgress.summaryWithChecks(outOfDomain, reporter = rep)
    // summary still returned (warn-and-continue, qc_summary.R:51-66)
    assert(prog.count() == 2)
    val msgs = rep.messages
    assert(msgs.exists(m => m.startsWith("temp:") && m.contains("NA count")))
    assert(msgs.exists(m => m.startsWith("rh:") && m.contains("outside") &&
      m.contains("7")))
    // and a clean table warns nothing
    val rep2 = new QcProgress.Reporter.Buffering
    QcProgress.summaryWithChecks(f, reporter = rep2)
    assert(rep2.messages.isEmpty)
  }
}
