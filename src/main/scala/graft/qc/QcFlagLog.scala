package graft.qc

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-sourced flag mutations — SURVEY §7.3, the scale answer to the
  * reference's by-reference table mutation (qc_window_app.R:362 etc.).
  *
  * Instead of rewriting a 100 TB table per interactive click, each
  * M1-M8 action appends a TINY event row; the current flag state is a
  * deterministic FOLD of the base flags through the event log in
  * sequence order, with each action's guard evaluated against the
  * folded state (exactly sequential-application semantics). The full
  * log doubles as the audit trail the reference's export rationale
  * asks for ("preserve raw + record of assigned flags",
  * overall_workflow.Rmd:187-189).
  *
  * Event scopes mirror the action algebra:
  *  - point:  a brushed row id (M1-M3, M7's selection)
  *  - window: every row of a window id (M4-M6, M7's approve-rest)
  *  - global: every row (M8)
  *
  * Fold cost at scale: one shuffle join on rowid for point events
  * (broadcast when the brushed sets are small — the common case), one
  * broadcast join on win_id for window events, one broadcast for
  * globals, then a narrow per-row fold over the row's few applicable
  * events. Mutation cost: appending rows to a log table.
  */
object QcFlagLog {

  import FlagSchema._

  /** Guard kinds, matching the M-algebra semantics. */
  val GuardNotOrigNA = 0 // flag != -1       (M1-M4, M6, M8)
  val GuardApproveUnchecked = 1 // flag == 0 && !missing (M5, M7 rest)
  val GuardNone = 2 // unguarded            (M7 selection)

  val ScopePoint = 0
  val ScopeWindow = 1
  val ScopeGlobal = 2

  val LogSchema: StructType = StructType(Seq(
    StructField("seq", LongType, nullable = false),
    StructField("variable", StringType, nullable = false),
    StructField("scope", IntegerType, nullable = false),
    StructField("rowid", LongType, nullable = true),
    StructField("win_id", LongType, nullable = true),
    StructField("new_flag", IntegerType, nullable = false),
    StructField("guard", IntegerType, nullable = false)))

  def emptyLog(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      LogSchema)

  /** Event constructors (driver-side row builders; append with
    * unionByName or write to the log table). */
  def pointEvents(seq: Long, v: String, ids: Seq[Long], newFlag: Int,
      guard: Int = GuardNotOrigNA): Seq[(Long, String, Int, Option[Long], Option[Long], Int, Int)] =
    ids.map(id => (seq, v, ScopePoint, Some(id), None, newFlag, guard))

  def windowEvent(seq: Long, v: String, winId: Long, newFlag: Int,
      guard: Int): (Long, String, Int, Option[Long], Option[Long], Int, Int) =
    (seq, v, ScopeWindow, None, Some(winId), newFlag, guard)

  def globalEvent(seq: Long, v: String, newFlag: Int,
      guard: Int = GuardNotOrigNA): (Long, String, Int, Option[Long], Option[Long], Int, Int) =
    (seq, v, ScopeGlobal, None, None, newFlag, guard)

  /** Fold the event log onto the base table: for every flagged variable
    * with events, the final flag is the base flag threaded through the
    * row's applicable events in `seq` order, guards evaluated against
    * the running state. Rows without events pass through untouched.
    *
    * `broadcastEventLimit` bounds the broadcast hints: point/window
    * event tables broadcast only while the variable's event count for
    * that scope stays under it — a year-long interactive history (or a
    * replayed audit log) can exceed broadcast limits, and an
    * unconditional hint would OOM the driver instead of degrading to a
    * shuffle join. Above the limit the join runs un-hinted
    * (sort-merge/shuffled-hash on rowid/win_id — the scale-safe
    * shape); results are identical. (Compacting the folded state into
    * a new base — [[LoggedQcSession.done]] + re-open — is the
    * complementary lever when the log itself gets unwieldy; the
    * fallback makes the fold correct either way.) */
  def fold(
      base: DataFrame,
      log: DataFrame,
      idCol: String = QcWindows.RowIdCol,
      winIdCol: String = QcWindows.WinIdCol,
      suffix: String = AutoSuffix,
      broadcastEventLimit: Long = 5L * 1000 * 1000): DataFrame = {
    val sfx = resolveSuffix(base, suffix)
    // driver-sized by construction: distinct flagged-variable NAMES —
    // schema-sized, not data-sized (each must resolve to a flag column
    // of `base`, so the require below bounds it by base's width)
    val vars = log.select("variable").distinct().collect().map(_.getString(0))
    // driver-sized by construction: ≤ |vars| × 3 scope rows. One tiny
    // aggregate decides every broadcast hint below — the grouped event
    // tables are at most event-count-sized, so the per-(variable,
    // scope) event count is a sound upper bound for the hint decision.
    val eventCounts = log.groupBy(col("variable"), col("scope")).count()
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap

    vars.foldLeft(base) { (df, v) =>
      val f = flagCol(v, sfx)
      require(df.schema.fieldNames.contains(f), s"fold: no flag column $f")
      val lv = log.filter(col("variable") === v)
      def hinted(t: DataFrame, scope: Int): DataFrame =
        if (eventCounts.getOrElse((v, scope), 0L) <= broadcastEventLimit)
          broadcast(t)
        else t

      val pt = lv.filter(col("scope") === ScopePoint)
        .groupBy(col("rowid").as(idCol))
        .agg(collect_list(struct(col("seq"), col("new_flag"), col("guard")))
          .as("__pe"))
      val wn = lv.filter(col("scope") === ScopeWindow)
        .groupBy(col("win_id").as(winIdCol))
        .agg(collect_list(struct(col("seq"), col("new_flag"), col("guard")))
          .as("__we"))
      val gl = lv.filter(col("scope") === ScopeGlobal)
        .select(struct(col("seq"), col("new_flag"), col("guard")).as("__g"))
        .agg(collect_list(col("__g")).as("__ge"))

      val hasWin = df.schema.fieldNames.contains(winIdCol)
      val joined0 = df.join(hinted(pt, ScopePoint), Seq(idCol), "left")
      val joined1 =
        if (hasWin) joined0.join(hinted(wn, ScopeWindow), Seq(winIdCol), "left")
        else joined0.withColumn("__we", lit(null))
      // globals aggregate to ONE row (a collect_list of the global
      // events) — always broadcastable as a table; its ROW size is
      // bounded by session compaction, not by this hint
      val joined = joined1.crossJoin(broadcast(gl))

      val emptyEv = array().cast("array<struct<seq:bigint,new_flag:int,guard:int>>")
      val events = array_sort(concat(
        coalesce(col("__pe"), emptyEv),
        coalesce(col("__we"), emptyEv),
        coalesce(col("__ge"), emptyEv)))
      val missing = QcFlags.isMissing(df, v)
      val folded = aggregate(
        events,
        qcol(f),
        (acc, e) =>
          when(e("guard") === GuardNone, e("new_flag"))
            .when(e("guard") === GuardNotOrigNA && acc =!= OrigNA, e("new_flag"))
            .when(e("guard") === GuardApproveUnchecked &&
              acc === Unchecked && !missing, e("new_flag"))
            .otherwise(acc))
      joined
        .withColumn(f, folded.cast(IntegerType))
        .drop("__pe", "__we", "__ge")
    }
  }
}
