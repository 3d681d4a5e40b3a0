package graft.timeseries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series relational operators beyond the reference's surface
  * (SURVEY §7.5 family): as-of join and sessionization — the two ops a
  * time-series engine's users reach for first once data stops being a
  * single table.
  *
  * Both are built on the scale-safe keyed-window shape: ONE hash
  * shuffle on the key, sort within partitions, no global order, no
  * custom physical operator needed (the union trick turns as-of into a
  * running `last`, which Catalyst executes as a standard window — the
  * same plan FINANCE-style engines hand-roll natively).
  */
object TimeSeriesOps {

  /** As-of join: for every left row, the single nearest right row of
    * the same key in the given `direction` (and within `toleranceSecs`,
    * if given) — nulls when there is none.
    *
    *  - `"backward"` (default): latest right with `rightTime <= leftTime`
    *  - `"forward"`: earliest right with `rightTime >= leftTime`
    *  - `"nearest"`: whichever of the two is closer in time; exact-tie
    *    distances resolve backward
    *
    * Implemented as union → per-key time-ordered running
    * `last(right, ignoreNulls)` → keep left rows: one shuffle on the
    * key regardless of either side's size, never a per-row probe.
    * Forward is the same running fold over the reversed time order;
    * nearest runs both folds over the ONE exchange (two in-partition
    * sorts, no extra shuffle).
    *
    * Right payload columns come back prefixed with `rightPrefix`. At
    * equal timestamps the right row is visible to the left row
    * (`>=`/`<=` semantics, matching DuckDB/pandas ASOF); ties among
    * right rows at the same instant need a caller-side tiebreaker.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      toleranceSecs: Option[Double] = None,
      rightPrefix: String = "r_",
      direction: String = "backward"): DataFrame = {
    require(keys.nonEmpty, "asofJoin: need at least one key column")
    require(Set("backward", "forward", "nearest")(direction),
      s"asofJoin: direction must be backward|forward|nearest, got $direction")
    val rPayload = right.columns.filterNot(keys.contains).toSeq
    val lPayload = left.columns.filterNot(keys.contains).toSeq

    val rSide = right.select(
      keys.map(col) ++
        lPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col(rightTime).as("__t"), lit(0).as("__side"),
          struct(rPayload.map(col): _*).as("__r")): _*)
    val rType = rSide.schema("__r").dataType
    val lSide = left.select(
      keys.map(col) ++ lPayload.map(col) ++
        Seq(col(leftTime).as("__t"), lit(1).as("__side"),
          lit(null).cast(rType).as("__r")): _*)

    val part = Window.partitionBy(keys.map(col): _*)
    // backward: rights sort BEFORE lefts at equal __t (side 0 < 1), so
    // an equal-timestamp right is inside the running frame; forward
    // reverses time, where the same side order keeps that visibility
    val wB = part.orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = part.orderBy(col("__t").desc, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def fold(w: org.apache.spark.sql.expressions.WindowSpec) =
      last(col("__r"), ignoreNulls = true).over(w)
    def dist(m: Column): Column =
      abs(col("__t").cast("double") - m(rightTime).cast("double"))

    val u = lSide.unionByName(rSide)
    val withM = direction match {
      case "backward" => u.withColumn("__m", fold(wB))
      case "forward"  => u.withColumn("__m", fold(wF))
      case "nearest"  => u
        .withColumn("__mb", fold(wB)).withColumn("__mf", fold(wF))
        .withColumn("__m",
          when(col("__mb").isNull, col("__mf"))
            .when(col("__mf").isNull, col("__mb"))
            .when(dist(col("__mf")) < dist(col("__mb")), col("__mf"))
            .otherwise(col("__mb")))
        .drop("__mb", "__mf")
    }
    val tolOk = toleranceSecs match {
      case Some(tol) => col("__m").isNotNull && dist(col("__m")) <= tol
      case None => col("__m").isNotNull
    }
    val out = withM
      .filter(col("__side") === 1)
      .withColumn("__m", when(tolOk, col("__m")))
    rPayload.foldLeft(out) { (d, c) =>
      d.withColumn(rightPrefix + c, col("__m")(c))
    }.drop("__m", "__t", "__side")
  }

  /** Range (interval-containment) join: left rows matched to right
    * intervals with `start <= t <= end`, optionally also on equi-keys.
    * BUCKETED, not a cross join: each right interval explodes to the
    * coarse time buckets it overlaps, each left row has exactly one
    * bucket, and the join runs on (keys, bucket) with the containment
    * predicate as a post-filter — the shuffle is keyed, the
    * quadratic blow-up of a naive inequality join never happens.
    * `bucketSecs` should be ≳ the typical interval length so intervals
    * explode to few buckets. */
  def rangeJoin(
      left: DataFrame,
      right: DataFrame,
      leftTime: String,
      rightStart: String,
      rightEnd: String,
      keys: Seq[String] = Nil,
      bucketSecs: Long = 86400L): DataFrame = {
    val lb = left.withColumn("__bucket",
      floor(col(leftTime).cast("double") / bucketSecs).cast("long"))
    val rb = right.withColumn("__bucket",
      explode(sequence(
        floor(col(rightStart).cast("double") / bucketSecs).cast("long"),
        floor(col(rightEnd).cast("double") / bucketSecs).cast("long"))))
    lb.join(rb, keys :+ "__bucket")
      .filter(col(leftTime) >= col(rightStart) && col(leftTime) <= col(rightEnd))
      .drop("__bucket")
  }

  /** Sessionization: per-key 0-based session ids, a new session
    * starting whenever the gap to the previous event exceeds
    * `gapSecs`. The change-counter idiom over a keyed window — one
    * shuffle on the key. `orderCols` should include a unique tiebreaker
    * after the time column for determinism. */
  def sessionize(
      df: DataFrame,
      keys: Seq[String],
      t: String,
      gapSecs: Double,
      orderCols: Seq[String] = Nil,
      outCol: String = "session_id"): DataFrame = {
    val ord = Window.partitionBy(keys.map(col): _*)
      .orderBy((t +: orderCols).map(col): _*)
    val prev = lag(col(t), 1).over(ord)
    val newSession = when(
      prev.isNull ||
        (col(t).cast("double") - prev.cast("double")) > gapSecs, 1L)
      .otherwise(0L)
    df.withColumn(outCol,
      sum(newSession).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1)
  }

  /** Ordered funnel analysis: how many keys (users) reach each step of
    * `steps` IN ORDER — step k counts a key only if some step-k event
    * happens at-or-after that key's earliest valid step-(k−1) arrival
    * (the strict sequential funnel, not mere set membership; `>=`
    * admits same-instant progression). Returns one row per step with
    * `step_idx`, `step`, and `n_keys`, monotonically non-increasing.
    *
    * Scale shape: per step, one key-keyed aggregate (map-side combine)
    * joined to the previous frontier ON THE KEY — every table involved
    * is one row per key, co-partitioned on the same key, so the k-step
    * funnel is k keyed shuffles over key-sized tables, never an event
    * self-join and no per-key event-list state. */
  def funnelCounts(
      df: DataFrame,
      keyCol: String,
      typeCol: String,
      tCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnelCounts: need at least one step")
    val first = df.filter(col(typeCol) === steps.head)
      .groupBy(col(keyCol)).agg(min(col(tCol)).as("__t"))
    val frontiers = steps.tail.scanLeft(first) { (prev, st) =>
      df.filter(col(typeCol) === st)
        .join(prev.select(col(keyCol), col("__t")), Seq(keyCol))
        .filter(col(tCol) >= col("__t"))
        .groupBy(col(keyCol)).agg(min(col(tCol)).as("__t"))
    }
    frontiers.zip(steps).zipWithIndex.map { case ((d, st), i) =>
      d.agg(count(lit(1)).as("n_keys"))
        .select(lit(i.toLong).as("step_idx"), lit(st).as("step"),
          col("n_keys"))
    }.reduce(_ unionByName _)
  }

  /** Rolling time-RANGE aggregates: for every row, stats over the same
    * key's rows in the trailing `windowSecs` seconds (inclusive of the
    * current instant) — the moving average / trailing count every
    * monitoring and feature-engineering pipeline asks of a time-series
    * engine.
    *
    * A RANGE frame (not ROWS): rows at the same millisecond are frame
    * peers and all see the identical frame, so the result is
    * independent of any tie-breaking order — deterministic across
    * engines and partition layouts. The frame is keyed on epoch
    * MILLISECONDS (integer), the finest grain both Spark
    * (`unix_micros DIV 1000`) and DuckDB (`epoch_ms`) truncate to
    * identically.
    *
    * Scale shape: ONE hash shuffle on `keys`, then an in-partition sort
    * and a single running frame per key — the same exchange profile as
    * [[sessionize]]; no self-join, no per-row range probe. Skewed keys
    * are bounded by the per-key data, not the window width.
    */
  def rollingStats(
      df: DataFrame,
      keys: Seq[String],
      t: String,
      v: String,
      windowSecs: Long,
      carry: Seq[String] = Nil): DataFrame = {
    require(windowSecs >= 0, "rollingStats: windowSecs must be >= 0")
    // exact for |micros| < 2^53; floor matches DuckDB's epoch_ms truncation
    val tms = floor(unix_micros(col(t)) / lit(1000.0)).cast("long")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tms)
      .rangeBetween(-windowSecs * 1000L, Window.currentRow)
    df.select((keys.map(col) ++ carry.map(col) :+ col(t) :+ col(v)) ++ Seq(
      count(col(v)).over(w).as("roll_n"),
      sum(col(v)).over(w).as("roll_sum"),
      avg(col(v)).over(w).as("roll_avg"),
      min(col(v)).over(w).as("roll_min"),
      max(col(v)).over(w).as("roll_max")): _*)
  }

  /** Exponentially-weighted moving average (pandas `ewm(adjust=false)`
    * semantics) over a bounded lookback of the last `lookback` rows
    * per key: `s := (1−α)·s + α·x`, seeded with the frame's oldest
    * value. The bound does two jobs: it caps the per-row fold cost,
    * and it keeps the weights (`(1−α)^j`, j < lookback) inside double
    * range — the unbounded recursion cannot be expressed as a finite
    * closed form without `(1−α)^{-i}` overflow. With
    * `(1−α)^lookback ≪ 1` the truncation error is negligible
    * (`0.8^50 ≈ 1e-5` of the oldest value's weight).
    *
    * ONE keyed shuffle; the fold runs over a `collect_list` ROWS frame
    * (bounded: `lookback` elements), so memory per row is O(lookback).
    * Null values would silently skip fold steps (collect_list drops
    * them) — mask or fill first. */
  def ewma(
      df: DataFrame,
      keys: Seq[String],
      t: String,
      v: String,
      alpha: Double,
      lookback: Int = 50,
      orderCols: Seq[String] = Nil): DataFrame = {
    require(alpha > 0 && alpha <= 1, "ewma: alpha must be in (0, 1]")
    require(lookback >= 1, "ewma: lookback must be >= 1")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((col(t) +: orderCols.map(col)): _*)
      .rowsBetween(-(lookback - 1), Window.currentRow)
    val vals = collect_list(col(v)).over(w)
    val folded = aggregate(
      vals,
      struct(lit(0.0).as("s"), lit(false).as("init")),
      (acc, x) => struct(
        when(acc("init"),
          lit(1.0 - alpha) * acc("s") + lit(alpha) * x)
          .otherwise(x).as("s"),
        lit(true).as("init")),
      acc => acc("s"))
    df.withColumn("ewma", folded)
  }

  /** Per-key inter-arrival (gap) statistics: count/avg/min/max of the
    * seconds between consecutive events — the cadence profile that
    * tells you whether a series is regular enough to resample, and the
    * first thing to check before trusting a watermark. Gap arithmetic
    * runs on exact integer MICROSECONDS (the lag difference) and is
    * divided out to seconds only at the end, so both engines aggregate
    * identical integers. The raw `*_gap_us` longs ride along: a caller
    * that needs DECIMAL-ROUNDED seconds must round in integer micro
    * space (`(us + 50) DIV 100 / 1e4`), because `round(us/1e6, 4)` on
    * the double hits half-ulp ties that Spark (BigDecimal HALF_UP on
    * the printed decimal) and SQL engines (binary-double half-away)
    * split differently — a gap of exactly 71.91035 s surfaced as
    * 71.9104 vs 71.9103 at sf0.1. One keyed shuffle: lag + aggregate
    * share the same hash exchange. */
  def gapStats(
      df: DataFrame,
      keys: Seq[String],
      t: String,
      orderCols: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((col(t) +: orderCols.map(col)): _*)
    val gapUs = unix_micros(col(t)) - lag(unix_micros(col(t)), 1).over(w)
    df.select(keys.map(col) :+ gapUs.as("__gap_us"): _*)
      .filter(col("__gap_us").isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n_gaps"),
        sum(col("__gap_us")).as("sum_gap_us"),
        min(col("__gap_us")).as("min_gap_us"),
        max(col("__gap_us")).as("max_gap_us"),
        (sum(col("__gap_us")) / lit(1e6)).as("sum_gap_s"),
        (avg(col("__gap_us")) / lit(1e6)).as("avg_gap_s"),
        (min(col("__gap_us")) / lit(1e6)).as("min_gap_s"),
        (max(col("__gap_us")) / lit(1e6)).as("max_gap_s"))
  }

  /** Type-2 slowly-changing-dimension history from a change-event
    * log: per key, collapse consecutive rows with identical `attrs`
    * into one version, then derive each version's validity interval
    * `[valid_from, valid_to)` from the next version's start
    * (`valid_to` null = current version, flagged `is_current`).
    *
    * The warehouse-standard SCD2 build as two frames over ONE keyed
    * exchange: `lag` over the attribute struct for change detection
    * (null-safe `<=>`, so a null attribute value is a real version,
    * not a perpetual change), then `lead` over the change rows for
    * interval close — the filter preserves partitioning and sort, so
    * Catalyst reuses the exchange rather than re-shuffling.
    * `orderCols` should make the per-key order total (ties between a
    * version's open and close otherwise depend on row order). */
  def scd2History(
      df: DataFrame,
      keys: Seq[String],
      t: String,
      attrs: Seq[String],
      orderCols: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "scd2History: need at least one key column")
    require(attrs.nonEmpty, "scd2History: need at least one attribute")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((t +: orderCols).map(col): _*)
    val attrStruct = struct(attrs.map(col): _*)
    val changed = !(lag(attrStruct, 1).over(w) <=> attrStruct)
    df.withColumn("__chg", changed)
      .filter(col("__chg"))
      .withColumn("valid_from", col(t))
      .withColumn("valid_to", lead(col(t), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select((keys ++ attrs).map(col) :+ col("valid_from") :+
        col("valid_to") :+ col("is_current"): _*)
  }

  /** Two-sided CUSUM change detection: per key, rows where the
    * standardized cumulative drift exceeds `threshold` on either side.
    * The classic recursions `S⁺ᵢ = max(0, S⁺ᵢ₋₁ + zᵢ − slack)` /
    * `S⁻ᵢ = max(0, S⁻ᵢ₋₁ − zᵢ − slack)` look inherently sequential,
    * but each has the closed form `Sᵢ = Cᵢ − min(0, min_{j≤i} Cⱼ)`
    * over the plain cumulative sum `C` of the slack-adjusted values —
    * so the whole detector is expressible as running window sums and
    * running extrema, no iterative state, no UDAF.
    *
    * Scale shape: ONE hash exchange on the key serves all four frames
    * (full-partition mean/stddev for the z-score, then the running
    * sum, then its running min — chained Window stages over the same
    * partitioning and sort). Output is the flagged rows only. */
  def cusumChangepoints(
      df: DataFrame,
      keys: Seq[String],
      t: String,
      v: String,
      slack: Double = 0.5,
      threshold: Double = 4.0,
      orderCols: Seq[String] = Nil,
      roundDp: Int = 4): DataFrame = {
    require(threshold > 0, "cusumChangepoints: threshold must be > 0")
    val part = Window.partitionBy(keys.map(col): _*)
    val ord = part.orderBy((t +: orderCols).map(col): _*)
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val mu = avg(col(v)).over(part)
    val sd = stddev_samp(col(v)).over(part)
    val z = when(sd > 0, (col(v) - mu) / sd).otherwise(lit(0.0))
    val staged = df
      .withColumn("__cp", sum(z - lit(slack)).over(run))
      .withColumn("__cn", sum(-z - lit(slack)).over(run))
      // second Window stage: running extremum OF the running sums —
      // window functions don't nest, but chained stages share the
      // exchange and sort
      .withColumn("s_pos", col("__cp") - least(lit(0.0), min(col("__cp")).over(run)))
      .withColumn("s_neg", col("__cn") - least(lit(0.0), min(col("__cn")).over(run)))
    // threshold compares the ROUNDED statistic (roundDp, default 4 dp):
    // cross-engine float summation noise (~1e-10) cannot flip
    // borderline membership unless the true value sits within that
    // noise of a rounding half-point — coarser grid, lower odds
    staged
      .filter(round(col("s_pos"), roundDp) > threshold ||
        round(col("s_neg"), roundDp) > threshold)
      .select(keys.map(col) :+ col(t) :+ col(v) :+
        round(col("s_pos"), roundDp).as("s_pos") :+
        round(col("s_neg"), roundDp).as("s_neg"): _*)
  }

  /** Per-session summary (count, span) — the aggregation usually
    * chained after [[sessionize]]; one additional groupBy shuffle. */
  def sessionStats(
      sessionized: DataFrame,
      keys: Seq[String],
      t: String,
      sessionCol: String = "session_id"): DataFrame =
    sessionized.groupBy((keys :+ sessionCol).map(col): _*)
      .agg(
        count(lit(1)).as("n_events"),
        min(col(t)).as("t_start"),
        max(col(t)).as("t_end"))

  /** CDC / MERGE-INTO apply: fold a changelog of upserts and deletes
    * into final table state — per key, the change with the highest
    * `seqCols` (lexicographic struct order; make it total or the
    * result depends on row order) wins, and wins of op `deleteOp`
    * drop the key. The batch half of streaming "apply changes":
    * upsert(k, v) then delete(k) then upsert(k, v2) ⇒ k holds v2.
    *
    * Scale shape: ONE key-hashed aggregate with map-side combine —
    * `max_by(payload, seq)` partial-aggregates to a single candidate
    * row per key per partition, so the shuffle carries |keys| rows,
    * not |changelog| rows. The window-rank formulation (`row_number()
    * ... WHERE rk = 1`, the oracle's shape) would sort the full log
    * instead. */
  def cdcApply(
      changes: DataFrame, keys: Seq[String], seqCols: Seq[String],
      opCol: String, deleteOp: String): DataFrame = {
    require(keys.nonEmpty, "cdcApply: need at least one key column")
    require(seqCols.nonEmpty, "cdcApply: need at least one sequence column")
    val payload = changes.columns.filterNot(keys.contains).toSeq
    changes
      .groupBy(keys.map(col): _*)
      .agg(max_by(struct(payload.map(col): _*),
        struct(seqCols.map(col): _*)).as("__last"))
      .filter(col(s"__last.$opCol") =!= deleteOp)
      .select(keys.map(col) ++
        payload.filterNot(_ == opCol).map(c => col(s"__last.$c").as(c)): _*)
  }

  /** Classical additive decomposition (STL-lite):
    * `value = trend + seasonal + residual` per key —
    *  - `trend`: centered time-RANGE moving average, ±`halfWindowSecs`
    *    (e.g. ±12 h turns a diurnal cycle into its local mean);
    *  - `seasonal`: the mean detrended value of the row's phase
    *    (`floor(ms mod period / bucket)` — hour-of-day for
    *    period=24 h, bucket=1 h), per key;
    *  - `residual`: what's left — the anomaly channel [[graft.qc.QcAuto]]'s
    *    seasonal detector thresholds.
    * The trend is EXACT: fixed-precision inputs (`valueDecimals`
    * decimals) are scaled to integers, so the sliding mean is a ratio
    * of exact integers and one double division — bit-identical on any
    * engine, immune to both summation order (engines disagree: Spark
    * accumulates running frames, DuckDB aggregates segment trees) and
    * to round-half ties (a mean of fixed-precision values lands
    * EXACTLY on 6-dp boundaries whenever the frame count divides the
    * scale — the small-integer-ratio trap, so the trend must not be
    * rounded at all). Seasonal/residual then carry full double
    * entropy and take the ordinary round-6 recipe safely.
    *
    * Scale shape: one keyed exchange + in-partition sort for the
    * centered trend frame (the [[rollingStats]] profile), then ONE
    * more full-data exchange re-keying the trend output to
    * (keys, phase) for the seasonal profile, computed as a
    * whole-partition window average (r15: the previous aggregate +
    * broadcast-join-back ran the scan + keyed exchange + trend window
    * TWICE because column pruning defeated exchange reuse; the window
    * form reads the trend output once — measured 2.81 → 1.61 s at
    * sf0.1, the only scale regime it has been validated in). The
    * corpus is never self-joined and never globally sorted; the
    * (keys, phase) window is strictly finer than the per-key ordered
    * window the trend already requires, so no new wide-partition
    * pathology appears at scale.
    *
    * Rows with a NULL key or NULL timestamp are DROPPED (they have no
    * trend frame or phase bucket): this was implicit in the pre-r15
    * aggregate + inner-join-back formulation — and is what a SQL
    * replay's JOIN USING computes — so it is now explicit at the
    * input, keeping the window formulation's null semantics identical
    * to both. */
  def decompose(
      df: DataFrame,
      keys: Seq[String],
      t: String,
      v: String,
      halfWindowSecs: Long,
      periodSecs: Long = 86400L,
      bucketSecs: Long = 3600L,
      valueDecimals: Int = 2): DataFrame = {
    require(halfWindowSecs > 0, "decompose: halfWindowSecs must be > 0")
    require(periodSecs > 0 && bucketSecs > 0 && periodSecs % bucketSecs == 0,
      "decompose: periodSecs must be a multiple of bucketSecs")
    require(valueDecimals >= 0 && valueDecimals <= 6,
      "decompose: valueDecimals in [0, 6]")
    val scale = math.pow(10, valueDecimals)
    val tms = floor(unix_micros(col(t)) / lit(1000.0)).cast("long")
    val ticks = round(col(v) * lit(scale)).cast("long")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tms)
      .rangeBetween(-halfWindowSecs * 1000L, halfWindowSecs * 1000L)
    // null key/timestamp rows dropped (see scaladoc): the r15 window
    // rewrite would otherwise RETAIN them with a null-group seasonal
    // where the old join-back (and a SQL JOIN USING replay) dropped
    // them — a latent cross-engine divergence on null-bearing inputs
    val clean = df.filter(
      (keys.map(col(_).isNotNull) :+ col(t).isNotNull).reduce(_ && _))
    val trended = clean
      .withColumn("__tms", tms)
      .withColumn("trend",
        sum(ticks).over(w).cast("double") /
          (lit(scale) * count(ticks).over(w)))
      .withColumn("phase",
        floor(pmod(col("__tms"), lit(periodSecs * 1000L)) /
          lit(bucketSecs * 1000L)).cast("long"))
    // Seasonal profile as a WHOLE-PARTITION window average over
    // (keys, phase), not aggregate + broadcast join back (r15, guide
    // §2.4/§7.2): `trended` used to feed BOTH the profile aggregate
    // and the join's left side, and column pruning gave the two
    // consumers different subtrees — no ReusedExchange, so the scan +
    // keyed exchange + trend window all executed TWICE. The window
    // form reads the trend output once: one scan, and the second
    // exchange re-keys rows the plan already holds (measured
    // 2.81 -> 1.26 s min-of-3 at sf0.1, quiet host both sides; plan
    // 2 scans -> 1, oracle PASS sf0.01 + sf0.1 — the 6-dp round sits
    // on the same per-group double sums, DuckDB-replayable as before).
    val wSeason = Window.partitionBy((keys :+ "phase").map(col): _*)
    trended
      .withColumn("seasonal",
        round(avg(col(v) - col("trend")).over(wSeason), 6))
      // residual stays UNROUNDED: value, the exact-integer trend, and
      // the rounded seasonal are all bit-identical across engines, so
      // the left-to-right subtraction is too — while rounding it would
      // re-enter the tie trap (value−trend−seasonal is an exact
      // ≤7-decimal rational that can land ON the 6-dp boundary).
      .withColumn("residual", col(v) - col("trend") - col("seasonal"))
      .drop("__tms")
  }
}
