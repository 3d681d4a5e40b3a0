package graft.timeseries

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class TimeSeriesOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val quotes = Seq(
    (1L, "A", ts("2024-01-01 00:00:00"), 10.0),
    (2L, "A", ts("2024-01-01 00:05:00"), 11.0),
    (3L, "B", ts("2024-01-01 00:02:00"), 99.0)
  ).toDF("q_id", "sym", "q_ts", "px")

  private val trades = Seq(
    (100L, "A", ts("2024-01-01 00:04:00")), // → quote 1
    (101L, "A", ts("2024-01-01 00:05:00")), // equal ts → quote 2
    (102L, "B", ts("2024-01-01 00:01:00")), // before any quote → null
    (103L, "C", ts("2024-01-01 00:10:00"))  // key with no quotes → null
  ).toDF("t_id", "sym", "t_ts")

  test("asofJoin: backward match per key, >= at equal timestamps, null when none") {
    val out = TimeSeriesOps.asofJoin(trades, quotes, Seq("sym"), "t_ts", "q_ts")
      .select("t_id", "r_q_id").as[(Long, Option[Long])].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (100L, Some(1L)), (101L, Some(2L)), (102L, None), (103L, None)))
  }

  test("asofJoin honors tolerance") {
    val out = TimeSeriesOps.asofJoin(trades, quotes, Seq("sym"), "t_ts", "q_ts",
        toleranceSecs = Some(60.0))
      .select("t_id", "r_q_id").as[(Long, Option[Long])].collect().sortBy(_._1)
    // trade 100 is 4 min after quote 1 → outside 60s tolerance
    assert(out.toSeq == Seq(
      (100L, None), (101L, Some(2L)), (102L, None), (103L, None)))
  }

  test("asofJoin carries the full right payload, prefixed") {
    val out = TimeSeriesOps.asofJoin(trades, quotes, Seq("sym"), "t_ts", "q_ts")
    assert(out.columns.toSet.intersect(Set("r_q_id", "r_q_ts", "r_px")).size == 3)
    val px = out.filter(col("t_id") === 101L).select("r_px").as[Double].head()
    assert(px == 11.0)
  }

  test("asofJoin forward: earliest right at-or-after, <= at equal timestamps") {
    val out = TimeSeriesOps.asofJoin(trades, quotes, Seq("sym"), "t_ts", "q_ts",
        direction = "forward")
      .select("t_id", "r_q_id").as[(Long, Option[Long])].collect().sortBy(_._1)
    // 100 (00:04) → quote 2 (00:05); 101 equal ts → quote 2;
    // 102 (00:01) → quote 3 (00:02); 103 key C → none
    assert(out.toSeq == Seq(
      (100L, Some(2L)), (101L, Some(2L)), (102L, Some(3L)), (103L, None)))
  }

  test("asofJoin nearest: closer side wins, exact ties go backward") {
    // trade at 00:02:30 sits 150s after quote 1 and 150s before quote 2
    // → exact tie → backward (quote 1); trade at 00:04 is 60s from
    // quote 2 vs 240s from quote 1 → forward wins
    val t = Seq(
      (200L, "A", ts("2024-01-01 00:02:30")),
      (201L, "A", ts("2024-01-01 00:04:00")),
      (202L, "B", ts("2024-01-01 00:01:00")), // only a later quote exists
      (203L, "C", ts("2024-01-01 00:01:00"))
    ).toDF("t_id", "sym", "t_ts")
    val out = TimeSeriesOps.asofJoin(t, quotes, Seq("sym"), "t_ts", "q_ts",
        direction = "nearest")
      .select("t_id", "r_q_id").as[(Long, Option[Long])].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (200L, Some(1L)), (201L, Some(2L)), (202L, Some(3L)), (203L, None)))
    // tolerance applies to the chosen side's distance
    val tol = TimeSeriesOps.asofJoin(t, quotes, Seq("sym"), "t_ts", "q_ts",
        direction = "nearest", toleranceSecs = Some(100.0))
      .select("t_id", "r_q_id").as[(Long, Option[Long])].collect().sortBy(_._1)
    assert(tol.toSeq == Seq(
      (200L, None), (201L, Some(2L)), (202L, Some(3L)), (203L, None)))
    intercept[IllegalArgumentException] {
      TimeSeriesOps.asofJoin(t, quotes, Seq("sym"), "t_ts", "q_ts",
        direction = "sideways")
    }
  }

  test("sessionize: gap splits, per-key independence, 0-based ids") {
    val ev = Seq(
      (1L, "u1", ts("2024-01-01 00:00:00")),
      (2L, "u1", ts("2024-01-01 00:30:00")),
      (3L, "u1", ts("2024-01-01 02:00:00")), // 90 min gap → new session
      (4L, "u2", ts("2024-01-01 00:00:00"))
    ).toDF("id", "user", "t")
    val out = TimeSeriesOps.sessionize(ev, Seq("user"), "t", gapSecs = 3600.0,
        orderCols = Seq("id"))
      .select("id", "session_id").as[(Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 0L)))
  }

  test("rangeJoin: containment matching across bucket boundaries, keys respected") {
    val intervals = Seq(
      ("u1", 10L, ts("2024-01-01 23:00:00"), ts("2024-01-02 01:00:00")), // spans midnight
      ("u2", 20L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:30:00"))
    ).toDF("user", "iv_id", "start", "end")
    val points = Seq(
      (1L, "u1", ts("2024-01-02 00:30:00")), // inside, other side of bucket edge
      (2L, "u1", ts("2024-01-01 22:59:59")), // just before
      (3L, "u2", ts("2024-01-01 00:30:00")), // boundary inclusive
      (4L, "u1", ts("2024-01-01 00:15:00"))  // right time, wrong key
    ).toDF("id", "user", "t")
    val out = TimeSeriesOps.rangeJoin(points, intervals, "t", "start", "end",
        keys = Seq("user"))
      .select("id", "iv_id").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 10L), (3L, 20L)))
  }

  test("funnelCounts: strict order, greedy-earliest anchors, monotone counts") {
    val ev = Seq(
      // u1 completes in order
      (1L, "u1", "signup", 1L), (2L, "u1", "view", 2L), (3L, "u1", "purchase", 3L),
      // u2: pre-signup view ignored; post-signup view at 5 is the
      // anchor, so the purchase at 4 does NOT count
      (4L, "u2", "view", 1L), (5L, "u2", "signup", 2L),
      (6L, "u2", "view", 5L), (7L, "u2", "purchase", 4L),
      // u3: no view → stops after signup
      (8L, "u3", "signup", 1L), (9L, "u3", "purchase", 2L),
      // u4: never signs up → counted nowhere
      (10L, "u4", "view", 1L), (11L, "u4", "purchase", 2L)
    ).toDF("id", "user", "type", "t")
    val out = TimeSeriesOps.funnelCounts(ev, "user", "type", "t",
        Seq("signup", "view", "purchase"))
      .orderBy("step_idx")
      .as[(Long, String, Long)].collect().toSeq
    assert(out == Seq((0L, "signup", 3L), (1L, "view", 2L),
      (2L, "purchase", 1L)))
  }

  test("rollingStats: trailing RANGE frame per key, peers share frames") {
    val ev = Seq(
      (1L, "u1", ts("2024-01-01 00:00:00"), 10.0),
      (2L, "u1", ts("2024-01-01 00:30:00"), 20.0),
      (3L, "u1", ts("2024-01-01 01:15:00"), 30.0), // 00:00 now out of 1h range
      (4L, "u1", ts("2024-01-01 01:15:00"), 40.0), // tie: same frame as row 3
      (5L, "u2", ts("2024-01-01 00:30:00"), 7.0)   // other key: isolated
    ).toDF("id", "user", "t", "v")
    val out = TimeSeriesOps.rollingStats(ev, Seq("user"), "t", "v",
        windowSecs = 3600L, carry = Seq("id"))
      .select("id", "roll_n", "roll_sum").as[(Long, Long, Double)]
      .collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, 1L, 10.0),          // only itself
      (2L, 2L, 30.0),          // 00:00 within 1h (inclusive)
      (3L, 3L, 90.0),          // 00:30 + both peers at 01:15
      (4L, 3L, 90.0),          // RANGE peer: identical frame
      (5L, 1L, 7.0)))
  }

  test("rollingStats is partition-layout invariant") {
    val ev = (0L until 200L).map(i =>
        (i, s"u${i % 5}", new Timestamp(i * 47000L), i.toDouble))
      .toDF("id", "user", "t", "v")
    def run(df: org.apache.spark.sql.DataFrame) =
      TimeSeriesOps.rollingStats(df, Seq("user"), "t", "v", 600L, Seq("id"))
        .select("id", "roll_n", "roll_sum").as[(Long, Long, Double)]
        .collect().sortBy(_._1).toSeq
    assert(run(ev) == run(ev.repartition(7)))
  }

  test("ewma: adjust=false recursion seeded at the frame's oldest row") {
    val ev = Seq(
      (1L, "u", ts("2024-01-01 00:00:00"), 10.0),
      (2L, "u", ts("2024-01-01 00:01:00"), 20.0),
      (3L, "u", ts("2024-01-01 00:02:00"), 30.0)
    ).toDF("id", "user", "t", "v")
    val out = TimeSeriesOps.ewma(ev, Seq("user"), "t", "v",
        alpha = 0.5, lookback = 50, orderCols = Seq("id"))
      .select("id", "ewma").as[(Long, Double)].collect().sortBy(_._1).toSeq
    // s1=10; s2=.5*10+.5*20=15; s3=.5*15+.5*30=22.5
    assert(out == Seq((1L, 10.0), (2L, 15.0), (3L, 22.5)))
  }

  test("ewma: lookback truncates the frame (seed re-anchors)") {
    val ev = Seq(
      (1L, "u", ts("2024-01-01 00:00:00"), 100.0),
      (2L, "u", ts("2024-01-01 00:01:00"), 0.0),
      (3L, "u", ts("2024-01-01 00:02:00"), 0.0)
    ).toDF("id", "user", "t", "v")
    val out = TimeSeriesOps.ewma(ev, Seq("user"), "t", "v",
        alpha = 0.5, lookback = 2, orderCols = Seq("id"))
      .select("id", "ewma").as[(Long, Double)].collect().sortBy(_._1).toSeq
    // row 3's frame is [0, 0] — the 100 fell out of the lookback
    assert(out == Seq((1L, 100.0), (2L, 50.0), (3L, 0.0)))
  }

  test("gapStats: inter-arrival seconds per key, singleton keys drop out") {
    val ev = Seq(
      (1L, "u1", ts("2024-01-01 00:00:00")),
      (2L, "u1", ts("2024-01-01 00:01:00")),
      (3L, "u1", ts("2024-01-01 00:04:00")),
      (4L, "u2", ts("2024-01-01 00:00:00"))  // one event → no gaps
    ).toDF("id", "user", "t")
    val out = TimeSeriesOps.gapStats(ev, Seq("user"), "t", Seq("id"))
      .select("user", "n_gaps", "avg_gap_s", "min_gap_s", "max_gap_s")
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(out == Seq(("u1", 2L, 120.0, 60.0, 180.0)))
  }

  test("sessionStats aggregates count and span per session") {
    val ev = Seq(
      (1L, "u1", ts("2024-01-01 00:00:00")),
      (2L, "u1", ts("2024-01-01 00:30:00"))
    ).toDF("id", "user", "t")
    val s = TimeSeriesOps.sessionize(ev, Seq("user"), "t", 3600.0, Seq("id"))
    val r = TimeSeriesOps.sessionStats(s, Seq("user"), "t").collect()(0)
    assert(r.getAs[Long]("n_events") == 2)
    assert(r.getAs[Timestamp]("t_end").getTime -
      r.getAs[Timestamp]("t_start").getTime == 30 * 60000L)
  }

  test("scd2History: consecutive equal attrs collapse, nulls are real versions") {
    val ev = Seq(
      (1L, "u", ts("2024-01-01 00:00:00"), Some("a")),
      (2L, "u", ts("2024-01-01 01:00:00"), Some("a")), // collapses into v1
      (3L, "u", ts("2024-01-01 02:00:00"), Some("b")),
      (4L, "u", ts("2024-01-01 03:00:00"), None),      // null attr = version
      (5L, "u", ts("2024-01-01 04:00:00"), None),      // collapses into v3
      (6L, "u", ts("2024-01-01 05:00:00"), Some("b"))  // b re-opens
    ).toDF("id", "user", "t", "attr")
    val out = TimeSeriesOps.scd2History(ev, Seq("user"), "t", Seq("attr"),
        orderCols = Seq("id"))
      .orderBy("valid_from")
      .select("attr", "valid_from", "valid_to", "is_current")
      .as[(Option[String], Timestamp, Option[Timestamp], Boolean)]
      .collect().toSeq
    assert(out == Seq(
      (Some("a"), ts("2024-01-01 00:00:00"), Some(ts("2024-01-01 02:00:00")), false),
      (Some("b"), ts("2024-01-01 02:00:00"), Some(ts("2024-01-01 03:00:00")), false),
      (None,      ts("2024-01-01 03:00:00"), Some(ts("2024-01-01 05:00:00")), false),
      (Some("b"), ts("2024-01-01 05:00:00"), None, true)))
  }

  test("scd2History intervals tile the key's time axis without overlap") {
    val ev = (0 until 200).map { i =>
      (i.toLong, s"u${i % 3}", ts(f"2024-01-01 ${i / 30}%02d:${i % 30 * 2}%02d:00"),
        (i * 7 % 5) / 2) // attr cycles with repeats
    }.toDF("id", "user", "t", "attr")
    val out = TimeSeriesOps.scd2History(ev, Seq("user"), "t", Seq("attr"),
        orderCols = Seq("id"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user").orderBy("valid_from")
    // every version's close equals the next version's open; exactly one
    // open (current) version per key
    val bad = out.withColumn("__next", lead(col("valid_from"), 1).over(w))
      .filter(!(col("valid_to") <=> col("__next"))).count()
    assert(bad == 0, "valid_to must equal the next version's valid_from")
    val cur = out.filter(col("is_current")).groupBy("user").count()
      .select("count").as[Long].collect().toSeq
    assert(cur == Seq(1L, 1L, 1L))
  }

  test("cusumChangepoints matches the sequential CUSUM recursion") {
    // level shift halfway: the detector must fire after the shift
    val vals = (0 until 60).map(i => if (i < 30) 10.0 else 14.0)
    val ev = vals.zipWithIndex.map { case (v, i) =>
      (i.toLong, "k", ts(f"2024-01-01 00:${i}%02d:00"), v)
    }.toDF("id", "key", "t", "v")
    val slack = 0.25
    val out = TimeSeriesOps.cusumChangepoints(ev, Seq("key"), "t", "v",
        slack = slack, threshold = 2.0, orderCols = Seq("id"))
      .select("t", "s_pos", "s_neg").as[(Timestamp, Double, Double)]
      .collect().sortBy(_._1.getTime).toSeq
    // reference recursion on the same standardization
    val n = vals.size
    val mu = vals.sum / n
    val sd = math.sqrt(vals.map(x => (x - mu) * (x - mu)).sum / (n - 1))
    var (sp, sn) = (0.0, 0.0)
    val expect = vals.zipWithIndex.flatMap { case (v, i) =>
      val z = (v - mu) / sd
      sp = math.max(0.0, sp + z - slack)
      sn = math.max(0.0, sn - z - slack)
      // Spark round() is HALF_UP (and s >= 0), not rint's HALF_EVEN
      def r4(x: Double) =
        BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      val (rp, rn) = (r4(sp), r4(sn))
      if (rp > 2.0 || rn > 2.0)
        Some((ts(f"2024-01-01 00:${i}%02d:00"), rp, rn))
      else None
    }
    assert(out.nonEmpty, "level shift must trip the detector")
    assert(out.map(r => (r._1, r._2, r._3)) == expect)
    // full-series standardization: the below-mean first half drifts the
    // NEGATIVE side (which then decays only gradually after the shift);
    // the positive side can accumulate only once the shift happens
    val shift = ts("2024-01-01 00:30:00").getTime
    assert(out.filter(_._2 > 2.0).forall(_._1.getTime >= shift),
      "positive side must fire only after the level shift")
    assert(out.exists(r => r._3 > 2.0 && r._1.getTime < shift),
      "negative side must catch the below-mean first regime")
  }

  test("cdcApply: last writer wins per key, trailing deletes drop the key") {
    // key 1: U(v=1) then U(v=2)         -> survives with v=2
    // key 2: U(v=3) then D              -> dropped
    // key 3: D then U(v=4)              -> revived with v=4
    // key 4: two changes at the same ts -> the higher seq wins
    val ch = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10L, "U", 1.0),
      (1L, ts("2024-01-01 00:00:01"), 11L, "U", 2.0),
      (2L, ts("2024-01-01 00:00:00"), 20L, "U", 3.0),
      (2L, ts("2024-01-01 00:00:01"), 21L, "D", 0.0),
      (3L, ts("2024-01-01 00:00:00"), 30L, "D", 0.0),
      (3L, ts("2024-01-01 00:00:01"), 31L, "U", 4.0),
      (4L, ts("2024-01-01 00:00:00"), 40L, "U", 5.0),
      (4L, ts("2024-01-01 00:00:00"), 41L, "U", 6.0)
    ).toDF("k", "t", "seq", "op", "v")
    val got = TimeSeriesOps.cdcApply(ch, Seq("k"), Seq("t", "seq"), "op", "D")
      .select("k", "seq", "v").orderBy("k")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 11L, 2.0), (3L, 31L, 4.0), (4L, 41L, 6.0)),
      s"got $got")
  }

  test("decompose: value = trend + seasonal + residual, trend exact") {
    // one series, 1 h cadence over 2 days: constant 10 plus a +2 bump
    // at hour 6 of each day (the seasonal signal)
    val rows = (0 until 48).map { h =>
      val bump = if (h % 24 == 6) 2.0 else 0.0
      (h.toLong, "s",
        ts(f"2024-01-${1 + h / 24}%02d ${h % 24}%02d:00:00"), 10.0 + bump)
    }
    val df = rows.toDF("id", "key", "t", "v")
    val out = TimeSeriesOps.decompose(df, Seq("key"), "t", "v",
        halfWindowSecs = 43200L)
      .select("id", "v", "trend", "seasonal", "residual")
      .as[(Long, Double, Double, Double, Double)].collect()
    assert(out.length == 48)
    // identity holds to rounding everywhere
    assert(out.forall(r => math.abs(r._2 - (r._3 + r._4 + r._5)) < 1e-6),
      "additive identity must hold")
    // the hour-6 phase carries the positive seasonal, others negative-ish
    val byId = out.map(r => r._1 -> r._4).toMap
    assert(byId(6L) > byId(7L) && byId(30L) > byId(29L),
      s"bump hour must have the largest seasonal: $byId")
    // layout-free
    val again = TimeSeriesOps.decompose(df.repartition(7), Seq("key"),
        "t", "v", halfWindowSecs = 43200L)
      .select("id", "v", "trend", "seasonal", "residual")
      .as[(Long, Double, Double, Double, Double)].collect()
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("decompose: null key / null timestamp rows are dropped") {
    // the join-back formulation (and a SQL JOIN USING replay) drops
    // rows without a key or phase; the window formulation must match
    val rows = Seq[(Long, String, java.sql.Timestamp, Double)](
      (1L, "s", ts("2024-01-01 00:00:00"), 10.0),
      (2L, "s", ts("2024-01-01 01:00:00"), 12.0),
      (3L, null, ts("2024-01-01 02:00:00"), 99.0), // null key
      (4L, "s", null, 99.0)) // null timestamp
    val out = TimeSeriesOps.decompose(rows.toDF("id", "key", "t", "v"),
        Seq("key"), "t", "v", halfWindowSecs = 43200L)
      .select("id").as[Long].collect().sorted.toSeq
    assert(out == Seq(1L, 2L), s"null key/ts rows must drop, got $out")
  }
}
