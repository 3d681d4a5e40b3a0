package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("kmvDistinct: exact below k, estimator within KMV error above") {
    val small = (0L until 10L).map(i => (i, "g")).toDF("id", "grp")
    val s = Sketch.kmvDistinct(small, "id", k = 16, Seq("grp")).collect()(0)
    assert(s.getAs[Long]("n_sketch") == 10)
    assert(s.getAs[Double]("est_distinct") == 10.0, "below k the count is exact")

    val big = (0L until 1000L).map(i => (i, "g")).toDF("id", "grp")
    val b = Sketch.kmvDistinct(big, "id", k = 32, Seq("grp")).collect()(0)
    assert(b.getAs[Long]("n_sketch") == 32)
    val est = b.getAs[Double]("est_distinct")
    // KMV relative stderr ≈ 1/sqrt(k−1) ≈ 18%; allow 3σ
    assert(est > 450 && est < 1800, s"estimate $est too far from 1000")
  }

  test("kmv sketch ignores duplicates and survives relayout") {
    val df = (0L until 500L).map(i => (i % 100, "g")).toDF("id", "grp")
    val once = Sketch.kmvDistinct(df, "id", k = 64, Seq("grp")).collect()(0)
    // 100 distinct keys cap a k=64 sketch at 64 retained hashes
    assert(once.getAs[Long]("n_sketch") == 64)
    val a = Sketch.kmvDistinct(df, "id", k = 32, Seq("grp"))
      .select("est_distinct").as[Double].head()
    val b = Sketch.kmvDistinct(df.repartition(13), "id", k = 32, Seq("grp"))
      .select("est_distinct").as[Double].head()
    assert(a == b, "hash bottom-k must be layout-independent")
    val c = Sketch.kmvDistinct(df.union(df), "id", k = 32, Seq("grp"))
      .select("est_distinct").as[Double].head()
    assert(a == c, "duplicate rows must not move the sketch")
  }

  test("fixedHistogram: width_bucket bins with under/overflow buckets") {
    val df = Seq(
      ("a", -5.0), ("a", 0.0), ("a", 9.9), ("a", 10.0),
      ("a", 99.9), ("a", 100.0), ("b", 250.0)
    ).toDF("grp", "v")
    val out = Sketch.fixedHistogram(df, "v", 0.0, 100.0, 10, Seq("grp"))
      .select(col("grp"), col("bucket").cast("long"), col("n"))
      .as[(String, Long, Long)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(out == Seq(
      ("a", 0L, 1L),   // -5.0 below lo → underflow bucket
      ("a", 1L, 2L),   // 0.0, 9.9 in [0, 10)
      ("a", 2L, 1L),   // 10.0 lands in the NEXT bin (half-open)
      ("a", 10L, 1L),  // 99.9 in the last real bin
      ("a", 11L, 1L),  // 100.0 at hi → overflow bucket
      ("b", 11L, 1L)), // 250.0 overflow, other group
      s"got $out")
  }

  test("psiDrift: identical cohorts score ~0, a shifted cohort scores high") {
    val same = (0 until 2000).map { i =>
      ("g", (i % 100).toDouble, i % 2 == 0)
    }.toDF("grp", "v", "isA")
    val psi0 = Sketch.psiDrift(same, "v", col("isA"), 0.0, 100.0, 10,
      Seq("grp")).select("psi").as[Double].head()
    assert(math.abs(psi0) < 0.01, s"identical halves must not drift: $psi0")

    val shifted = (0 until 2000).map { i =>
      val isA = i % 2 == 0
      ("g", if (isA) (i % 50).toDouble else 50.0 + i % 50, isA)
    }.toDF("grp", "v", "isA")
    val psi1 = Sketch.psiDrift(shifted, "v", col("isA"), 0.0, 100.0, 10,
      Seq("grp")).select("psi").as[Double].head()
    assert(psi1 > 1.0, s"disjoint supports must drift hard: $psi1")
  }

  test("hash60 is a 60-bit non-negative value") {
    val hs = (0L until 200L).toDF("id")
      .select(Sketch.hash60(col("id")).as("h")).as[Long].collect()
    assert(hs.forall(h => h >= 0 && h < (1L << 60)))
    assert(hs.distinct.length == 200, "no collisions on a tiny domain")
  }

  test("histogramQuantiles: within one bin width of the exact quantile") {
    val n = 2000
    val df = (0 until n).map(i => ((i * 37) % n).toDouble).toDF("v")
    val sorted = (0 until n).map(_.toDouble) // the same multiset, sorted
    val binW = (sorted.last - sorted.head) / 100
    val got = Sketch.histogramQuantiles(df, "v", 100,
      Seq(0.1, 0.25, 0.5, 0.75, 0.9, 1.0))
      .orderBy("q").as[(Double, Double)].collect()
    assert(got.length == 6)
    got.foreach { case (q, est) =>
      val exact = sorted(math.min(n - 1, math.ceil(q * n).toInt - 1))
      assert(math.abs(est - exact) <= binW + 1e-9,
        s"q=$q est=$est exact=$exact")
    }
    // monotone in q
    assert(got.map(_._2).toSeq == got.map(_._2).sorted.toSeq)
  }

  test("kmvSetOps: exact below k; estimator within KMV error above") {
    def sk(lo: Long, hi: Long) =
      (lo until hi).toDF("u").agg(Sketch.kmv("u", 64))
    def ops(a: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame) =
      a.toDF("ka").crossJoin(b.toDF("kb"))
        .select(Sketch.kmvSetOps(col("ka"), col("kb"), 64).as("s"))
        .select("s.est_a", "s.est_b", "s.est_union", "s.est_intersection")
        .as[(Double, Double, Double, Double)].head()
    // small cohorts: union retains < k hashes, everything is EXACT
    val small = ops(sk(0, 10), sk(5, 15))
    assert(small == ((10.0, 10.0, 15.0, 5.0)), s"got $small")
    // large overlapping cohorts: |A|=|B|=600, |A∪B|=900, |A∩B|=300;
    // the k=64 estimator should land within ~3/sqrt(k) ≈ 38%
    val big = ops(sk(0, 600), sk(300, 900))
    assert(math.abs(big._3 - 900) / 900 < 0.38, s"union: $big")
    assert(big._4 > 90 && big._4 < 620, s"intersection: $big")
  }

  test("histogramQuantiles grouped: per-group bounds; constant group collapses") {
    val df = ((0 until 1000).map(i => ("wide", i.toDouble)) ++
      (0 until 50).map(_ => ("const", 7.0))).toDF("g", "v")
    val got = Sketch.histogramQuantiles(df, "v", 100, Seq(0.5, 0.9),
      groupCols = Seq("g"))
      .orderBy("g", "q").as[(String, Double, Double)].collect().toSeq
    val cq = got.filter(_._1 == "const")
    assert(cq.map(_._3) == Seq(7.0, 7.0), s"constant group: $cq")
    val wq = got.filter(_._1 == "wide")
    assert(math.abs(wq(0)._3 - 500.0) <= 10, s"p50: ${wq(0)}")
    assert(math.abs(wq(1)._3 - 900.0) <= 10, s"p90: ${wq(1)}")
  }

  test("countMin: cell table bounded by d*w; totals preserved per row") {
    val df = (0 until 300).map(i => ("k" + i % 30)).toDF("k")
    val cells = Sketch.countMinCells(df, "k", d = 3, w = 8).collect()
    assert(cells.length <= 3 * 8, s"cells ${cells.length} > d*w")
    // every hash row partitions the input: its cells sum to n
    val byRow = cells.groupBy(_.getInt(0)).view
      .mapValues(_.map(_.getLong(2)).sum)
    assert(byRow.toMap == Map(0 -> 300L, 1 -> 300L, 2 -> 300L), s"$byRow")
  }

  test("countMin estimate: never underestimates; exact when w is roomy") {
    val df = (0 until 6).flatMap(i => Seq.fill(i + 1)("k" + i)).toDF("k")
    val keys = df.distinct()
    // wide sketch: 6 keys in 1024 cells -> collisions (p ~ 1.4%/pair)
    // are absent for THIS fixed key set (asserted, not hoped)
    val wide = Sketch.countMinEstimate(
      Sketch.countMinCells(df, "k", 4, 1024), keys, "k", 4, 1024)
      .orderBy("k").as[(String, Long)].collect().toSeq
    assert(wide == (0 until 6).map(i => ("k" + i, (i + 1).toLong)),
      s"got $wide")
    // degenerate w=1: every key collides into the one cell per row,
    // so every estimate is the total row count — the upper bound
    val tight = Sketch.countMinEstimate(
      Sketch.countMinCells(df, "k", 4, 1), keys, "k", 4, 1)
      .select("cms_est").as[Long].collect()
    assert(tight.forall(_ == 21L), s"got ${tight.toSeq}")
  }

  test("hllEstimate: within HLL error across regimes, duplicate-blind, layout-free") {
    // p=8 → 256 registers → typical relative error ~1.04/16 ≈ 6.5%;
    // assert a generous 3-sigma 20% across linear-counting (n < 640)
    // and raw regimes
    for (n <- Seq(100, 1000, 20000)) {
      val df = (0 until n).map(i => s"k$i").toDF("k")
      val est = Sketch.hllEstimate(df, "k", Nil)
        .select("hll_est").as[Double].head()
      assert(math.abs(est - n) / n < 0.20, s"n=$n est=$est")
    }
    // duplicates do not move the estimate; neither does layout
    val dup = (0 until 1000).flatMap(i => Seq.fill(7)(s"k$i")).toDF("k")
    val e1 = Sketch.hllEstimate(dup, "k", Nil)
      .select("hll_est").as[Double].head()
    val e2 = Sketch.hllEstimate(
        (0 until 1000).map(i => s"k$i").toDF("k").repartition(17), "k", Nil)
      .select("hll_est").as[Double].head()
    assert(e1 == e2, "hash sketch must be a pure function of the key set")
  }

  test("hllEstimate grouped: per-group independence, same answer as separate runs") {
    val df = (0 until 3000).map(i => (s"g${i % 3}", s"k${i / (1 + i % 3)}"))
      .toDF("grp", "k")
    val grouped = Sketch.hllEstimate(df, "k", Seq("grp"))
      .orderBy("grp").as[(String, Double)].collect().toSeq
    for ((g, est) <- grouped) {
      val alone = Sketch.hllEstimate(df.filter(col("grp") === g), "k", Nil)
        .select("hll_est").as[Double].head()
      assert(est == alone, s"group $g: $est != $alone")
    }
  }
}
