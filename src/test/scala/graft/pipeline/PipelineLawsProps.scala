package graft.pipeline

import graft.timeseries.TimeSeriesOps
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._

/** ScalaCheck laws for the curation / time-series pipeline operators —
  * the invariants a 100 TB run silently relies on: deterministic
  * sampling must nest, the two sampling implementations must agree,
  * and as-of matches must respect their direction contracts.
  * Spark jobs per case are expensive; minSuccessful stays small.
  */
object PipelineLawsProps extends Properties("PipelineLaws") {

  private lazy val spark = graft.SparkSpec.session

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(10)

  private def keyed(n: Int) = {
    import spark.implicits._
    (0L until n.toLong).map(i => (i, if (i % 3 == 0) "a" else "b"))
      .toDF("id", "stratum")
  }

  // 6-decimal fractions: the granularity rateSample rounds to, so the
  // literal-rate and column-rate paths see identical thresholds
  private val fracGen: Gen[Double] =
    Gen.choose(0, 1000000).map(_ / 1e6)

  property("deterministicSample nests: kept(f2) ⊆ kept(f1) for f2 <= f1") =
    forAll(fracGen, fracGen) { (x, y) =>
      import spark.implicits._
      val (lo, hi) = if (x <= y) (x, y) else (y, x)
      val df = keyed(300)
      val small = Curation.deterministicSample(df, "id", lo)
        .select("id").as[Long].collect().toSet
      val big = Curation.deterministicSample(df, "id", hi)
        .select("id").as[Long].collect().toSet
      small.subsetOf(big)
    }

  property("rateSample == stratifiedSample at the same per-stratum rates") =
    forAll(fracGen, fracGen) { (fa, fb) =>
      import spark.implicits._
      val df = keyed(300)
      val viaLiterals = Curation.stratifiedSample(df, "id", "stratum",
          Map("a" -> fa, "b" -> fb))
        .select("id").as[Long].collect().toSet
      val rates = Seq(("a", fa), ("b", fb)).toDF("stratum", "rate")
      val viaColumn = Curation.rateSample(df, "id", "stratum", rates, "rate")
        .select("id").as[Long].collect().toSet
      viaLiterals == viaColumn
    }

  private val eventsGen: Gen[(List[Int], List[Int])] = for {
    lts <- Gen.nonEmptyListOf(Gen.choose(0, 1000))
    rts <- Gen.listOf(Gen.choose(0, 1000))
  } yield (lts, rts)

  property("asofJoin directions: backward <=, forward >=, nearest is closest") =
    forAll(eventsGen) { case (lts, rts) =>
      import spark.implicits._
      val left = lts.zipWithIndex
        .map { case (t, i) => (i.toLong, "k", t.toLong) }
        .toDF("l_id", "key", "t")
      val right = rts.zipWithIndex
        .map { case (t, i) => (i.toLong, "k", t.toLong) }
        .toDF("r_id", "key", "t")
      def run(dir: String): Map[Long, Option[Long]] =
        TimeSeriesOps.asofJoin(left, right, Seq("key"), "t", "t",
            direction = dir)
          .select("l_id", "r_t").as[(Long, Option[Long])].collect().toMap
      val b = run("backward"); val f = run("forward"); val n = run("nearest")
      val ts = lts.map(_.toLong)
      ts.indices.forall { i =>
        val t = ts(i)
        val bOk = b(i.toLong).forall(_ <= t)
        val fOk = f(i.toLong).forall(_ >= t)
        // nearest: defined iff either side is, at the minimum distance
        val cand = Seq(b(i.toLong), f(i.toLong)).flatten
        val nOk =
          if (cand.isEmpty) n(i.toLong).isEmpty
          else n(i.toLong).exists(m =>
            math.abs(m - t) == cand.map(c => math.abs(c - t)).min)
        bOk && fOk && nOk
      }
    }

  private val seriesGen: Gen[List[Double]] = for {
    n <- Gen.choose(5, 80)
    base <- Gen.choose(-50, 50)
    vals <- Gen.listOfN(n, Gen.choose(-100, 100))
  } yield vals.map(v => base + v / 10.0)

  property("cusum closed form == the sequential recursion on random series") =
    forAll(seriesGen) { vals =>
      import spark.implicits._
      val df = vals.zipWithIndex
        .map { case (v, i) => (i.toLong, "k", i.toLong, v) }
        .toDF("id", "key", "t", "v")
      val out = TimeSeriesOps
        .cusumChangepoints(df, Seq("key"), "t", "v",
          slack = 0.3, threshold = 1.0, orderCols = Seq("id"))
        .select("t", "s_pos", "s_neg").as[(Long, Double, Double)]
        .collect().map(r => r._1 -> ((r._2, r._3))).toMap
      val n = vals.size
      val mu = vals.sum / n
      val sd =
        if (n < 2) 0.0
        else math.sqrt(vals.map(x => (x - mu) * (x - mu)).sum / (n - 1))
      def r4(x: Double) =
        BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      var (sp, sn) = (0.0, 0.0)
      val expect = vals.zipWithIndex.flatMap { case (v, i) =>
        val z = if (sd > 0) (v - mu) / sd else 0.0
        sp = math.max(0.0, sp + z - 0.3)
        sn = math.max(0.0, sn - z - 0.3)
        if (r4(sp) > 1.0 || r4(sn) > 1.0) Some(i.toLong -> ((r4(sp), r4(sn))))
        else None
      }.toMap
      // float tolerance: summation order may differ at the last ulps,
      // surfacing as a 1-ulp difference AFTER rounding to 4 dp
      out.keySet == expect.keySet && out.forall { case (k, (p, ng)) =>
        math.abs(p - expect(k)._1) <= 1e-4 &&
          math.abs(ng - expect(k)._2) <= 1e-4
      }
    }

  private val scd2Gen: Gen[List[(Int, Int)]] = for {
    n <- Gen.choose(1, 60)
    rows <- Gen.listOfN(n, Gen.zip(Gen.choose(0, 2), Gen.choose(0, 3)))
  } yield rows // (key, attr) pairs; time = index

  property("scd2 versions tile each key's axis; folding is idempotent") =
    forAll(scd2Gen) { rows =>
      import spark.implicits._
      val df = rows.zipWithIndex
        .map { case ((k, a), i) => (i.toLong, s"k$k", i.toLong, a) }
        .toDF("id", "key", "t", "attr")
      val hist = TimeSeriesOps.scd2History(df, Seq("key"), "t", Seq("attr"),
        orderCols = Seq("id"))
      val versions = hist
        .select("key", "attr", "valid_from", "valid_to")
        .as[(String, Int, Long, Option[Long])].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._3).toList).toMap
      // per key: intervals chain (to == next from), exactly one open,
      // consecutive versions always change the attribute
      val tiled = versions.forall { case (_, vs) =>
        vs.zip(vs.drop(1)).forall { case (a, b) =>
          a._4.contains(b._3) && a._2 != b._2
        } && vs.count(_._4.isEmpty) == 1
      }
      // idempotence: collapsing the version table again is the identity
      val twice = TimeSeriesOps.scd2History(
        hist.select(col("key"), col("valid_from").as("t"), col("attr")),
        Seq("key"), "t", Seq("attr")).count()
      tiled && twice == hist.count()
    }

  private val keysGen = for {
    n <- Gen.choose(1, 120)
    ks <- Gen.listOfN(n, Gen.choose(0, 25))
  } yield ks

  property("countMin never underestimates; exact at w >= support size") =
    forAll(keysGen) { ks =>
      import spark.implicits._
      val df = ks.map(k => s"k$k").toDF("k")
      val truth = ks.groupBy(k => s"k$k").view.mapValues(_.size.toLong).toMap
      val keys = df.distinct()
      val est = Sketch.countMinEstimate(
        Sketch.countMinCells(df, "k", 3, 16), keys, "k", 3, 16)
        .as[(String, Long)].collect().toMap
      val upper = truth.forall { case (k, n) => est(k) >= n }
      // a roomy sketch (w = 64 >= 26-key support) has some exact row
      // with overwhelming probability; the UPPER-BOUND law is the
      // guarantee, exactness only needs one collision-free row
      val wide = Sketch.countMinEstimate(
        Sketch.countMinCells(df, "k", 4, 512), keys, "k", 4, 512)
        .as[(String, Long)].collect().toMap
      upper && truth.forall { case (k, n) => wide(k) == n }
    }

  property("topKPerGroup == the window-sort reference on random tables") =
    forAll(Gen.choose(1, 80), Gen.choose(1, 6)) { (n, k) =>
      import spark.implicits._
      val rows = (0 until n).map { i =>
        ("g" + (i % 4), i.toLong, ((i * 31) % 13).toDouble)
      }
      val got = Grouped.topKPerGroup(rows.toDF("g", "id", "v"),
          Seq("g"), "v", "id", k)
        .select("g", "rank", "id", "v")
        .as[(String, Int, Long, Double)].collect().toSet
      val want = rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
        rs.sortBy { case (_, id, v) => (-v, id) }.take(k).zipWithIndex
          .map { case ((_, id, v), r) => (g, r + 1, id, v) }
      }.toSet
      got == want
    }

  property("cdcApply is idempotent: re-applying the survivors is identity") =
    forAll(Gen.choose(1, 60)) { n =>
      import spark.implicits._
      val ch = (0 until n).map { i =>
        (i % 7L, i.toLong, if (i % 5 == 0) "D" else "U", i * 1.5)
      }.toDF("k", "seq", "op", "v")
      val once = TimeSeriesOps.cdcApply(ch, Seq("k"), Seq("seq"), "op", "D")
      val again = TimeSeriesOps.cdcApply(
        once.withColumn("op", lit("U")), Seq("k"), Seq("seq"), "op", "D")
      once.select("k", "seq", "v").as[(Long, Long, Double)].collect().toSet ==
        again.select("k", "seq", "v").as[(Long, Long, Double)].collect().toSet
    }

  property("pageRank conserves probability mass (within rounding)") =
    forAll(Gen.choose(2, 12)) { m =>
      import spark.implicits._
      // a random-ish connected graph: chain + chords
      val edges = (0 until m).map(i => (s"n$i", s"n${(i + 1) % (m + 1)}")) ++
        (0 until m by 2).map(i => (s"n$i", s"n${(i * 3 + 2) % (m + 1)}"))
      val ranks = Graph.pageRank(edges.toDF("s", "d"), "s", "d", 3)
        .select("r").as[Double].collect()
      math.abs(ranks.sum - 1.0) < 5e-3 && ranks.forall(_ > 0)
    }

  private val wordGen: Gen[String] = Gen.oneOf("a", "b", "c", "dd")
  private val textGen: Gen[String] =
    Gen.listOfN(8, wordGen).map(_.mkString(" "))

  property("rougeN: identity scores 1; swapping sides swaps prec/rec") =
    forAll(textGen, textGen, Gen.choose(1, 3)) { (t1, t2, n) =>
      import spark.implicits._
      def run(c: String, r: String) =
        TextAnalysis.rougeN(Seq((1L, c, r)).toDF("id", "cand", "ref"),
            "id", "cand", "ref", n)
          .select("clipped", "cand_ngrams", "ref_ngrams", "prec", "rec", "f1")
          .as[(Long, Long, Long, Option[Double], Option[Double], Double)]
          .collect().head
      val self = run(t1, t1)
      val fwd = run(t1, t2)
      val rev = run(t2, t1)
      // identity: every gram clips to itself -> prec = rec = f1 = 1
      self._4.contains(1.0) && self._5.contains(1.0) && self._6 == 1.0 &&
        // clipped count and totals are side-symmetric under swap
        fwd._1 == rev._1 && fwd._2 == rev._3 && fwd._3 == rev._2 &&
        fwd._4 == rev._5 && fwd._5 == rev._4 &&
        // bounds: every ratio sits in [0, 1]
        Seq(fwd._4, fwd._5).flatten.forall(v => v >= 0.0 && v <= 1.0) &&
        fwd._6 >= 0.0 && fwd._6 <= 1.0
    }
}
