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
}
