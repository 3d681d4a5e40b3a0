package graft.qc

import graft.SparkSpec
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._

/** ScalaCheck property suites for the engine laws (SURVEY §5.2),
  * run by sbt's native ScalaCheck framework. Spark jobs per case are
  * expensive, so minSuccessful is kept small — the generators cover
  * the flag domain × missing-value space densely even so.
  */
object QcLawsProps extends Properties("QcLaws") {

  private lazy val spark = graft.SparkSpec.session
  import FlagSchema._

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(15)

  private val rowGen: Gen[(Option[Double], Int)] = for {
    flag <- Gen.oneOf(Approved, Unchecked, OrigNA, ManualFlag)
    v <- if (flag == OrigNA) Gen.const(None)
         else Gen.option(Gen.choose(-100.0, 300.0))
    // non-OrigNA rows may still hold values (or not); OrigNA rows are
    // missing by construction, as addFlags guarantees
  } yield (v, flag)

  private val tableGen: Gen[List[(Option[Double], Int)]] =
    Gen.nonEmptyListOf(rowGen)

  private def mk(rows: List[(Option[Double], Int)]) = {
    import spark.implicits._
    rows.zipWithIndex.map { case ((v, f), i) => (i.toLong, v, f) }
      .toDF("id", "v", "v_qcflag")
  }

  property("applyFlags(addFlags(df)) only masks originally-missing values") =
    forAll(Gen.nonEmptyListOf(Gen.option(Gen.choose(-10.0, 10.0)))) { vals =>
      import spark.implicits._
      val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
      val out = QcFlags.applyFlags(QcFlags.addFlags(df, Seq("v")))
        .orderBy("id").select("v").as[Option[Double]].collect().toSeq
      out == vals
    }

  property("progress percentages sum to 100 for any flag table") =
    forAll(tableGen) { rows =>
      val r = QcProgress.summary(mk(rows)).collect()(0)
      val sum = Seq("pct_approved", "pct_unchecked", "pct_missing", "pct_flagged")
        .map(r.getAs[Double]).sum
      math.abs(sum - 100.0) < 0.05
    }

  property("any single action keeps the flag domain closed and -1 immune") =
    forAll(tableGen, Gen.choose(0, 6), Gen.choose(2, 7)) { (rows, action, mod) =>
      val df = mk(rows)
      val scope = pmod(col("id"), lit(mod)) === 0
      val out = action match {
        case 0 => QcActions.flagSelected(df, "v", scope)
        case 1 => QcActions.approveSelected(df, "v", scope)
        case 2 => QcActions.unflagSelected(df, "v", scope)
        case 3 => QcActions.flagWindow(df, "v", scope)
        case 4 => QcActions.approveUnflagged(df, "v", scope)
        case 5 => QcActions.resetWindow(df, "v", scope)
        case 6 => QcActions.resetAll(df, "v")
      }
      import spark.implicits._
      val res = out.orderBy("id").select("v_qcflag").as[Int].collect().toSeq
      val before = rows.map(_._2)
      res.forall(Domain.contains) &&
        before.zip(res).forall { case (b, a) => b != OrigNA || a == OrigNA }
    }

  property("cleanForPlot masks strictly more than applyFlags") =
    forAll(tableGen) { rows =>
      import spark.implicits._
      val df = mk(rows)
      val p5 = QcFlags.applyFlags(df, dropFlags = false)
        .orderBy("id").select("v").as[Option[Double]].collect()
      val p6 = QcFlags.cleanForPlot(df)
        .orderBy("id").select("v").as[Option[Double]].collect()
      p5.zip(p6).forall { case (a5, a6) => a6.isEmpty || a5 == a6 }
    }

  private val upsertGen: Gen[List[(Long, String, Long)]] =
    Gen.nonEmptyListOf(for {
      k <- Gen.choose(0L, 6L)
      v <- Gen.alphaLowerStr.map(_.take(4))
      ver <- Gen.choose(0L, 5L)
    } yield (k, v, ver)).map(
      // one row per (key, version): duplicate (k, ver) rows with
      // different payloads are ambiguous by the upsert contract
      _.groupBy(t => (t._1, t._3)).map(_._2.head).toList)

  property("upsert is idempotent and version-monotone") =
    forAll(upsertGen, upsertGen) { (baseRows, updRows) =>
      import spark.implicits._
      def snap(df: org.apache.spark.sql.DataFrame) =
        df.select("k", "v", "ver").as[(Long, String, Long)].collect().toSet
      val base = baseRows.toDF("k", "v", "ver")
      val upd = updRows.toDF("k", "v", "ver")
      val once = QcExport.upsertByKey(base, upd, Seq("k"), "ver")
      // idempotence: re-applying the same delta changes nothing
      val twice = QcExport.upsertByKey(once, upd, Seq("k"), "ver")
      // monotonicity: no key's version ever decreases
      val baseVers = baseRows.groupBy(_._1).map { case (k, rs) =>
        k -> rs.map(_._3).max }
      val onceSnap = snap(once)
      snap(twice) == onceSnap &&
        onceSnap.groupBy(_._1).forall { case (k, rs) =>
          rs.map(_._3).max >= baseVers.getOrElse(k, Long.MinValue)
        } &&
        onceSnap.size == onceSnap.map(_._1).size // one row per key
    }
}
