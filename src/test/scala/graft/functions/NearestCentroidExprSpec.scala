package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.functions._

class NearestCentroidExprSpec extends SparkSpec {
  import spark.implicits._

  private def nc(v: Column, cents: Array[(Int, Array[Double])]): Column = {
    val dim = cents.head._2.length
    val flat = cents.flatMap(_._2)
    val ids = cents.map(_._1)
    GraftColumnBridge.column(NearestCentroidExpr(
      GraftColumnBridge.expression(v), flat, ids, dim))
  }

  /** The composition the native kernel replaced — the reference for
    * bit-identity. */
  private def composed(v: Column, cents: Array[(Int, Array[Double])]): Column =
    array_min(array(cents.map { case (cid, c) =>
      struct(l2Sq(v, lit(c)).as("dist"), lit(cid).as("cid"))
    }.toIndexedSeq: _*))

  test("argmin matches the array_min(struct(l2_sq…)) composition bit-for-bit") {
    // irrational coordinates so any arithmetic difference shows up in
    // the low mantissa bits; 37 centroids in shuffled id order
    val rnd = new scala.util.Random(7)
    val cents = rnd.shuffle((0 until 37).toList).map { cid =>
      cid -> Array.fill(8)(rnd.nextDouble() * 2 - 1)
    }.toArray
    val rows = (0 until 200).map(i =>
      (i.toLong, Seq.fill(8)(rnd.nextDouble() * 2 - 1)))
    val df = rows.toDF("id", "v")
    val out = df.select(col("id"),
        nc(col("v"), cents).as("a"), composed(col("v"), cents).as("b"))
      .select(col("id"),
        col("a.dist"), col("a.cid"), col("b.dist"), col("b.cid"))
      .as[(Long, Double, Int, Double, Int)].collect()
    out.foreach { case (id, da, ca, db, cb) =>
      assert(ca == cb, s"row $id: cid $ca != $cb")
      assert(java.lang.Double.doubleToLongBits(da) ==
        java.lang.Double.doubleToLongBits(db), s"row $id: $da != $db")
    }
  }

  test("exact-tie distances break to the LOWEST centroid id") {
    // two identical centroids with ids 9 and 3: dist ties exactly,
    // winner must be 3 (lexicographic (dist, cid) min)
    val cents = Array(9 -> Array(1.0, 0.0), 3 -> Array(1.0, 0.0))
    val got = Seq((1L, Seq(0.25, 0.5))).toDF("id", "v")
      .select(nc(col("v"), cents).getField("cid")).as[Int].head()
    assert(got == 3, s"tie must break to lowest cid, got $got")
  }

  test("null array / null element / dim mismatch assign (null dist, lowest cid) like the composition") {
    // the replaced array_min(struct(...)) puts a null dist FIRST in
    // Spark's struct ordering, so invalid vectors were assigned to the
    // lowest centroid id with a null distance — the kernel must match
    val cents = Array(7 -> Array(0.0, 0.0), 2 -> Array(1.0, 1.0))
    val df = Seq(
      (1L, Some(Seq(Some(1.0), Some(2.0)))),
      (2L, None),
      (3L, Some(Seq(Some(1.0), None))),
      (4L, Some(Seq(Some(1.0)))))
      .toDF("id", "v")
    val out = df.select(col("id"),
        nc(col("v"), cents).getField("dist").as("d"),
        nc(col("v"), cents).getField("cid").as("c"),
        composed(col("v"), cents).getField("dist").as("rd"),
        composed(col("v"), cents).getField("cid").as("rc"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.isNullAt(1), r.getInt(2), r.isNullAt(3), r.getInt(4)))).toMap
    for (id <- Seq(1L, 2L, 3L, 4L)) {
      val (dNull, cid, rdNull, rcid) = out(id)
      assert(dNull == rdNull && cid == rcid,
        s"row $id: kernel ($dNull,$cid) != composition ($rdNull,$rcid)")
    }
    assert(out(2L) == ((true, 2, true, 2)), s"null vec: ${out(2L)}")
    assert(out(3L) == ((true, 2, true, 2)), s"null elem: ${out(3L)}")
    assert(out(4L) == ((true, 2, true, 2)), s"dim mismatch: ${out(4L)}")
  }

  test("a NaN distance never beats a finite one (total double order)") {
    // centroid 0 yields a NaN distance (∞ − ∞); centroid 5 is finite:
    // both the composition (Spark sorts NaN above +∞) and the kernel
    // must pick the finite centroid
    val cents = Array(
      0 -> Array(Double.PositiveInfinity, 0.0), 5 -> Array(0.0, 0.0))
    val df = Seq((1L, Seq(Double.PositiveInfinity, 3.0))).toDF("id", "v")
    val got = df.select(
        nc(col("v"), cents).getField("cid").as("a"),
        composed(col("v"), cents).getField("cid").as("b"))
      .as[(Int, Int)].head()
    assert(got == ((5, 5)), s"NaN must lose to finite: $got")
  }

  test("dist field equals the exact left-to-right sum of squares") {
    val cents = Array(5 -> Array(1.0, 2.0, 3.0))
    val got = Seq((1L, Seq(2.0, 0.0, 4.0))).toDF("id", "v")
      .select(nc(col("v"), cents).getField("dist")).as[Double].head()
    assert(got == 1.0 + 4.0 + 1.0, s"got $got")
  }

  test("structurally identical instances are equal (semanticEquals / CSE)") {
    // same child (as in a resolved plan, where equal attrs compare
    // equal); fresh Arrays each call — the synthesized case-class
    // equals compared them by reference, so plan-fragment dedup never
    // fired; the override compares contents
    val ch = GraftColumnBridge.expression(col("v"))
    def mk(c0: Double) = graft.functions.NearestCentroidExpr(
      ch, Array(c0, 2.0, 3.0, 4.0), Array(0, 1), 2)
    assert(mk(1.0) == mk(1.0))
    assert(mk(1.0).hashCode == mk(1.0).hashCode)
    assert(mk(1.0) != mk(9.0))
  }
}
