package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class L2SqExprSpec extends SparkSpec {
  import spark.implicits._

  test("squared L2 matches the interpreted fold it replaces, bit-for-bit") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 6.0, 3.0))).toDF("a", "b")
    assert(df.select(l2Sq(col("a"), col("b"))).as[Double].head() == 25.0)
    // the exact fold nearestCentroid used before the native kernel
    val fold = df.select(
      aggregate(zip_with(col("a"), col("b"),
        (x, y) => (x - y) * (x - y)), lit(0.0), _ + _))
      .as[Double].head()
    assert(fold == 25.0)
    // irrational case: both paths must produce the IDENTICAL double
    val irr = Seq((Seq(0.1, 0.2, 0.7), Seq(0.3, 0.9, 0.05))).toDF("a", "b")
    val native = irr.select(l2Sq(col("a"), col("b"))).as[Double].head()
    val folded = irr.select(
      aggregate(zip_with(col("a"), col("b"),
        (x, y) => (x - y) * (x - y)), lit(0.0), _ + _))
      .as[Double].head()
    assert(java.lang.Double.doubleToLongBits(native) ==
      java.lang.Double.doubleToLongBits(folded), s"$native != $folded")
  }

  test("float and int arrays widen to double exactly") {
    val f = Seq((Seq(1.5f, 2.5f), Seq(0.5f, 0.5f))).toDF("a", "b")
    assert(f.select(l2Sq(col("a"), col("b"))).as[Double].head() == 5.0)
    val m = Seq((Seq(3.0, 5.0), Seq(1L, 2L))).toDF("a", "b")
    assert(m.select(l2Sq(col("a"), col("b"))).as[Double].head() == 13.0)
  }

  test("null array, null element, and length mismatch all yield null") {
    val df = Seq(
      (1L, Some(Seq(Some(1.0), Some(2.0))), Some(Seq(Some(3.0), Some(4.0)))),
      (2L, None, Some(Seq(Some(3.0)))),
      (3L, Some(Seq(Some(1.0), None)), Some(Seq(Some(3.0), Some(4.0)))),
      (4L, Some(Seq(Some(1.0))), Some(Seq(Some(3.0), Some(4.0)))))
      .toDF("id", "a", "b")
    val out = df.select(col("id"), l2Sq(col("a"), col("b")))
      .as[(Long, Option[Double])].collect().sortBy(_._1)
    assert(out(0)._2.contains(8.0))
    assert(out(1)._2.isEmpty, "null array → null")
    assert(out(2)._2.isEmpty, "null element → null")
    assert(out(3)._2.isEmpty, "length mismatch → null")
  }

  test("registered for SQL; matches the DataFrame API") {
    graft.GraftExtensions.register(spark)
    Seq((Seq(1.0, 2.0), Seq(3.0, 5.0))).toDF("a", "b")
      .createOrReplaceTempView("l2sq_t")
    assert(spark.sql("SELECT l2_sq(a, b) FROM l2sq_t")
      .as[Double].head() == 13.0)
  }
}
