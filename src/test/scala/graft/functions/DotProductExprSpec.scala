package graft.functions

import graft.SparkSpec
import graft.pipeline.Vec
import org.apache.spark.sql.functions._

class DotProductExprSpec extends SparkSpec {
  import spark.implicits._

  test("dot product matches the reference fold, left-to-right in double") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
    assert(df.select(dotProduct(col("a"), col("b"))).as[Double].head() == 32.0)
    // equal to the interpreted fold it replaced
    val fold = df.select(
      aggregate(zip_with(col("a"), col("b"), _ * _), lit(0.0), _ + _))
      .as[Double].head()
    assert(fold == 32.0)
  }

  test("float and int arrays widen to double exactly") {
    val f = Seq((Seq(1.5f, 2.5f), Seq(2.0f, 4.0f))).toDF("a", "b")
    assert(f.select(dotProduct(col("a"), col("b"))).as[Double].head() == 13.0)
    val m = Seq((Seq(1.5f, 2.5f), Seq(2L, 4L))).toDF("a", "b")
    assert(m.select(dotProduct(col("a"), col("b"))).as[Double].head() == 13.0)
    val i = Seq((Seq(1, 2), Seq(3, 4))).toDF("a", "b")
    assert(i.select(dotProduct(col("a"), col("b"))).as[Double].head() == 11.0)
    val s = Seq((Seq(1.toShort, 2.toShort), Seq(3.toByte, 4.toByte))).toDF("a", "b")
    assert(s.select(dotProduct(col("a"), col("b"))).as[Double].head() == 11.0)
    val d = Seq((Seq(BigDecimal("1.5"), BigDecimal("2.5")), Seq(2.0, 4.0)))
      .toDF("a", "b")
    assert(d.select(dotProduct(col("a"), col("b"))).as[Double].head() == 13.0)
  }

  test("null array, null element, and length mismatch all yield null") {
    val df = Seq(
      (1L, Some(Seq(Some(1.0), Some(2.0))), Some(Seq(Some(3.0), Some(4.0)))),
      (2L, None, Some(Seq(Some(3.0)))),
      (3L, Some(Seq(Some(1.0), None)), Some(Seq(Some(3.0), Some(4.0)))),
      (4L, Some(Seq(Some(1.0))), Some(Seq(Some(3.0), Some(4.0)))))
      .toDF("id", "a", "b")
    val out = df.select(col("id"), dotProduct(col("a"), col("b")))
      .as[(Long, Option[Double])].collect().sortBy(_._1)
    assert(out(0)._2.contains(11.0))
    assert(out(1)._2.isEmpty, "null array → null")
    assert(out(2)._2.isEmpty, "null element → null")
    assert(out(3)._2.isEmpty, "length mismatch → null")
  }

  test("Vec.cosine through the native kernel: unit vectors, zero-norm guard") {
    val df = Seq(
      (1L, Seq(1.0, 0.0), Seq(0.0, 1.0)),
      (2L, Seq(1.0, 0.0), Seq(1.0, 0.0)),
      (3L, Seq(0.0, 0.0), Seq(1.0, 0.0)))
      .toDF("id", "a", "b")
    val out = df.select(col("id"), Vec.cosine(col("a"), col("b")))
      .as[(Long, Double)].collect().sortBy(_._1)
    assert(out(0)._2 == 0.0)
    assert(out(1)._2 == 1.0)
    assert(out(2)._2 == 0.0, "zero-norm → 0, not divide-by-zero")
  }
}
