package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class IvmSpec extends SparkSpec {
  import spark.implicits._

  private def rollup(df: DataFrame) =
    df.groupBy(col("k")).agg(
      count(col("v")).as("n"), sum(col("v")).as("sv"),
      min(col("v")).as("mn"), max(col("v")).as("mx"))

  test("merge(agg(A), agg(B)) == agg(A union B), keys from either side") {
    // key 1 in both halves, key 2 only in the view, key 3 only in the
    // delta — the merged view must cover all three
    val a = Seq((1L, 2.0), (1L, 4.0), (2L, 10.0)).toDF("k", "v")
    val b = Seq((1L, 6.0), (3L, -1.0)).toDF("k", "v")
    val merged = Ivm.merge(rollup(a), rollup(b), Seq("k"), Seq(
      "n" -> Ivm.Add, "sv" -> Ivm.Add,
      "mn" -> Ivm.TakeMin, "mx" -> Ivm.TakeMax))
      .orderBy("k").as[(Long, Long, Double, Double, Double)].collect().toSeq
    val full = rollup(a.unionByName(b))
      .orderBy("k").as[(Long, Long, Double, Double, Double)].collect().toSeq
    assert(merged == full, s"merged $merged != full $full")
    assert(merged == Seq((1L, 3L, 12.0, 2.0, 6.0), (2L, 1L, 10.0, 10.0, 10.0),
      (3L, 1L, -1.0, -1.0, -1.0)), s"got $merged")
  }

  test("merge is associative across three delta batches") {
    val batches = (0 until 3).map(i =>
      Seq((1L, i + 1.0), (2L, i * 2.0)).toDF("k", "v"))
    val rules = Seq[(String, Ivm.MergeFn)]("n" -> Ivm.Add, "sv" -> Ivm.Add,
      "mn" -> Ivm.TakeMin, "mx" -> Ivm.TakeMax)
    val leftFold = Ivm.merge(
      Ivm.merge(rollup(batches(0)), rollup(batches(1)), Seq("k"), rules),
      rollup(batches(2)), Seq("k"), rules)
      .orderBy("k").as[(Long, Long, Double, Double, Double)].collect().toSeq
    val full = rollup(batches.reduce(_ unionByName _))
      .orderBy("k").as[(Long, Long, Double, Double, Double)].collect().toSeq
    assert(leftFold == full, s"$leftFold != $full")
  }
}
