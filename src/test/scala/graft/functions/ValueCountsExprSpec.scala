package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ValueCountsExprSpec extends SparkSpec {
  import spark.implicits._

  test("valueCounts: counts per distinct item, sorted by item") {
    val out = Seq(Seq("b", "a", "b", "c", "b", "a")).toDF("t")
      .select(valueCounts(col("t")).as("vc"))
      .as[Seq[(String, Long)]].head()
    assert(out == Seq(("a", 2L), ("b", 3L), ("c", 1L)))
  }

  test("valueCounts: empty array → empty; null → null") {
    val df = Seq(Some(Seq.empty[String]), None).toDF("t")
    val out = df.select(valueCounts(col("t")))
      .as[Option[Seq[(String, Long)]]].collect().toSet
    assert(out == Set(Some(Seq.empty[(String, Long)]), None))
  }

  test("valueCounts ≡ explode + groupBy on the bigram stream") {
    // within-row counting must reproduce the explode + groupBy
    // formulation exactly (the interchangeability its Scaladoc's
    // A/B claims rest on)
    val docs = Seq((1L, "the cat sat"), (2L, "aaaa"), (3L, ""), (4L, "xy"))
      .toDF("id", "text")
    val grams = graft.pipeline.TextAnalysis.charNgrams(col("text"), 2)
    val viaShuffle = docs
      .select(col("id"), explode(grams).as("g"))
      .groupBy("id", "g").agg(count(lit(1)).as("k"))
      .as[(Long, String, Long)].collect().toSet
    val viaRow = docs
      .select(col("id"), explode(valueCounts(grams)).as("e"))
      .select(col("id"), col("e.item"), col("e.cnt"))
      .as[(Long, String, Long)].collect().toSet
    assert(viaRow == viaShuffle)
  }

  test("value_counts registered for SQL; matches the DataFrame API") {
    graft.GraftExtensions.register(spark)
    val sql = spark.sql(
      "SELECT value_counts(array('z', 'a', 'z')) AS vc")
      .as[Seq[(String, Long)]].head()
    assert(sql == Seq(("a", 1L), ("z", 2L)))
  }
}
