package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HashFeaturesExprSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "hello world"), (2L, "other text"), (3L, "")).toDF("id", "text")
    .withColumn("payload", encode(col("text"), "UTF-8"))

  test("unit norm, fixed length, deterministic, payload-sensitive") {
    val out = docs.select(col("id"),
        graft.functions.hashFeatures(col("payload"), 16).as("v"))
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    out.foreach { case (_, v) =>
      assert(v.length == 16)
      assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-12)
    }
    assert(out(0)._2 != out(1)._2)
    val again = docs.select(col("id"),
        graft.functions.hashFeatures(col("payload"), 16).as("v"))
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    assert(out.toSeq == again.toSeq)
  }

  test("null payload yields null; empty payload yields a valid vector") {
    val withNull = Seq((1L, Some("x")), (2L, None)).toDF("id", "text")
      .withColumn("payload", encode(col("text"), "UTF-8"))
      .select(col("id"), graft.functions.hashFeatures(col("payload"), 4).as("v"))
      .as[(Long, Option[Seq[Double]])].collect().sortBy(_._1)
    assert(withNull(0)._2.isDefined)
    assert(withNull(1)._2.isEmpty)
    val empty = docs.filter(col("id") === 3L)
      .select(graft.functions.hashFeatures(col("payload"), 4))
      .as[Seq[Double]].head()
    assert(empty.length == 4)
    assert(math.abs(math.sqrt(empty.map(x => x * x).sum) - 1.0) < 1e-12)
  }

  test("hash_features registered for SQL; matches the DataFrame API") {
    graft.GraftExtensions.register(spark)
    docs.createOrReplaceTempView("hf_docs")
    val viaSql = spark.sql(
      "SELECT id, hash_features(payload, 8) AS v FROM hf_docs ORDER BY id")
      .as[(Long, Seq[Double])].collect()
    val viaDf = docs.select(col("id"),
        graft.functions.hashFeatures(col("payload"), 8).as("v"))
      .orderBy("id").as[(Long, Seq[Double])].collect()
    assert(viaSql.toSeq == viaDf.toSeq)
  }
}
