package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

class SimHash64ExprSpec extends SparkSpec {
  import spark.implicits._

  test("native simhash64: deterministic, near-dup hashes are close in hamming space") {
    val df = Seq(
      ("a", "the quick brown fox jumps over the lazy dog"),
      ("b", "the quick brown fox jumps over the lazy cat"), // 1 token differs
      ("c", "completely different words entirely unrelated text")
    ).toDF("id", "text")
    val h = df.select(col("id"),
      simhash64(split(col("text"), " ")).as("h"))
      .as[(String, Long)].collect().toMap
    def hamming(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(hamming(h("a"), h("b")) < hamming(h("a"), h("c")),
      "one-token edit must be closer than an unrelated doc")
    val h2 = df.select(simhash64(split(col("text"), " "))).as[Long].collect()
    assert(h2.toSet == h.values.toSet, "deterministic across runs")
  }

  test("null array → null; null elements skipped; empty array → 0") {
    val df = Seq(
      (1L, Some(Seq(Some("x"), None))),
      (2L, None),
      (3L, Some(Seq.empty[Option[String]]))
    ).toDF("id", "toks")
    val out = df.select(col("id"), simhash64(col("toks")))
      .as[(Long, Option[Long])].collect().sortBy(_._1)
    assert(out(1)._2.isEmpty, "null input propagates null")
    assert(out(2)._2.contains(0L), "empty array hashes to 0")
    val justX = Seq(Seq("x")).toDF("toks")
      .select(simhash64(col("toks"))).as[Long].head()
    assert(out(0)._2.contains(justX), "null elements are skipped")
  }

  test("SQL registration (GraftExtensions.register on a live session)") {
    graft.GraftExtensions.register(spark)
    val viaSql = spark.sql(
      "SELECT simhash64(array('a','b','c')) AS h").collect()(0).getLong(0)
    val viaCol = Seq(Seq("a", "b", "c")).toDF("t")
      .select(simhash64(col("t"))).as[Long].head()
    assert(viaSql == viaCol, "SQL and DataFrame paths agree")

    val row = spark.sql(
      """SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp,
        |  sorted_intersect_count(token_set(array('a','b','c')),
        |                         token_set(array('b','c','d'))) AS ic,
        |  size(minhash_sig(array('a','b'), 16, 7)) AS siglen
        |""".stripMargin).collect()(0)
    assert(row.getDouble(0) == 11.0)
    assert(row.getLong(1) == 2L)
    assert(row.getInt(2) == 16)
  }

  test("stays inside whole-stage codegen (no UDF fallback)") {
    // non-foldable input (depends on id) so the projection survives
    // constant folding and actually code-generates
    val df = spark.range(4)
      .select(simhash64(split(concat(col("id").cast("string"), lit(" x")), " ")).as("h"))
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" marks a WholeStageCodegen stage in the plan rendering
    assert(plan.contains("*(1) Project"), s"expected codegen'd Project in:\n$plan")
    assert(!plan.contains("ScalaUDF"))
    assert(df.collect().length == 4)
  }

  test("type check rejects non string-array input") {
    val err = intercept[Exception] {
      Seq((1, 2)).toDF("a", "b").select(simhash64(col("a"))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("simhash64") ||
      err.getMessage.toLowerCase.contains("array"))
  }
}
