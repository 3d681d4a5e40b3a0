package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  test("check: one row per rule from one scan; null predicates fail") {
    val df = Seq((Some(1.0), "a"), (None, "b"), (Some(-2.0), "a"))
      .toDF("v", "g")
    val got = Expectations.check(df, Seq(
      "v_not_null" -> col("v").isNotNull,
      "v_positive" -> (col("v") > 0),
      "g_in_domain" -> col("g").isin("a", "b")))
      .orderBy("rule").as[(String, Long, Long)].collect().toSeq
    // v_positive on the null row evaluates to NULL -> counted as a
    // FAILURE (2 fails: the null and the -2), not a silent pass
    assert(got == Seq(("g_in_domain", 0L, 3L), ("v_not_null", 1L, 3L),
      ("v_positive", 2L, 3L)), s"got $got")
  }

  test("check rejects duplicate rule names") {
    val df = Seq(1).toDF("x")
    intercept[IllegalArgumentException] {
      Expectations.check(df, Seq("r" -> lit(true), "r" -> lit(false)))
    }
  }
}
