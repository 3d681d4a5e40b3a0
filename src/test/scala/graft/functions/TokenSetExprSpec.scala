package graft.functions

import graft.SparkSpec
import graft.pipeline.Dedup
import org.apache.spark.sql.functions._

class TokenSetExprSpec extends SparkSpec {
  import spark.implicits._

  test("tokenSet: sorted, distinct, null elements skipped, null array → null") {
    val df = Seq(
      (1L, Some(Seq(Some("b"), Some("a"), Some("b"), None))),
      (2L, None),
      (3L, Some(Seq.empty[Option[String]])))
      .toDF("id", "toks")
    val out = df.select(col("id"), tokenSet(col("toks")))
      .as[(Long, Option[Seq[Long]])].collect().sortBy(_._1)
    val s = out(0)._2.get
    assert(s.length == 2, "duplicates collapse, null skipped")
    assert(s == s.sorted, "output is sorted")
    assert(out(1)._2.isEmpty, "null array → null")
    assert(out(2)._2.contains(Seq.empty[Long]), "empty array → empty set")
  }

  test("jaccardSorted over tokenSet equals jaccard over raw string sets") {
    val df = Seq(
      ("x y z w", "x y z"),
      ("a b", "c d"),
      ("", ""),
      ("same same", "same"))
      .toDF("ta", "tb")
    val toks = (c: org.apache.spark.sql.Column) =>
      when(length(trim(c)) === 0, array().cast("array<string>"))
        .otherwise(split(trim(c), "\\s+"))
    val out = df.select(
      Dedup.jaccard(array_distinct(toks(col("ta"))),
        array_distinct(toks(col("tb")))).as("ref"),
      Dedup.jaccardSorted(tokenSet(toks(col("ta"))),
        tokenSet(toks(col("tb")))).as("fast"))
      .as[(Double, Double)].collect()
    out.foreach { case (ref, fast) => assert(ref == fast, s"$ref != $fast") }
  }

  test("sortedIntersectCount: two-pointer merge semantics") {
    val df = Seq(
      (Seq(1L, 3L, 5L, 7L), Seq(3L, 4L, 5L, 8L), 2L),
      (Seq.empty[Long], Seq(1L), 0L),
      (Seq(2L, 4L), Seq(2L, 4L), 2L))
      .toDF("a", "b", "expect")
    val out = df.select(sortedIntersectCount(col("a"), col("b")), col("expect"))
      .as[(Long, Long)].collect()
    out.foreach { case (got, want) => assert(got == want) }
  }
}
