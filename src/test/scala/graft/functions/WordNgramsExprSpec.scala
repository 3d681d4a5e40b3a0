package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WordNgramsExprSpec extends SparkSpec {
  import spark.implicits._

  test("wordNgrams non-distinct: every sliding gram, in order") {
    val df = Seq("a b a b c", "one", "", "  padded   ws\ttab  ").toDF("t")
    val out = df.select(wordNgrams(col("t"), 2).as("g"))
      .as[Seq[String]].collect().toSeq
    assert(out(0) == Seq("a b", "b a", "a b", "b c"), "duplicates kept, ordered")
    assert(out(1).isEmpty, "< n tokens → empty")
    assert(out(2).isEmpty, "empty string → empty")
    assert(out(3) == Seq("padded ws", "ws tab"), "trim + any-whitespace split")
  }

  test("wordNgrams distinct: first-occurrence order, set semantics") {
    val out = Seq("a b a b c").toDF("t")
      .select(wordNgrams(col("t"), 2, distinct = true))
      .as[Seq[String]].head()
    assert(out == Seq("a b", "b a", "b c"))
  }

  test("wordNgrams: null input → null; n = 1 yields tokens") {
    val df = Seq(Some("x y"), None).toDF("t")
    val out = df.select(wordNgrams(col("t"), 1)).as[Option[Seq[String]]].collect()
    assert(out.contains(Some(Seq("x", "y"))) && out.contains(None))
  }

  test("word_ngrams registered for SQL; matches the DataFrame API") {
    graft.GraftExtensions.register(spark)
    val sql = spark.sql(
      "SELECT word_ngrams('a b a b c', 2, 1) AS d, word_ngrams('a b a b c', 2) AS a")
      .as[(Seq[String], Seq[String])].head()
    assert(sql._1 == Seq("a b", "b a", "b c"))
    assert(sql._2 == Seq("a b", "b a", "a b", "b c"))
  }

  test("wordNgrams agrees with the composed built-in reference on random text") {
    // reference: transform over token slices (interpreted, slow — but correct)
    val df = Seq(
      "the quick brown fox jumps over the lazy dog the quick brown fox",
      "a a a a a a a a", "x").toDF("t")
    val toks = filter(split(trim(col("t")), "\\s+"), x => length(x) > 0)
    val ref = df.select(
      when(size(toks) - 2 >= 0,
        transform(sequence(lit(0), greatest(size(toks) - 3, lit(0))),
          i => concat_ws(" ", slice(toks, i + lit(1), lit(3)))))
        .otherwise(array().cast("array<string>")).as("g"))
      .as[Seq[String]].collect().toSeq
    val got = df.select(wordNgrams(col("t"), 3).as("g"))
      .as[Seq[String]].collect().toSeq
    assert(got == ref)
  }
}
