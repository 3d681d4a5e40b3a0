package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WinnowExprSpec extends SparkSpec {
  import spark.implicits._

  test("winnowing guarantee: a shared run of >= w+k-1 chars shares a fingerprint") {
    val k = 5
    val w = 4
    val common = "thequickbrownfoxjumpsoverthelazydog" // 35 > w+k-1 = 8
    val docs = Seq(
      (1L, s"zzzzyyyyxxxx${common}ppppqqqq"),
      (2L, s"aaaabbbbcccc${common}ddddeeee"))
      .toDF("id", "text")
    val fps = docs.select(col("id"), winnow(col("text"), k, w).as("fp"))
    val Array(a, b) = fps.orderBy("id").as[(Long, Seq[Long])].collect().map(_._2)
    assert(a.intersect(b).nonEmpty,
      "documents sharing a long substring must share a fingerprint")
    // and the sets are sorted+distinct, suitable for sortedIntersectCount
    assert(a == a.sorted && a.distinct == a)
    val ic = fps.as("x").join(fps.as("y"), $"x.id" < $"y.id")
      .select(sortedIntersectCount($"x.fp", $"y.fp")).as[Long].head()
    assert(ic == a.intersect(b).length.toLong)
  }

  test("fingerprint density: selections are a small fraction of grams") {
    val text = (1 to 200).map(i => s"word$i").mkString(" ")
    val fp = Seq(text).toDF("t").select(winnow(col("t"), 5, 8)).as[Seq[Long]].head()
    val nGrams = text.length - 5 + 1
    assert(fp.nonEmpty && fp.length < nGrams / 2,
      s"winnowing must sparsify: ${fp.length} of $nGrams grams kept")
  }

  test("edge cases: empty → empty set, shorter than k → one gram, deterministic") {
    val out = Seq((1L, ""), (2L, "ab"), (3L, "ab"))
      .toDF("id", "t").select(col("id"), winnow(col("t"), 5, 4).as("fp"))
      .as[(Long, Seq[Long])].collect().sortBy(_._1)
    assert(out(0)._2.isEmpty)
    assert(out(1)._2.length == 1)
    assert(out(1)._2 == out(2)._2, "identical input → identical fingerprints")
  }

  test("SQL registration with literal k/w") {
    graft.GraftExtensions.register(spark)
    val viaSql = spark.sql("SELECT winnow('hello world hello', 5, 4) AS fp")
      .as[Seq[Long]].head()
    val viaCol = Seq("hello world hello").toDF("t")
      .select(winnow(col("t"), 5, 4)).as[Seq[Long]].head()
    assert(viaSql == viaCol)
  }
}
