package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // a skewed table: one hot key (90% of rows) + a tail
  private def skewed = (0L until 1000L)
    .map(i => (if (i < 900) "hot" else s"k${i % 7}", i, i * 0.5))
    .toDF("k", "id", "v")

  private def dim = Seq(("hot", 1), ("k0", 2), ("k3", 3), ("absent", 9))
    .toDF("k", "w")

  test("saltedJoin equals the plain inner join, row for row") {
    val plain = skewed.join(dim, Seq("k"))
      .select("k", "id", "v", "w")
      .as[(String, Long, Double, Int)].collect().sorted.toSeq
    val salted = Skew.saltedJoin(skewed, dim, Seq("k"), salt = 8)
      .select("k", "id", "v", "w")
      .as[(String, Long, Double, Int)].collect().sorted.toSeq
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("saltedSumCount equals the direct aggregation") {
    val plain = skewed.groupBy("k")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("n"))
      .as[(String, Double, Long)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    val salted = Skew.saltedSumCount(skewed, Seq("k"), "v", salt = 8)
      .as[(String, Double, Long)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(salted.keySet == plain.keySet)
    salted.foreach { case (k, (s, n)) =>
      assert(n == plain(k)._2, s"count mismatch for $k")
      assert(math.abs(s - plain(k)._1) < 1e-9, s"sum mismatch for $k")
    }
  }

  test("salt=1 degenerates to the plain shapes") {
    assert(Skew.saltedJoin(skewed, dim, Seq("k"), salt = 1).count() ==
      skewed.join(dim, Seq("k")).count())
    assert(Skew.saltedSumCount(skewed, Seq("k"), "v", salt = 1).count() ==
      skewed.select("k").distinct().count())
  }

  test("joinCardinality: total equals the real join's count, hot key first") {
    import spark.implicits._
    // key 7 is hot on both sides (4×3=12 pairs); keys only on one side
    // contribute nothing
    val l = Seq(7L, 7L, 7L, 7L, 1L, 1L, 2L, 9L).toDF("k")
    val r = Seq(7L, 7L, 7L, 1L, 2L, 2L, 5L).toDF("k")
    val out = Skew.joinCardinality(l, r, "k", topK = 3)
      .as[(Long, Long, Long, Long, Long)].collect()
    val realCount = l.join(r, Seq("k")).count()
    assert(out.forall(_._5 == realCount),
      s"total_pairs must equal the executed join: ${out.toSeq} vs $realCount")
    assert(out.head == ((7L, 4L, 3L, 12L, realCount)), s"got ${out.toSeq}")
    assert(out.map(_._1).toSet == Set(7L, 1L, 2L), s"got ${out.toSeq}")
  }
}
