package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("kmvDistinct: exact below k, estimator within KMV error above") {
    val small = (0L until 10L).map(i => (i, "g")).toDF("id", "grp")
    val s = Sketch.kmvDistinct(small, "id", k = 16, Seq("grp")).collect()(0)
    assert(s.getAs[Long]("n_sketch") == 10)
    assert(s.getAs[Double]("est_distinct") == 10.0, "below k the count is exact")

    val big = (0L until 1000L).map(i => (i, "g")).toDF("id", "grp")
    val b = Sketch.kmvDistinct(big, "id", k = 32, Seq("grp")).collect()(0)
    assert(b.getAs[Long]("n_sketch") == 32)
    val est = b.getAs[Double]("est_distinct")
    // KMV relative stderr ≈ 1/sqrt(k−1) ≈ 18%; allow 3σ
    assert(est > 450 && est < 1800, s"estimate $est too far from 1000")
  }

  test("kmv sketch ignores duplicates and survives relayout") {
    val df = (0L until 500L).map(i => (i % 100, "g")).toDF("id", "grp")
    val once = Sketch.kmvDistinct(df, "id", k = 64, Seq("grp")).collect()(0)
    // 100 distinct keys cap a k=64 sketch at 64 retained hashes
    assert(once.getAs[Long]("n_sketch") == 64)
    val a = Sketch.kmvDistinct(df, "id", k = 32, Seq("grp"))
      .select("est_distinct").as[Double].head()
    val b = Sketch.kmvDistinct(df.repartition(13), "id", k = 32, Seq("grp"))
      .select("est_distinct").as[Double].head()
    assert(a == b, "hash bottom-k must be layout-independent")
    val c = Sketch.kmvDistinct(df.union(df), "id", k = 32, Seq("grp"))
      .select("est_distinct").as[Double].head()
    assert(a == c, "duplicate rows must not move the sketch")
  }

  test("hash60 is a 60-bit non-negative value") {
    val hs = (0L until 200L).toDF("id")
      .select(Sketch.hash60(col("id")).as("h")).as[Long].collect()
    assert(hs.forall(h => h >= 0 && h < (1L << 60)))
    assert(hs.distinct.length == 200, "no collisions on a tiny domain")
  }
}
