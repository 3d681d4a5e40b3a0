package graft.pipeline

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side replica of pageRank's exact arithmetic (same
    * per-iteration HALF_UP rounding). */
  private def ref(
      edges: Seq[(String, String)], iters: Int): Map[String, Double] = {
    val und = edges ++ edges.map(_.swap)
    val deg = und.groupBy(_._1).view.mapValues(_.size).toMap
    val n = deg.size
    def rnd(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    var r = deg.keys.map(k => k -> rnd(1.0 / n)).toMap
    for (_ <- 1 to iters)
      r = deg.keys.map { v =>
        val s = und.collect { case (u, `v`) => r(u) / deg(u) }.sum
        v -> rnd(0.15 / n + 0.85 * s)
      }.toMap
    r
  }

  test("pageRank matches the exact-arithmetic reference on a small graph") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("b", "d"))
    val got = Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", 5)
      .as[(String, Double)].collect().toMap
    assert(got == ref(edges, 5), s"got $got want ${ref(edges, 5)}")
    // hub b outranks every leaf; total mass stays ~1
    assert(got("b") > got("a") && got("b") > got("c") && got("b") > got("d"))
    assert(math.abs(got.values.sum - 1.0) < 1e-3, s"mass ${got.values.sum}")
  }

  test("pageRank at 50 iterations: lineage capped, values match reference") {
    // without the periodic localCheckpoint each iteration nests another
    // join+agg — at 50 the analyzer/optimizer cost dwarfs execution;
    // with the cap this completes quickly and values are unchanged
    // (per-iteration rounding makes the cut bit-exact)
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("b", "d"))
    val df = Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", 50,
      checkpointEvery = 10)
    // the returned plan must be a checkpoint leaf, not 50 nested joins
    val depth = df.queryExecution.optimizedPlan.toString
      .linesIterator.size
    assert(depth < 20, s"plan must be lineage-capped, got $depth nodes")
    val got = df.as[(String, Double)].collect().toMap
    assert(got == ref(edges, 50), s"got $got want ${ref(edges, 50)}")
  }

  test("pageRank on a symmetric path gives mirror-equal ranks") {
    val got = Graph.pageRank(
        Seq(("x", "m"), ("m", "y")).toDF("src", "dst"), "src", "dst", 4)
      .as[(String, Double)].collect().toMap
    assert(got("x") == got("y"), s"got $got")
    assert(got("m") > got("x"))
  }
}
