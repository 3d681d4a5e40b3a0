package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GroupedSpec extends SparkSpec {
  import spark.implicits._

  test("topKPerGroup matches the window-sort reference, ties to low id") {
    val df = (0L until 200L).map { i =>
      ("g" + i % 3, i, (i % 7).toDouble)
    }.toDF("g", "id", "v")
    val got = Grouped.topKPerGroup(df, Seq("g"), "v", "id", 4)
      .orderBy("g", "rank")
      .as[(String, Int, Long, Double)].collect().toSeq
    val want = (0L until 200L).map(i => ("g" + i % 3, i, (i % 7).toDouble))
      .groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (g, rows) =>
        rows.sortBy { case (_, id, v) => (-v, id) }.take(4).zipWithIndex
          .map { case ((_, id, v), r) => (g, r + 1, id, v) }
      }
    assert(got == want, s"got $got")
  }

  test("topKPerGroup: groups smaller than k return all rows, ranked") {
    val df = Seq(("a", 1L, 5.0), ("a", 2L, 9.0), ("b", 3L, 1.0))
      .toDF("g", "id", "v")
    val got = Grouped.topKPerGroup(df, Seq("g"), "v", "id", 10)
      .orderBy("g", "rank").as[(String, Int, Long, Double)].collect().toSeq
    assert(got == Seq(("a", 1, 2L, 9.0), ("a", 2, 1L, 5.0),
      ("b", 1, 3L, 1.0)), s"got $got")
  }
}
