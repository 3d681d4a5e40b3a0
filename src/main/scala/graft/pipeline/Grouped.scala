package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grouped-ranking operators whose shuffle volume is bounded by the
  * RESULT size, not the input size. The textbook `row_number() OVER
  * (PARTITION BY g ORDER BY v)` top-k shuffles and sorts EVERY input
  * row; at 100 TB that is the whole table through the wire to keep
  * k·|groups| of it. The bounded-heap aggregate form partial-aggregates
  * map-side, so the exchange carries at most k candidates per group
  * per input partition — the same shape [[Similarity.TopKAgg]] uses
  * for vector search, exposed here for plain relational top-k.
  */
object Grouped {

  /** Exact top-k rows per group by `orderCol` DESCENDING (ties broken
    * by ascending `idCol` — fully deterministic). Output:
    * `(groupCols..., rank, idCol, orderCol)` with dense 1-based ranks.
    * Carry additional payload by semi-joining the (small) result back
    * on `idCol`.
    */
  def topKPerGroup(
      df: DataFrame, groupCols: Seq[String], orderCol: String,
      idCol: String, k: Int): DataFrame = {
    require(k >= 1, "topKPerGroup: k >= 1")
    require(groupCols.nonEmpty, "topKPerGroup: at least one group column")
    val topk = udaf(new Similarity.TopKAgg(k))
    df.groupBy(groupCols.map(col): _*)
      .agg(topk(col(orderCol).cast("double"), col(idCol).cast("long"))
        .as("__top"))
      .select(groupCols.map(col) :+ posexplode(col("__top")): _*)
      .select(groupCols.map(col) ++ Seq(
        (col("pos") + 1).cast("int").as("rank"),
        col("col._2").as(idCol),
        col("col._1").as(orderCol)): _*)
  }
}
