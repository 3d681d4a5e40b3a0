package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance for decomposable aggregates: a
  * standing aggregate table ("the view") absorbs a delta batch by
  * MERGING partial states instead of rescanning the base data — the
  * operation behind every "update the daily rollup without re-reading
  * the lake" pipeline. Sound exactly for the algebraic aggregates
  * whose partials compose: `sum`/`count` add, `min`/`max` fold;
  * `avg` is carried as (sum, count) and derived at read time.
  * Deletions/updates are upstream concerns ([[graft.timeseries
  * .TimeSeriesOps.cdcApply]] folds the changelog first); this merge is
  * insert-only, the common append-log case.
  *
  * Scale shape: union of two ALREADY-AGGREGATED tables (each ≤ one
  * row per key) + one keyed hash aggregate with map-side combine —
  * the cost is proportional to |keys touched|, not to the base data
  * that produced the standing view. The correctness law (locked by
  * the oracle): merge(agg(A), agg(B)) == agg(A ∪ B), bit-for-bit for
  * the integer measures and within float-sum reassociation for the
  * doubles. */
object Ivm {

  /** Merge rule per measure column: how two partial states combine. */
  sealed trait MergeFn
  case object Add extends MergeFn // sum and count partials
  case object TakeMin extends MergeFn
  case object TakeMax extends MergeFn

  def merge(
      view: DataFrame, delta: DataFrame, keys: Seq[String],
      rules: Seq[(String, MergeFn)]): DataFrame = {
    require(keys.nonEmpty, "Ivm.merge: need at least one key column")
    require(rules.nonEmpty, "Ivm.merge: need at least one measure")
    val aggs = rules.map {
      case (c, Add)     => sum(col(c)).as(c)
      case (c, TakeMin) => min(col(c)).as(c)
      case (c, TakeMax) => max(col(c)).as(c)
    }
    view.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
