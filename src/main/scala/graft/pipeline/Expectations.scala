package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality gate (the dbt-test / Great Expectations
  * primitive): a rule is `(name, row predicate)`; the check evaluates
  * EVERY rule in ONE scan and returns one row per rule with its
  * violation count. A predicate evaluating to NULL counts as a
  * FAILURE — SQL three-valued logic would otherwise let null-laden
  * rows slip through every `col > x` rule silently.
  *
  * Scale shape: all rules fold into a single hash aggregate (one
  * counter column per rule) with map-side combine — cost is the scan,
  * independent of rule count; the per-rule explode happens on the
  * one-row result. The shape a 100 TB pre-ingest gate needs: you pay
  * one read for the whole rulebook.
  */
object Expectations {

  def check(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "Expectations.check: need at least one rule")
    require(rules.map(_._1).distinct.length == rules.length,
      "Expectations.check: rule names must be unique")
    // coalesce: sum() over ZERO rows is NULL, so an empty input would
    // report n_fail = NULL for every rule — and a consumer gating on
    // `n_fail > 0` would silently pass. An empty scan must report an
    // explicit 0 violations.
    val aggs = count(lit(1)).as("__n") +:
      rules.map { case (name, pred) =>
        coalesce(sum(when(pred, 0L).otherwise(1L)), lit(0L))
          .as(s"__f_$name")
      }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rules.map { case (name, _) =>
        struct(lit(name).as("rule"),
          col(s"__f_$name").as("n_fail"),
          col("__n").as("n_rows"))
      }: _*)).as("__r"))
      .select(col("__r.rule").as("rule"), col("__r.n_fail").as("n_fail"),
        col("__r.n_rows").as("n_rows"))
  }
}
