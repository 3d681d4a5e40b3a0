package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit skew-mitigation utilities. AQE's skew-join split handles
  * most sort-merge skew automatically; these are for the cases it
  * doesn't reach — a deliberately chosen salt fan-out for a join that
  * must co-locate a hot key, and holistic aggregations (collect_list,
  * exact distinct) where map-side partial aggregation can't compress a
  * hot group. Both transforms are RESULT-INVARIANT in the salt: the
  * output equals the unsalted equivalent, which is what makes them
  * oracle-checkable and safe to sprinkle on hot paths.
  */
object Skew {

  private val SaltCol = "__graft_salt"

  /** Equi-join `big ⋈ small` on `keys`, salted: the big side gets a
    * uniform salt in [0, salt), the small side is replicated `salt`
    * times, and the join key becomes (keys, salt) — a hot key's rows
    * spread over `salt` reducers instead of one. Inner joins only
    * (outer-join null rows would duplicate across salts). Use when the
    * small side is too big to broadcast but small enough to replicate,
    * and AQE's split heuristics don't fire (e.g. a single pathological
    * key known in advance). */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      salt: Int = 16): DataFrame = {
    require(salt >= 1, "saltedJoin: salt must be >= 1")
    require(keys.nonEmpty, "saltedJoin: at least one join key")
    val b = big.withColumn(SaltCol,
      pmod(monotonically_increasing_id(), lit(salt.toLong)))
    val s = small.withColumn(SaltCol,
      explode(sequence(lit(0L), lit(salt.toLong - 1))))
    b.join(s, keys :+ SaltCol).drop(SaltCol)
  }

  /** Join-cardinality estimator — the pre-flight check for a join
    * that might explode. For an equi-join on `keyCol`, the output
    * size is EXACTLY `Σ_k n_left(k) · n_right(k)`; two per-key counts
    * (map-side combined) and one count-keyed join compute that sum
    * plus the top-`topK` hottest keys — never running the join
    * itself. At 100 TB this replaces a blown 10¹⁴-row shuffle with
    * two aggregate scans; feed the hot keys straight into
    * [[saltedJoin]].
    *
    * Output: one row per hottest key — `(key, n_left, n_right,
    * pairs)` ranked by pairs desc (ties to smaller key) — with the
    * join-wide `total_pairs` repeated on every row (one-row
    * broadcast, no second pass). */
  def joinCardinality(
      left: DataFrame, right: DataFrame,
      keyCol: String, topK: Int = 5): DataFrame = {
    require(topK >= 1, "joinCardinality: topK >= 1")
    val nl = left.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n_left"))
    val nr = right.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n_right"))
    val pairs = nl.join(nr, "key")
      .select(col("key"), col("n_left"), col("n_right"),
        (col("n_left") * col("n_right")).as("pairs"))
    val total = pairs.agg(sum(col("pairs")).as("total_pairs"))
    pairs
      .orderBy(col("pairs").desc, col("key"))
      .limit(topK)
      .crossJoin(broadcast(total))
  }

  /** Two-stage salted sum/count per key group — for when a handful of
    * groups dominate AND the aggregate is extended later with holistic
    * functions partial aggregation can't pre-compress. Stage 1 groups
    * by (keys, salt) so a hot group's rows split `salt` ways; stage 2
    * recombines the decomposable partials. Output: keys, `sum_<col>`,
    * `n`. */
  def saltedSumCount(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      salt: Int = 16): DataFrame = {
    require(salt >= 1, "saltedSumCount: salt must be >= 1")
    df.withColumn(SaltCol,
        pmod(monotonically_increasing_id(), lit(salt.toLong)))
      .groupBy((keys :+ SaltCol).map(col): _*)
      .agg(sum(col(valueCol)).as("__s"), count(lit(1)).as("__c"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__s")).as(s"sum_$valueCol"),
        sum(col("__c")).as("n"))
  }
}
