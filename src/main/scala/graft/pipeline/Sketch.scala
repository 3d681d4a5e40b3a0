package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) sketch: the deterministic distinct-count /
  * uniform-sample sketch. Every key hashes to a 60-bit value; the
  * sketch keeps only the k SMALLEST distinct hashes per group. From
  * the k-th smallest hash `h_k`, distinct cardinality is estimated as
  * `(k−1) · 2^60 / h_k` (Bar-Yossef et al. 2002); with fewer than k
  * distinct hashes the sketch IS the exact distinct set.
  *
  * Unlike RNG-based reservoir sampling, the hash bottom-k is a pure
  * function of the data — identical across runs, engines, partition
  * layouts, and merge orders (the property every law in this repo's
  * sampling family relies on). State is O(k) longs, partial-aggregated
  * map-side: the shuffle carries ≤ k hashes per group per partition —
  * the same bounded-merge shape as [[Similarity.TopKAgg]].
  */
object Sketch {

  /** 60-bit hash: the first 15 hex digits of md5, as a long — chosen
    * over xxhash64 because every SQL engine can reproduce it
    * (`CAST(concat('0x', substring(md5(x), 1, 15)) AS BIGINT)`). */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("string").cast("binary")), 1, 15), 16, 10)
      .cast("long")

  /** 2^60 as a double (exact). */
  val HashSpace: Double = 1152921504606846976.0

  /** Bounded bottom-k distinct-merge aggregator over hashes: keeps the
    * k smallest DISTINCT values, sorted ascending. */
  class KmvAgg(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
    private def trim(xs: Seq[Long]): Seq[Long] = xs.distinct.sorted.take(k)
    def zero: Seq[Long] = Nil
    def reduce(b: Seq[Long], h: Long): Seq[Long] =
      // early-exit: a full buffer ignores hashes at-or-above its max
      if (b.length >= k && h >= b.last) b else trim(b :+ h)
    def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] = trim(x ++ y)
    def finish(r: Seq[Long]): Seq[Long] = r
    def bufferEncoder: org.apache.spark.sql.Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: org.apache.spark.sql.Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** The sketch column: bottom-k distinct hashes of `keyCol`,
    * ascending. Use inside `groupBy(...).agg(...)`. */
  def kmv(keyCol: String, k: Int): Column =
    udaf(new KmvAgg(k)).apply(hash60(col(keyCol)))

  /** Fixed-width histogram: per-group bucket counts over `[lo, hi)`
    * with `width_bucket` semantics (bucket 0 below `lo`, `nBins + 1`
    * at-or-above `hi`, nulls in a null bucket) — identical in Spark
    * and DuckDB, so the profile is engine-portable. ONE hash aggregate
    * with map-side combine: the shuffle carries ≤ (nBins + 2) rows per
    * group per partition no matter the data size — the cheap first
    * look at a value column before committing to flag thresholds. */
  def fixedHistogram(
      df: DataFrame, v: String, lo: Double, hi: Double, nBins: Int,
      groupCols: Seq[String]): DataFrame = {
    require(nBins >= 1, "fixedHistogram: nBins must be >= 1")
    require(lo < hi, "fixedHistogram: lo must be < hi")
    df.groupBy((groupCols.map(col) :+
        width_bucket(col(v), lit(lo), lit(hi), lit(nBins)).as("bucket")): _*)
      .agg(count(lit(1)).as("n"))
  }

  /** Population-stability-index drift between two cohorts of the same
    * table (e.g. last week vs history): per group, the value
    * distributions are binned with [[fixedHistogram]] semantics and
    * compared via `PSI = Σ (pA−pB)·ln(pA/pB)` over the observed bins
    * (the standard model-monitoring drift score; PSI > 0.2
    * conventionally = drift). Each observed bin's count gets an `eps`
    * floor on BOTH sides — the usual smoothing that keeps ln finite
    * when a bin is empty in one cohort; the denominator adds
    * `eps·(nBins+2)` so the formula is a fixed, engine-portable
    * definition. Null values fall outside every bucket and are
    * ignored.
    *
    * ONE aggregation pass over the table (cohort is a column — never a
    * join of two scans), then arithmetic on the tiny (group × bin)
    * result; the per-group totals reuse the same exchange via a keyed
    * window. */
  def psiDrift(
      df: DataFrame, v: String, cohort: Column,
      lo: Double, hi: Double, nBins: Int,
      groupCols: Seq[String], eps: Double = 0.5): DataFrame = {
    require(nBins >= 1, "psiDrift: nBins must be >= 1")
    require(eps > 0, "psiDrift: eps must be > 0 (ln smoothing)")
    import org.apache.spark.sql.expressions.Window
    val h = df
      .groupBy((groupCols.map(col) :+
        width_bucket(col(v), lit(lo), lit(hi), lit(nBins)).as("bucket")): _*)
      .agg(
        count(when(cohort, lit(1))).as("__na"),
        count(when(!cohort, lit(1))).as("__nb"))
      .filter(col("bucket").isNotNull)
    val w = Window.partitionBy(groupCols.map(col): _*)
    val denom = lit(eps * (nBins + 2))
    val pa = (col("__na") + lit(eps)) / (sum(col("__na")).over(w) + denom)
    val pb = (col("__nb") + lit(eps)) / (sum(col("__nb")).over(w) + denom)
    h.withColumn("__term", (pa - pb) * log(pa / pb))
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("__term")).as("psi"))
  }

  /** (n_sketch, est_distinct) columns from a bottom-k sketch column:
    * exact when fewer than k hashes were retained, the KMV estimator
    * otherwise. */
  def kmvEstimate(sketch: Column, k: Int): (Column, Column) = (
    size(sketch).cast("long").as("n_sketch"),
    when(size(sketch) < k, size(sketch).cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(HashSpace) /
        element_at(sketch, k).cast("double"))
      .as("est_distinct"))

  /** Per-group distinct-count estimates: `n_sketch` (hashes retained),
    * `est_distinct` — exact when the group has < k distinct keys, the
    * KMV estimator otherwise. The estimate is a deterministic double:
    * same bits on any engine computing the same formula. */
  def kmvDistinct(
      df: DataFrame, keyCol: String, k: Int,
      groupCols: Seq[String]): DataFrame = {
    require(k >= 2, "kmvDistinct: k must be >= 2")
    val sk = df.groupBy(groupCols.map(col): _*)
      .agg(kmv(keyCol, k).as("__kmv"))
    val (n, est) = kmvEstimate(col("__kmv"), k)
    sk.select(groupCols.map(col) :+ n :+ est: _*)
  }

  /** KMV set-operation estimates (Beyer et al. 2007) from TWO bottom-k
    * sketches: distinct counts of each side, of the union, and of the
    * intersection — WITHOUT touching the raw data again. The union
    * sketch is the bottom-k of the merged hash sets (exactly the
    * sketch the union of the raw sets would produce — the mergeability
    * that makes KMV work distributed); the intersection estimate is
    * the Jaccard fraction OBSERVED INSIDE the union sketch scaled by
    * the union estimate: `|K ∩ A ∩ B| / k · est(A ∪ B)`. Exact when
    * the union retains fewer than k hashes. Returns one row:
    * `(est_a, est_b, est_union, est_intersection)`.
    *
    * Scale shape: pure array arithmetic on two k-length sketch rows —
    * the data was read once when the sketches were built; cohort
    * overlap questions after that are model-sized. */
  def kmvSetOps(a: Column, b: Column, k: Int): Column = {
    def est(s: Column): Column =
      when(size(s) < k, size(s).cast("double"))
        .otherwise(lit((k - 1).toDouble) * lit(HashSpace) /
          element_at(s, k).cast("double"))
    val union = slice(array_sort(array_union(a, b)), 1, k)
    val interInUnion = size(array_intersect(array_intersect(union, a), b))
    struct(
      est(a).as("est_a"),
      est(b).as("est_b"),
      est(union).as("est_union"),
      when(size(union) < k,
        interInUnion.cast("double"))
        .otherwise(interInUnion.cast("double") / lit(k.toDouble) *
          est(union)).as("est_intersection"))
  }

  /** Row-`i` cell position of a key in a `w`-wide count–min sketch:
    * `hash60(key || '|' || i) mod w` — d independent hash rows from
    * the one cross-engine [[hash60]] family, salt in the payload. */
  private def cmsPos(key: Column, row: Int, w: Int): Column =
    pmod(hash60(concat(key.cast("string"), lit("|"), lit(row))),
      lit(w.toLong)).cast("int")

  /** The `d` (row, pos) cells a key lands in, as an array of structs —
    * explode this to build or probe a sketch (streaming aggregates
    * compose it with a time window for per-window sketch state). */
  def cmsCells(key: Column, d: Int, w: Int): Column =
    array((0 until d).map(i =>
      struct(lit(i).as("row"), cmsPos(key, i, w).as("pos"))): _*)

  /** Count–min sketch (Cormode & Muthukrishnan 2005) of the key
    * frequencies in `df`: `d` hash rows × `w` cells, each cell the
    * count of keys hashing into it. Returns the cell table
    * `(row, pos, cnt)` — AT MOST `d·w` rows regardless of data size.
    * Deterministic: positions come from [[hash60]], so any SQL engine
    * rebuilds the identical sketch.
    *
    * Scale shape: one projection exploding each input row into its
    * `d` (row, pos) cells + one hash aggregate with map-side combine;
    * the shuffle carries ≤ `d·w` cells per partition no matter the
    * input size. The classic pre-aggregation for heavy-hitter /
    * frequency queries over streams too large to count exactly. */
  def countMinCells(
      df: DataFrame, keyCol: String, d: Int, w: Int): DataFrame = {
    require(d >= 1 && w >= 1, "countMinCells: d and w must be >= 1")
    df.select(explode(cmsCells(col(keyCol), d, w)).as("__c"))
      .groupBy(col("__c.row").as("row"), col("__c.pos").as("pos"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Histogram-sketch quantiles: approximate quantiles of a value
    * column from a fixed-width `nBins` histogram — min/max bounds
    * first (one 1-row-per-group aggregate), then bin counts (≤
    * `nBins` rows per group no matter the data size), then each
    * requested quantile interpolates linearly inside the first bin
    * whose cumulative count reaches `q·n`. Error is bounded by one
    * bin width — the classic constant-state quantile at scale (exact
    * `percentile` sorts the whole column; this shuffles `nBins` longs
    * per group). Deterministic: every step is exact integer counting
    * plus a fixed-shape double expression, so any engine replays it
    * bit-for-bit. With `groupCols` the whole pipeline runs per group
    * (p50/p95-per-key in two scans); constant groups collapse to
    * their single value.
    *
    * Scale shape: two scans (bounds, counts), both map-side combined;
    * everything after is model-sized (`nBins`×groups rows, |qs|
    * quantiles — the windows and joins below never see data-sized
    * input). */
  def histogramQuantiles(
      df: DataFrame, v: String, nBins: Int,
      qs: Seq[Double], groupCols: Seq[String] = Nil): DataFrame = {
    require(nBins >= 1, "histogramQuantiles: nBins >= 1")
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      "histogramQuantiles: quantiles in (0, 1]")
    val spark = df.sparkSession
    import spark.implicits._
    val gcols = groupCols.map(col)
    val vals = df.select(gcols :+ col(v).as("__v"): _*)
      .filter(col("__v").isNotNull)
    val bounds = vals.groupBy(gcols: _*).agg(min(col("__v")).as("__lo"),
      max(col("__v")).as("__hi"), count(lit(1)).as("__n"))
    val bounded =
      if (groupCols.isEmpty) vals.crossJoin(broadcast(bounds))
      else vals.join(broadcast(bounds), groupCols)
    val hist = bounded
      // explicit bucket arithmetic (not width_bucket, whose float
      // path differs between engines): floor((v-lo)/((hi-lo)/n))+1,
      // clamping the v = hi row into the last real bin; a constant
      // group (hi = lo) puts everything in bin 1 (and interpolates
      // to exactly lo, since the bin width is 0)
      .select(gcols :+ when(col("__hi") === col("__lo"), lit(1L))
        .otherwise(least(
          floor((col("__v") - col("__lo")) /
            ((col("__hi") - col("__lo")) / nBins)) + 1,
          lit(nBins.toLong))).as("__bk"): _*)
      .groupBy(gcols :+ col("__bk"): _*).agg(count(lit(1)).as("__cnt"))
    // bins-per-group-sized windows: the groupless global window is
    // deliberate (≤ nBins rows reach it)
    val cum = hist.withColumn("__cum",
      sum(col("__cnt")).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(gcols: _*).orderBy(col("__bk"))))
    val targets = bounds.crossJoin(broadcast(qs.toDF("q")))
      .withColumn("__target", col("q") * col("__n"))
    val joined =
      if (groupCols.isEmpty) targets.crossJoin(broadcast(cum))
      else targets.join(cum, groupCols)
    joined
      .filter(col("__cum") >= col("__target"))
      .groupBy(gcols ++ Seq(col("q"), col("__lo"), col("__hi"),
        col("__n"), col("__target")): _*)
      .agg(min_by(struct(col("__bk"), col("__cnt"), col("__cum")),
        col("__bk")).as("__p"))
      .select(gcols ++ Seq(col("q"),
        (col("__lo") + (col("__p.__bk") - 1 +
          (col("__target") - (col("__p.__cum") - col("__p.__cnt"))) /
            col("__p.__cnt")) *
          ((col("__hi") - col("__lo")) / nBins)).as("quantile")): _*)
  }

  /** HyperLogLog distinct-count estimate per group (Flajolet et al.
    * 2007) — the fixed-size companion to [[kmv]]: where KMV keeps the
    * k smallest hashes, HLL keeps one max-rank byte per register
    * (`2^p` registers), so the shuffle carries ≤ `2^p` rows per group
    * per partition regardless of cardinality, with relative error
    * ~`1.04/sqrt(2^p)` at ANY scale (KMV's error grows once n >> k).
    *
    * Fully deterministic and cross-engine replayable:
    *  - hash = [[hash60]] (md5-based — any SQL engine reproduces it);
    *  - register = low `p` bits, rank = leading zeros of the high
    *    `60-p` bits + 1, computed via `length(bin(...))` (identical
    *    string semantics in Spark and DuckDB — no clz builtin needed);
    *  - the harmonic sum `Σ 2^-M_j` is scaled by `2^(61-p)` and summed
    *    in EXACT integer arithmetic (every term is a power of two
    *    ≤ 2^(60-p); `2^p` terms stay under 2^61 — no ANSI overflow),
    *    so it is immune to float summation-order drift; the only
    *    float ops are one division and the small-range `ln`, both on
    *    identical inputs in either engine;
    *  - small-range correction: linear counting `m·ln(m/V)` when the
    *    raw estimate ≤ 2.5m and V (empty registers) > 0, as in the
    *    original paper.
    *
    * Scale shape: two hash aggregates with map-side combine —
    * (group, register) max-rank, then per-group integer sum. Nothing
    * is ever collected; state is O(2^p) per group. */
  def hllEstimate(
      df: DataFrame, keyCol: String, groupCols: Seq[String],
      p: Int = 8): DataFrame =
    hllFinalize(hllRegisters(df, keyCol, groupCols, p), groupCols, p)

  /** The (group, register)-max-rank table behind [[hllEstimate]] —
    * exposed because this aggregate is the sketch's MERGEABLE state:
    * register max is commutative/associative/idempotent, so it can
    * ride a watermarked STREAMING aggregate (or a partial per-shard
    * pass later unioned), with [[hllFinalize]] run in batch over the
    * drained register table. Output: groupCols..., `__idx`, `__m`. */
  def hllRegisters(
      df: DataFrame, keyCol: String, groupCols: Seq[String],
      p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 14, "hllRegisters: p must be in [4, 14]")
    val m = 1 << p
    val rhoMax = 60 - p + 1 // rank when the whole suffix is zero
    val gcols = groupCols.map(col)
    val h = hash60(col(keyCol))
    val idx = pmod(h, lit(m)) // low p bits: register index
    val w = shiftright(h, p) // high 60-p bits: rank source
    val rho = when(w === 0, lit(rhoMax))
      .otherwise(lit(rhoMax) - length(bin(w)))
    df.select(gcols :+ idx.as("__idx") :+ rho.as("__rho"): _*)
      .groupBy(gcols :+ col("__idx"): _*)
      .agg(max(col("__rho")).as("__m"))
  }

  /** Per-group estimate from a [[hllRegisters]] table (absent
    * registers count as empty). */
  def hllFinalize(
      regs: DataFrame, groupCols: Seq[String], p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 14, "hllFinalize: p must be in [4, 14]")
    val m = 1 << p
    val rhoMax = 60 - p + 1
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val gcols = groupCols.map(col)
    regs
      .groupBy(gcols: _*)
      .agg(
        count(lit(1)).as("__present"),
        // exact: each term is 2^(rhoMax - M_j), a long
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $rhoMax - __m)"))
          .as("__s_present"))
      .select(gcols ++ Seq(
        (lit(m) - col("__present")).cast("long").as("__v"),
        (col("__s_present") +
          (lit(m.toLong) - col("__present")) *
            lit(1L << rhoMax)).cast("double").as("__s")): _*)
      .select(gcols :+
        round(
          when(
            lit(alpha * m.toDouble * m.toDouble) *
              lit(math.pow(2.0, rhoMax)) / col("__s") <= lit(2.5 * m) &&
              col("__v") > 0,
            lit(m.toDouble) * log(lit(m.toDouble) / col("__v")))
            .otherwise(lit(alpha * m.toDouble * m.toDouble) *
              lit(math.pow(2.0, rhoMax)) / col("__s")),
          6).as("hll_est"): _*)
  }

  /** Point-query the sketch: for each key in `keys`, the estimate is
    * `min` over the `d` rows of that key's cell count — an upper
    * bound on the true frequency (CMS never underestimates; the
    * one-sided error is the property the spec locks). `cells`
    * broadcasts (≤ `d·w` rows), so estimation is a scan-bound
    * broadcast join + per-key min — no corpus-sized shuffle.
    *
    * LEFT join with missing cells counted as 0: a sparse sketch table
    * only materializes touched cells, so a probe key the sketch never
    * saw (or one whose cells only partially collide with seen keys)
    * must estimate over ALL `d` rows with absent cells = 0 — an inner
    * join would drop those rows and overestimate, or drop the key
    * entirely. */
  def countMinEstimate(
      cells: DataFrame, keys: DataFrame, keyCol: String,
      d: Int, w: Int): DataFrame = {
    require(d >= 1 && w >= 1, "countMinEstimate: d and w must be >= 1")
    keys
      .select(col(keyCol), explode(cmsCells(col(keyCol), d, w)).as("__c"))
      .join(broadcast(cells),
        col("__c.row") === cells("row") && col("__c.pos") === cells("pos"),
        "left_outer")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
  }
}
