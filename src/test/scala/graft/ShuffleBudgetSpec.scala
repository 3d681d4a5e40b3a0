package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._
import graft.pipeline.{Grouped, Sketch}

/** RUNTIME shuffle-volume budgets: PlanShapeSpec locks what the plan
  * looks like; this suite locks what actually moved. After executing
  * a query it reads `shuffleRecordsWritten` off every exchange in the
  * final adaptive plan and asserts the record count stays bounded by
  * the OPERATOR's contract (k·groups·partitions for a bounded heap,
  * d·w·partitions for a sketch, ~groups·partitions for a combined
  * aggregate) — orders of magnitude below the input row count. A
  * regression that silently disables partial aggregation (e.g. an
  * accidental non-combinable expression in an Aggregator) passes most
  * plan-shape checks but fails these immediately.
  *
  * Record counts (not bytes) keep the assertions deterministic:
  * compression and serialization sizes drift, cardinalities don't.
  * Test session: local[4], 4 shuffle partitions.
  */
class ShuffleBudgetSpec extends SparkSpec {
  import spark.implicits._

  private val P = 4 // spark.sql.shuffle.partitions in SparkSpec

  private def shuffleRecords(df: DataFrame): Long = {
    df.collect()
    var total = 0L
    def walk(p: SparkPlan): Unit = p.foreach {
      case q: QueryStageExec => walk(q.plan)
      case n =>
        n.metrics.get("shuffleRecordsWritten").foreach(m => total += m.value)
    }
    walk(df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    })
    total
  }

  test("hash aggregate partial-combines: 100k rows shuffle as <= groups x partitions") {
    val agg = spark.range(100000)
      .select((col("id") % 4).as("g"), col("id").as("v"))
      .groupBy("g").agg(sum("v").as("s"))
    val rec = shuffleRecords(agg)
    assert(rec <= 4L * P, s"map-side combine broken: $rec records shuffled")
  }

  test("bounded-heap top-k shuffles <= k rows per group per partition") {
    val df = spark.range(100000)
      .select((col("id") % 8).cast("string").as("g"), col("id").as("i"),
        (col("id") % 97).cast("double").as("v"))
    val rec = shuffleRecords(Grouped.topKPerGroup(df, Seq("g"), "v", "i", 5))
    assert(rec <= 8L * P, s"heap must shuffle one buffer per group per partition: $rec")
  }

  test("count-min cells shuffle bounded by d*w per partition, not input size") {
    val df = spark.range(50000).select((col("id") % 1000).cast("string").as("k"))
    val rec = shuffleRecords(Sketch.countMinCells(df, "k", d = 2, w = 32))
    assert(rec <= 2L * 32 * P,
      s"sketch cells must combine map-side: $rec records for 100k exploded cells")
  }

  test("kmv sketch shuffles <= one k-hash buffer per group per partition") {
    val df = spark.range(60000)
      .select((col("id") % 3).cast("string").as("g"), col("id").as("u"))
    val rec = shuffleRecords(
      df.groupBy("g").agg(Sketch.kmv("u", 64).as("kmv")).select("g"))
    assert(rec <= 3L * P, s"kmv buffers: $rec rows shuffled for 60k inputs")
  }

  test("broadcast join moves zero fact rows through a shuffle") {
    val fact = spark.range(80000).select((col("id") % 50).as("k"), col("id").as("v"))
    val dim = spark.range(50).select(col("id").as("k"), concat(lit("d"), col("id")).as("name"))
    val joined = fact.join(broadcast(dim), "k")
      .groupBy("name").agg(count(lit(1)).as("n"))
    val rec = shuffleRecords(joined)
    // only the post-join aggregate's combined partials shuffle
    assert(rec <= 50L * P, s"fact side must not shuffle for the join: $rec")
  }

  test("passage strip on an m-identical flood shuffles O(occurrences), not O(m^2)") {
    // 1000 identical 12-token docs = 5 span occurrences each. A
    // pair-based design would move ~m²/2 = 500k records; the strip's
    // contract is a small constant × occurrences across ALL of its
    // stages (span stats, probe join, interval merge, range fold).
    val n = 1000
    val docs = (0 until n)
      .map(i => (i.toLong, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11 t12"))
      .toDF("doc_id", "text")
    val out = graft.pipeline.Dedup.stripDuplicateSpans(
      docs, "doc_id", "text", spanTokens = 8)
    val rec = shuffleRecords(out)
    assert(rec <= 60000L,
      s"strip must stay linear in occurrences (~5k), got $rec")
  }

  test("repeated prefix-dedup calls hold at most ONE call's staged block set") {
    import graft.pipeline.{Dedup, PrefixBlocks}
    PrefixBlocks.release(spark)
    def cached(): Int = spark.sparkContext.getPersistentRDDs.size
    // unpersist(blocking=false) drains asynchronously — poll down to a
    // target instead of reading one racy snapshot
    def awaitCachedAtMost(n: Int): Int = {
      val deadline = System.nanoTime + 15L * 1000 * 1000 * 1000
      var c = cached()
      while (c > n && System.nanoTime < deadline) { Thread.sleep(50); c = cached() }
      c
    }
    val base = awaitCachedAtMost(0)
    val docs = (0 until 300)
      .map(i => (i.toLong, s"w${i % 7} w${i % 11} w${i % 13} w${i % 5} t${i % 17} tail$i"))
      .toDF("doc_id", "text")
    for (_ <- 1 to 3) {
      // groupFloor=0 forces the grouped path: BOTH doc-count-sized
      // tables (prefix + signature) stage every call — the worst case
      Dedup.prefixJaccardCandidatePairs(
        docs, "doc_id", "text", 0.8, groupFloor = 0).count()
    }
    // the registry holds exactly the LAST call's set (prefix + sig)...
    assert(PrefixBlocks.liveCount(spark) <= 2,
      s"live=${PrefixBlocks.liveCount(spark)}")
    // ...and executor storage drains the two earlier calls' sets
    val afterCalls = awaitCachedAtMost(base + 2)
    assert(afterCalls <= base + 2,
      s"staged blocks accumulated across calls: base=$base now=$afterCalls")
    PrefixBlocks.release(spark)
    assert(PrefixBlocks.liveCount(spark) == 0)
    val end = awaitCachedAtMost(base)
    assert(end <= base, s"release must free the final set: base=$base now=$end")
  }

  test("a plan retained across prefix-dedup calls is released, not leaked") {
    import graft.pipeline.{Dedup, PrefixBlocks}
    val docs = (0 until 200)
      .map(i => (i.toLong, s"a${i % 5} b${i % 9} c${i % 4} d$i"))
      .toDF("doc_id", "text")
    // COLUMNAR-staged tables (the candidate stage's prefix/sig at
    // SCALE — forced here via the adaptive threshold override, since
    // a 200-doc corpus sits far below the 4 MiB default): release
    // goes through the CacheManager, so a retained plan re-executed
    // after the next call RECOMPUTES - slower, never wrong
    val key = "graft.prefix.columnarMinBytes"
    sys.props(key) = "0"
    try {
      val cand = Dedup.prefixJaccardCandidatePairs(
        docs, "doc_id", "text", 0.8, groupFloor = 0)
      val expected = cand.count()
      Dedup.prefixJaccardCandidatePairs(
        docs, "doc_id", "text", 0.8, groupFloor = 0).count()
      assert(cand.count() == expected)
    } finally sys.props.remove(key)
    // ROW-BLOCK-staged tables (the collapse's groups/reps): released
    // localCheckpoint blocks are non-replayable, so the documented
    // consume-before-next-call contract applies - the stale plan
    // throws instead of silently holding executor storage, and the
    // error NAMES the contract (RetiredStageGuardRDD) instead of
    // surfacing the block manager's opaque "Checkpoint block not
    // found" from deep inside Spark
    val collapsed = Dedup.prefixJaccardPairsCollapsed(
      docs, "doc_id", "text", 0.8)
    assert(collapsed.count() >= 0) // consumed within its call window
    Dedup.prefixJaccardPairsCollapsed(docs, "doc_id", "text", 0.8).count()
    val ex = intercept[org.apache.spark.SparkException] { collapsed.count() }
    val chain = Iterator.unfold(ex: Throwable)(t =>
      Option(t).map(t => (Option(t.getMessage).getOrElse(""), t.getCause)))
      .mkString("\n")
    assert(chain.contains(
      "prefix-dedup result consumed after a subsequent prefix-dedup call"),
      s"retained-plan failure must name the contract, got:\n$chain")
    PrefixBlocks.release(spark)
  }

  test("prefix staging format follows the size estimate: rows at gate " +
      "scale, columnar above the threshold") {
    import graft.pipeline.{Dedup, PrefixBlocks}
    val docs = (0 until 200)
      .map(i => (i.toLong, s"a${i % 5} b${i % 9} c${i % 4} d$i"))
      .toDF("doc_id", "text")
    // default threshold (4 MiB): a tiny corpus stages EVERY table as
    // row blocks — including the sig table, whose estimate flows
    // through the staged prefix's LogicalRDD leaf (a defaultSizeInBytes
    // fallback there would silently re-route sig to columnar and
    // re-open the r13 gate-scale regression this gate closed)
    val r0 = PrefixBlocks.rowStagings.get; val c0 = PrefixBlocks.columnarStagings.get
    Dedup.prefixJaccardCandidatePairs(
      docs, "doc_id", "text", 0.8, groupFloor = 0).count()
    assert(PrefixBlocks.rowStagings.get - r0 == 2 &&
      PrefixBlocks.columnarStagings.get - c0 == 0,
      s"small corpus must stage prefix+sig as row blocks, got " +
        s"rows=${PrefixBlocks.rowStagings.get - r0} " +
        s"columnar=${PrefixBlocks.columnarStagings.get - c0}")
    // bytes threshold forced to 0: the same call stages both columnar
    // (the 100 TB-side path the 10x replica A/B measured 5x faster)
    val key = "graft.prefix.columnarMinBytes"
    sys.props(key) = "0"
    try {
      val r1 = PrefixBlocks.rowStagings.get; val c1 = PrefixBlocks.columnarStagings.get
      Dedup.prefixJaccardCandidatePairs(
        docs, "doc_id", "text", 0.8, groupFloor = 0).count()
      assert(PrefixBlocks.columnarStagings.get - c1 == 2 &&
        PrefixBlocks.rowStagings.get - r1 == 0,
        "forced bytes threshold must stage prefix+sig columnar")
    } finally sys.props.remove(key)
    // DOC-COUNT signal alone (bytes threshold at default, far above
    // this corpus): the second signal exists because near-dup corpora
    // compress 3-4x, so source bytes under-read rows — the r13 stress
    // rerun caught the bytes-only gate choosing rows on the 10x
    // replica and re-creating the 12 s row-block penalty
    val dkey = "graft.prefix.columnarMinDocs"
    sys.props(dkey) = "100" // corpus has 200 docs
    try {
      val r2 = PrefixBlocks.rowStagings.get; val c2 = PrefixBlocks.columnarStagings.get
      Dedup.prefixJaccardCandidatePairs(
        docs, "doc_id", "text", 0.8, groupFloor = 0).count()
      assert(PrefixBlocks.columnarStagings.get - c2 == 2 &&
        PrefixBlocks.rowStagings.get - r2 == 0,
        "doc-count signal alone must stage prefix+sig columnar")
    } finally sys.props.remove(dkey)
    PrefixBlocks.release(spark)
  }

  test("a prefix-dedup call on another thread never retires this thread's blocks") {
    import graft.pipeline.{Dedup, PrefixBlocks}
    PrefixBlocks.release(spark)
    val docs = (0 until 200)
      .map(i => (i.toLong, s"a${i % 5} b${i % 9} c${i % 4} d$i"))
      .toDF("doc_id", "text")
    // This thread's collapse stages non-replayable ROW blocks
    // (localCheckpoint): under the old session-only registry a call on
    // ANY other thread released them and this plan's next count threw
    // SparkException mid-consumption — the registry is keyed per
    // (session, thread) exactly so concurrent callers on a shared
    // session (which Spark supports) each retire only their own
    // completed calls' blocks.
    val mine = Dedup.prefixJaccardPairsCollapsed(docs, "doc_id", "text", 0.8)
    val expected = mine.count()
    var otherFailure: Option[Throwable] = None
    val t = new Thread(() => {
      try Dedup.prefixJaccardPairsCollapsed(docs, "doc_id", "text", 0.8).count()
      catch { case e: Throwable => otherFailure = Some(e) }
    })
    t.start(); t.join()
    assert(otherFailure.isEmpty, s"other thread's call failed: $otherFailure")
    assert(mine.count() == expected,
      "another thread's call must not invalidate this thread's in-flight result")
    // both threads' sets are live until their owners' next call...
    assert(PrefixBlocks.liveCount(spark) > 0)
    // ...and the all-threads release clears everything
    PrefixBlocks.release(spark)
    assert(PrefixBlocks.liveCount(spark) == 0)
  }

  test("NB training shuffles bounded by buckets and doc-bucket pairs, not tokens") {
    // 2000 docs × 40 occurrences of ≤ 8 distinct tokens: the model
    // aggregate must partial-combine to ≤ buckets × partitions and the
    // scoring aggregate to ≤ distinct (doc, bucket) pairs — a
    // non-combinable regression would shuffle all 80k token rows.
    val vocab = Seq("a", "b", "c", "d", "w", "x", "y", "z")
    val docs = (0 until 2000).map { i =>
      (i.toLong,
        Seq.tabulate(40)(j => vocab((i + j) % vocab.size)).mkString(" "),
        i % 2)
    }.toDF("doc_id", "text", "y")
    val out = graft.pipeline.TextAnalysis.nbTokenClassifier(
      docs, "doc_id", "text", "y", buckets = 64)
    val rec = shuffleRecords(out)
    // pairs ≤ 2000 × 8 = 16k; model ≤ 64 × P; everything else is
    // doc-sized — 80k token rows on the wire means combine broke
    assert(rec <= 40000L,
      s"NB train+score must not shuffle raw token rows: $rec")
  }
}
