package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic lifecycle for the prefix-dedup family's materialized
  * intermediates (the ranked-prefix table, the prefix-signature table,
  * the exact-collapse's groups/reps tables) — replaces the earlier
  * GC-freed contract, under which a long interactive session issuing
  * repeated prefix-dedup calls accumulated one doc-count-sized block
  * set per LIVE returned plan until the ContextCleaner happened to
  * run.
  *
  * Contract: each top-level prefix-dedup call
  * ([[Dedup.prefixJaccardPairs]], [[Dedup.prefixJaccardCandidatePairs]],
  * [[Dedup.prefixJaccardPairsCollapsed]],
  * [[Dedup.incrementalJaccardPairs]]) RELEASES the previous call's
  * staged blocks before staging its own, so executor storage holds at
  * most ONE call's block set no matter how many calls a session issues
  * (ShuffleBudgetSpec locks this). The corollary the caller must
  * honor: CONSUME a call's result before issuing the next prefix-dedup
  * call on the same session — a plan retained across calls throws on
  * re-execution once its blocks retire (the cc_star round-release
  * pattern, applied across calls). [[release]] frees the last call's
  * set immediately for sessions done deduping.
  *
  * Storage is `localCheckpoint(true)` row blocks with the backing
  * RDD handle kept for release — NOT a CacheManager `persist`: the
  * columnar cache's write + per-consumer read conversion measured
  * +0.7 s per call at sf0.1 on the collapse's text-carrying tables
  * (A/B, min-of-4), and these are single-call scratch tables, not
  * long-lived hot caches, so recompute-on-release buys nothing the
  * consume-before-next-call contract doesn't already give.
  *
  * Nested entry points (the collapse calls the pair join, which calls
  * the candidate stage) share ONE scope via a thread-local depth: the
  * inner call must not retire the outer call's still-referenced
  * groups/reps tables.
  */
object PrefixBlocks {
  private val live =
    scala.collection.mutable.Map.empty[SparkSession, List[org.apache.spark.rdd.RDD[_]]]
  private val depth = new ThreadLocal[Int] { override def initialValue = 0 }

  /** Run `body` as one prefix-pipeline call scope: retire the previous
    * top-level call's blocks, adopt everything staged inside. A failed
    * call releases its own partial stages (nothing leaks from a
    * mid-build exception). */
  private[pipeline] def scoped[T](s: SparkSession)(body: => T): T =
    if (depth.get > 0) body
    else {
      release(s) // the previous call's blocks retire HERE — deterministic
      depth.set(1)
      try body
      catch {
        case scala.util.control.NonFatal(e) => release(s); throw e
      } finally depth.set(0)
    }

  /** Materialize `df` once (eager localCheckpoint — every downstream
    * consumer reads the row blocks) and track its backing RDD for
    * release at the next top-level prefix-dedup call. */
  private[pipeline] def stage(df: DataFrame): DataFrame = {
    val c = df.localCheckpoint(true)
    // the checkpointed Dataset's plan is a LogicalRDD leaf over the
    // persisted InternalRow RDD — THAT handle is what unpersists the
    // blocks (Dataset.unpersist only talks to the CacheManager). A
    // plan shape without the leaf (never observed) would just degrade
    // that one table to the old GC-freed lifecycle.
    val backing = c.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }
    synchronized {
      live(c.sparkSession) =
        backing.toList ::: live.getOrElse(c.sparkSession, Nil)
    }
    c
  }

  /** Free the most recent prefix-dedup call's staged blocks now
    * (idempotent) — for sessions done deduping that don't want to wait
    * for their next call. */
  def release(s: SparkSession): Unit = {
    val rdds = synchronized { live.remove(s).getOrElse(Nil) }
    rdds.foreach(_.unpersist(blocking = false))
  }

  /** Staged tables currently holding executor blocks (test hook). */
  def liveCount(s: SparkSession): Int =
    synchronized { live.get(s).map(_.size).getOrElse(0) }
}
