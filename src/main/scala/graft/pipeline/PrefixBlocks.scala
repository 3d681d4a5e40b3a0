package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Deterministic lifecycle for the prefix-dedup family's materialized
  * intermediates (the ranked-prefix table, the prefix-signature table,
  * the exact-collapse's groups/reps tables) — replaces the earlier
  * GC-freed localCheckpoint contract, under which a long interactive
  * session issuing repeated prefix-dedup calls accumulated one
  * doc-count-sized block set per LIVE returned plan until the
  * ContextCleaner happened to run.
  *
  * Contract: each top-level prefix-dedup call
  * ([[Dedup.prefixJaccardPairs]], [[Dedup.prefixJaccardCandidatePairs]],
  * [[Dedup.prefixJaccardPairsCollapsed]],
  * [[Dedup.incrementalJaccardPairs]]) RELEASES the previous call's
  * staged blocks before staging its own, so executor storage holds at
  * most ONE call's block set no matter how many calls a session
  * issues (ShuffleBudgetSpec locks this). Staging is
  * `persist(MEMORY_AND_DISK)` + count, NOT localCheckpoint: release
  * goes through the CacheManager, so a caller that still holds the
  * previous call's returned plan and runs it later RECOMPUTES from
  * lineage instead of crashing on missing blocks (localCheckpoint is
  * non-replayable — deterministically releasing its blocks would have
  * poisoned retained plans, which is exactly why the old code had to
  * lean on GC). The lineage these tables keep is one shot deep (no
  * iteration), so there is no growing-plan risk in trading the
  * truncation away; recompute-on-loss comes back as a bonus for
  * unreliable clusters.
  *
  * Nested entry points (the collapse calls the pair join, which calls
  * the candidate stage) share ONE scope via a thread-local depth: the
  * inner call must not retire the outer call's still-referenced
  * groups/reps tables.
  */
object PrefixBlocks {
  private val live =
    scala.collection.mutable.Map.empty[SparkSession, List[DataFrame]]
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

  /** Materialize `df` once (persist + count, map-side of every
    * downstream consumer) and track it for release at the next
    * top-level prefix-dedup call. */
  private[pipeline] def stage(df: DataFrame): DataFrame = {
    val c = df.persist(StorageLevel.MEMORY_AND_DISK)
    c.count()
    synchronized {
      live(c.sparkSession) = c :: live.getOrElse(c.sparkSession, Nil)
    }
    c
  }

  /** Free the most recent prefix-dedup call's staged blocks now
    * (idempotent) — for sessions done deduping that don't want to wait
    * for their next call. */
  def release(s: SparkSession): Unit = {
    val dfs = synchronized { live.remove(s).getOrElse(Nil) }
    dfs.foreach(_.unpersist(blocking = false))
  }

  /** Staged tables currently holding executor blocks (test hook). */
  def liveCount(s: SparkSession): Int =
    synchronized { live.get(s).map(_.size).getOrElse(0) }
}
