package graft.pipeline

import org.apache.spark.sql.DataFrame

/** Stage-level timing instrumentation for scaling attribution (the
  * stress harness's breakdown runs). OFF by default everywhere: an
  * inactive probe is a pure pass-through — no persist, no extra
  * action, no plan change — so production paths pay nothing. An
  * ACTIVE probe materializes each named stage (persist + count) and
  * records its wall-clock, deliberately inserting execution barriers:
  * per-stage attribution requires forcing the stage, so a probed run
  * is NOT comparable to an unprobed total — it answers "which stage
  * bends", never "how fast".
  */
private[graft] final class StageProbe(val active: Boolean) {
  val timings = scala.collection.mutable.LinkedHashMap[String, Double]()
  private val held = scala.collection.mutable.ListBuffer[DataFrame]()

  /** Materialize-and-time `df` as `name` when active; `df` untouched
    * when not. The persisted copy is returned so downstream stages
    * read the materialized blocks instead of re-running the stage. */
  def stage(name: String, df: DataFrame): DataFrame =
    if (!active) df
    else {
      val t0 = System.nanoTime()
      val c = df.persist()
      c.count()
      timings(name) = (System.nanoTime() - t0) / 1e9
      held += c
      c
    }

  def metric(name: String, v: Double): Unit =
    if (active) timings(name) = v

  /** Drop every stage's persisted blocks (call when done reading). */
  def release(): Unit = { held.foreach(_.unpersist()); held.clear() }
}

private[graft] object StageProbe {
  /** The no-op probe: every operator default. */
  def off = new StageProbe(false)
}
