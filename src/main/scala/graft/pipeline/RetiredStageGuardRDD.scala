package graft.pipeline

import org.apache.spark.{Partition, SparkException, TaskContext}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow

/** One-to-one shim over a [[PrefixBlocks.stageRows]] checkpoint RDD
  * that turns the opaque missing-block SparkException a RETIRED stage
  * re-execution raises into an actionable error naming the
  * prefix-dedup lifecycle contract.
  *
  * Row blocks (`localCheckpoint`) are non-replayable by design: once
  * the next top-level prefix-dedup call on the same (session, thread)
  * retires a call's staged blocks, a plan from the earlier call that
  * re-executes hits the block manager's "Checkpoint block rdd_N_M not
  * found" — a storage-layer message with no hint that the CALLER's
  * retention pattern caused it. The guard rethrows with the contract
  * spelled out, but ONLY once the stage was actually retired (the
  * `retired` flag is set by the release thunk before the blocks are
  * dropped): a genuine executor loss on a live stage keeps Spark's
  * own message.
  *
  * Cost: one iterator indirection per partition. Locality and
  * partition structure delegate to the parent, and the wrapping
  * Dataset is rebuilt with `LogicalRDD.fromDataset`, so the
  * checkpoint's pinned partitioning survives for downstream joins.
  */
private[pipeline] final class RetiredStageGuardRDD(
    prev: RDD[InternalRow],
    retired: java.util.concurrent.atomic.AtomicBoolean)
  extends RDD[InternalRow](prev) {

  override def compute(split: Partition, context: TaskContext): Iterator[InternalRow] =
    try firstParent[InternalRow].iterator(split, context)
    catch {
      case e: SparkException if retired.get() =>
        throw new SparkException(
          "prefix-dedup result consumed after a subsequent prefix-dedup " +
            "call: this plan's staged row blocks were retired when the " +
            "next top-level call on the same session+thread began (see " +
            "graft.pipeline.PrefixBlocks). Consume each call's result " +
            "before issuing the next prefix-dedup call, or issue " +
            "concurrent calls from separate threads/sessions.", e)
    }

  override protected def getPartitions: Array[Partition] =
    firstParent[InternalRow].partitions

  override protected def getPreferredLocations(split: Partition): Seq[String] =
    firstParent[InternalRow].preferredLocations(split)
}
