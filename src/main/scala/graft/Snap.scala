package graft

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.storage.StorageLevel

/** Actually release the storage blocks behind an eagerly
  * localCheckpointed frame.
  *
  * `Dataset.unpersist` only consults the CacheManager — the cache of
  * `persist()`ed plans — and never touches the checkpoint RDD an eager
  * `localCheckpoint(true, level)` pinned into the block manager (verified
  * empirically on this Spark: after `df.localCheckpoint(true); df
  * .unpersist(true)`, `sc.getPersistentRDDs` still holds the RDD and the
  * frame still scans). The checkpointed plan is a [[LogicalRDD]] leaf
  * whose `rdd` IS the pinned RDD, so freeing it means unpersisting that
  * RDD directly. Without this, every batch of a long-lived pipeline
  * session pins one frame set until ContextCleaner GC happens to notice
  * — at a 1 s trigger that is thousands of dead MEMORY_AND_DISK block
  * sets a day competing with live work for the unified memory pool.
  *
  * Call on frames THIS scope checkpointed and fully consumed (state on
  * disk, counts taken). The frame is dead afterwards: a local checkpoint
  * has no lineage to recompute from, so a post-free scan fails — that is
  * the point, it makes accidental reuse loud instead of silently
  * re-reading stale blocks.
  *
  * Also forwards to `Dataset.unpersist`, so the one helper covers the
  * few `persist()`-cached frames in the same hygiene paths. */
object Snap {

  /** Free `df`'s checkpoint blocks (and any CacheManager entry). Returns
    * the number of checkpoint RDDs actually unpersisted — 0 for a frame
    * that was never locally checkpointed.
    *
    * ROOT-ONLY on purpose: the plan must BE the [[LogicalRDD]] (the
    * frame `localCheckpoint` returned), not merely contain one as a
    * leaf. A frame DERIVED from a checkpointed parent has the parent's
    * LogicalRDD among its leaves, and freeing through leaves would let a
    * consumer kill a snapshot it doesn't own while other consumers still
    * read it — the exact sharing bug the pipelines' ownership comments
    * guard against. Root-match makes free() a no-op on anything but the
    * snapshot its owner took. */
  def free(df: Dataset[_], blocking: Boolean = false): Int = {
    df.unpersist(blocking)
    df.queryExecution.analyzed match {
      case lr: LogicalRDD if lr.rdd.getStorageLevel != StorageLevel.NONE =>
        lr.rdd.unpersist(blocking)
        1
      case _ => 0
    }
  }
}
