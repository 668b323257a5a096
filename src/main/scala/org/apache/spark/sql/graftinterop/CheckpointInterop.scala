package org.apache.spark.sql.graftinterop

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Bridge for releasing a superseded `localCheckpoint`'s storage.
  *
  * `Dataset.unpersist()` only clears CacheManager (InMemoryRelation)
  * entries; the blocks behind `localCheckpoint(eager = true)` are
  * RDD-level persistence on the materialized internal RDD, which
  * CacheManager never sees — calling `unpersist()` on a checkpointed
  * Dataset is a silent no-op, and the blocks live until ContextCleaner
  * happens to GC the dereferenced RDD. Iterative drivers that pin every
  * round (PageRank lineage pinning, connected components) would hold one
  * node-sized copy per superseded pin until a driver GC cycle.
  *
  * The checkpointed Dataset's plan is a [[LogicalRDD]] leaf wrapping the
  * materialized RDD; unpersisting THAT rdd releases the blocks eagerly. */
object CheckpointInterop {

  /** Release the storage of a Dataset produced by `localCheckpoint`.
    * No-op (harmless) on frames whose plan carries no LogicalRDD. */
  def unpersistLocalCheckpoint(df: DataFrame, blocking: Boolean = false): Unit =
    df.queryExecution.analyzed.foreach {
      case l: LogicalRDD => l.rdd.unpersist(blocking)
      case _ => ()
    }
}
