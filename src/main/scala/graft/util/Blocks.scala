package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Block-manager hygiene for iterative relational algorithms. */
object Blocks {

  /** Release the block-manager blocks behind an eagerly
    * `localCheckpoint(true)`-ed DataFrame once a later round has
    * materialized past it. `df.rdd.unpersist` would NOT do this — `.rdd`
    * builds a fresh wrapper over the checkpointed RDD and unpersisting
    * the wrapper frees nothing; the persisted RDD lives inside the plan's
    * [[LogicalRDD]] leaf. No-op for non-checkpointed frames. */
  def release(df: DataFrame): Unit =
    df.queryExecution.logical.foreach {
      case l: LogicalRDD => l.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
