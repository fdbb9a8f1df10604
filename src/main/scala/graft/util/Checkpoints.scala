package graft.util

import org.apache.spark.sql.DataFrame

/** Release the block-manager storage behind a localCheckpoint'd DataFrame
  * once no consumer will read it again — otherwise every checkpoint stays
  * cached until driver GC + ContextCleaner get to it, and peak storage
  * grows with the number of checkpoints (O(rounds × |V|) in iterative
  * algorithms, O(batches) in streaming sinks).
  *
  * One definition shared by every checkpointing operator (iterative graph
  * loops, merge sinks) — the analyzed-plan shape this matches is a Spark
  * internal, and a version-upgrade fix must land exactly once.
  */
object Checkpoints {
  def unpersist(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
      case _ => ()
    }
}
