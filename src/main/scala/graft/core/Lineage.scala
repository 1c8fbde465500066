package graft.core

import org.apache.spark.sql.DataFrame

/** Lineage truncation for iterative/multi-consumer plans, picked by
  * deployment: a RELIABLE checkpoint when the SparkContext has a
  * checkpoint dir configured (cluster deployments — the data survives
  * executor loss), else a localCheckpoint (local mode, where
  * "executor-local blocks" live in the one JVM that is the whole
  * cluster, so reliability adds nothing and the local form is cheaper).
  *
  * The distinction matters on exactly the workloads that need
  * truncation: an iterative algorithm (connected components, Lloyd's,
  * BPE passes) that localCheckpoints on a real cluster pins the ONLY
  * copy of its state to executor blocks with no lineage left to
  * recompute it — the first lost executor aborts the whole run.
  */
object Lineage {
  def truncate(df: DataFrame, eager: Boolean = true): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager)
    else df.localCheckpoint(eager)
}
