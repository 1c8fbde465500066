package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

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
  *
  * Cluster operational note: reliable checkpoint files are NOT deleted
  * by default when the RDD goes out of scope — long iterative runs
  * should set `spark.cleaner.referenceTracking.cleanCheckpoints=true`
  * so each round's superseded checkpoint is GC-reclaimed, or point the
  * checkpoint dir at job-scoped storage cleaned on exit. (A library
  * must not mutate the session's conf behind the caller's back, so
  * this is documented rather than forced.)
  */
object Lineage {
  /** Truncate a DataFrame's lineage. On the reliable path the frame is
    * persisted first so the eager materialization and the checkpoint
    * write don't EACH compute the plan (RDD.checkpoint's documented
    * contract: checkpoint without persist runs the computation twice);
    * the cache is dropped once the checkpoint is materialized.
    * `eager = false` is honored only on the LOCAL path (localCheckpoint
    * blocks are reclaimed by the ContextCleaner once the plan is
    * unreachable); the reliable path always materializes eagerly —
    * a lazy persist there has no unpersist hook and leaks one
    * CacheManager entry per call on a long-lived service (r14 review).
    * Idempotent: an already-truncated plan (checkpoint scan / local
    * relation) passes through untouched.
    */
  def truncate(df: DataFrame, eager: Boolean = true): DataFrame = {
    // idempotent: a frame whose plan is already lineage-free (a prior
    // checkpoint's RDD scan, or a local relation) gains nothing from a
    // second checkpoint — it would only copy the blocks again. Lets
    // composed operators each declare their own truncation without a
    // caller-side "is it already truncated" protocol (r14: the CC gate
    // truncates the band rows it shares across consumers, and
    // bandsWithBucketMin declares its own for direct callers).
    val analyzed = df.queryExecution.analyzed
    val alreadyFlat = analyzed match {
      case _: org.apache.spark.sql.execution.LogicalRDD => true
      case _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => true
      case _ => false
    }
    if (alreadyFlat) df
    else if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) {
      // reliable path: ALWAYS eager — persist + checkpoint(lazy) would
      // leave the CacheManager entry registered forever (one leaked
      // MEMORY_AND_DISK cache per operator construction on a long-
      // lived cluster service; review r14), and checkpoint-without-
      // persist computes the plan twice. The extra blocking job per
      // call is the price of the leak-free contract; local mode (below)
      // keeps true laziness — localCheckpoint's RDD-level persist is
      // reclaimed by the ContextCleaner once the plan is unreachable.
      val persisted = df.persist(StorageLevel.MEMORY_AND_DISK)
      val out = persisted.checkpoint(eager = true)
      persisted.unpersist(blocking = false)
      out
    } else df.localCheckpoint(eager)
  }

  /** RDD twin of [[truncate]] — ONE definition of the deployment
    * policy (the BPE trainers iterate on RDDs). CONTRACT: the caller
    * persists the RDD before its first action (both trainers do), so
    * the reliable checkpoint write reads the cache instead of
    * recomputing; callers own the unpersist.
    */
  def truncate(rdd: org.apache.spark.rdd.RDD[_]): Unit =
    if (rdd.sparkContext.getCheckpointDir.isDefined) rdd.checkpoint()
    else { rdd.localCheckpoint(); () }
}
