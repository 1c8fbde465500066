package graft

import org.apache.spark.sql.SparkSession

/** Session-level engine tuning shared by every entrypoint that builds a
  * session (Bench, Verify, dev probes) — r15, guide §7.3 "driver
  * overheads" / §1.2 step 3.
  *
  * The excluded optimizer rules below were MEASURED, not guessed:
  * `RuleExecutor.dumpTimeSpent()` over 3 full timed passes of all 129
  * gates (graft.tools.PlanCost) shows each rule with ZERO effective
  * runs — it never changed any plan in the suite — while still being
  * traversed on every optimization pass. Excluding them is
  * plan-neutral by construction on this workload, proven by a
  * byte-identical PlanSnap diff (normalized formatted plans for all
  * 129 gates with and without the exclusions, sf0.1 and sf0.001).
  *
  * Selection rules (why this list and not every zero-effective rule):
  *  - main-optimizer rules only (analyzer rules are not excludable);
  *  - structural rules only — a rule whose applicability depends on
  *    runtime statistics (InjectRuntimeFilter, the AQE re-optimizer's
  *    AQEPropagateEmptyRelation) is KEPT even though it fired zero
  *    times at the probe SF, because at production scale it can fire
  *    usefully; excluding those would be exactly the local-only
  *    config win the optimization contract forbids.
  *  - rules Spark marks non-excludable are not listed (Spark would
  *    ignore the entry and log a warning per query).
  *
  * The list removes ~0.4 s of pure rule-traversal time per full-suite
  * pass (measured); plan shapes, and therefore results, are unchanged.
  */
object SparkTuning {

  val ExcludedOptimizerRules: String = Seq(
    "org.apache.spark.sql.catalyst.optimizer.OptimizeOneRowPlan",
    "org.apache.spark.sql.catalyst.optimizer.FoldablePropagation",
    "org.apache.spark.sql.catalyst.optimizer.PruneFilters",
    "org.apache.spark.sql.catalyst.optimizer.MergeScalarSubqueries",
    "org.apache.spark.sql.catalyst.optimizer.OptimizeOneRowRelationSubquery",
    "org.apache.spark.sql.catalyst.optimizer.SimplifyBinaryComparison",
    "org.apache.spark.sql.catalyst.optimizer.OptimizeCsvJsonExprs",
    "org.apache.spark.sql.catalyst.optimizer.GenerateOptimization",
    "org.apache.spark.sql.catalyst.optimizer.EliminateOuterJoin",
    "org.apache.spark.sql.catalyst.optimizer.ConstantPropagation",
    "org.apache.spark.sql.catalyst.optimizer.NullDownPropagation",
    "org.apache.spark.sql.catalyst.optimizer.ReorderJoin",
    "org.apache.spark.sql.catalyst.optimizer.EliminateSorts",
    "org.apache.spark.sql.catalyst.optimizer.PushExtraPredicateThroughJoin",
    "org.apache.spark.sql.catalyst.optimizer.ReplaceNullWithFalseInPredicate",
    "org.apache.spark.sql.catalyst.optimizer.EliminateDistinct",
    "org.apache.spark.sql.catalyst.optimizer.EliminateAggregateFilter",
    "org.apache.spark.sql.catalyst.optimizer.OptimizeWindowFunctions",
    "org.apache.spark.sql.catalyst.optimizer.DecimalAggregates",
    "org.apache.spark.sql.catalyst.optimizer.OptimizeJoinCondition",
    "org.apache.spark.sql.catalyst.optimizer.OptimizeIn",
    "org.apache.spark.sql.catalyst.optimizer.SimplifyExtractValueOps",
    "org.apache.spark.sql.catalyst.optimizer.LikeSimplification",
    "org.apache.spark.sql.catalyst.optimizer.CombineConcats",
    "org.apache.spark.sql.catalyst.optimizer.OptimizeRand",
    "org.apache.spark.sql.catalyst.optimizer.TransposeWindow",
    "org.apache.spark.sql.catalyst.optimizer.LimitPushDownThroughWindow",
    "org.apache.spark.sql.catalyst.optimizer.EliminateWindowPartitions",
    "org.apache.spark.sql.catalyst.optimizer.CollapseRepartition",
    "org.apache.spark.sql.catalyst.optimizer.RemoveRedundantSorts",
    "org.apache.spark.sql.catalyst.optimizer.SimplifyDateTimeConversions",
    "org.apache.spark.sql.catalyst.optimizer.SimplifyCaseConversionExpressions",
    "org.apache.spark.sql.catalyst.optimizer.RemoveLiteralFromGroupExpressions",
    "org.apache.spark.sql.catalyst.optimizer.RemoveRepetitionFromGroupExpressions",
    "org.apache.spark.sql.catalyst.optimizer.OptimizeRepartition",
    "org.apache.spark.sql.catalyst.optimizer.EliminateOffsets"
  ).mkString(",")

  /** Apply the measured tuning to a session builder. Callers that need
    * an untuned control session (PlanSnap A/B) skip this and set confs
    * themselves.
    */
  def tuned(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.optimizer.excludedRules", ExcludedOptimizerRules)
}
