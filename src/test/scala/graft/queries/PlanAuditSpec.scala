package graft.queries

import graft.SparkSpec

/** Global plan audit over every registered gate query: no plan may
  * contain a CartesianProduct — the silent all-pairs scale-killer a
  * missing join key produces. Intentional small cross joins (query
  * sets, dense axes) plan as BroadcastNestedLoopJoin and stay legal.
  */
class PlanAuditSpec extends SparkSpec {

  test("no gate query plans a CartesianProduct") {
    val dir = "/root/testdata/sf0.001"
    val offenders = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }
}
