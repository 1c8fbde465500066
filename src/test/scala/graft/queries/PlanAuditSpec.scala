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

  test("exchange counts of the most expensive gates stay pinned") {
    // shuffle/broadcast exchange counts of the top bench-cost queries
    // (BENCH r5, slowest first), pinned from the audited plans: an
    // edit that silently adds a shuffle to a hot path must fail HERE,
    // not show up as a bench regression two rounds later. If a change
    // deliberately alters a plan, re-derive the number and justify it
    // in the commit. Counts are of the INITIAL plan (pre-AQE), so
    // they're deterministic for a given schema + Spark version.
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ShuffleExchangeLike}
    val dir = "/root/testdata/sf0.001"
    val pinned = Map(
      // name -> (shuffles, broadcasts)
      "d_connected_components" -> (1, 0), // post-localCheckpoint final round
      "e_ivf_trained" -> (4, 3),
      "st_rle_sharded" -> (4, 0),
      "e_pca_project" -> (2, 0),
      // r14: 8 → 6 shuffles — bandsWithBucketMin now lineage-truncates
      // the band rows, so the signature subtree (and its spread
      // exchange) appears once instead of once per consumer
      "d_cluster_embeddings" -> (6, 2),
      "t_decontaminate" -> (7, 0),
      "j7_geo_matchup" -> (4, 0),
      // r14: 6 → 4 shuffles — the span-hash relation is truncated, so
      // the shingle pass (and its spread exchange) runs once, not once
      // per consumer
      "d_span_dedup" -> (4, 1),
      "t_heavy_hitters" -> (7, 2),
      "w13_rolling_dau" -> (4, 1),
      "j1_tolerance_join" -> (3, 0),
      "a1_daily_stats" -> (2, 0),
      // r8 gates: spread + word-count + pair-count (argmax collapses
      // to TakeOrderedAndProject, no range exchange)
      "t_bpe_pairs" -> (3, 0),
      // spread + output range sort only — the fingerprint itself is
      // one codegen'd projection, zero exchanges
      "t_rolling_fingerprint" -> (2, 0),
      // spread + centroid global-agg + output sort; centroids broadcast
      "e_ivf_assign_fixed" -> (3, 1),
      // spread + ONE dedup exchange (min_by sort-aggregate — no
      // join-back) + audit agg + output sort
      "d_curation_pipeline" -> (4, 0),
      // r9 gate: encode runs in the RDD scan (spread + memoized merge
      // application live in its lineage, outside the SQL plan); the
      // relational tail is one pair-count aggregate, argmax-50 as
      // TakeOrderedAndProject (no range exchange)
      "t_bpe_step_fixed" -> (1, 0),
      // r9 gate: the assigned relation feeds TWO aggregates (the real
      // updateStep mean + the oracle's member count), each partial+
      // final, plus the two left joins against the 4-row centroid side
      // (broadcast) and the output sort — tiny relations throughout,
      // the pin is against silent shape drift, not cost
      "e_ivf_update_fixed" -> (7, 4))
    val got = pinned.keys.toSeq.sorted.map { name =>
      val plan = graft.SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan
      val inner = plan match {
        case a: AdaptiveSparkPlanExec => a.initialPlan
        case p => p
      }
      name -> (inner.collect { case s: ShuffleExchangeLike => s }.size,
        inner.collect { case b: BroadcastExchangeLike => b }.size)
    }.toMap
    val drift = pinned.keys.toSeq.sorted
      .filter(k => got(k) != pinned(k))
      .map(k => s"$k: expected ${pinned(k)} got ${got(k)}")
    assert(drift.isEmpty, s"plan-shape drift:\n${drift.mkString("\n")}")
  }
}
