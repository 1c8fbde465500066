package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe (r15): per-gate driver-overhead split across the WHOLE
  * suite — construct (the `fn` call: plan build + eager analysis),
  * plan (`queryExecution.toRdd`: optimization + physical planning +
  * codegen), and exec (`count()`: scheduling + task work) — the
  * measurement behind the round's Catalyst-fixed-cost attack (VERDICT
  * r14 "next round" #1: 113/129 gates are driver-bound at sf0.1).
  * Also dumps Catalyst's per-rule cumulative time via
  * `RuleExecutor.dumpTimeSpent()` so the excludedRules candidate list
  * is measured, not guessed. Not part of the driver contract.
  *
  * Usage: runMain graft.tools.PlanCost <sfDir> [reps] [gate,gate,...]
  *   SPARK_GRAFT_EXCLUDED_RULES=<csv> sets
  *   spark.sql.optimizer.excludedRules for A/B runs.
  */
object PlanCost {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val onlyGates = if (args.length > 2)
      Some(args(2).split(",").map(_.trim).toSet) else None
    val b = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_EXCLUDED_RULES").foreach { rules =>
      b.config("spark.sql.optimizer.excludedRules", rules)
    }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val gates = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (k, _) => onlyGates.forall(_.contains(k)) }
    // warmup pass: codegen/JIT, one-time stores (a12b/j1c), memos
    gates.foreach { case (_, fn) =>
      try fn(spark, dir).queryExecution.toRdd.count()
      catch { case _: Throwable => () }
    }
    org.apache.spark.sql.catalyst.rules.RuleExecutor.resetMetrics()
    final case class Split(c: Double, p: Double, e: Double) {
      def total: Double = c + p + e
    }
    val rows = gates.map { case (name, fn) =>
      val splits = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val df = fn(spark, dir)
        val t1 = System.nanoTime()
        val rdd = df.queryExecution.toRdd
        val t2 = System.nanoTime()
        try rdd.count() catch { case _: Throwable => () }
        val t3 = System.nanoTime()
        Split((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
      }
      // min PER PHASE (phases are independently noise-hit)
      val m = Split(splits.map(_.c).min, splits.map(_.p).min,
        splits.map(_.e).min)
      println(f"[plancost] $name%-28s construct=${m.c}%7.3f plan=${m.p}%7.3f exec=${m.e}%7.3f total=${m.total}%7.3f")
      name -> m
    }
    val tc = rows.map(_._2.c).sum
    val tp = rows.map(_._2.p).sum
    val te = rows.map(_._2.e).sum
    println(f"[plancost] TOTALS over ${rows.size} gates: construct=$tc%.2f plan=$tp%.2f exec=$te%.2f sum=${tc + tp + te}%.2f s")
    println("[plancost] === RuleExecutor.dumpTimeSpent (cumulative over " +
      s"$reps timed reps of the whole suite) ===")
    println(org.apache.spark.sql.catalyst.rules.RuleExecutor.dumpTimeSpent())
    spark.stop()
  }
}
