package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe (r15): decompose one gate's latency into FINE driver
  * phases — construct (fn + analysis), optimize (optimizedPlan),
  * plan (executedPlan: physical planning + AQE wrapper), run
  * (toRdd: under AQE this EXECUTES every non-final stage), and count
  * (final stage) — a sharper version of PlanCost's 3-way split for
  * deciding whether the sub-second tail is Catalyst or stage
  * execution. Not part of the driver contract.
  *
  * Usage: runMain graft.tools.FinePhase <sfDir> <q1,q2,...> [reps]
  */
object FinePhase {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",").map(_.trim).toSeq
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = graft.SparkTuning.tuned(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      try fn(spark, dir).queryExecution.toRdd.count() // warm
      catch { case _: Throwable => () }
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        val df = fn(spark, dir)
        val qe = df.queryExecution
        qe.assertAnalyzed()
        val t1 = System.nanoTime()
        qe.optimizedPlan
        val t2 = System.nanoTime()
        qe.executedPlan
        val t3 = System.nanoTime()
        val rdd = qe.toRdd
        val t4 = System.nanoTime()
        try rdd.count() catch { case _: Throwable => () }
        val t5 = System.nanoTime()
        def s(a: Long, b: Long) = (b - a) / 1e9
        println(f"[fine] $name rep$i construct=${s(t0, t1)}%.3f optimize=${s(t1, t2)}%.3f plan=${s(t2, t3)}%.3f stages=${s(t3, t4)}%.3f final=${s(t4, t5)}%.3f total=${s(t0, t5)}%.3f")
      }
    }
    spark.stop()
  }
}
