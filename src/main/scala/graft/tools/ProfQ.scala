package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch per-query profiler: ProfQ <sfDir> <query> [reps] — warm
  * once, time reps, print each. Not part of the library.
  */
object ProfQ {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    // materialize the query's OWN plan (count() lets Catalyst delete
    // sorts/prune columns and times an emptier plan — same rule as
    // Bench)
    def run(): Long = fn(spark, dir).queryExecution.toRdd.count()
    run() // warm
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = run()
      println(f"[prof] $name rep$i ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    if (sys.env.contains("PROF_EXPLAIN")) fn(spark, dir).explain("formatted")
    spark.stop()
  }
}
