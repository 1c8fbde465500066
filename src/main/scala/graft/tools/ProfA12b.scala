package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiler for the a12b bench tail — not part of the library. */
object ProfA12b {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s  ($n rows)")
    }

    // warmup
    time("warmup_a1")(graft.SparkEntry.queries("a1_daily_stats")(spark, dir).count())

    time("a12b_full")(graft.SparkEntry.queries("a12b_summary_pushdown")(spark, dir).count())
    time("a12b_full_2nd")(graft.SparkEntry.queries("a12b_summary_pushdown")(spark, dir).count())
    time("a12_agg_pushdown")(graft.SparkEntry.queries("a12_agg_pushdown")(spark, dir).count())
    time("core_tile_pipeline")(graft.SparkEntry.queries("core_tile_pipeline")(spark, dir).count())

    spark.stop()
  }
}
