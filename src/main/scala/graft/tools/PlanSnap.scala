package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool (r15): snapshot every gate's FORMATTED physical plan to
  * one file with volatile tokens (exprIds, plan ids, per-process tmp
  * paths, UUIDs) normalized away, so two snapshots taken under
  * different session configs (e.g. with and without
  * spark.sql.optimizer.excludedRules) can be diffed byte-for-byte to
  * PROVE a config change is plan-neutral on the whole suite. Not part
  * of the driver contract.
  *
  * Usage: runMain graft.tools.PlanSnap <sfDir> <outFile>
  *   SPARK_GRAFT_EXCLUDED_RULES=<csv> applies an exclusion list.
  */
object PlanSnap {
  private[tools] def normalize(s: String): String = s
    .replaceAll("#\\d+", "#x")
    .replaceAll("@[0-9a-f]+", "@x")
    .replaceAll("Lambda\\$\\d+/0x[0-9a-f]+", "Lambda\\$x")
    .replaceAll("MapPartitionsRDD\\[\\d+\\]", "MapPartitionsRDD[x]")
    .replaceAll("plan_id=\\d+", "plan_id=x")
    .replaceAll("\\bid=#x\\b", "id=#x")
    .replaceAll("[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}", "UUID")
    .replaceAll("gate-[0-9a-f]{8}", "gate-X")
    .replaceAll("tile_store_[0-9a-f]+_\\d+", "tile_store_X")
    .replaceAll("graft_j1c_store\\S*", "graft_j1c_store_X")
    .replaceAll("Statistics\\([^)]*\\)", "Statistics(X)")
    .replaceAll("cachedrdd_\\d+", "cachedrdd_x")
    .replaceAll("CachedRDDBuilder\\(.*", "CachedRDDBuilder(X")
    .replaceAll("LocalTableScan \\[.*", "LocalTableScan [X]")

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val out = args(1)
    val b = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_EXCLUDED_RULES").foreach { rules =>
      b.config("spark.sql.optimizer.excludedRules", rules)
    }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gates = graft.SparkEntry.queries.toSeq.sortBy(_._1)
    // j1c/a12b build one-time stores on first construction — run the
    // store-writing gates once so both snapshots see the same shape
    Seq("a12b_summary_pushdown").foreach { n =>
      try graft.SparkEntry.queries(n)(spark, dir).queryExecution.toRdd.count()
      catch { case _: Throwable => () }
    }
    val sb = new StringBuilder
    gates.foreach { case (name, fn) =>
      sb.append(s"===== $name =====\n")
      val body =
        try fn(spark, dir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        catch { case e: Throwable => s"explain failed: ${e.getMessage}" }
      sb.append(normalize(body)).append('\n')
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      sb.toString.getBytes("UTF-8"))
    println(s"[plansnap] wrote ${gates.size} plans to $out")
    spark.stop()
  }
}
