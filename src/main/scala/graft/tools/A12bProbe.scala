package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: split a12b's construct-time cost into its driver-side
  * pieces (tile-store parquet read vs plan construction). Not part of
  * the driver contract.
  */
object A12bProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the store via one full gate run
    graft.SparkEntry.queries("a12b_summary_pushdown")(spark, dir)
      .queryExecution.toRdd.count()
    val tag = java.lang.Long.toHexString(
      java.util.UUID.nameUUIDFromBytes(dir.getBytes("UTF-8"))
        .getMostSignificantBits)
    val store = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_a12b_tile_store_${tag}_${ProcessHandle.current.pid}").getPath
    (1 to 3).foreach { i =>
      var t0 = System.nanoTime()
      val tiles = spark.read.parquet(store)
      val tRead = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val q = graft.index.SummaryPushdown
        .dailyMeanFromSummaries(tiles, 0, 7.5, 0, 7.5)
      val tPlan = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val rdd = q.queryExecution.toRdd
      val tOpt = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      rdd.count()
      val tExec = (System.nanoTime() - t0) / 1e9
      println(f"[a12b] rep$i read=$tRead%.3f plan=$tPlan%.3f optimize=$tOpt%.3f exec=$tExec%.3f")
    }
    spark.stop()
  }
}
