package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev profiler: decompose a gate's wall time into plan-construction
  * (the `fn(spark, dir)` call, which for some gates runs driver-side
  * actions) and per-job / per-stage execution, with task counts and
  * shuffle volumes — the text-mode stand-in for the Spark UI's stage
  * table (guide §7.1) on a UI-less bench host. Not part of the driver
  * contract.
  *
  * Usage: runMain graft.tools.StageProf <sfDir> <query>[,<query>...] [reps]
  */
object StageProf {

  final class Collector extends SparkListener {
    case class StageRow(id: Int, name: String, tasks: Int, wallMs: Long,
                        taskTimeMs: Long, inputMb: Double,
                        shReadMb: Double, shWriteMb: Double)
    // listener events arrive on the bus thread while reset()/report()
    // run on main — every access synchronizes on `this`, and jobStart
    // entries are removed on job end so the map cannot grow across a
    // long multi-query session (review r14)
    private val stages = scala.collection.mutable.ArrayBuffer.empty[StageRow]
    private val jobs = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    private val jobStart = scala.collection.mutable.Map.empty[Int, Long]
    override def onJobStart(j: SparkListenerJobStart): Unit =
      synchronized { jobStart(j.jobId) = j.time }
    override def onJobEnd(j: SparkListenerJobEnd): Unit = synchronized {
      jobs += ((j.jobId, j.time - jobStart.getOrElse(j.jobId, j.time)))
      jobStart.remove(j.jobId)
    }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      val i = s.stageInfo
      val m = i.taskMetrics
      val row = StageRow(i.stageId,
        i.name.split("\n").head.take(80), i.numTasks,
        (i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)).max(0L),
        m.executorRunTime,
        m.inputMetrics.bytesRead / 1e6,
        m.shuffleReadMetrics.totalBytesRead / 1e6,
        m.shuffleWriteMetrics.bytesWritten / 1e6)
      synchronized { stages += row }
    }
    def reset(): Unit = synchronized { stages.clear(); jobs.clear() }
    def report(): Unit = synchronized {
      println(f"  jobs: ${jobs.size} (wall ms each: ${jobs.map(_._2).mkString(", ")})")
      stages.sortBy(-_.wallMs).take(14).foreach { s =>
        println(f"  stage ${s.id}%4d wall=${s.wallMs}%5d ms taskSum=${s.taskTimeMs}%6d ms " +
          f"tasks=${s.tasks}%3d in=${s.inputMb}%7.2f MB shR=${s.shReadMb}%7.2f shW=${s.shWriteMb}%7.2f  ${s.name}")
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",").map(_.trim).toSeq
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val coll = new Collector
    spark.sparkContext.addSparkListener(coll)
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      def once(label: String, report: Boolean): Unit = {
        coll.reset()
        val t0 = System.nanoTime()
        val df = fn(spark, dir)
        val t1 = System.nanoTime()
        val n = df.queryExecution.toRdd.count()
        val t2 = System.nanoTime()
        // listener events are async; DRAIN the bus instead of a fixed
        // sleep (r15, ADVICE: under load events arrived later than
        // 300 ms and rows silently dropped from the report).
        // listenerBus/waitUntilEmpty are private[spark] — public at
        // the bytecode level, reached via reflection; fall back to the
        // old sleep if an upgrade moves them.
        try {
          val sc = spark.sparkContext
          val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
          bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
        } catch { case _: Throwable => Thread.sleep(300) }
        println(f"[$label] $name construct=${(t1 - t0) / 1e9}%.3f s exec=${(t2 - t1) / 1e9}%.3f s total=${(t2 - t0) / 1e9}%.3f s ($n rows)")
        if (report) coll.report()
      }
      once("warm", report = false)
      (1 to reps).foreach(i => once(s"rep$i", report = i == reps))
    }
    spark.stop()
  }
}
