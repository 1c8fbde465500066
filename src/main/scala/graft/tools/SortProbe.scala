package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch decomposition of j1's final total sort (VERDICT r7 item 8):
  * the gate's orderBy adds a range-partitioning exchange whose bounds
  * are SAMPLED from its child — and sampling a shuffle-exchange child
  * re-executes the join probe, so the pair enumeration runs ~twice.
  * Variants, each materialized via toRdd.count() (Bench's rule):
  *
  *   join   — pair enumeration only (no ordering)
  *   local  — + sortWithinPartitions(pid, eid) (no exchange)
  *   order  — + orderBy(pid, eid)   (the gate: exchange + sample + sort)
  *
  * order - local ≈ range exchange + bounds sampling (incl. the double
  * probe); local - join ≈ the distributed per-partition sort itself.
  *
  * Usage: runMain graft.tools.SortProbe <sfDir> [reps]
  */
object SortProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def pairs: DataFrame = graft.queries.JoinQueries.j1Pairs(spark, dir)
    val variants: Seq[(String, () => DataFrame)] = Seq(
      "join" -> (() => pairs),
      "local" -> (() => pairs.sortWithinPartitions("pid", "eid")),
      "order" -> (() => pairs.orderBy("pid", "eid")),
      // the gate's production form: BucketedSort (one hash exchange,
      // bounds from the primary's min/max, no sampling pass)
      "bucket" -> (() => graft.SparkEntry.queries("j1_tolerance_join")(spark, dir)))

    variants.foreach { case (nm, f) =>
      f().queryExecution.toRdd.count() // warm
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = f().queryExecution.toRdd.count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[sortprobe] $nm%-6s min ${times.map(_._1).min}%.3f s " +
        f"(reps ${times.map(t => f"${t._1}%.2f").mkString(",")}; ${times.head._2} rows)")
    }
    spark.stop()
  }
}
