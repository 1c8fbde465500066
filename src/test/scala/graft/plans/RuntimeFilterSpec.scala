package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** At 100 TB the cheapest rows are the ones the scan never surfaces.
  * Catalyst's runtime bloom-filter injection builds a filter from the
  * selective (dimension) side of a shuffle join and applies it as a
  * `might_contain` predicate on the fact side's scan — a semi-join
  * reduction the engine gets by keeping joins declarative. The
  * size thresholds are tuned for clusters, so this spec lowers them to
  * prove the rewrite engages on our join shapes (the plan-level
  * behavior is scale-independent; only the thresholds are).
  */
class RuntimeFilterSpec extends SparkSpec {

  test("selective dim join injects a bloom filter on the fact scan") {
    val dir = "/root/testdata/sf0.01"
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val fact = spark.read.parquet(s"$dir/lineitem.parquet")
      // the injection rule requires a LIKELY-SELECTIVE creation-side
      // predicate (equality/IN/LIKE over an attribute — an arithmetic
      // expression like `key % 100 = 0` does not qualify)
      val dim = spark.read.parquet(s"$dir/part.parquet")
        .where(col("p_brand") === "Brand#1")
      val joined = fact.join(dim, col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_returnflag")).agg(sum(col("l_quantity")).as("q"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") &&
        optimized.contains("bloom_filter_agg"),
        s"runtime bloom filter not injected:\n$optimized")
      // and the filtered plan still computes the right answer
      val expected = fact.join(dim.hint("broadcast"),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_returnflag")).agg(sum(col("l_quantity")).as("q"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got === expected)
    }
  }

  private def withConf(kvs: (String, String)*)(body: => Unit): Unit = {
    val old = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
