package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SCALING.md leans on AQE skew-join splitting as the safety net for
  * skewed band/bucket keys (tolerance bands, LSH mega-buckets). This
  * spec proves the mechanism actually engages on this build: a join
  * with one mega-key, thresholds tuned to testbed size, must show
  * skew-split sort-merge partitions in the adaptive plan.
  */
class AqeSkewSpec extends SparkSpec {

  test("AQE splits a skewed join partition") {
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.shuffle.partitions"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8k")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8k")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.shuffle.partitions", "4")
      // one mega-key (0) carrying ~99% of rows + a uniform tail
      val left = spark.range(0, 60000)
        .select(when(col("id") < 59000, lit(0L)).otherwise(col("id") % 97).as("k"),
          concat(lit("padpadpadpadpadpadpadpad-"), col("id")).as("payload"))
      val right = spark.range(0, 200)
        .select((col("id") % 97).as("k"), col("id").as("rv"))
      val joined = left.join(right, "k")
      // execute THIS DataFrame (a .count() would finalize a different
      // adaptive plan wrapped in its own aggregate)
      joined.queryExecution.toRdd.count()
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE skew split did not engage:\n$finalPlan")
    } finally saved.foreach { case (k, v) =>
      v match { case Some(x) => conf.set(k, x); case None => conf.unset(k) }
    }
  }
}
