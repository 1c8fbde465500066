package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot aggregation keys (SURVEY §4 / SCALING.md):
  * two-phase salted aggregation. Phase 1 spreads each hot key over
  * `buckets` salt partitions (map-side partials stay balanced); phase 2
  * combines the algebraic partials per real key. AQE's skew handling
  * covers joins; this covers the groupBy path when one key dominates
  * (e.g. the dedup mega-cluster, a global hot pixel).
  *
  * The salt mixes a per-row id into the hash so byte-identical rows —
  * precisely the dedup-mega-cluster hot-key case — still spread across
  * buckets. The aggregate RESULT is salt-invariant (sum/count/min/max
  * partials recombine identically whatever the bucket assignment), so
  * reproducibility is unaffected.
  */
object Salting {

  private def rowSalt(df: DataFrame, buckets: Int): org.apache.spark.sql.Column =
    pmod(hash((df.columns.map(col) :+ monotonically_increasing_id()).toIndexedSeq: _*),
      lit(buckets))

  /** Salted sum/count/min/max (algebraic partials) per key. Output
    * columns: sum_<v>, cnt_<v>, min_<v>, max_<v>, mean_<v>.
    */
  def saltedStats(df: DataFrame, keys: Seq[String], valueCol: String,
                  buckets: Int): DataFrame = {
    val salted = df.withColumn("__salt", rowSalt(df, buckets))
    val partial = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(
        sum(col(valueCol)).as("__s"),
        count(col(valueCol)).as("__c"),
        min(col(valueCol)).as("__mn"),
        max(col(valueCol)).as("__mx"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("__s")).as(s"sum_$valueCol"),
        sum(col("__c")).as(s"cnt_$valueCol"),
        min(col("__mn")).as(s"min_$valueCol"),
        max(col("__mx")).as(s"max_$valueCol"),
        (sum(col("__s")) / sum(col("__c"))).as(s"mean_$valueCol"))
  }

  /** Salt one side of a join on a skewed key: replicate the small side
    * `buckets` times, salt the big side deterministically, join on
    * (key, salt). Equivalent rows, balanced partitions.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 buckets: Int): DataFrame = {
    val bigSalted = big.withColumn("__salt", rowSalt(big, buckets))
    val smallReplicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    bigSalted.join(smallReplicated, Seq(key, "__salt")).drop("__salt")
  }
}
