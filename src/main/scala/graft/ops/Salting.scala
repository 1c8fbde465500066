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
  * The salt hashes a caller-supplied UNIQUE row id: deterministic
  * across retries (unlike monotonically_increasing_id, which is
  * partition-layout dependent) and spreads byte-identical payload rows
  * (unlike hashing row content). Every table in this engine carries
  * such an id (tile_id, event_id, doc_id, …).
  */
object Salting {

  private def salt(rowId: Column, buckets: Int): Column =
    pmod(hash(rowId), lit(buckets))

  /** Salted sum/count/min/max (algebraic partials) per key. Output
    * columns: sum_<v>, cnt_<v>, min_<v>, max_<v>, mean_<v>.
    */
  def saltedStats(df: DataFrame, keys: Seq[String], valueCol: String,
                  rowId: Column, buckets: Int): DataFrame = {
    val salted = df.withColumn("__salt", salt(rowId, buckets))
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
    * `buckets` times, salt the big side by its row id, join on
    * (key, salt). Equivalent rows, balanced partitions.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 bigRowId: Column, buckets: Int): DataFrame = {
    val bigSalted = big.withColumn("__salt", salt(bigRowId, buckets))
    val smallReplicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    bigSalted.join(smallReplicated, Seq(key, "__salt")).drop("__salt")
  }
}
