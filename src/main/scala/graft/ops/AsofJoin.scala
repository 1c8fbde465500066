package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — each left row matched to the most recent right row
  * at-or-before its time, per key (SURVEY J4/P8: the data↔climatology
  * anomaly join, DailyDifferenceAverageSpark.py:295-374 /
  * SolrProxy.pyx:137-153).
  *
  * Implementation is the sort-merge-style union+window trick: tag both
  * sides, union, sort within each key by (time, tag), and carry the
  * last-seen right-side values forward with `last(..., ignoreNulls)`.
  * One shuffle on the key, no per-row lookups, no O(n·m) blowup —
  * the plan is a single window over a union, which scales like a
  * sort-merge join at 100 TB (and AQE handles key skew).
  */
object AsofJoin {

  /** @param keys      equality key columns present in both sides
    * @param leftTime  time expression over `left`
    * @param rightTime time expression over `right`
    * @param rightVals right columns to carry (appear as `matched_<name>`)
    * @param rightTie  right column ordering equal-time right rows
    *                  (latest wins), for determinism
    * @return `left` rows (all columns) plus `matched_*` columns; rows
    *         with no earlier right match have NULL `matched_*`.
    */
  def lastEarlier(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTime: Column, rightTime: Column,
                  rightVals: Seq[String], rightTie: String): DataFrame = {
    // the carried values ride in ONE struct, so the match is always a
    // single actual right row — carrying columns independently would
    // stitch fields from different rows whenever the latest row holds
    // a NULL field
    val r2 = right.select(
      keys.map(col) ++
        Seq(rightTime.as("__t"), lit(0).as("__tag"), col(rightTie).as("__tie"),
          struct(rightVals.map(col): _*).as("__rvals")): _*)
      // a NULL-time right row has no position on the timeline; left
      // unfiltered it sorts FIRST (asc = nulls-first) and its non-null
      // value struct is carried into every left row that should have
      // matched nothing — violating the at-or-before contract
      .where(col("__t").isNotNull)
    val l2 = left.withColumn("__t", leftTime).withColumn("__tag", lit(1))
    val u = l2.unionByName(r2, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__tag").asc, col("__tie").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = u.withColumn("__m", last(col("__rvals"), ignoreNulls = true).over(w))
      .where(col("__tag") === 1)
    rightVals.foldLeft(matched) { (df, c) =>
        df.withColumn(s"matched_$c", col("__m").getField(c))
      }
      .drop("__t", "__tag", "__tie", "__rvals", "__m")
  }
}
