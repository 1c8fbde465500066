package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tile-index predicate and window building blocks (SURVEY §2.2/§2.5).
  *
  * The reference's Solr `find_*` queries (data-access/nexustiles/dao/
  * SolrProxy.pyx) are all conjunctive range predicates plus a couple of
  * window tricks; expressed as Catalyst filters they push down to the
  * Parquet scan (min/max skipping + partition pruning) — the Spark-native
  * replacement for Solr index pruning.
  */
object TileIndexOps {

  /** Interval-overlap predicate, the reference's time-range clause
    * (SolrProxy.pyx:202-210):
    * `(lo ∈ [s,e]) OR (hi ∈ [s,e]) OR (lo ≤ s AND hi ≥ e)` ≡
    * `lo ≤ e AND hi ≥ s` — we use the simplified algebraic form so
    * Catalyst sees two independent range predicates it can push down.
    */
  def overlaps(lo: Column, hi: Column, s: Column, e: Column): Column =
    lo <= e && hi >= s

  /** Point-in-interval (find_all_tiles_in_box_at_time, SolrProxy.pyx:357-378). */
  def containsPoint(lo: Column, hi: Column, t: Column): Column =
    lo <= t && hi >= t

  /** Box strictly-within predicate (find_all_tiles_within_box_at_time,
    * SolrProxy.pyx:403-425): the row's extent fully inside the query box.
    */
  def within(minC: Column, maxC: Column, qlo: Column, qhi: Column): Column =
    minC >= qlo && maxC <= qhi

  /** Boundary predicate (find_all_boundary_tiles_at_time,
    * SolrProxy.pyx:427-451): intersects the box but is not within it.
    */
  def boundary(minC: Column, maxC: Column, qlo: Column, qhi: Column): Column =
    overlaps(minC, maxC, qlo, qhi) && !within(minC, maxC, qlo, qhi)

  /** As-of pick (find_tile_by_polygon_and_most_recent_day_of_year,
    * SolrProxy.pyx:137-153): the latest row per key by `orderCol`.
    * The at-or-before cutoff is the CALLER's filter — apply
    * `.where(orderCol <= cutoff)` before calling (as IndexQueries
    * does); this function itself picks the global per-key latest.
    * One shuffle on the partition keys; ties broken by `tieBreak` so
    * the result is deterministic.
    */
  def asOfPick(df: DataFrame, keys: Seq[Column], orderCol: Column,
               tieBreak: Column): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(orderCol.desc, tieBreak.desc)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** Deterministic paging (SolrProxy.pyx:488-504 `start`/`rows`):
    * requires a total order, so callers must pass a tie-broken sort.
    */
  def page(df: DataFrame, sortCols: Seq[Column], start: Int, rows: Int): DataFrame =
    df.orderBy(sortCols: _*).offset(start).limit(rows)
}
