package graft.index

import graft.core.TileOps
import graft.functions.GeoFunctions
import graft.ops.TileIndexOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A12 — aggregate pushdown over tile summary statistics (SURVEY §4
  * "needs design"; reference: TimeSeriesSolr.py:284-327,
  * TimeSeries.py:311-334).
  *
  * The fast time-series path: tiles fully inside the query bbox are
  * answered from their pre-aggregated index columns (stats_mean,
  * stats_count — the array payload is never read, so the scan projects
  * only scalars); only tiles straddling the bbox boundary explode to
  * points, get masked to the domain, and recompute. The two partial
  * streams combine with count-weighted algebra.
  *
  * At 100 TB this is the difference between scanning summary columns
  * of every tile (KBs each) and decoding every array payload: interior
  * tiles dominate any large domain, so the pushdown reads a vanishing
  * fraction of the bytes.
  *
  * Matches the reference's weighting semantics: the combined mean is
  * count-weighted over tile means (calculate_monthly_average
  * :261-326); use the full explode path when exact cos-lat weighting
  * across tiles is required.
  */
object SummaryPushdown {

  /** Per-day mean/count over the bbox domain, summaries-first.
    * `tiles` must carry the standard summary columns + array payloads.
    */
  def dailyMeanFromSummaries(tiles: DataFrame,
                             minLat: Double, maxLat: Double,
                             minLon: Double, maxLon: Double): DataFrame = {
    val overlapping = tiles.where(
      TileIndexOps.overlaps(col("min_lat"), col("max_lat"), lit(minLat), lit(maxLat)) &&
        TileIndexOps.overlaps(col("min_lon"), col("max_lon"), lit(minLon), lit(maxLon)))

    // fast path only for tiles that are (a) fully inside the bbox and
    // (b) single-day — a multi-day tile's summary count cannot be
    // attributed to one day, so it routes to the explode path
    val isInner =
      TileIndexOps.within(col("min_lat"), col("max_lat"), lit(minLat), lit(maxLat)) &&
        TileIndexOps.within(col("min_lon"), col("max_lon"), lit(minLon), lit(maxLon)) &&
        TileOps.dayStart(col("min_time")) === TileOps.dayStart(col("max_time"))

    // interior tiles: index columns only — no array column in the plan
    val innerPartials = overlapping.where(isInner)
      .select(TileOps.dayStart(col("min_time")).as("day_start"),
        (col("stats_mean") * col("stats_count")).as("sum_v"),
        col("stats_count").as("cnt"))

    // boundary tiles: explode, mask to the domain, recompute with the
    // SAME per-tile semantics as the summaries (cos-lat-weighted tile
    // mean × count), so a tile flipping inner↔border as the bbox moves
    // never changes the combined value discontinuously
    val borderPoints = TileOps.maskPointsToBBox(
      TileOps.toPoints(overlapping.where(!isInner)),
      minLat, maxLat, minLon, maxLon)
    // sum(w) can never vanish for a surviving group: cos(radians(lat))
    // is ≥ 6.1e-17 for every representable |lat| ≤ 90 (double cos of a
    // rounded π/2 is not exactly 0), and NULL-coordinate points never
    // pass the bbox mask — so sum_v NULL with cnt > 0 (a phantom-count
    // bias in the combine) has no reachable input
    val w = GeoFunctions.cosLatWeight(col("latitude"))
    val borderPartials = borderPoints
      .groupBy(col("tile_id"), TileOps.dayStart(col("time")).as("day_start"))
      .agg(((sum(col("value") * w) / sum(w)) * count(lit(1))).as("sum_v"),
        count(lit(1)).as("cnt"))
      .select("day_start", "sum_v", "cnt")

    innerPartials.unionByName(borderPartials)
      .groupBy("day_start")
      .agg((sum(col("sum_v")) / sum(col("cnt"))).as("mean"),
        sum(col("cnt")).as("cnt"))
  }
}
