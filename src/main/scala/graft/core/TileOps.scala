package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GeoFunctions

/** Tile-level operators: explosion to points, domain masking, summary
  * statistics, and the analytic kernels of the reference's handlers
  * (SURVEY §2.4), all as declarative plans over the `tiles` table.
  *
  * Everything here is partition-friendly: explosion is a generator (no
  * shuffle), masking is a filter, kernels are hash aggregations with
  * map-side partials. At 100 TB the `tiles` table is partitioned by
  * (dataset, time bucket), so the P-layer predicates prune partitions
  * before any array column is even read.
  */
object TileOps {

  /** Epoch-seconds → day-bucket start (floor division, so pre-1970
    * times land in the correct day). THE one place this expression
    * lives — two independent truncate-toward-zero bugs came from
    * hand-writing it.
    */
  def dayStart(timeSec: Column): Column =
    floor(timeSec / 86400L).cast("long") * 86400L

  /** Explode tiles to non-masked points (nexus_point_generator,
    * nexusmodel.py:69-86). Index arithmetic over the row-major
    * time × lat × lon layout; NaN cells are dropped (mask semantics).
    * No shuffle — a generator over the scan.
    *
    * `metaNames`: also surface the named `meta_data` companion arrays
    * (secondary variables, `nexusmodel.py:34/69-86` — the reference's
    * point generator yields `NexusPoint.data_val` plus the same-index
    * meta values) as one column per name, aligned by the shared
    * row-major index. A point masked in the PRIMARY is dropped (the
    * reference's generator iterates the primary's mask); a meta slot
    * masked independently surfaces as NULL.
    */
  def toPoints(tiles: DataFrame, metaNames: Seq[String] = Nil,
               includeMetaMap: Boolean = false): DataFrame = {
    val nlat = size(col("latitudes"))
    val nlon = size(col("longitudes"))
    val metaCols = metaNames.map { nm =>
      val slot = element_at(col(s"__meta_$nm"), col("idx") + 1)
      when(isnan(slot), lit(null)).otherwise(slot)
        .cast("double").as(nm)
    }
    // includeMetaMap (/datainbounds includemeta): EVERY companion's
    // value at this point, as a dynamic name → value map. The whole
    // meta_data map necessarily rides through the generator here —
    // that is the request's cost, exactly as in the reference — so
    // ask for named columns via metaNames when the names are known.
    val metaMapCol =
      if (!includeMetaMap) Nil
      else Seq(transform_values(col("meta_data"), (_, v) => {
        val slot = element_at(v, col("idx") + 1)
        when(isnan(slot), lit(null)).otherwise(slot).cast("double")
      }).as("meta"))
    tiles
      .select(Seq(col("tile_id"), col("dataset"), col("latitudes"),
        col("longitudes"), col("times"), nlat.as("nlat"), nlon.as("nlon"),
        posexplode(col("data")).as(Seq("idx", "value"))) ++
        // extract ONLY the requested companion arrays BEFORE the
        // explode: carrying the whole meta_data map through the
        // generator would duplicate every stored companion into each
        // exploded row
        metaNames.map(nm =>
          element_at(col("meta_data"), nm).as(s"__meta_$nm")) ++
        (if (includeMetaMap) Seq(col("meta_data")) else Nil): _*)
      .where(!isnan(col("value")))
      .select(Seq(
        col("tile_id"), col("dataset"),
        element_at(col("latitudes"), (col("idx") % (col("nlat") * col("nlon")) / col("nlon")).cast("int") + 1)
          .cast("double").as("latitude"),
        element_at(col("longitudes"), (col("idx") % col("nlon")).cast("int") + 1)
          .cast("double").as("longitude"),
        element_at(col("times"), (col("idx") / (col("nlat") * col("nlon"))).cast("int") + 1)
          .as("time"),
        col("value").cast("double").as("value")) ++ metaCols ++ metaMapCol: _*)
  }

  /** Clip exploded points to a search bbox (mask_tiles_to_bbox,
    * nexustiles.py:243-277) — in the columnar design masking is a
    * plain filter on the point relation.
    */
  def maskPointsToBBox(points: DataFrame, minLat: Double, maxLat: Double,
                       minLon: Double, maxLon: Double): DataFrame =
    points.where(col("latitude").between(minLat, maxLat) &&
      col("longitude").between(minLon, maxLon))

  /** Per-tile summary stats (ingest-time A7, tilesumarizingprocessor
    * .py:27-98): min/max/cos-lat-weighted mean/count. The reference
    * weights only the mean, not min/max (SURVEY §7.4).
    */
  def tileSummaries(points: DataFrame): DataFrame = {
    val w = GeoFunctions.cosLatWeight(col("latitude"))
    points.groupBy(col("tile_id"))
      .agg(
        min(col("value")).as("stats_min"),
        max(col("value")).as("stats_max"),
        (sum(col("value") * w) / sum(w)).as("stats_mean"),
        count(col("value")).as("stats_count"),
        min(col("time")).as("min_time"),
        max(col("time")).as("max_time"))
  }

  /** A1 — per-day domain statistics (TimeSeriesSpark.calc_average_on_day
    * :493-554): cos-lat-weighted mean; min/max/std unweighted, exactly
    * as the reference kernel does (TimeSeriesSpark.py:536-541).
    * `extraKeys` adds grouping columns (e.g. `dataset` for the
    * multi-dataset time-series request — one series per dataset).
    */
  def dailyStats(points: DataFrame, extraKeys: Seq[String] = Nil): DataFrame = {
    val w = GeoFunctions.cosLatWeight(col("latitude"))
    points
      .groupBy(extraKeys.map(col) :+ dayStart(col("time")).as("day_start"): _*)
      .agg(
        (sum(col("value") * w) / sum(w)).as("mean"),
        min(col("value")).as("min"),
        max(col("value")).as("max"),
        stddev_samp(col("value")).as("std"),
        count(col("value")).as("cnt"))
  }

  /** A2 — time-average map: per-(lat, lon) sum/count/mean partials
    * (TimeAvgMapSpark.py:28-96, 181-198). Hash aggregate with map-side
    * combine replaces the reference's hand-rolled combineByKey.
    */
  def timeAvgMap(points: DataFrame): DataFrame =
    points.groupBy(col("latitude"), col("longitude"))
      .agg(sum(col("value")).as("sum"), count(col("value")).as("cnt"),
        avg(col("value")).as("mean"))

  /** A6 — Hovmöller: per (time, latitude) [or longitude] stats
    * (HofMoellerSpark.py:27-102).
    */
  def hovmoller(points: DataFrame, axis: String): DataFrame =
    points.groupBy(col("time"), col(axis))
      .agg(count(col("value")).as("cnt"), avg(col("value")).as("mean"),
        min(col("value")).as("min"), max(col("value")).as("max"),
        stddev_samp(col("value")).as("std"))

  /** A4 — per-pixel Pearson correlation of two datasets co-located on
    * (time, lat, lon) (CorrMapSpark.py:29-151): equi-join then corr
    * per pixel; Catalyst's corr uses the same one-pass algebra.
    */
  def corrMap(pointsA: DataFrame, pointsB: DataFrame): DataFrame = {
    val a = pointsA.select(col("time"), col("latitude"), col("longitude"),
      col("value").as("va"))
    val b = pointsB.select(col("time"), col("latitude"), col("longitude"),
      col("value").as("vb"))
    a.join(b, Seq("time", "latitude", "longitude"))
      .groupBy(col("latitude"), col("longitude"))
      .agg(corr(col("va"), col("vb")).as("r"), count(lit(1)).as("n"))
  }

  /** A16 — approximate value at (lat, lon): the nearest non-masked grid
    * point per tile (nexusmodel.get_approximate_value_for_lat_lon
    * :223-250).
    */
  def approxValueAt(points: DataFrame, lat: Double, lon: Double): DataFrame = {
    val d = pow(col("latitude") - lat, 2) + pow(col("longitude") - lon, 2)
    val w = Window.partitionBy(col("tile_id"))
      .orderBy(d.asc, col("latitude").asc, col("longitude").asc)
    points.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }
}
