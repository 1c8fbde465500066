package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.kernels.GridFilters

/** Remaining source/function coverage: the in-situ JSON source (S7) and
  * offline climatology generation (SURVEY §2.10) — the N-day bucket
  * job plus the reference's other two averagers, spatialFilter and
  * gaussInterp, run over the same granule-day grid the tile pipeline
  * uses.
  */
object MiscQueries extends QueryModule {

  /** Reference Gaussian 3×3 filter, normalization 16
    * (ClimatologySpark.py:84-90, SpatialFilterConfig1). */
  private val FilterGaussian = Seq(Seq(1, 2, 1), Seq(2, 4, 2), Seq(1, 2, 1))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S7 — in-situ EDGE source: semi-structured point records with a
    // JSON payload column, parsed and filtered engine-side
    // (Matchup.query_edge:639-691; the JSON paging becomes a JSON
    // column parse).
    "s7_insitu_json" -> { (s, dir) =>
      // EvalOnce barrier (r15, guide §4.4): without it the k-filter is
      // pushed below BOTH the projection and the spread exchange,
      // substituting the JSON parse into the filter — measured plan:
      // THREE get_json_object parses per surviving row, two of them on
      // the scan's single task below the repartition. Barriered, every
      // row is parsed exactly once, after the spread, on all cores.
      Tables.eventsSpread(s, dir)
        .select(col("event_id"),
          graft.functions.EvalOnce.once(
            get_json_object(col("props"), "$.k").cast("long")).as("k"),
          round(col("value") + lit(1e-9), 4).as("value_r"))
        .where(col("k").between(10, 50))
        .orderBy("event_id")
    },

    // §2.10 — climatology generation: N-day (weekly) day-of-year
    // buckets averaged across all years (ClimatologySpark
    // .climByAveragingPeriods:99-180) — the offline job that *produces*
    // a _CLIM dataset.
    "c10_clim_generation" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(expr("dayofyear(l_shipdate) DIV 7").as("week_of_year"),
          col("l_returnflag"))
        .agg(round(avg(col("l_quantity")) + 1e-9, 4).as("clim_mean"),
          count(lit(1)).as("cnt"),
          countDistinct(year(col("l_shipdate"))).as("n_years"))
        .orderBy("week_of_year", "l_returnflag")
    },

    // §2.10 — spatialFilter averager (spatialFilter.py:11-35,
    // spatialFilter_f.f:80-118): per-epoch 3×3 Gaussian-filter
    // convolution over the granule-day grid, then mean across epochs.
    "c11_spatial_filter" -> { (s, dir) =>
      val cells = TileQueries.gridCells(s, dir)
      GridFilters.spatialFilter(cells, "granule", "lat_c", "lon_c", "v",
          FilterGaussian, normalization = 16.0, latN = 10, lonN = 10)
        .select(col("lat_c"), col("lon_c"),
          round(col("filtered") + lit(1e-9), 4).as("filtered"),
          col("n_epochs"))
        .orderBy("lat_c", "lon_c")
    },

    // §2.10 — gaussInterp averager (gaussInterp_slow.py:8-61):
    // Gaussian-weighted mean over a ±1-cell window and all epochs,
    // interpolating to the median epoch (the reference's midTime =
    // vtime[int(ntime/2 + 0.5)]).
    "c12_gauss_interp" -> { (s, dir) =>
      val cells = TileQueries.gridCells(s, dir)
      // median granule day, by the reference's index formula
      val mid = cells.agg(collect_set(col("granule")).as("gs"))
        .select(expr(
          "element_at(array_sort(gs), CAST((size(gs) + 1) DIV 2 + 1 AS INT))")
          .as("mg"))
      val withMid = cells.crossJoin(broadcast(mid))
      GridFilters.gaussInterp(withMid,
          epochDay = datediff(to_date(col("granule")), to_date(col("mg"))),
          latCol = "lat_c", lonCol = "lon_c", valueCol = "v",
          radius = 1, slat = 0.75, slon = 0.75, stime = 2.0,
          vfactor = -0.6931, midEpochDay = lit(0),
          latN = 10, lonN = 10)
        .select(col("lat_c"), col("lon_c"),
          round(col("interp") + lit(1e-9), 4).as("interp"),
          round(col("wsum") + lit(1e-9), 4).as("wsum"),
          col("n_contrib"))
        .orderBy("lat_c", "lon_c")
    }
  )

  def oracle: Map[String, String] = Map(
    "s7_insitu_json" ->
      """SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k,
        |       round(value + 1e-9, 4) AS value_r
        |FROM events
        |WHERE CAST(json_extract(props, '$.k') AS BIGINT) BETWEEN 10 AND 50
        |ORDER BY event_id""".stripMargin,

    "c10_clim_generation" ->
      """SELECT dayofyear(l_shipdate) // 7 AS week_of_year, l_returnflag,
        |       round(avg(l_quantity) + 1e-9, 4) AS clim_mean, count(*) AS cnt,
        |       count(DISTINCT year(l_shipdate)) AS n_years
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "c11_spatial_filter" ->
      """WITH cells AS (
        |  SELECT strftime(ts, '%Y-%m-%d') AS g, least(user_id // 15, 9) AS lat_c,
        |         least(CAST(floor(value / 50) AS BIGINT), 9) AS lon_c,
        |         round(avg(value) + 1e-9, 6) AS v
        |  FROM events GROUP BY 1, 2, 3),
        |offs AS (SELECT * FROM (VALUES
        |  (-1,-1,1),(-1,0,2),(-1,1,1),(0,-1,2),(0,0,4),(0,1,2),
        |  (1,-1,1),(1,0,2),(1,1,1)) AS t(di, dj, w)),
        |epoch_f AS (
        |  SELECT c.g, c.lat_c + o.di AS lat_c, c.lon_c + o.dj AS lon_c,
        |         sum(o.w * c.v) / 16.0 AS ef
        |  FROM cells c CROSS JOIN offs o
        |  WHERE c.lat_c + o.di BETWEEN 0 AND 9
        |    AND c.lon_c + o.dj BETWEEN 0 AND 9
        |  GROUP BY 1, 2, 3)
        |SELECT lat_c, lon_c, round(avg(ef) + 1e-9, 4) AS filtered,
        |       count(*) AS n_epochs
        |FROM epoch_f GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "c12_gauss_interp" ->
      """WITH cells AS (
        |  SELECT strftime(ts, '%Y-%m-%d') AS g, least(user_id // 15, 9) AS lat_c,
        |         least(CAST(floor(value / 50) AS BIGINT), 9) AS lon_c,
        |         round(avg(value) + 1e-9, 6) AS v
        |  FROM events GROUP BY 1, 2, 3),
        |mid AS (
        |  SELECT g AS mg FROM (
        |    SELECT g, row_number() OVER (ORDER BY g) AS rn,
        |           count(*) OVER () AS n
        |    FROM (SELECT DISTINCT g FROM cells))
        |  WHERE rn = (n + 1) // 2 + 1),
        |offs AS (SELECT * FROM (VALUES
        |  (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),
        |  (1,-1),(1,0),(1,1)) AS t(di, dj)),
        |contrib AS (
        |  SELECT c.lat_c + o.di AS lat_c, c.lon_c + o.dj AS lon_c, c.v,
        |         exp(-0.6931 * (
        |           (o.di / 0.75) * (o.di / 0.75)
        |             + (o.dj / 0.75) * (o.dj / 0.75)
        |             + (date_diff('day', strptime(m.mg, '%Y-%m-%d'),
        |                          strptime(c.g, '%Y-%m-%d')) / 2.0)
        |             * (date_diff('day', strptime(m.mg, '%Y-%m-%d'),
        |                          strptime(c.g, '%Y-%m-%d')) / 2.0))) AS w
        |  FROM cells c CROSS JOIN offs o CROSS JOIN mid m
        |  WHERE c.lat_c + o.di BETWEEN 0 AND 9
        |    AND c.lon_c + o.dj BETWEEN 0 AND 9)
        |SELECT lat_c, lon_c,
        |       round(sum(w * v) / sum(w) + 1e-9, 4) AS interp,
        |       round(sum(w) + 1e-9, 4) AS wsum,
        |       count(*) AS n_contrib
        |FROM contrib GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
