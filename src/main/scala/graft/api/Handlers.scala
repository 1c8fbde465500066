package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.TileOps
import graft.ops.{AsofJoin, TileIndexOps}

/** The serving surface (SURVEY §2.8/§2.9): the reference's
  * `@nexus_handler` registry (NexusHandler.py:30-38) becomes an
  * explicit map from endpoint path → plan builder. Each handler takes
  * parsed parameters and a `tiles` DataFrame and returns a DataFrame
  * plan — no reflection, no per-request Spark context; the serving
  * layer (HTTP optional) just executes the plan.
  *
  * Concurrency control mirrors the reference (FAIR pools + a job
  * semaphore of `maxConcurrentJobs`, NexusHandler.py:250-294): callers
  * acquire a slot before executing a plan and get a 503-equivalent
  * `None` when exhausted.
  */
object Handlers {

  /** Parsed request parameters (webmodel.py:138-341 P10). */
  case class QueryParams(
      dataset: String,
      minLat: Double = -90, maxLat: Double = 90,
      minLon: Double = -180, maxLon: Double = 180,
      startTime: Long = Long.MinValue, endTime: Long = Long.MaxValue,
      secondaryDataset: Option[String] = None,
      // matchup / DOMS parameters (Matchup.py:41-120, MatchupQuery.py)
      rtMeters: Double = 50000.0, ttSeconds: Long = 86400L,
      matchOnce: Boolean = false, executionId: Option[String] = None,
      // time-series smoothing flags (TimeSeriesSpark.py:75-88)
      seasonalFilter: Boolean = false, lowPassFilter: Boolean = false,
      // the raw query map, for endpoint-specific parameters the typed
      // fields don't model (the reference's handlers pull arbitrary
      // args off computeOptions the same way — e.g. /domsplot's
      // `type`/`id`, /delay's duration)
      extra: Map[String, String] = Map.empty)

  object QueryParams {
    /** P10 request parsing (webmodel.py:138-341): `ds` dataset, `b` =
      * `minLon,minLat,maxLon,maxLat` bbox (the reference's order),
      * `startTime`/`endTime` as epoch seconds or ISO-8601 Z, matchup
      * tolerances `rt` (meters) / `tt` (seconds), `matchOnce`,
      * `executionId`. Unknown keys are ignored (the reference does the
      * same); a missing `ds` throws — every data endpoint needs one.
      */
    def fromQuery(q: Map[String, String]): QueryParams = {
      def time(key: String): Option[Long] = q.get(key).map(parseTimeArg)
      val bbox = q.get("b").map(_.split(",").map(_.trim.toDouble)) match {
        case Some(Array(minLon, minLat, maxLon, maxLat)) =>
          Some((minLat, maxLat, minLon, maxLon))
        case Some(other) =>
          sys.error(s"bad bbox 'b=${q("b")}': want minLon,minLat,maxLon,maxLat")
        case None => None
      }
      QueryParams(
        dataset = q.getOrElse("ds",
          q.getOrElse("dataset", sys.error("missing required parameter 'ds'"))),
        minLat = bbox.map(_._1).getOrElse(-90),
        maxLat = bbox.map(_._2).getOrElse(90),
        minLon = bbox.map(_._3).getOrElse(-180),
        maxLon = bbox.map(_._4).getOrElse(180),
        // the DOMS subset endpoints spell the time bounds `s`/`e`
        // (subsetter.py, insitusubset.py); accept both spellings
        startTime = time("startTime").orElse(time("s")).getOrElse(Long.MinValue),
        endTime = time("endTime").orElse(time("e")).getOrElse(Long.MaxValue),
        secondaryDataset = q.get("ds2"),
        rtMeters = q.get("rt").map(_.toDouble).getOrElse(50000.0),
        ttSeconds = q.get("tt").map(_.toLong).getOrElse(86400L),
        matchOnce = q.get("matchOnce").exists(_.toBoolean),
        executionId = q.get("executionId"),
        seasonalFilter = q.get("seasonalFilter").exists(_.toBoolean),
        lowPassFilter = q.get("lowPassFilter").exists(_.toBoolean),
        extra = q)
    }
  }

  type Handler = (QueryParams, DataFrame) => DataFrame

  /** Datasets of a request: `ds` accepts a comma-separated list (the
    * reference's multi-dataset time series, TimeSeries.py `ds` param).
    */
  private def datasetsOf(p: QueryParams): Seq[String] =
    p.dataset.split(",").map(_.trim).filter(_.nonEmpty).toSeq

  /** Index predicate shared by all handlers: dataset partition prune +
    * bbox overlap + time-interval overlap (P2). `isin` keeps the
    * partition filter for single and multi dataset alike.
    */
  private def pruneTilesFor(dss: Seq[String], p: QueryParams,
                            tiles: DataFrame): DataFrame =
    tiles.where(col("dataset").isin(dss: _*) &&
      TileIndexOps.overlaps(col("min_lat"), col("max_lat"), lit(p.minLat), lit(p.maxLat)) &&
      TileIndexOps.overlaps(col("min_lon"), col("max_lon"), lit(p.minLon), lit(p.maxLon)) &&
      TileIndexOps.overlaps(col("min_time"), col("max_time"), lit(p.startTime), lit(p.endTime)))

  /** Shared prune — multi-dataset lists pass through (each row keeps
    * its `dataset` tag, so row-returning endpoints like /tiles,
    * /datainbounds, /domssubset are well-defined for lists).
    */
  private def pruneTiles(p: QueryParams, tiles: DataFrame): DataFrame =
    pruneTilesFor(datasetsOf(p), p, tiles)

  /** Endpoints whose aggregation has NO dataset key must REJECT a ds
    * list — silently blending two datasets into one statistic is worse
    * than a 400. Wrap their handlers with this.
    */
  private def singleDs(h: Handler): Handler = (p, tiles) => {
    if (datasetsOf(p).length > 1)
      sys.error(s"this endpoint accepts a single ds= (got '${p.dataset}'); " +
        "multi-dataset lists are supported on /timeSeriesSpark " +
        "(and its /stats aliases)")
    h(p, tiles)
  }

  private def domainPoints(p: QueryParams, tiles: DataFrame): DataFrame =
    domainPointsOf(pruneTiles(p, tiles), p)

  /** Multi-dataset variant (the time-series endpoint groups per
    * dataset, so a list is well-defined there).
    */
  private def domainPointsMulti(p: QueryParams, tiles: DataFrame): DataFrame =
    domainPointsOf(pruneTilesFor(datasetsOf(p), p, tiles), p)

  private def domainPointsOf(pruned: DataFrame, p: QueryParams,
                             includeMetaMap: Boolean = false): DataFrame =
    TileOps.maskPointsToBBox(
        TileOps.toPoints(pruned, includeMetaMap = includeMetaMap),
        p.minLat, p.maxLat, p.minLon, p.maxLon)
      .where(col("time").between(p.startTime, p.endTime))

  /** The `parameter` request arg → the named in-situ measurement
    * column it selects (Matchup.py:142-145 / DataInBoundsSearch.py:64
    * share the same enum). ONE definition: the validation set derives
    * from the keys, so adding a measurement cannot desynchronize the
    * endpoints.
    */
  private[api] val ParamCols: Map[String, String] = Map(
    "sst" -> "sea_water_temperature",
    "sss" -> "sea_water_salinity",
    "wind" -> "wind_speed")
  private[api] def validateParameter(v: String): Unit =
    require(ParamCols.contains(v),
      s"Parameter $v not supported. Must be one of " +
        ParamCols.keys.toSeq.sorted.map(k => s"'$k'").mkString(", ") + ".")

  /** Time argument parse shared by request parsing and handler-local
    * date args: pure integers are epoch seconds, `yyyy-MM-dd` is a UTC
    * date, anything else must be a full ISO-8601 instant.
    */
  private[api] def parseTimeArg(v: String): Long =
    if (v.matches("-?\\d+")) v.toLong
    else if (v.matches("\\d{4}-\\d{2}-\\d{2}"))
      java.time.LocalDate.parse(v).atStartOfDay(java.time.ZoneOffset.UTC)
        .toEpochSecond
    else java.time.Instant.parse(v).getEpochSecond

  /** Endpoint registry (§2.9 inventory). */
  val registry: Map[String, Handler] = core ++ legacyAliases ++ trivial

  private def core: Map[String, Handler] = Map(
    // seasonalFilter= subtracts the series' own monthly climatology
    // (TimeSeriesSpark.py:75-88 applySeasonalCycleFilter); lowPassFilter=
    // appends the zero-phase MA-cascade smoothing (the distributed W7
    // form — exact scipy-parity Butterworth lives in kernels.Butterworth
    // for collected series). Both windows run over the RESULT series
    // (one row per day), never the point data.
    "/timeSeriesSpark" -> ((p, tiles) => {
      // ds=a,b requests one series per dataset (extra `dataset` column,
      // reference's multi-dataset time series); smoothing windows then
      // partition per series
      val multi = datasetsOf(p).length > 1
      val keys = if (multi) Seq("dataset") else Nil
      val base = TileOps.dailyStats(domainPointsMulti(p, tiles), keys)
      val seasonal =
        if (!p.seasonalFilter) base
        else graft.kernels.SeriesFilters.deseasonalize(base,
          to_date(from_unixtime(col("day_start"))), col("mean"),
          seriesKeys = keys, out = "mean_seasonal")
      val smoothed =
        if (!p.lowPassFilter) seasonal
        else graft.kernels.SeriesFilters
          .lowPass(seasonal, keys, "day_start", "mean", windowSize = 5)
          .withColumnRenamed("lowpass", "mean_lowpass")
      smoothed.orderBy(keys :+ "day_start" map col: _*)
    }),

    "/timeAvgMapSpark" -> singleDs((p, tiles) =>
      TileOps.timeAvgMap(domainPoints(p, tiles))),

    "/climMapSpark" -> singleDs((p, tiles) =>
      domainPoints(p, tiles)
        .groupBy(month(timestamp_seconds(col("time"))).as("month"),
          col("latitude"), col("longitude"))
        .agg(avg(col("value")).as("mean"), count(lit(1)).as("cnt"))),

    "/corrMapSpark" -> singleDs((p, tiles) => {
      val secondary = p.copy(dataset = p.secondaryDataset.getOrElse(
        sys.error("corrMap requires secondaryDataset")))
      TileOps.corrMap(domainPoints(p, tiles), domainPoints(secondary, tiles))
    }),

    "/dailydifferenceaverage_spark" -> singleDs((p, tiles) => {
      // anomaly vs climatology dataset via as-of join on day_of_year
      val clim = p.copy(dataset = p.dataset + "_CLIM")
      val data = pruneTiles(p, tiles)
      val climTiles = tiles.where(col("dataset") === clim.dataset)
        .select(col("min_lat"), col("min_lon"), col("day_of_year").as("clim_doy"),
          col("stats_mean").as("clim_mean"))
      AsofJoin.lastEarlier(
          data, climTiles, Seq("min_lat", "min_lon"),
          col("day_of_year").cast("long"), col("clim_doy").cast("long"),
          Seq("clim_mean"), rightTie = "clim_doy")
        .withColumn("diff", col("stats_mean") - col("matched_clim_mean"))
        .groupBy(TileOps.dayStart(col("min_time")).as("day_start"))
        .agg(avg(col("diff")).as("mean_diff"), stddev_samp(col("diff")).as("std_diff"),
          count(lit(1)).as("cnt"))
        .orderBy("day_start")
    }),

    "/latitudeTimeHofMoellerSpark" -> singleDs((p, tiles) =>
      TileOps.hovmoller(domainPoints(p, tiles), "latitude")),

    "/longitudeTimeHofMoellerSpark" -> singleDs((p, tiles) =>
      TileOps.hovmoller(domainPoints(p, tiles), "longitude")),

    // /datainbounds (DataInBoundsSearch.py:55-120): raw points of the
    // domain. `parameter` (sst|sss|wind, validated like the reference)
    // labels the value field; `includemeta` attaches every meta_data
    // companion's value at the point as a name → value map.
    "/datainbounds" -> ((p, tiles) => {
      val param = p.extra.get("parameter")
      param.foreach(validateParameter)
      val includeMeta = p.extra.get("includemeta").exists(_.toBoolean)
      val pts = domainPointsOf(pruneTiles(p, tiles), p,
        includeMetaMap = includeMeta)
      param.map(nm => pts.withColumnRenamed("value", nm)).getOrElse(pts)
    }),

    "/tiles" -> ((p, tiles) => pruneTiles(p, tiles)
      .select("tile_id", "dataset", "granule", "min_lat", "max_lat",
        "min_lon", "max_lon", "min_time", "max_time", "stats_count")),

    "/list" -> ((_, tiles) => tiles.groupBy("dataset")
      .agg(count(lit(1)).as("tile_count"), min("min_time").as("start"),
        max("max_time").as("end"))),

    // /standarddeviationsearch (StandardDeviationSearch.py:55-160): with
    // longitude=/latitude= and exactly one of day=/date=, the reference
    // behavior — find the tile containing the point with the most
    // recent day_of_year ≤ day (P8 as-of pick), read its *std META
    // array (the multi-variable tile's companion, get_all_std_dev),
    // and return (longitude, latitude, standard_deviation) for every
    // pixel (allInTile=true, default) or the nearest pixel only.
    // Without a point the legacy domain stddev map answers (extension).
    "/standarddeviationsearch" -> singleDs((p, tiles) =>
      (p.extra.get("longitude"), p.extra.get("latitude")) match {
        case (Some(lonS), Some(latS)) =>
          val lon = lonS.toDouble; val lat = latS.toDouble
          val day: Int = (p.extra.get("day"), p.extra.get("date")) match {
            case (Some(d), None) => d.toInt
            case (None, Some(dt)) =>
              java.time.Instant.ofEpochSecond(parseTimeArg(dt))
                .atZone(java.time.ZoneOffset.UTC).getDayOfYear
            case _ => sys.error("At least one of 'day' or 'date' arguments " +
              "are required but not both.")
          }
          val allInTile = p.extra.get("allInTile").forall(_.toBoolean)
          val tile = tiles.where(col("dataset") === p.dataset &&
              col("min_lat") <= lat && col("max_lat") >= lat &&
              col("min_lon") <= lon && col("max_lon") >= lon &&
              col("day_of_year") <= day)
            .orderBy(col("day_of_year").desc, col("tile_id"))
            .limit(1)
          // the std companion key, SORTED for determinism when several
          // *std companions exist (the reference's next(iter(...)) is
          // map-order-arbitrary there); tiles without one yield an
          // empty result, like NoStandardDeviationException. The pixel
          // decode below assumes ONE time slice (every climatology
          // tile has one) — a multi-slice tile would silently
          // duplicate pixels, so reject it loudly.
          val px = tile
            .withColumn("__stdkeys", array_sort(
              filter(map_keys(col("meta_data")), k => k.endsWith("std"))))
            .where(size(col("__stdkeys")) > 0)
            .select(col("latitudes"), col("longitudes"),
              size(col("longitudes")).as("nlon"),
              size(col("latitudes")).as("nlat"),
              // the guard rides INSIDE the exploded expression so
              // column pruning cannot delete it
              posexplode(when(size(col("times")) <= 1,
                element_at(col("meta_data"), element_at(col("__stdkeys"), 1)))
                .otherwise(raise_error(lit("/standarddeviationsearch: tile " +
                  "has multiple time slices; std companions are " +
                  "per-climatology (single-time) arrays"))))
                .as(Seq("idx", "sd")))
            .select(
              element_at(col("longitudes"),
                (col("idx") % col("nlon")).cast("int") + 1)
                .cast("double").as("longitude"),
              element_at(col("latitudes"),
                ((col("idx") % (col("nlat") * col("nlon"))) / col("nlon"))
                  .cast("int") + 1)
                .cast("double").as("latitude"),
              col("sd").cast("double").as("standard_deviation"))
            .where(!isnan(col("standard_deviation")))
          if (allInTile) px.orderBy("latitude", "longitude")
          else px.orderBy((pow(col("latitude") - lat, 2) +
            pow(col("longitude") - lon, 2)).asc,
            col("latitude").asc, col("longitude").asc).limit(1)
        case (None, None) =>
          domainPoints(p, tiles)
            .groupBy(col("latitude"), col("longitude"))
            .agg(stddev_samp(col("value")).as("std"), count(lit(1)).as("cnt"))
        case _ =>
          // exactly one coordinate given: a point query was intended —
          // falling back to the whole-domain map would return a huge,
          // differently-shaped wrong answer with no warning
          sys.error("point search needs BOTH 'longitude' and 'latitude' " +
            "(got one); omit both for the domain stddev map")
      }),

    // /longitudeLatitudeMap (LongitudeLatitudeMap.py:20-24, kernel
    // :186-244 A14): per-pixel linear trend + stats over the domain.
    // Parity notes vs the reference kernel: np.nanstd is POPULATION
    // std (ddof=0) ⇒ stddev_pop, and the regression runs against the
    // time-STEP index (np.arange over the sorted distinct times), not
    // epoch seconds — slope is per-step. dense_rank over time
    // reproduces the index distributively.
    "/longitudeLatitudeMap" -> singleDs((p, tiles) => {
      val pts = domainPoints(p, tiles)
      // rank only the DISTINCT times (bounded by the dataset's step
      // count) and broadcast back — never a global window over points
      // (pmod(time,1) partition key: constant but non-foldable — a
      // plain literal or time*0 would be simplified away — so this
      // bounded window doesn't emit the global-window warning)
      val steps = pts.select(col("time")).distinct()
        .withColumn("t_step",
          (row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy(pmod(col("time"), lit(1))).orderBy(col("time"))) - 1)
            .cast("double"))
      val stepped = pts.join(broadcast(steps), "time")
      stepped
        .groupBy(col("latitude"), col("longitude"))
        .agg(expr("regr_slope(value, t_step)").as("slope"),
          expr("regr_intercept(value, t_step)").as("intercept"),
          corr(col("value"), col("t_step")).as("r"),
          avg(col("value")).as("mean"), max(col("value")).as("max"),
          min(col("value")).as("min"), stddev_pop(col("value")).as("std"),
          count(lit(1)).as("cnt"))
    })
  )

  /** The reference keeps non-Spark twins of several endpoints
    * (/stats, /timeAvgMap, /correlationMap, /dailydifferenceaverage,
    * /latitudeTimeHofMoeller, /longitudeTimeHofMoeller — §2.9): same
    * semantics, hand-rolled single-process kernels. In a declarative
    * engine the distinction dissolves — both names build the SAME plan
    * and Spark picks the execution; the aliases exist so every §2.9
    * path resolves.
    */
  private def legacyAliases: Map[String, Handler] = Map(
    "/stats" -> core("/timeSeriesSpark"),
    "/statsSolr" -> core("/timeSeriesSpark"),
    "/timeAvgMap" -> core("/timeAvgMapSpark"),
    "/correlationMap" -> core("/corrMapSpark"),
    "/dailydifferenceaverage" -> core("/dailydifferenceaverage_spark"),
    "/latitudeTimeHofMoeller" -> core("/latitudeTimeHofMoellerSpark"),
    "/longitudeTimeHofMoeller" -> core("/longitudeTimeHofMoellerSpark"),
    // the reference's canonical std-search path is /standardDeviation
    // (StandardDeviationSearch.py:23); /standarddeviationsearch stays
    // as the engine's original spelling
    "/standardDeviation" -> core("/standarddeviationsearch")
  )

  /** The reference's diagnostic endpoints (§2.9: /capabilities,
    * /heartbeat, /version — Capabilities.py, Heartbeat.py,
    * webapp.py:232-237): static single-purpose responses, expressed as
    * plans over the session so the serving layer stays uniform.
    */
  private def trivial: Map[String, Handler] = Map(
    "/capabilities" -> ((_, tiles) => {
      val s = tiles.sparkSession
      import s.implicits._
      registry.keys.toSeq.sorted.toDF("path")
    }),
    "/heartbeat" -> ((_, tiles) => {
      val s = tiles.sparkSession
      import s.implicits._
      Seq(true).toDF("ok")
    }),
    "/version" -> ((_, tiles) => {
      val s = tiles.sparkSession
      import s.implicits._
      Seq(("nexusspark", "0.1.0", s.version)).toDF("name", "version", "spark")
    }),

    // /delay (DelayTest.py:12-14: "Waits a little while" — a fixed
    // 10 s sleep). `t=` overrides the duration (fractional seconds) so
    // tests don't pay the full reference sleep; clamped to the
    // reference's 10 s ceiling so client-chosen values can't pin the
    // serving pool's threads indefinitely.
    "/delay" -> ((p, tiles) => {
      val secs = p.extra.get("t").map { v =>
        val t = try v.toDouble catch {
          case _: NumberFormatException => sys.error(s"bad t= '$v': want seconds")
        }
        if (!(t >= 0 && t <= 10)) sys.error(s"t= must be in [0, 10] s (got $v)")
        t
      }.getOrElse(10.0)
      Thread.sleep((secs * 1000).toLong)
      val s = tiles.sparkSession
      import s.implicits._
      Seq(secs).toDF("slept_sec")
    }),

    // /makeerror (ErrorTosserTest.py:9-11: `100 / 0.0` — an endpoint
    // whose whole purpose is raising). Python's float division raises
    // ZeroDivisionError; the JVM needs an explicit throw.
    "/makeerror" -> ((_, _) =>
      throw new ArithmeticException("division by zero"))
  )

  /** /match_spark (Matchup.py:41-120): satellite tile points × in-situ
    * points within (rt meters, tt seconds); `matchOnce` keeps only the
    * nearest match per primary point (the `matchOnce` request flag).
    * Primary side comes from the pruned tile domain; secondary is any
    * point table with (id, latitude, longitude, time) columns.
    */
  /** In-situ measurement filters shared by every endpoint that reads
    * the in-situ relation (Matchup.py:79-183, ValuesQuery/insitusubset
    * same contract): depthMin/depthMax bound the measurement depth,
    * platforms restricts to a comma-list of platform ids. Requesting a
    * filter the relation cannot express fails loudly — silently
    * returning unfiltered data would fabricate results the reference
    * excludes.
    */
  def insituFilters(p: QueryParams, insitu: DataFrame): DataFrame = {
    val depthMin = p.extra.get("depthMin").map(_.toDouble)
    val depthMax = p.extra.get("depthMax").map(_.toDouble)
    (depthMin, depthMax) match {
      case (Some(lo), Some(hi)) if lo >= hi =>
        sys.error("depthMin must be less than depthMax")
      case _ => ()
    }
    def needs(colName: String, param: String): Unit =
      if (!insitu.columns.contains(colName))
        sys.error(s"'$param' was requested but the in-situ relation " +
          s"has no '$colName' column")
    Seq[Option[DataFrame => DataFrame]](
      depthMin.map { lo =>
        needs("depth", "depthMin")
        (df: DataFrame) => df.where(col("depth") >= lo)
      },
      depthMax.map { hi =>
        needs("depth", "depthMax")
        (df: DataFrame) => df.where(col("depth") <= hi)
      },
      p.extra.get("platforms").map { raw =>
        needs("platform", "platforms")
        val ids = raw.split(",").map(_.trim).filter(_.nonEmpty).map(v =>
          scala.util.Try(v.toInt).getOrElse(sys.error(
            "platforms must be a comma-delimited list of integers")))
        (df: DataFrame) => df.where(col("platform").isin(ids.map(Int.box).toIndexedSeq: _*))
      }
    ).flatten.foldLeft(insitu)((df, f) => f(df))
  }

  def matchSpark(p: QueryParams, tiles: DataFrame, insitu: DataFrame,
                 rtMeters: Double, ttSeconds: Long,
                 matchOnce: Boolean): DataFrame = {
    val primary = domainPoints(p, tiles)
      .select(col("tile_id"), col("latitude").as("plat"),
        col("longitude").as("plon"), col("time").as("pt"),
        col("value").as("pv"))
    val filtered = insituFilters(p, insitu)
    // `parameter` selects WHICH in-situ measurement rides along as the
    // secondary value `sv` (Matchup.py:142-145 + DomsPoint, ParamCols).
    // An EXPLICITLY requested measurement the relation lacks fails
    // loudly — quietly substituting another would mislabel the data —
    // but the implicit sst default must not reject a relation that was
    // working through the generic `value` column (the EDGE
    // usable-result trim). A relation with neither yields pairs
    // without `sv`, and /domsplot falls back to distance.
    val explicitParam = p.extra.get("parameter")
    explicitParam.foreach(validateParameter)
    val parameter = explicitParam.getOrElse("sst")
    val paramCol = ParamCols(parameter)
    val svCol: Seq[org.apache.spark.sql.Column] =
      if (filtered.columns.contains(paramCol))
        Seq(col(paramCol).cast("double").as("sv"))
      else if (explicitParam.isDefined)
        // the generic `value` fallback is ONLY for the implicit sst
        // default: serving `value` as an explicitly requested
        // measurement would label unknown data as that measurement
        sys.error(s"in-situ relation has no '$paramCol' column for " +
          s"explicitly requested parameter '$parameter'")
      else if (filtered.columns.contains("value"))
        Seq(col("value").cast("double").as("sv"))
      else Nil
    // widest participating latitude: the bbox extreme PLUS the rt
    // tolerance (in-situ points up to rt poleward of the bbox still
    // match). Polar domains are fine: GeoMatchup routes latitudes
    // above its cap through dedicated polar-cap passes, so no banding
    // precondition remains at this layer.
    val padDeg = rtMeters / 111000.0
    val widestLat = (math.max(math.abs(p.minLat), math.abs(p.maxLat)) + padDeg)
      .max(1.0).min(90.0)
    // ENFORCE the tolerance-padded envelope on the in-situ side — the
    // reference queries EDGE with exactly this padded bbox + time
    // window (Matchup.py:523-542), and the broadcast-sized claim below
    // plus GeoMatchup's maxAbsLat cell-sizing contract both depend on
    // it; a point outside the envelope can never be within rt/tt of a
    // masked primary point, so results are unchanged
    // saturating time pad: the default open-ended request carries
    // endTime = Long.MaxValue, which a naive + tt wraps NEGATIVE,
    // silently emptying the envelope
    val tLo =
      if (p.startTime < Long.MinValue + ttSeconds) Long.MinValue
      else p.startTime - ttSeconds
    val tHi =
      if (p.endTime > Long.MaxValue - ttSeconds) Long.MaxValue
      else p.endTime + ttSeconds
    // longitude envelope, WRAP-AWARE: a padded range crossing ±180
    // becomes a disjunction (GeoMatchup's modular cells are seam-
    // correct — a naive between() here would drop the matches the
    // kernel then finds). Above the polar cap the cos-based pad is
    // meaningless (30° of longitude is ~6 km at 89.9°), so polar
    // domains keep every longitude and rely on the lat+time bounds.
    val lonFilter: org.apache.spark.sql.Column =
      if (widestLat > 85.0) lit(true)
      else {
        val lonPad = padDeg / math.cos(math.toRadians(widestLat))
        val lo = p.minLon - lonPad
        val hi = p.maxLon + lonPad
        if (hi - lo >= 360.0) lit(true)
        else if (lo < -180.0) col("slon") >= lo + 360.0 || col("slon") <= hi
        else if (hi > 180.0) col("slon") >= lo || col("slon") <= hi - 360.0
        else col("slon").between(lo, hi)
      }
    val secondary = filtered.select(Seq(col("id").as("sid"),
        col("latitude").as("slat"), col("longitude").as("slon"),
        col("time").as("st")) ++ svCol: _*)
      .where(col("slat").between(p.minLat - padDeg, p.maxLat + padDeg) &&
        lonFilter && col("st").between(tLo, tHi))
    // the secondary is the in-situ side: request-bounded in space and
    // time (envelope above), so it is broadcast-sized by construction
    // and the ×27-exploded primary never shuffles
    // geodesic = reference parity: Matchup.py measures match distance
    // on the WGS84 ellipsoid, and boundary pairs flip membership if the
    // engine measures spherically instead
    val pairs = graft.ops.GeoMatchup.matchup(primary, secondary,
      col("plat"), col("plon"), col("pt"), col("slat"), col("slon"), col("st"),
      rtMeters, ttSeconds, maxAbsLat = widestLat, broadcastSecondary = true,
      geodesic = true)
    val matched =
      if (matchOnce)
        // the primary's identity includes tile_id + pv: multi-dataset
        // requests (and reprocessed granules) carry DISTINCT primary
        // records tied on every geometric key, and a coords-only key
        // would collapse them to one row — silently dropping the other
        // record's closest match (same reasoning as the total-order
        // comment on the limit below)
        graft.ops.ToleranceJoin.matchOnce(pairs,
          struct(col("tile_id"), col("plat"), col("plon"), col("pt"),
            col("pv")), col("dist_km"), col("sid"))
      else pairs
    // resultSizeLimit (Matchup.py:187): reference default 500 pairs,
    // 0 = unlimited — the cap that keeps a wide-open request from
    // shipping the whole cross-domain result to the client. The cap is
    // DETERMINISTIC (closest pairs first, total tie-break): a bare
    // limit() keeps whichever pairs scan first, so a re-run could
    // persist a different arbitrary subset under a new executionId.
    val limit = p.extra.get("resultSizeLimit").map(_.toInt).getOrElse(500)
    if (limit > 0)
      // tile_id + pv complete a TOTAL order: multi-dataset requests
      // (or reprocessed granules) can tie on every geometric key
      matched.orderBy(col("dist_km").asc, col("dt_s").asc, col("sid").asc,
        col("plat").asc, col("plon").asc, col("pt").asc,
        col("tile_id").asc, col("pv").asc).limit(limit)
    else matched
  }

  /** DOMS endpoint registry (the reference's `algorithms/doms` tree):
    * the matchup
    * execute-store-retrieve loop plus the subset endpoints. Handlers
    * close over the in-situ table and the results-store path, so the
    * serving layer keeps the uniform (params, tiles) → plan signature.
    *
    *  - `/domsmatchup` (MatchupQuery.py:22): run the tolerance matchup,
    *    persist under an execution id, return the one-row receipt —
    *    exactly the reference's execute-then-poll contract.
    *  - `/domsresults` (ResultsRetrieval.py:12): fetch a stored
    *    execution (partition-pruned read).
    *  - `/domslist` (DomsInitialization.py / StatsQuery.py): stored
    *    executions with pair counts.
    *  - `/domsvalues` + `/domsinsitusubset` (ValuesQuery.py,
    *    insitusubset.py): the in-situ points of the request domain.
    *  - `/domssubset` (subsetter.py:203-232): the satellite points of
    *    the request domain; ZIP/NetCDF encoding happens in the serving
    *    layer via `output=`.
    */
  def domsRegistry(insitu: DataFrame, resultsPath: String): Map[String, Handler] = {
    // bbox/time domain PLUS the shared depth/platform filters —
    // /domsvalues and /domsinsitusubset accept the same measurement
    // filters as the matchup (ValuesQuery.py, insitusubset.py), and
    // `source=` restricts to one in-situ provider (insitusubset's
    // required arg; loud when the relation carries no source column)
    val insituDomain: Handler = (p, _) => {
      val bySource = p.extra.get("source").map { src =>
        if (!insitu.columns.contains("source"))
          sys.error("'source' was requested but the in-situ relation " +
            "has no 'source' column")
        insitu.where(col("source") === src)
      }.getOrElse(insitu)
      insituFilters(p, bySource)
        .where(col("latitude").between(p.minLat, p.maxLat) &&
          col("longitude").between(p.minLon, p.maxLon) &&
          col("time").between(p.startTime, p.endTime))
    }
    Map(
      // /match_spark (Matchup.py:41-120): the spark matchup under its
      // canonical path — same kernel and request contract as
      // /domsmatchup but answering the pairs inline rather than
      // storing an execution
      "/match_spark" -> ((p, tiles) =>
        matchSpark(p, tiles, insitu, p.rtMeters, p.ttSeconds, p.matchOnce)),
      "/domsmatchup" -> ((p, tiles) => {
        val execId = p.executionId.getOrElse(
          java.util.UUID.randomUUID().toString)
        // executions are immutable: re-running a client-supplied id
        // must not APPEND a second copy of every pair (the store is
        // mode=append, partitioned by execution_id)
        val execDir = new org.apache.hadoop.fs.Path(
          s"$resultsPath/execution_id=$execId")
        val fs = execDir.getFileSystem(
          tiles.sparkSession.sparkContext.hadoopConfiguration)
        def rejectExisting(): Nothing =
          sys.error(s"executionId '$execId' already exists; executions " +
            "are immutable — fetch it via /domsresults or omit executionId")
        // fast-path reject before any claim bookkeeping
        if (fs.exists(execDir)) rejectExisting()
        // ATOMIC claim, not check-then-write: two concurrent requests
        // with the same id would both pass an exists() check (the
        // matchup takes seconds) and both append, doubling every pair.
        // create(overwrite=false) is the filesystem's atomic
        // first-writer-wins primitive. Claims live under the hidden
        // _claims/ dir (underscore-prefixed — invisible to Spark's
        // partition discovery; a bare file beside the partition dirs
        // would break whole-store reads).
        val claim = new org.apache.hadoop.fs.Path(
          s"$resultsPath/_claims/$execId")
        fs.mkdirs(claim.getParent)
        try fs.create(claim, false).close()
        catch { case _: java.io.IOException => rejectExisting() }
        // RE-CHECK under the claim: claims are dropped after success
        // (bounded _claims/), so the exists() above can be stale — a
        // request that passed it before a same-id predecessor
        // committed, then won the claim AFTER the predecessor dropped
        // it, would append every pair a second time. Holding the claim
        // while checking closes that window: the predecessor's dir is
        // committed before its claim is released, so whoever owns the
        // claim sees the truth.
        if (fs.exists(execDir)) {
          try fs.delete(claim, false)
          catch { case _: java.io.IOException => () }
          rejectExisting()
        }
        try {
          val pairs = matchSpark(p, tiles, insitu, p.rtMeters, p.ttSeconds,
            p.matchOnce)
          graft.sources.ResultsStore.write(pairs, resultsPath, execId)
        } catch {
          case e: Throwable =>
            // RECLAIM on failure BEFORE the write committed: we hold
            // the claim (sole writer for this id), so any partially-
            // materialized execDir is ours to remove — a failed
            // parquet job can leave the dir existing with no committed
            // data, and without this cleanup a client retrying its own
            // id would get 'already exists' forever while /domsresults
            // has nothing (the id permanently burned). Cleanup failure
            // must not mask the real error.
            // INDEPENDENT catches: a transient failure deleting the
            // partial dir must not skip freeing the claim, or the id
            // is burned with nothing behind it (the dir delete's own
            // failure leaves a partial dir the re-check treats as
            // committed — a double-failure corner needing manual
            // cleanup, but the claim is never the thing that wedges)
            try fs.delete(execDir, true)
            catch { case _: java.io.IOException => () }
            try fs.delete(claim, false)
            catch { case _: java.io.IOException => () }
            throw e
        }
        // COMMITTED past this point: the execution dir now guards
        // immutability by itself and must never be deleted — even if
        // the read-back count below fails transiently, the data is
        // durable and a /domsresults retry serves it. Only the claim
        // is dropped (bounded _claims/ — it holds in-flight requests,
        // never history; a claim orphaned by driver death mid-matchup
        // needs manual removal, an exception path never leaves one).
        val n = try graft.sources.ResultsStore.read(tiles.sparkSession,
            resultsPath, execId).count()
          finally {
            try fs.delete(claim, false)
            catch { case _: java.io.IOException => () }
          }
        val s = tiles.sparkSession
        import s.implicits._
        Seq((execId, n)).toDF("execution_id", "n_pairs")
      }),
      // /domsresults (ResultsRetrieval.py:28): the DEFAULT shape is the
      // nested DOMS form — one row per primary point with its matches
      // collected as an array (sorted for determinism); simpleResults=
      // true returns the flat pair rows (the CSV-friendly rendition).
      "/domsresults" -> ((p, tiles) => {
        val pairs = graft.sources.ResultsStore.read(tiles.sparkSession,
          resultsPath, p.executionId.getOrElse(sys.error(
            "/domsresults requires executionId")))
        // CSV/NETCDF/ZIP renditions are tabular: the nested matches
        // array would stringify (CSV) or vanish (NetCDF) silently, so
        // those outputs default to the flat form unless simpleResults
        // says otherwise explicitly
        val tabularOut = p.extra.get("output")
          .exists(o => Set("CSV", "NETCDF", "ZIP")(o.toUpperCase))
        val simple = p.extra.get("simpleResults").map(_.toBoolean)
          .getOrElse(tabularOut)
        if (simple) pairs
        else {
          val primaryCols = Seq("tile_id", "plat", "plon", "pt", "pv")
            .filter(pairs.columns.contains)
          val matchCols = pairs.columns
            .filterNot(primaryCols.toSet)
            .filterNot(_ == "execution_id")
          pairs.groupBy(primaryCols.map(col): _*)
            .agg(sort_array(collect_list(struct(matchCols.map(col).toIndexedSeq: _*)))
              .as("matches"))
            .orderBy(primaryCols.map(col): _*)
        }
      }),
      "/domslist" -> ((_, tiles) => {
        val s = tiles.sparkSession
        try s.read.parquet(resultsPath)
          .groupBy("execution_id").agg(count(lit(1)).as("n_pairs"))
        catch {
          case _: org.apache.spark.sql.AnalysisException => // no executions yet
            import s.implicits._
            Seq.empty[(String, Long)].toDF("execution_id", "n_pairs")
        }
      }),
      "/domsvalues" -> insituDomain,
      // insitusubset.py REQUIRES the source argument; /domsvalues
      // accepts the blended multi-provider domain
      "/domsinsitusubset" -> ((p, tiles) => {
        if (!p.extra.contains("source"))
          sys.error("'source' argument is required")
        insituDomain(p, tiles)
      }),
      "/domssubset" -> ((p, tiles) => domainPoints(p, tiles)),

      // /domsmetadata (MetadataQuery.py:16-38): dataset metadata
      // lookup. The reference proxies an external UMM-JSON metadata
      // service per dataset; with no external registry the engine IS
      // the source of truth, so the metadata is computed from the tile
      // catalog (granule/tile counts, spatial + temporal extent). An
      // unknown dataset errors like the reference's
      // DatasetNotFoundException.
      "/domsmetadata" -> ((p, tiles) => {
        val ds = p.extra.getOrElse("dataset", p.dataset)
        if (ds.isEmpty) sys.error("'dataset' parameter not specified")
        // existence probe via limit(1) — running the full aggregation
        // here would execute it TWICE per request (once for the check,
        // once when the serving layer collects the returned plan)
        if (tiles.where(col("dataset") === ds).limit(1).isEmpty)
          throw new graft.sources.NotFoundException(s"Dataset '$ds' not found")
        tiles.where(col("dataset") === ds)
          .groupBy(col("dataset"))
          .agg(countDistinct(col("granule")).as("n_granules"),
            count(lit(1)).as("n_tiles"),
            min(col("min_time")).as("start_time"),
            max(col("max_time")).as("end_time"),
            min(col("min_lat")).as("min_lat"), max(col("max_lat")).as("max_lat"),
            min(col("min_lon")).as("min_lon"), max(col("max_lon")).as("max_lon"))
      }),

      // /domsstats (StatsQuery.py:13-55): in-situ count + bounds for a
      // request domain — the reference's datafetch.getCount against the
      // in-situ service, here one aggregate over the in-situ table.
      "/domsstats" -> ((p, tiles) => {
        // same domain + filter surface as /domsvalues — counts that
        // silently included filtered-out rows would misreport
        val dom = insituDomain(p, tiles)
        dom.agg(count(lit(1)).as("count"),
          min(col("latitude")).as("min_lat"), max(col("latitude")).as("max_lat"),
          min(col("longitude")).as("min_lon"), max(col("longitude")).as("max_lon"),
          min(col("time")).as("start_time"), max(col("time")).as("end_time"))
      }),

      // /domsplot (ResultsPlotQuery.py:17-40): plot a stored matchup
      // execution. `id`= the execution, `type`= scatter (default) |
      // map | histogram. The handler returns the plot-shaped relation;
      // the serving layer renders it (output defaults to PNG on this
      // path). Scatter pairs the primary value with the matched in-situ
      // value when the pairs carry one (`sv`), else with match
      // distance; map is the primary points colored by value;
      // histogram is 20 equi-width bins of the primary value.
      "/domsplot" -> ((p, tiles) => {
        val execId = p.extra.get("id").orElse(p.executionId).getOrElse(
          sys.error("/domsplot requires id= (an execution id)"))
        val pairs = graft.sources.ResultsStore.read(tiles.sparkSession,
          resultsPath, execId)
        p.extra.getOrElse("type", "scatter") match {
          case "scatter" =>
            val y = if (pairs.columns.contains("sv")) col("sv").as("y")
                    else col("dist_km").as("y")
            pairs.select(col("pv").as("x"), y)
          case "map" =>
            pairs.select(col("plon").as("longitude"),
              col("plat").as("latitude"), col("pv").as("value"))
          case "histogram" =>
            val ext = pairs.agg(min(col("pv")).as("lo"), max(col("pv")).as("hi"),
              count(lit(1)).as("n"), avg(col("pv")).as("mu"),
              stddev_pop(col("pv")).as("sigma"))
            val nBins = 20
            // bin width from a broadcast one-row extent — the pairs
            // relation never collects
            val hist = pairs.crossJoin(broadcast(ext))
              .withColumn("bin", least(lit(nBins - 1), greatest(lit(0),
                floor((col("pv") - col("lo")) /
                  greatest((col("hi") - col("lo")) / nBins, lit(1e-300)))
                  .cast("int"))))
              .groupBy(col("bin"), col("lo"), col("hi"), col("n"),
                col("mu"), col("sigma"))
              .agg(count(lit(1)).as("count"))
              .withColumn("bin_center", col("lo") + (col("bin") + 0.5) *
                (col("hi") - col("lo")) / nBins)
            // normandcurve (ResultsPlotQuery.py:30): density-normalized
            // bars plus the fitted normal curve sampled at bin centers
            if (p.extra.get("normandcurve").exists(_.toBoolean)) {
              // degenerate handling for constant-valued data: hi == lo
              // makes the bin width 0 (density → Infinity) and sigma 0
              // (pdf → NaN); a tiny epsilon floor is NOT enough because
              // pow(eps, 2) underflows double to 0 and trips ANSI
              // divide-by-zero. Treat the point mass explicitly: unit
              // bin width (density = count/n) and pdf 0.
              val w = when(col("hi") === col("lo"), lit(1.0))
                .otherwise((col("hi") - col("lo")) / nBins)
              val pdf = when(col("sigma") <= 1e-150, lit(0.0))
                .otherwise(exp(-pow(col("bin_center") - col("mu"), 2) /
                    (pow(col("sigma"), 2) * 2)) /
                  (col("sigma") * math.sqrt(2 * math.Pi)))
              hist.select(col("bin_center"), col("count"),
                  (col("count") / (col("n") * w)).as("density"),
                  pdf.as("normal_pdf"))
                .orderBy("bin_center")
            } else hist.select(col("bin_center"), col("count"))
              .orderBy("bin_center")
          case other => sys.error(s"Unsupported plot type '$other' specified.")
        }
      })
    )
  }

  /** Reference concurrency gate: 10 concurrent Spark jobs, then 503
    * (NexusHandler.py:250-294, algorithms.ini:4-5).
    */
  final class JobGate(maxConcurrentJobs: Int = 10) {
    private val slots = new java.util.concurrent.Semaphore(maxConcurrentJobs)
    /** Run `body` in a slot, or None (≡ HTTP 503) when exhausted. */
    def tryRun[T](spark: SparkSession, pool: String = "default")(body: => T): Option[T] =
      if (!slots.tryAcquire()) None
      else try {
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", pool)
        Some(body)
      } finally {
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", null)
        slots.release()
      }
  }

  /** W5 — result-size limit gate (Matchup.py:269-274): results within
    * the limit return Right(rows); oversized results return Left(limit
    * exceeded) (≡ HTTP 202 + async path). Single execution: collects
    * limit+1 rows and checks for the sentinel extra row, instead of a
    * separate count() job that would run the whole plan twice.
    */
  def sizeGated(df: DataFrame, limit: Int): Either[Long, Array[org.apache.spark.sql.Row]] = {
    require(limit >= 1, s"sizeGated limit must be positive, got $limit")
    val rows = df.limit(limit + 1).collect()
    // Left carries the LIMIT itself (the number the client should
    // raise), not limit+1 — the old off-by-one made the 413 message
    // name a threshold the result only EQUALLED
    if (rows.length > limit) Left(limit.toLong) else Right(rows)
  }
}
