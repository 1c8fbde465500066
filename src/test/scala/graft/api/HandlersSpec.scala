package graft.api

import graft.SparkSpec
import graft.ingest.Ingest
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class HandlersSpec extends SparkSpec {

  /** Two-dataset tile fixture: a 4×4 grid granule per day for 3 days,
    * plus a _CLIM dataset keyed by day_of_year.
    */
  private lazy val tiles: DataFrame = {
    import spark.implicits._
    val day = 86400L
    val pts = for {
      d <- 0 until 3
      li <- 0 until 4; lo <- 0 until 4
    } yield (s"g$d.nc", li + 0.5, lo + 0.5, d * day, (li * 4 + lo).toDouble + d)
    val data = Ingest.pointsToTiles(
      pts.toDF("granule", "latitude", "longitude", "time", "value"), 2.0, 2.0, "sst")
    val clim = Ingest.pointsToTiles(
      (for { li <- 0 until 4; lo <- 0 until 4 }
        yield ("clim.nc", li + 0.5, lo + 0.5, 0L, 5.0))
        .toDF("granule", "latitude", "longitude", "time", "value"),
      2.0, 2.0, "sst_CLIM")
    data.unionByName(clim)
  }

  private val p = Handlers.QueryParams(dataset = "sst")

  test("/list reports datasets with tile counts") {
    val rows = Handlers.registry("/list")(p, tiles).collect()
      .map(r => r.getAs[String]("dataset") -> r.getAs[Long]("tile_count")).toMap
    assert(rows === Map("sst" -> 12L, "sst_CLIM" -> 4L))
  }

  test("/timeSeriesSpark returns one row per day over the pruned domain") {
    val rows = Handlers.registry("/timeSeriesSpark")(p, tiles).collect()
    assert(rows.length === 3)
    assert(rows.map(_.getAs[Long]("cnt")).toSeq === Seq(16L, 16L, 16L))
    // day 1 values are day-0 values + 1 ⇒ mean shifts by exactly 1
    val means = rows.map(_.getAs[Double]("mean"))
    assert(math.abs((means(1) - means(0)) - 1.0) < 1e-6)
  }

  test("/timeSeriesSpark seasonalFilter and lowPassFilter append columns") {
    val rows = Handlers.registry("/timeSeriesSpark")(
      p.copy(seasonalFilter = true, lowPassFilter = true), tiles).collect()
    assert(rows.length === 3)
    // all 3 days share a month ⇒ de-meaned seasonal column sums to ~0
    val seasonal = rows.map(_.getAs[Double]("mean_seasonal"))
    assert(math.abs(seasonal.sum) < 1e-9)
    // smoothing stays within the raw series' range and preserves order
    val mean = rows.map(_.getAs[Double]("mean"))
    val lp = rows.map(_.getAs[Double]("mean_lowpass"))
    assert(lp.forall(v => v >= mean.min - 1e-9 && v <= mean.max + 1e-9))
    // flags off ⇒ plain schema (no smoothing columns)
    val plain = Handlers.registry("/timeSeriesSpark")(p, tiles)
    assert(!plain.columns.contains("mean_seasonal") &&
      !plain.columns.contains("mean_lowpass"))
  }

  test("/timeSeriesSpark ds=a,b returns one series per dataset") {
    val rows = Handlers.registry("/timeSeriesSpark")(
      p.copy(dataset = "sst,sst_CLIM"), tiles).collect()
    val byDs = rows.groupBy(_.getAs[String]("dataset"))
    assert(byDs.keySet === Set("sst", "sst_CLIM"))
    assert(byDs("sst").length === 3) // 3 days
    assert(byDs("sst_CLIM").length === 1) // single epoch
    assert(byDs("sst_CLIM").head.getAs[Double]("mean") === 5.0)
    // single-ds request keeps the original schema (no dataset column)
    val single = Handlers.registry("/timeSeriesSpark")(p, tiles)
    assert(!single.columns.contains("dataset"))
  }

  test("ds lists pass through row-returning endpoints, 400 on aggregating ones") {
    val multi = p.copy(dataset = "sst,sst_CLIM")
    // row-returning: every row keeps its dataset tag — lists are fine
    val tilesRows = Handlers.registry("/tiles")(multi, tiles).collect()
    assert(tilesRows.map(_.getAs[String]("dataset")).toSet ===
      Set("sst", "sst_CLIM"))
    assert(Handlers.registry("/datainbounds")(multi, tiles).count() > 0)
    // aggregating endpoints must reject rather than blend
    val e = intercept[RuntimeException] {
      Handlers.registry("/timeAvgMapSpark")(multi, tiles)
    }
    assert(e.getMessage.contains("single ds"))
    intercept[RuntimeException] {
      Handlers.registry("/dailydifferenceaverage_spark")(multi, tiles)
    }
  }

  test("/timeSeriesSpark bbox pruning restricts the domain") {
    val small = p.copy(minLat = 0, maxLat = 1.9, minLon = 0, maxLon = 1.9)
    val rows = Handlers.registry("/timeSeriesSpark")(small, tiles).collect()
    assert(rows.map(_.getAs[Long]("cnt")).toSeq === Seq(4L, 4L, 4L))
  }

  test("/timeAvgMapSpark averages each pixel across days") {
    val rows = Handlers.registry("/timeAvgMapSpark")(p, tiles).collect()
    assert(rows.length === 16)
    val at00 = rows.find(r => r.getAs[Double]("latitude") == 0.5 &&
      r.getAs[Double]("longitude") == 0.5).get
    assert(math.abs(at00.getAs[Double]("mean") - 1.0) < 1e-6) // (0+1+2)/3
  }

  test("/corrMapSpark correlates co-located datasets") {
    val p2 = p.copy(secondaryDataset = Some("sst"))
    val rows = Handlers.registry("/corrMapSpark")(p2, tiles).collect()
    assert(rows.length === 16)
    assert(rows.forall(r => math.abs(r.getAs[Double]("r") - 1.0) < 1e-9))
  }

  test("/tiles is index-only and prunes by time") {
    val narrowed = p.copy(startTime = 86400L, endTime = 86400L)
    val rows = Handlers.registry("/tiles")(narrowed, tiles).collect()
    assert(rows.length === 4)
    assert(rows.forall(_.getAs[Long]("min_time") === 86400L))
  }

  test("/dailydifferenceaverage_spark computes anomaly vs the _CLIM dataset") {
    val rows = Handlers.registry("/dailydifferenceaverage_spark")(p, tiles)
      .collect()
    assert(rows.length === 3) // one anomaly row per day
    // clim mean is 5.0 everywhere; day d tile means grow by exactly 1/day,
    // so the anomaly mean shifts by 1 between consecutive days
    val means = rows.map(_.getAs[Double]("mean_diff"))
    assert(math.abs((means(1) - means(0)) - 1.0) < 1e-6)
    assert(rows.forall(_.getAs[Long]("cnt") === 4L)) // 4 tiles per day
  }

  test("/match_spark matches tile points to in-situ points") {
    import spark.implicits._
    // bounded request bbox first; the unbounded default is retried below
    val pm = p.copy(minLat = -10, maxLat = 10, minLon = -10, maxLon = 10)
    // in-situ points: one at grid point (0.5, 0.5) same day, one far away
    val insitu = Seq(
      (100L, 0.5, 0.5, 10L),
      (101L, 40.0, 40.0, 10L)
    ).toDF("id", "latitude", "longitude", "time")
    val all = Handlers.matchSpark(pm, tiles, insitu,
      rtMeters = 200000, ttSeconds = 86400, matchOnce = false)
    // matches points of day 0 within 200 km of (0.5, 0.5); 101 never matches
    assert(all.where($"sid" === 101L).count() === 0)
    assert(all.where($"sid" === 100L).count() > 0)
    val once = Handlers.matchSpark(pm, tiles, insitu,
      rtMeters = 200000, ttSeconds = 86400, matchOnce = true)
    // match-once: each primary point keeps exactly one match
    val perPoint = once.groupBy("plat", "plon", "pt").count()
      .agg(max("count")).collect()(0).getLong(0)
    assert(perPoint === 1L)
    // nearest match for the (0.5, 0.5) point is distance 0
    val d0 = once.where($"plat" === 0.5 && $"plon" === 0.5 && $"pt" === 0L)
      .select("dist_km").as[Double].collect()(0)
    assert(d0 === 0.0)
    // polar/unbounded request: previously rejected, now served through
    // GeoMatchup's polar-cap passes — the same equatorial pair matches,
    // nothing silently drops
    val global = Handlers.matchSpark(p, tiles, insitu, 200000, 86400,
      matchOnce = false)
    assert(global.where($"sid" === 100L).count() > 0)
    assert(global.where($"sid" === 101L).count() === 0)
  }

  test("matchup honors depthMin/depthMax and platforms filters on the " +
    "in-situ side (Matchup.py request contract)") {
    import spark.implicits._
    val pm = p.copy(minLat = -10, maxLat = 10, minLon = -10, maxLon = 10)
    // three co-located in-situ points differing only in depth/platform
    val insitu = Seq(
      (100L, 0.5, 0.5, 10L, 2.0, 30),
      (101L, 0.5, 0.5, 10L, 50.0, 30),
      (102L, 0.5, 0.5, 10L, 2.0, 42)
    ).toDF("id", "latitude", "longitude", "time", "depth", "platform")
    def ids(extra: Map[String, String]): Set[Long] =
      Handlers.matchSpark(pm.copy(extra = extra), tiles, insitu,
        rtMeters = 200000, ttSeconds = 86400, matchOnce = false)
        .select("sid").distinct().as[Long].collect().toSet
    assert(ids(Map.empty) === Set(100L, 101L, 102L))
    assert(ids(Map("depthMax" -> "10")) === Set(100L, 102L))
    assert(ids(Map("depthMin" -> "10")) === Set(101L))
    assert(ids(Map("platforms" -> "30")) === Set(100L, 101L))
    assert(ids(Map("platforms" -> "30,42", "depthMax" -> "10")) ===
      Set(100L, 102L))
    // contract errors fail loudly
    intercept[RuntimeException](
      ids(Map("depthMin" -> "5", "depthMax" -> "5")))
    intercept[RuntimeException](ids(Map("platforms" -> "a,b")))
    val noCol = Seq((1L, 0.5, 0.5, 10L))
      .toDF("id", "latitude", "longitude", "time")
    val e = intercept[RuntimeException](
      Handlers.matchSpark(pm.copy(extra = Map("depthMin" -> "1")), tiles,
        noCol, 200000, 86400, matchOnce = false))
    assert(e.getMessage.contains("no 'depth' column"))
    // the same filters apply to the raw in-situ endpoints
    val reg = Handlers.domsRegistry(insitu,
      java.nio.file.Files.createTempDirectory("graft-dv").toString)
    val v = reg("/domsvalues")(pm.copy(extra = Map("depthMax" -> "10")), tiles)
    assert(v.select("id").as[Long].collect().toSet === Set(100L, 102L))
    // source= restricts to one provider (insitusubset contract)
    val sourced = Seq(
      (1L, 0.5, 0.5, 10L, "icoads"),
      (2L, 0.5, 0.5, 10L, "samos")
    ).toDF("id", "latitude", "longitude", "time", "source")
    val reg2 = Handlers.domsRegistry(sourced,
      java.nio.file.Files.createTempDirectory("graft-dv2").toString)
    assert(reg2("/domsinsitusubset")(
      pm.copy(extra = Map("source" -> "samos")), tiles)
      .select("id").as[Long].collect().toSeq === Seq(2L))
    intercept[RuntimeException](reg("/domsvalues")(
      pm.copy(extra = Map("source" -> "samos")), tiles).collect())
    // DOMS short time spellings s=/e= parse like startTime/endTime
    val qp = Handlers.QueryParams.fromQuery(Map("ds" -> "x",
      "s" -> "1970-01-01T00:00:10Z", "e" -> "100"))
    assert(qp.startTime === 10L && qp.endTime === 100L)
  }

  test("/domsmatchup reclaims its execution id when the matchup fails " +
    "(claim deleted, same id retryable; success also drops the claim)") {
    import spark.implicits._
    val pm = p.copy(minLat = -10, maxLat = 10, minLon = -10, maxLon = 10)
    val insitu = Seq((100L, 0.5, 0.5, 10L))
      .toDF("id", "latitude", "longitude", "time")
    val dir = java.nio.file.Files.createTempDirectory("graft-claim").toString
    val reg = Handlers.domsRegistry(insitu, dir)
    val withId = pm.copy(executionId = Some("exec-retry"))
    // parameter=wind is valid but the relation lacks wind_speed → the
    // matchup throws AFTER the claim is created
    val e = intercept[RuntimeException](reg("/domsmatchup")(
      withId.copy(extra = Map("parameter" -> "wind")), tiles).collect())
    assert(e.getMessage.contains("wind_speed"))
    // the failed claim must NOT burn the id: the client's retry without
    // the bad parameter succeeds
    val retry = reg("/domsmatchup")(withId, tiles).collect()
    assert(retry.head.getAs[String]("execution_id") === "exec-retry")
    assert(retry.head.getAs[Long]("n_pairs") > 0L)
    // a successful execution drops its claim too (bounded _claims/),
    // while the partition dir still enforces immutability
    val claims = new java.io.File(dir, "_claims")
    assert(!new java.io.File(claims, "exec-retry").exists())
    val e2 = intercept[RuntimeException](reg("/domsmatchup")(
      withId, tiles).collect())
    assert(e2.getMessage.contains("already exists"))
  }

  test("zero-pair matchup commits and round-trips: empty write reads " +
    "back 0 rows (never missing-id), and the id lists") {
    import spark.implicits._
    val insitu = Seq((100L, 0.5, 0.5, 10L))
      .toDF("id", "latitude", "longitude", "time")
    val dir = java.nio.file.Files.createTempDirectory("graft-zero").toString
    val reg = Handlers.domsRegistry(insitu, dir)
    // a domain away from every tile and in-situ point ⇒ 0 pairs; the
    // handler still writes the (empty) execution and its read-back
    // count must succeed — this pins the empty-write/read-back
    // behavior (a parquet data file exists even for 0 rows,
    // SPARK-23271) the handler's post-write count depends on
    val pm = p.copy(minLat = 50, maxLat = 60, minLon = 50, maxLon = 60,
      executionId = Some("exec-zero"))
    val out = reg("/domsmatchup")(pm, tiles).collect()
    assert(out.head.getAs[String]("execution_id") === "exec-zero")
    assert(out.head.getAs[Long]("n_pairs") === 0L)
    val rb = graft.sources.ResultsStore.read(spark, dir, "exec-zero")
    assert(rb.count() === 0L)
    assert(graft.sources.ResultsStore.listExecutions(spark, dir)
      .as[String].collect().contains("exec-zero"))
    // an unknown id is the TYPED not-found (→ 404 at the serving layer)
    intercept[graft.sources.NotFoundException](
      graft.sources.ResultsStore.read(spark, dir, "never-was"))
  }

  test("/datainbounds labels the value by `parameter` and attaches the " +
    "meta map with includemeta") {
    import spark.implicits._
    val pts = (for { li <- 0 until 2; lo <- 0 until 2 }
      yield ("g.nc", li + 0.5, lo + 0.5, 0L, (li * 2 + lo).toDouble,
        Seq(li * 20.0 + lo)))
      .toDF("granule", "latitude", "longitude", "time", "value", "meta")
    val mt = Ingest.pointsToTiles(pts, 2.0, 2.0, "sstm",
      metaNames = Seq("wind_v"))
    val pd = Handlers.QueryParams(dataset = "sstm")
    val labeled = Handlers.registry("/datainbounds")(
      pd.copy(extra = Map("parameter" -> "sst")), mt)
    assert(labeled.columns.contains("sst") && !labeled.columns.contains("value"))
    intercept[RuntimeException](Handlers.registry("/datainbounds")(
      pd.copy(extra = Map("parameter" -> "chlorophyll")), mt).collect())
    val withMeta = Handlers.registry("/datainbounds")(
      pd.copy(extra = Map("includemeta" -> "true")), mt)
      .orderBy("latitude", "longitude").collect()
    assert(withMeta.length === 4)
    val m0 = withMeta(0).getAs[Map[String, Any]]("meta")
    assert(m0("wind_v") === 0.0)
    assert(withMeta(3).getAs[Map[String, Any]]("meta")("wind_v") === 21.0)
    // without includemeta the column is absent (legacy shape)
    assert(!Handlers.registry("/datainbounds")(pd, mt).columns.contains("meta"))
  }

  test("/standarddeviationsearch with a point reads the as-of tile's " +
    "*std meta array (all pixels or nearest); legacy domain map without") {
    import spark.implicits._
    // two climatology tiles for the same cell at day_of_year 32 and 60,
    // each with an sst_std companion; a plain tile with no std meta
    def climTiles(doy: Int, bias: Double) = {
      val day = (doy - 1) * 86400L
      val pts = (for { li <- 0 until 2; lo <- 0 until 2 }
        yield ("c.nc", li + 0.5, lo + 0.5, day,
          1.0, Seq((li * 2 + lo) + bias)))
        .toDF("granule", "latitude", "longitude", "time", "value", "meta")
      Ingest.pointsToTiles(pts, 2.0, 2.0, "sstclim", metaNames = Seq("sst_std"))
    }
    val tiles2 = climTiles(32, 0.0).unionByName(climTiles(60, 100.0))
    val pc = Handlers.QueryParams(dataset = "sstclim")
    def run(extra: Map[String, String]) =
      Handlers.registry("/standarddeviationsearch")(
        pc.copy(extra = extra), tiles2).collect()
    // day 45: as-of pick takes doy 32 (most recent <= 45), not 60
    val all = run(Map("longitude" -> "0.5", "latitude" -> "0.5", "day" -> "45"))
    assert(all.length === 4)
    assert(all.map(_.getAs[Double]("standard_deviation")).toSet ===
      Set(0.0, 1.0, 2.0, 3.0))
    // day 70 picks doy 60's biased values
    val later = run(Map("longitude" -> "0.5", "latitude" -> "0.5", "day" -> "70"))
    assert(later.map(_.getAs[Double]("standard_deviation")).min === 100.0)
    // nearest-pixel mode: (1.5, 0.5) is lat index 1, lon index 0 → 2.0
    val one = run(Map("longitude" -> "0.5", "latitude" -> "1.5",
      "day" -> "45", "allInTile" -> "false"))
    assert(one.length === 1)
    assert(one(0).getAs[Double]("standard_deviation") === 2.0)
    // date= alternative (Feb 14 = doy 45); both given → loud error
    val viaDate = run(Map("longitude" -> "0.5", "latitude" -> "0.5",
      "date" -> "2001-02-14T00:00:00Z"))
    assert(viaDate.length === 4)
    intercept[RuntimeException](run(Map("longitude" -> "0.5",
      "latitude" -> "0.5", "day" -> "45", "date" -> "2001-02-14T00:00:00Z")))
    // date-only spelling parses as a UTC date, not a failed epoch int
    assert(run(Map("longitude" -> "0.5", "latitude" -> "0.5",
      "date" -> "2001-02-14")).length === 4)
    // exactly one coordinate: loud error, never the whole-domain map
    val half = intercept[RuntimeException](
      run(Map("longitude" -> "0.5", "day" -> "45")))
    assert(half.getMessage.contains("BOTH"))
    // a tile with NO *std meta yields an empty result, not an error
    assert(Handlers.registry("/standarddeviationsearch")(
      p.copy(extra = Map("longitude" -> "0.5", "latitude" -> "0.5",
        "day" -> "400")), tiles).collect().isEmpty)
    // legacy (no point): per-pixel domain stddev map still answers
    val legacy = Handlers.registry("/standarddeviationsearch")(p, tiles)
    assert(legacy.columns.toSet === Set("latitude", "longitude", "std", "cnt"))
    assert(legacy.count() > 0)
  }

  test("matchup `parameter` selects the in-situ measurement as sv, and " +
    "resultSizeLimit caps the pairs (reference default 500, 0=unlimited)") {
    import spark.implicits._
    val pm = p.copy(minLat = -10, maxLat = 10, minLon = -10, maxLon = 10)
    val insitu = Seq((100L, 0.5, 0.5, 10L, 17.5, 35.1))
      .toDF("id", "latitude", "longitude", "time",
        "sea_water_temperature", "sea_water_salinity")
    def run(extra: Map[String, String]) =
      Handlers.matchSpark(pm.copy(extra = extra), tiles, insitu,
        rtMeters = 200000, ttSeconds = 86400, matchOnce = false)
    // default parameter sst → sea_water_temperature rides as sv
    assert(run(Map.empty).select("sv").distinct().as[Double].collect()
      .toSeq === Seq(17.5))
    assert(run(Map("parameter" -> "sss")).select("sv").distinct()
      .as[Double].collect().toSeq === Seq(35.1))
    intercept[RuntimeException](run(Map("parameter" -> "chlorophyll")))
    // relation models NAMED measurements but not the requested one:
    // loud failure, never another measurement mislabeled as wind
    val eWind = intercept[RuntimeException](run(Map("parameter" -> "wind")))
    assert(eWind.getMessage.contains("wind_speed"))
    // generic `value` column serves as sv when no named measurement
    val generic = Seq((100L, 0.5, 0.5, 10L, 9.9))
      .toDF("id", "latitude", "longitude", "time", "value")
    assert(Handlers.matchSpark(pm, tiles, generic, 200000, 86400,
      matchOnce = false).select("sv").distinct().as[Double].collect()
      .toSeq === Seq(9.9))
    // ...but an EXPLICIT parameter never falls back to `value`: serving
    // whatever `value` holds labeled as salinity would mislabel data,
    // even when the relation has no other named measurement to confuse
    val eGeneric = intercept[RuntimeException] {
      Handlers.matchSpark(pm.copy(extra = Map("parameter" -> "sss")),
        tiles, generic, 200000, 86400, matchOnce = false)
    }
    assert(eGeneric.getMessage.contains("sea_water_salinity"))
    // the IMPLICIT sst default must not reject a relation that works
    // through `value` just because it also models another measurement
    val mixed = Seq((100L, 0.5, 0.5, 10L, 4.2, 9.9))
      .toDF("id", "latitude", "longitude", "time", "wind_speed", "value")
    assert(Handlers.matchSpark(pm, tiles, mixed, 200000, 86400,
      matchOnce = false).select("sv").distinct().as[Double].collect()
      .toSeq === Seq(9.9))
    // ...but an EXPLICIT parameter the relation lacks still fails loudly
    intercept[RuntimeException](Handlers.matchSpark(
      pm.copy(extra = Map("parameter" -> "sst")), tiles, mixed,
      200000, 86400, matchOnce = false))
    // resultSizeLimit: cap honored; 0 lifts it
    val n = run(Map.empty).count()
    assert(run(Map("resultSizeLimit" -> "1")).count() === 1)
    assert(run(Map("resultSizeLimit" -> "0")).count() === n)
  }

  test("JobGate limits concurrency like the reference's 503 gate") {
    val gate = new Handlers.JobGate(maxConcurrentJobs = 1)
    val latch = new java.util.concurrent.CountDownLatch(1)
    val started = new java.util.concurrent.CountDownLatch(1)
    val t = new Thread(() => {
      gate.tryRun(spark) { started.countDown(); latch.await(); 1 }
    })
    t.start(); started.await()
    assert(gate.tryRun(spark) { 2 } === None) // slot exhausted → 503
    latch.countDown(); t.join()
    assert(gate.tryRun(spark) { 3 } === Some(3))
  }

  test("sizeGated returns Left(count) beyond the limit (W5)") {
    val df = Handlers.registry("/datainbounds")(p, tiles)
    assert(Handlers.sizeGated(df, limit = 10).isLeft)
    assert(Handlers.sizeGated(df, limit = 1000).isRight)
  }

  test("legacy non-Spark aliases resolve to the same plan as their Spark twins") {
    Seq("/stats" -> "/timeSeriesSpark", "/timeAvgMap" -> "/timeAvgMapSpark",
      "/latitudeTimeHofMoeller" -> "/latitudeTimeHofMoellerSpark")
      .foreach { case (alias, target) =>
        val a = Handlers.registry(alias)(p, tiles)
        val b = Handlers.registry(target)(p, tiles)
        assert(a.queryExecution.optimizedPlan.sameResult(
          b.queryExecution.optimizedPlan), s"$alias != $target")
      }
  }

  test("/longitudeLatitudeMap computes per-pixel regression + stats (A14)") {
    val rows = Handlers.registry("/longitudeLatitudeMap")(p, tiles).collect()
    assert(rows.nonEmpty)
    val r = rows.head
    assert(r.schema.fieldNames.toSet ===
      Set("latitude", "longitude", "slope", "intercept", "r", "mean",
        "max", "min", "std", "cnt"))
    assert(r.getAs[Long]("cnt") > 0)
  }

  test("/domsplot histogram normandcurve stays finite on constant-valued " +
    "pairs (hi == lo, sigma == 0)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-plot").toString
    // every pv identical: bin width and sigma both degenerate to 0
    val pairs = Seq.fill(4)((7.25, 1.0, 2.0))
      .toDF("pv", "plat", "plon")
    graft.sources.ResultsStore.write(pairs, dir, "const-exec")
    val insitu = Seq((1.0, 2.0, 0L, 1.0)).toDF("latitude", "longitude", "time", "value")
    val reg = Handlers.domsRegistry(insitu, dir)
    val pp = p.copy(extra = Map("id" -> "const-exec", "type" -> "histogram",
      "normandcurve" -> "true"))
    val rows = reg("/domsplot")(pp, tiles).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val density = r.getAs[Double]("density")
      val pdf = r.getAs[Double]("normal_pdf")
      assert(!density.isInfinite && !density.isNaN, s"density=$density")
      assert(!pdf.isInfinite && !pdf.isNaN, s"normal_pdf=$pdf")
    }
  }

  test("diagnostic endpoints: capabilities lists the registry, heartbeat and version answer") {
    import spark.implicits._
    val tiles = Seq((1L, "ds")).toDF("tile_id", "dataset")
    val p = Handlers.QueryParams(dataset = "ds")
    val paths = Handlers.registry("/capabilities")(p, tiles)
      .as[String].collect().toSet
    assert(paths.contains("/timeSeriesSpark") && paths.contains("/heartbeat"))
    assert(Handlers.registry("/heartbeat")(p, tiles).collect()(0).getBoolean(0))
    val v = Handlers.registry("/version")(p, tiles).collect()(0)
    assert(v.getString(0) === "nexusspark" && v.getString(2).nonEmpty)
  }
}
