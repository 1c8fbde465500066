package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.GranuleIngest

/** Field-conformance: decode REAL libhdf5/netcdf-c-written granules —
  * AVHRR/MUR L4 SST, CCMP wind, ASCAT and SMAP L2 swaths — and pin the
  * values the reference's own reader test pins on the very same bytes
  * (`nexus-ingest/nexus-xd-python-modules/tests/
  * tilereadingprocessor_test.py`). Every other H5 fixture in this repo
  * is synthesized from the format spec; these six files are written by
  * the real library stack the reference ingests daily, so passing here
  * is evidence the reader works on field bytes, not just spec bytes.
  *
  * The fixture files are the reference repo's checked-in test data
  * (its `tests/datafiles` directory), carried unmodified.
  */
class RealGranuleSpec extends AnyFunSuite {

  private def load(name: String) = {
    val in = getClass.getResourceAsStream(s"/granules/$name")
    require(in != null, s"missing fixture $name")
    try GranuleIngest.decode(in.readAllBytes()) finally in.close()
  }

  private def grid(name: String, v: String, latVar: String = "lat",
                   lonVar: String = "lon") = {
    val nc = load(name)
    val pts = GranuleIngest.gridPointsOf(nc, name, v, latVar, lonVar).toVector
    (nc, pts)
  }

  test("AVHRR L4: first 10x10 tile matches the reference reader") {
    // tilereadingprocessor_test.py:396-427: 100 valid cells, lat range
    // [-39.875, -37.625], epoch 1462060800, corner value 289.71
    val (nc, pts) = grid("not_empty_avhrr.nc4", "analysed_sst")
    val nLon = nc.variable("lon").get.data.length
    val tile = pts.zipWithIndex.collect {
      case (p, k) if (k / nLon) < 10 && (k % nLon) < 10 => p
    }
    assert(tile.size == 100)
    assert(tile.count(p => !p.value.isNaN) == 100)
    assert(math.abs(tile.map(_.latitude).min - (-39.875)) < 1e-3)
    assert(math.abs(tile.map(_.latitude).max - (-37.625)) < 1e-3)
    assert(tile.forall(_.time == 1462060800L))
    assert(math.abs(tile.head.value - 289.71) < 1e-2)
  }

  test("MUR L4: adjacent 10x10 tiles are full and distinct") {
    // tilereadingprocessor_test.py:127-146: both tiles 100 valid, not
    // identical
    val (nc, pts) = grid("not_empty_mur.nc4", "analysed_sst")
    val nLon = nc.variable("lon").get.data.length
    def tile(lat0: Int) = pts.zipWithIndex.collect {
      case (p, k) if (k / nLon) >= lat0 && (k / nLon) < lat0 + 10 &&
        (k % nLon) < 10 => p.value
    }
    val (t1, t2) = (tile(0), tile(10))
    assert(t1.count(!_.isNaN) == 100 && t2.count(!_.isNaN) == 100)
    assert(t1 != t2, "adjacent MUR tiles decoded identical data")
  }

  test("CCMP wind: uwnd grid + vwnd meta match the reference reader") {
    // tilereadingprocessor_test.py:352-385: 4 time slices of 38x87,
    // 3306 valid each, lat range [-78.375, -69.125], epoch 1451606400
    val nc = load("not_empty_ccmp.nc")
    val pts = GranuleIngest.gridPointsOf(nc, "ccmp", "uwnd",
      latVar = "latitude", lonVar = "longitude").toVector
    val nCell = 38 * 87
    assert(pts.size == 4 * nCell)
    val slice0 = pts.take(nCell)
    assert(slice0.count(p => !p.value.isNaN) == 3306)
    assert(math.abs(slice0.map(_.latitude).min - (-78.375)) < 1e-3)
    assert(math.abs(slice0.map(_.latitude).max - (-69.125)) < 1e-3)
    assert(slice0.head.time == 1451606400L,
      s"CF 'hours since' axis decoded to ${slice0.head.time}")
    // vwnd rides the same grid (the reference ingests it as meta_data)
    val vw = nc.variable("vwnd").get
    assert(nc.shape(vw) == nc.shape(nc.variable("uwnd").get))
    assert(vw.unpacked.take(nCell).count(x => !x.isNaN) == 3306)
  }

  test("ASCAT L2 swath: two scan rows, both full, distinct, meta aligned") {
    // tilereadingprocessor_test.py:180-240: 82 valid cells per row for
    // wind_speed AND the wind_dir meta, rows not identical
    val nc = load("not_empty_ascatb.nc4")
    val pts = GranuleIngest.swathPointsOf(nc, "ascat", "wind_speed").toVector
    assert(pts.size == 2 * 82)
    val (r0, r1) = (pts.take(82), pts.drop(82))
    assert(r0.count(p => !p.value.isNaN) == 82)
    assert(r1.count(p => !p.value.isNaN) == 82)
    assert(r0.map(_.value) != r1.map(_.value))
    val dir = nc.variable("wind_dir").get
    assert(dir.dims == nc.variable("wind_speed").get.dims)
    assert(dir.unpacked.take(82).count(x => !x.isNaN) == 82)
  }

  test("SMAP L2 swath: seconds-of-day time base + masked column") {
    // tilereadingprocessor_test.py:272-310: column 0 has 43 valid of
    // 76, lat range [-50.056, -47.949], first time 1427820162 via
    // REV_START_TIME (= 2015-090T16:31:44) + row_time seconds of day
    val nc = load("not_empty_smap.h5")
    val pts = GranuleIngest.swathPointsOf(nc, "smap", "smap_sss",
      timeVar = "row_time",
      dayAttr = Some(("REV_START_TIME", "yyyy-DDD'T'HH:mm:ss.SSS"))).toVector
    assert(pts.size == 76 * 2)
    val col0 = pts.zipWithIndex.collect { case (p, k) if k % 2 == 0 => p }
    assert(col0.count(p => !p.value.isNaN) == 43)
    val lats = col0.map(_.latitude).filter(!_.isNaN)
    assert(math.abs(lats.min - (-50.056)) < 1e-3)
    assert(math.abs(lats.max - (-47.949)) < 1e-3)
    assert(col0.head.time == 1427820162L,
      s"seconds-of-day base decoded to ${col0.head.time}")
  }

  test("real granules run the FULL pipeline: binaryFile → decode → tiles → stats") {
    // the production shape end to end on field bytes: both L4 SST
    // granules land in a tile store and the daily-stats aggregation
    // (the reference's /stats role) reads physically-plausible kelvins
    val spark = graft.SparkSpec.session
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("realgran")
    for (n <- Seq("not_empty_avhrr.nc4", "not_empty_mur.nc4")) {
      val in = getClass.getResourceAsStream(s"/granules/$n")
      java.nio.file.Files.write(dir.resolve(n), in.readAllBytes())
      in.close()
    }
    val tiles = GranuleIngest.ingestGridGranules(spark,
      dir.toString + "/*.nc4", "analysed_sst", "sst_real",
      tileLat = 5.0, tileLon = 5.0)
    val daily = tiles.groupBy(col("min_time"))
      .agg(sum("stats_count").as("n"),
        min("stats_min").as("lo"), max("stats_max").as("hi"))
      .collect()
    assert(daily.nonEmpty)
    // AVHRR is 2016-05-01, MUR 2015-10-01 — CF-converted epochs
    assert(daily.map(_.getLong(0)).toSet.contains(1462060800L))
    daily.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(r.getDouble(2) > 250 && r.getDouble(3) < 320,
        s"implausible SST range ${r.getDouble(2)}..${r.getDouble(3)} K")
    }
  }

  test("real swath granule streams through granulePipeline as point rows") {
    // the L2 swath production path on field bytes: ASCAT wind rows
    // arrive via the streaming file source, decode to points, and land
    // idempotently (second run with a fresh checkpoint adds nothing)
    val spark = graft.SparkSpec.session
    import org.apache.spark.sql.functions._
    val watch = java.nio.file.Files.createTempDirectory("realswath").toFile
    val out = java.nio.file.Files.createTempDirectory("realswath_store")
      .toFile.getAbsolutePath + "/pts"
    val in = getClass.getResourceAsStream("/granules/not_empty_ascatb.nc4")
    java.nio.file.Files.write(
      new java.io.File(watch, "ascat.nc4").toPath, in.readAllBytes())
    in.close()
    def run(): Unit = {
      val ckpt = java.nio.file.Files.createTempDirectory("realswath_ckpt")
        .toFile.getAbsolutePath
      val q = graft.streaming.StreamingIngest.granulePipeline(spark,
        watch.getAbsolutePath, out, ckpt, "wind_speed", "ascat_stream",
        tileLat = 30.0, tileLon = 30.0, swath = true).start()
      q.awaitTermination()
    }
    run()
    val pts = spark.read.parquet(out)
    // 2 rows x 82 cells, every wind_speed valid (reference test pin)
    assert(pts.count() === 164)
    assert(pts.where(isnan(col("value"))).count() === 0)
    run() // replay from scratch: the dedup-append sink keeps it 164
    assert(spark.read.parquet(out).count() === 164)
  }

  test("SMAP tile summary matches the reference summarizer's pinned stats") {
    // tilesumarizingprocessor_test.py:44-52 pins the column-0 SMAP
    // tile's summary: bbox, nan-min/max, cos-lat-WEIGHTED mean
    // (tilesumarizingprocessor.py:53-57), valid count — the A7
    // semantics this engine computes at ingest, checked here on field
    // bytes with the engine's own aggregation expressions
    val spark = graft.SparkSpec.session
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.GeoFunctions
    val nc = load("not_empty_smap.h5")
    val pts = GranuleIngest.swathPointsOf(nc, "smap", "smap_sss",
        timeVar = "row_time",
        dayAttr = Some(("REV_START_TIME", "yyyy-DDD'T'HH:mm:ss.SSS"))).toVector
    val col0 = pts.zipWithIndex.collect { case (p, k) if k % 2 == 0 => p }
    val df = col0.map(p => (p.latitude, p.longitude, p.value))
      .toDF("latitude", "longitude", "value")
    val r = df.agg(
      min(when(!isnan($"latitude"), $"latitude")).as("lat_min"),
      max(when(!isnan($"latitude"), $"latitude")).as("lat_max"),
      min(when(!isnan($"longitude"), $"longitude")).as("lon_min"),
      max(when(!isnan($"longitude"), $"longitude")).as("lon_max"),
      min(when(!isnan($"value"), $"value")).as("v_min"),
      max(when(!isnan($"value"), $"value")).as("v_max"),
      (sum(when(!isnan($"value"),
        $"value" * GeoFunctions.cosLatWeight($"latitude"))) /
        sum(when(!isnan($"value"),
          GeoFunctions.cosLatWeight($"latitude")))).as("mean"),
      count(when(!isnan($"value"), lit(1))).as("cnt")).head()
    assert(math.abs(r.getAs[Double]("lat_min") - (-50.056)) < 1e-3)
    assert(math.abs(r.getAs[Double]("lat_max") - (-47.949)) < 1e-3)
    assert(math.abs(r.getAs[Double]("lon_min") - 22.376) < 1e-3)
    assert(math.abs(r.getAs[Double]("lon_max") - 36.013) < 1e-3)
    assert(math.abs(r.getAs[Double]("v_min") - 33.067) < 1e-3)
    assert(math.abs(r.getAs[Double]("v_max") - 40.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("mean") - 36.6348) < 1e-3)
    assert(r.getAs[Long]("cnt") === 43L)
  }

  test("MEaSUREs SLA: huge heap attribute file decodes") {
    // not_empty_measures_alt.nc carries an 8 KiB root attribute stored
    // as a HUGE fractal-heap object (heap-ID type 1, indexed by the
    // heap's v2 B-tree) — the storage class libhdf5 switches to above
    // the managed-object maximum
    val nc = load("not_empty_measures_alt.nc")
    assert(nc.vars.map(_.name).toSet ==
      Set("Latitude", "Longitude", "SLA", "Time"))
    val sla = nc.variable("SLA").get
    assert(sla.unpacked.exists(x => !x.isNaN))
  }
}
