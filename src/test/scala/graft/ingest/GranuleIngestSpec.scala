package graft.ingest

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.NetcdfClassic
import graft.sources.NetcdfClassic._

class GranuleIngestSpec extends SparkSpec {

  private def gridGranule(t0: Int, bias: Double): Array[Byte] =
    NetcdfClassic.write(NcFile(
      dims = Seq(NcDim("time", 2), NcDim("lat", 2), NcDim("lon", 2)),
      attrs = Nil,
      vars = Seq(
        NcVar("time", Seq("time"), NC_INT, Nil,
          Array(t0.toDouble, t0 + 3600.0)),
        NcVar("lat", Seq("lat"), NC_FLOAT, Nil, Array(10.0, 20.0)),
        NcVar("lon", Seq("lon"), NC_FLOAT, Nil, Array(-40.0, -35.0)),
        NcVar("sst", Seq("time", "lat", "lon"), NC_DOUBLE,
          Seq(NcAttr("_FillValue", NC_DOUBLE, nums = Seq(-999.0))),
          Array(1 + bias, 2 + bias, 3 + bias, -999.0,
            5 + bias, 6 + bias, 7 + bias, 8 + bias)))))

  test("grid granules ingest end-to-end into dense tiles") {
    val dir = java.nio.file.Files.createTempDirectory("graft_nc").toFile
    java.nio.file.Files.write(
      new java.io.File(dir, "g1.nc").toPath, gridGranule(86400, 0.0))
    java.nio.file.Files.write(
      new java.io.File(dir, "g2.nc").toPath, gridGranule(172800, 10.0))

    val pts = GranuleIngest.readGranules(spark, dir.getAbsolutePath + "/*.nc", "sst")
    assert(pts.count() === 16) // 2 granules x 2 times x 2x2 grid
    // fill pixel decoded to NaN, coordinates in row-major order
    val p0 = pts.where(col("granule") === "g1.nc" && col("time") === 86400)
      .orderBy(col("latitude"), col("longitude"))
      .collect()
    assert(p0.map(_.getDouble(4)).take(3).toSeq === Seq(1.0, 2.0, 3.0))
    assert(p0.last.getDouble(4).isNaN)

    val tiles = GranuleIngest.ingestGridGranules(spark,
      dir.getAbsolutePath + "/*.nc", "sst", "sst_dataset", 30.0, 30.0)
    val rows = tiles.orderBy("granule", "min_time").collect()
    assert(rows.length === 4) // one 30-degree cell per granule per time
    val first = rows.head
    assert(first.getAs[String]("dataset") === "sst_dataset")
    assert(first.getAs[Long]("stats_count") === 3) // fill cell masked
    assert(first.getAs[Double]("stats_min") === 1.0)
    assert(first.getAs[Seq[Float]]("latitudes") === Seq(10.0f, 20.0f))
    // NaN mask cell survives in the data array at its grid slot
    assert(first.getAs[Seq[Float]]("data").count(_.isNaN) === 1)
  }

  test("secondary variables ingest into meta_data in the same row-major " +
    "layout as data, with independent masks") {
    val dir = java.nio.file.Files.createTempDirectory("graft_meta").toFile
    // primary sst masks cell 3; wind masks cell 5 — independent masks
    val nc = NcFile(
      dims = Seq(NcDim("time", 1), NcDim("lat", 2), NcDim("lon", 4)),
      attrs = Nil,
      vars = Seq(
        NcVar("time", Seq("time"), NC_INT, Nil, Array(86400.0)),
        NcVar("lat", Seq("lat"), NC_FLOAT, Nil, Array(10.0, 20.0)),
        NcVar("lon", Seq("lon"), NC_FLOAT, Nil, Array(1.0, 2.0, 3.0, 4.0)),
        NcVar("sst", Seq("time", "lat", "lon"), NC_DOUBLE,
          Seq(NcAttr("_FillValue", NC_DOUBLE, nums = Seq(-999.0))),
          Array(1, 2, 3, -999, 5, 6, 7, 8).map(_.toDouble)),
        NcVar("wind", Seq("time", "lat", "lon"), NC_DOUBLE,
          Seq(NcAttr("_FillValue", NC_DOUBLE, nums = Seq(-999.0))),
          Array(11, 12, 13, 14, 15, -999, 17, 18).map(_.toDouble)),
        NcVar("ice", Seq("time", "lat", "lon"), NC_DOUBLE, Nil,
          Array(0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8))))
    java.nio.file.Files.write(
      new java.io.File(dir, "m1.nc").toPath, NetcdfClassic.write(nc))
    val tiles = GranuleIngest.ingestGridGranules(spark,
      dir.getAbsolutePath + "/*.nc", "sst", "multi", 90.0, 90.0,
      metaVars = Seq("wind", "ice"))
    val row = tiles.collect() match { case Array(r) => r }
    val data = row.getAs[scala.collection.Seq[Float]]("data")
    val meta = row.getAs[Map[String, scala.collection.Seq[Float]]]("meta_data")
    assert(data.take(3) === Seq(1.0f, 2.0f, 3.0f) && data(3).isNaN)
    // same row-major slots; wind's OWN mask at slot 5, value at slot 3
    val wind = meta("wind")
    assert(wind.take(5) === Seq(11f, 12f, 13f, 14f, 15f) && wind(5).isNaN)
    assert(wind.drop(6) === Seq(17f, 18f))
    assert(meta("ice").last === 0.8f)
    // stats stay primary-only: the wind mask does not change the count
    assert(row.getAs[Long]("stats_count") === 7)
    // metaVars = Nil keeps the legacy empty map (hash-stable gates)
    val plain = GranuleIngest.ingestGridGranules(spark,
      dir.getAbsolutePath + "/*.nc", "sst", "multi", 90.0, 90.0)
    assert(plain.collect()(0)
      .getAs[Map[String, scala.collection.Seq[Float]]]("meta_data").isEmpty)

    // and meta surfaces at QUERY time: toPoints(metaNames) yields one
    // aligned column per secondary — primary-masked slot dropped
    // (slot 3), independently-masked meta slot NULL (wind at slot 5)
    val pts = graft.core.TileOps.toPoints(tiles, metaNames = Seq("wind", "ice"))
      .orderBy("time", "latitude", "longitude").collect()
    assert(pts.length === 7) // 8 cells minus the primary-masked one
    assert(pts.map(_.getAs[Double]("value")).toSeq ===
      Seq(1.0, 2.0, 3.0, 5.0, 6.0, 7.0, 8.0))
    assert(pts.map(r => Option(r.get(r.fieldIndex("wind")))).toSeq ===
      Seq(Some(11.0), Some(12.0), Some(13.0), Some(15.0), None,
        Some(17.0), Some(18.0)))
    assert(math.abs(pts.last.getAs[Double]("ice") - 0.8) < 1e-6) // f32 round-trip
  }

  test("the CF calendar attribute flows from granule bytes to tile epochs") {
    // a 360_day-calendar granule: days since 2000-01-01 in ITS OWN
    // calendar = 10800 360-day days after the 1970 origin. The
    // attribute must survive the codec -> CfTime path end-to-end, not
    // just the unit test
    def granule(cal: String): Array[Byte] = NetcdfClassic.write(NcFile(
      dims = Seq(NcDim("time", 1), NcDim("lat", 2), NcDim("lon", 2)),
      attrs = Nil,
      vars = Seq(
        NcVar("time", Seq("time"), NC_DOUBLE,
          Seq(NcAttr("units", NC_CHAR, text = "days since 2000-01-01"),
            NcAttr("calendar", NC_CHAR, text = cal)), Array(30.0)),
        NcVar("lat", Seq("lat"), NC_FLOAT, Nil, Array(10.0, 20.0)),
        NcVar("lon", Seq("lon"), NC_FLOAT, Nil, Array(-40.0, -35.0)),
        NcVar("sst", Seq("time", "lat", "lon"), NC_DOUBLE, Nil,
          Array(1.0, 2.0, 3.0, 4.0)))))
    val dir = java.nio.file.Files.createTempDirectory("graft_cal").toFile
    java.nio.file.Files.write(
      new java.io.File(dir, "g360.nc").toPath, granule("360_day"))
    val pts = GranuleIngest.ingestGridGranules(spark,
      dir.getAbsolutePath + "/g360.nc", "sst", "cal360", 90.0, 90.0)
    val t = graft.core.TileOps.toPoints(pts).select("time").distinct()
      .collect().map(_.getLong(0)).toSeq
    assert(t === Seq((10800L + 30) * 86400)) // 360_day arithmetic, not 946684800+30d
    // and a julian-calendar granule fails LOUDLY at decode
    java.nio.file.Files.write(
      new java.io.File(dir, "gjul.nc").toPath, granule("julian"))
    val e = intercept[Exception] {
      GranuleIngest.ingestGridGranules(spark,
        dir.getAbsolutePath + "/gjul.nc", "sst", "caljul", 90.0, 90.0)
        .collect()
    }
    def chain(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: chain(x.getCause))
    assert(chain(e).exists(m => m != null && m.contains("unsupported CF calendar")),
      chain(e).mkString(" | "))
  }

  test("granulePipeline streams arriving granules into the tile store " +
    "incrementally and idempotently (checkpoint loss included)") {
    import graft.streaming.StreamingIngest
    val watch = java.nio.file.Files.createTempDirectory("graft_watch").toFile
    val out = java.nio.file.Files.createTempDirectory("graft_store")
      .toFile.getAbsolutePath + "/tiles"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt")
      .toFile.getAbsolutePath
    def run(checkpoint: String): Unit = {
      val q = StreamingIngest.granulePipeline(spark, watch.getAbsolutePath,
        out, checkpoint, "sst", "sst_stream", 30.0, 30.0).start()
      q.awaitTermination()
    }
    java.nio.file.Files.write(
      new java.io.File(watch, "g1.nc").toPath, gridGranule(86400, 0.0))
    run(ckpt)
    val after1 = spark.read.parquet(out)
    assert(after1.count() === 2) // one 30° cell × 2 time steps
    assert(after1.select("dataset").distinct().collect()
      .map(_.getString(0)).toSeq === Seq("sst_stream"))

    // a new granule arrives: the SAME checkpoint continues incrementally
    java.nio.file.Files.write(
      new java.io.File(watch, "g2.nc").toPath, gridGranule(172800, 10.0))
    run(ckpt)
    assert(spark.read.parquet(out).count() === 4)

    // checkpoint loss: a FRESH checkpoint re-lists and re-decodes every
    // file — the tile_id anti-join keeps the store duplicate-free (the
    // reference gets the same property from UUID5 + Cassandra upsert)
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft_ckpt2")
      .toFile.getAbsolutePath
    run(ckpt2)
    val finalTiles = spark.read.parquet(out)
    assert(finalTiles.count() === 4)
    assert(finalTiles.select("tile_id").distinct().count() === 4)
    // streamed tiles are byte-identical to the batch path's
    val batch = GranuleIngest.ingestGridGranules(spark,
      watch.getAbsolutePath + "/*.nc", "sst", "sst_stream", 30.0, 30.0)
    assert(finalTiles.select("tile_id", "stats_mean", "stats_count")
      .except(batch.select("tile_id", "stats_mean", "stats_count"))
      .count() === 0)
  }

  test("granulePipeline crash mid-batch and lost commit marker both " +
    "recover to a store identical to one clean run") {
    import graft.streaming.StreamingIngest
    val watch = java.nio.file.Files.createTempDirectory("graft_cwatch").toFile
    val outCrash = java.nio.file.Files.createTempDirectory("graft_cstore")
      .toFile.getAbsolutePath + "/tiles"
    val outClean = java.nio.file.Files.createTempDirectory("graft_cstore2")
      .toFile.getAbsolutePath + "/tiles"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cckpt")
      .toFile.getAbsolutePath
    val ckptClean = java.nio.file.Files.createTempDirectory("graft_cckpt2")
      .toFile.getAbsolutePath
    java.nio.file.Files.write(
      new java.io.File(watch, "g1.nc").toPath, gridGranule(86400, 0.0))
    java.nio.file.Files.write(
      new java.io.File(watch, "g2.nc").toPath, gridGranule(172800, 10.0))
    // the injected crash: a per-row predicate that throws while the
    // flag file exists — it executes in EXECUTOR tasks during the
    // batch's write job, i.e. AFTER decode and BEFORE any store or
    // checkpoint commit (the window a real mid-batch crash hits)
    val flag = new java.io.File(watch.getParentFile, "graft_crash_flag")
    flag.createNewFile()
    val flagPath = flag.getAbsolutePath
    val boom = udf { () =>
      if (new java.io.File(flagPath).exists())
        throw new RuntimeException("injected crash after decode")
      true
    }
    val crashing: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      _.filter(boom())
    def run(out: String, checkpoint: String): Unit = {
      // a just-failed query releases its checkpoint registration
      // asynchronously (after awaitTermination already threw) — retry
      // the restart through that window, nothing else
      var attempts = 0
      var done = false
      while (!done) {
        attempts += 1
        try {
          val q = StreamingIngest.granulePipeline(spark,
            watch.getAbsolutePath, out, checkpoint, "sst", "sst_crash",
            30.0, 30.0, pointTransform = crashing).start()
          q.awaitTermination()
          done = true
        } catch {
          case e: Exception
            if attempts < 50 && e.getMessage != null &&
              e.getMessage.contains("concurrently using") =>
            Thread.sleep(200)
          case e: Exception => throw e
        }
      }
    }
    intercept[Exception](run(outCrash, ckpt))
    // nothing committed: no parquet file outside _temporary exists
    def committedParquet(p: java.io.File): Seq[java.io.File] =
      if (!p.exists()) Nil
      else if (p.isFile) (if (p.getName.endsWith(".parquet")) Seq(p) else Nil)
      else if (p.getName == "_temporary") Nil
      else Option(p.listFiles).toSeq.flatten.flatMap(committedParquet)
    assert(committedParquet(new java.io.File(outCrash)).isEmpty,
      "crashed batch must not commit any store file")
    // restart from the SAME checkpoint with the fault cleared: the
    // batch replays in full
    flag.delete()
    run(outCrash, ckpt)
    // second crash window: the sink committed but the checkpoint's
    // commit marker was lost (crash between sink write and checkpoint
    // commit). Spark replays the batch; the tile_id anti-join must
    // keep the store duplicate-free.
    val commits = new java.io.File(ckpt, "commits").listFiles
      .filter(_.getName.forall(_.isDigit))
    assert(commits.nonEmpty)
    commits.sortBy(_.getName.toInt).lastOption.foreach(_.delete())
    run(outCrash, ckpt)
    // one clean run, same granules, fresh checkpoint+store
    run(outClean, ckptClean)
    val cols = spark.read.parquet(outClean).columns.sorted
    def rowsOf(p: String) = spark.read.parquet(p)
      .select(cols.map(col).toIndexedSeq: _*).collect()
      .map(_.toString).sorted.toSeq
    assert(rowsOf(outCrash) === rowsOf(outClean))
    assert(spark.read.parquet(outCrash)
      .select("tile_id").distinct().count() === 4)
  }

  test("granulePipeline(swath=true) streams swath granules as POINT " +
    "rows, idempotent per granule") {
    import graft.streaming.StreamingIngest
    def swathGranule(bias: Double): Array[Byte] = NetcdfClassic.write(NcFile(
      dims = Seq(NcDim("y", 2), NcDim("x", 3)),
      attrs = Nil,
      vars = Seq(
        NcVar("time", Seq("y"), NC_INT, Nil, Array(100.0, 200.0)),
        NcVar("lat", Seq("y", "x"), NC_FLOAT, Nil,
          Array(1.0, 1.1, 1.2, 2.0, 2.1, 2.2)),
        NcVar("lon", Seq("y", "x"), NC_FLOAT, Nil,
          Array(30.0, 30.1, 30.2, 31.0, 31.1, 31.2)),
        NcVar("wind", Seq("y", "x"), NC_FLOAT, Nil,
          Array.tabulate(6)(_ + bias)))))
    val watch = java.nio.file.Files.createTempDirectory("graft_sw").toFile
    val out = java.nio.file.Files.createTempDirectory("graft_swstore")
      .toFile.getAbsolutePath + "/points"
    def run(ckpt: String): Unit = {
      val q = StreamingIngest.granulePipeline(spark, watch.getAbsolutePath,
        out, ckpt, "wind", "wind_swath", 30.0, 30.0, swath = true).start()
      q.awaitTermination()
    }
    java.nio.file.Files.write(
      new java.io.File(watch, "s1.nc").toPath, swathGranule(0.0))
    val ckpt = java.nio.file.Files.createTempDirectory("graft_swck")
      .toFile.getAbsolutePath
    run(ckpt)
    val pts1 = spark.read.parquet(out)
    assert(pts1.count() === 6) // sparse points, NOT dense tiles
    assert(pts1.columns.contains("latitude") && pts1.columns.contains("value"))
    // second granule + checkpoint loss: row-identity anti-join dedups
    java.nio.file.Files.write(
      new java.io.File(watch, "s2.nc").toPath, swathGranule(50.0))
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft_swck2")
      .toFile.getAbsolutePath
    run(ckpt2) // fresh checkpoint reprocesses s1 too
    val all = spark.read.parquet(out)
    assert(all.count() === 12)
    assert(all.select("granule").distinct().count() === 2)
    // PARTIAL-commit window: a crash inside the parquet job commit can
    // leave a strict subset of a granule's rows visible. Simulate by
    // rewriting the store minus two of s1's points, then replay from a
    // fresh checkpoint: the row-identity anti-join must fill exactly
    // the gap — a (granule, bucket)-keyed join would see the bucket
    // "done" and lose the two rows forever.
    val partial = all.where(!(col("granule").contains("s1.nc") &&
      col("value") >= 4.0))
    assert(partial.count() === 10)
    val tmpStore = out + "_partial"
    partial.write.partitionBy("dataset", "time_bucket").parquet(tmpStore)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    org.apache.commons.io.FileUtils.moveDirectory(
      new java.io.File(tmpStore), new java.io.File(out))
    val ckpt3 = java.nio.file.Files.createTempDirectory("graft_swck3")
      .toFile.getAbsolutePath
    run(ckpt3) // replays both granules against the partial store
    val healed = spark.read.parquet(out)
    assert(healed.count() === 12, "replay must restore the missing rows")
    assert(healed.select("granule", "time", "latitude", "longitude")
      .distinct().count() === 12, "and introduce no duplicates")
  }

  test("granulePipeline(swath=true) replay restores a dropped sibling " +
    "of two points sharing (granule, time, lat, lon)") {
    import graft.streaming.StreamingIngest
    // one scan row: per-scan-row time, and pixels 0 and 2 COINCIDE in
    // geolocation with different values — (granule, time, lat, lon) is
    // the same key for both, only point_index tells them apart
    val granule = NetcdfClassic.write(NcFile(
      dims = Seq(NcDim("y", 1), NcDim("x", 3)),
      attrs = Nil,
      vars = Seq(
        NcVar("time", Seq("y"), NC_INT, Nil, Array(100.0)),
        NcVar("lat", Seq("y", "x"), NC_FLOAT, Nil, Array(1.0, 1.5, 1.0)),
        NcVar("lon", Seq("y", "x"), NC_FLOAT, Nil, Array(30.0, 30.5, 30.0)),
        NcVar("wind", Seq("y", "x"), NC_FLOAT, Nil, Array(5.0, 6.0, 7.0)))))
    val watch = java.nio.file.Files.createTempDirectory("graft_swsib").toFile
    val out = java.nio.file.Files.createTempDirectory("graft_swsibstore")
      .toFile.getAbsolutePath + "/points"
    def run(): Unit = {
      val ckpt = java.nio.file.Files.createTempDirectory("graft_swsibck")
        .toFile.getAbsolutePath
      val q = StreamingIngest.granulePipeline(spark, watch.getAbsolutePath,
        out, ckpt, "wind", "wind_swath", 30.0, 30.0, swath = true).start()
      q.awaitTermination()
    }
    java.nio.file.Files.write(
      new java.io.File(watch, "sib.nc").toPath, granule)
    run()
    val all = spark.read.parquet(out)
    assert(all.count() === 3)
    // partial commit persisted ONE of the two same-key siblings
    val partial = all.where(col("value") =!= 7.0)
    assert(partial.count() === 2)
    val tmpStore = out + "_partial"
    partial.write.partitionBy("dataset", "time_bucket").parquet(tmpStore)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    org.apache.commons.io.FileUtils.moveDirectory(
      new java.io.File(tmpStore), new java.io.File(out))
    run() // fresh checkpoint replays the granule against the partial store
    val healed = spark.read.parquet(out)
    // a coordinate-keyed anti-join would see value=5.0's key present
    // and silently drop the regenerated 7.0 sibling forever
    assert(healed.count() === 3, "replay must restore the same-key sibling")
    assert(healed.select("granule", "point_index").distinct().count() === 3)
    assert(healed.agg(sum(col("value"))).head.getDouble(0) === 18.0)
  }

  test("granulePipeline(swath=true) replays against a PRE-point_index " +
    "store via the legacy coordinate key instead of wedging") {
    import graft.streaming.StreamingIngest
    val granule = NetcdfClassic.write(NcFile(
      dims = Seq(NcDim("y", 1), NcDim("x", 3)),
      attrs = Nil,
      vars = Seq(
        NcVar("time", Seq("y"), NC_INT, Nil, Array(100.0)),
        NcVar("lat", Seq("y", "x"), NC_FLOAT, Nil, Array(1.0, 1.5, 2.0)),
        NcVar("lon", Seq("y", "x"), NC_FLOAT, Nil, Array(30.0, 30.5, 31.0)),
        NcVar("wind", Seq("y", "x"), NC_FLOAT, Nil, Array(5.0, 6.0, 7.0)))))
    val watch = java.nio.file.Files.createTempDirectory("graft_swleg").toFile
    val out = java.nio.file.Files.createTempDirectory("graft_swlegstore")
      .toFile.getAbsolutePath + "/points"
    def run(): Unit = {
      val ckpt = java.nio.file.Files.createTempDirectory("graft_swlegck")
        .toFile.getAbsolutePath
      val q = StreamingIngest.granulePipeline(spark, watch.getAbsolutePath,
        out, ckpt, "wind", "wind_swath", 30.0, 30.0, swath = true).start()
      q.awaitTermination()
    }
    java.nio.file.Files.write(
      new java.io.File(watch, "leg.nc").toPath, granule)
    run()
    // simulate a store written by the previous version: rewrite it
    // WITHOUT the point_index column
    val old = spark.read.parquet(out).drop("point_index")
    val tmp = out + "_old"
    old.write.partitionBy("dataset", "time_bucket").parquet(tmp)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    org.apache.commons.io.FileUtils.moveDirectory(
      new java.io.File(tmp), new java.io.File(out))
    run() // fresh checkpoint replays the granule against the legacy store
    val healed = spark.read.parquet(out)
    // legacy-key dedup: nothing duplicated, nothing lost, no exception
    assert(healed.count() === 3)
    assert(healed.select("granule", "time", "latitude", "longitude")
      .distinct().count() === 3)
  }

  test("swath granules decode per-pixel geolocation and per-scan time") {
    val nc = NcFile(
      dims = Seq(NcDim("y", 2), NcDim("x", 3)),
      attrs = Nil,
      vars = Seq(
        NcVar("time", Seq("y"), NC_INT, Nil, Array(100.0, 200.0)),
        NcVar("lat", Seq("y", "x"), NC_FLOAT, Nil,
          Array(1.0, 1.1, 1.2, 2.0, 2.1, 2.2)),
        NcVar("lon", Seq("y", "x"), NC_FLOAT, Nil,
          Array(30.0, 30.1, 30.2, 31.0, 31.1, 31.2)),
        NcVar("wind", Seq("y", "x"), NC_FLOAT, Nil,
          Array(5.0, 6.0, 7.0, 8.0, 9.0, 10.0))))
    val pts = GranuleIngest.swathPointsOf(nc, "s.nc", "wind").toSeq
    assert(pts.length === 6)
    assert(pts.count(_.time == 100L) === 3) // first scan line
    assert(pts.count(_.time == 200L) === 3)
    val p = pts.find(_.value == 9.0).get
    assert(p.latitude === 2.1 && p.time === 200L)
  }

  test("grid reader refuses 2-D coordinates (directs to swath path)") {
    val nc = NcFile(
      dims = Seq(NcDim("y", 1), NcDim("x", 1)),
      attrs = Nil,
      vars = Seq(
        NcVar("lat", Seq("y", "x"), NC_FLOAT, Nil, Array(0.0)),
        NcVar("lon", Seq("y", "x"), NC_FLOAT, Nil, Array(0.0)),
        NcVar("v", Seq("y", "x"), NC_FLOAT, Nil, Array(1.0))))
    val e = intercept[IllegalArgumentException] {
      GranuleIngest.gridPointsOf(nc, "bad.nc", "v").toSeq
    }
    assert(e.getMessage.contains("swathPoints"))
  }

  test("permuted-axis grids decode by dim identity, not position " +
    "(reference: callncpdq.py pre-permutes; here strides do it in place)") {
    // value laid out (lon, lat) — decoding with the (lat, lon)
    // assumption would transpose silently. data(lo, la) = lo*10 + la.
    val f2 = NcFile(
      dims = Seq(NcDim("lat", 2), NcDim("lon", 3)),
      attrs = Nil,
      vars = Seq(
        NcVar("lat", Seq("lat"), NC_DOUBLE, Nil, Array(10.0, 20.0)),
        NcVar("lon", Seq("lon"), NC_DOUBLE, Nil, Array(1.0, 2.0, 3.0)),
        NcVar("sst", Seq("lon", "lat"), NC_DOUBLE, Nil,
          Array(0.0, 1.0, 10.0, 11.0, 20.0, 21.0)))) // (lon, lat) order
    val pts = GranuleIngest.gridPointsOf(f2, "p.nc", "sst")
      .map(p => (p.latitude, p.longitude) -> p.value).toMap
    assert(pts((10.0, 1.0)) === 0.0)
    assert(pts((20.0, 1.0)) === 1.0)
    assert(pts((10.0, 3.0)) === 20.0)
    assert(pts((20.0, 3.0)) === 21.0)

    // 3-D (time, lon, lat) with a meta variable in the SAME permuted
    // layout: the multi-variable path must stay aligned
    val nT = 2
    def cell(t: Int, lo: Int, la: Int) = t * 100.0 + lo * 10 + la
    val data3 = Array.tabulate(nT * 3 * 2) { k =>
      val t = k / 6; val lo = (k / 2) % 3; val la = k % 2
      cell(t, lo, la)
    }
    val f3 = NcFile(
      dims = Seq(NcDim("time", nT), NcDim("lat", 2), NcDim("lon", 3)),
      attrs = Nil,
      vars = Seq(
        NcVar("time", Seq("time"), NC_DOUBLE, Nil, Array(0.0, 3600.0)),
        NcVar("lat", Seq("lat"), NC_DOUBLE, Nil, Array(10.0, 20.0)),
        NcVar("lon", Seq("lon"), NC_DOUBLE, Nil, Array(1.0, 2.0, 3.0)),
        NcVar("sst", Seq("time", "lon", "lat"), NC_DOUBLE, Nil, data3),
        NcVar("err", Seq("time", "lon", "lat"), NC_DOUBLE, Nil,
          data3.map(_ + 0.5))))
    val dir = java.nio.file.Files.createTempDirectory("graft_perm").toFile
    java.nio.file.Files.write(new java.io.File(dir, "g.nc").toPath,
      NetcdfClassic.write(f3))
    val rows = GranuleIngest.decodeFilesMulti(
        spark.read.format("binaryFile").load(dir.toString + "/*.nc"),
        "sst", Seq("err"))
      .collect()
      .map(r => (r.getAs[Long]("time"), r.getAs[Double]("latitude"),
        r.getAs[Double]("longitude")) ->
        (r.getAs[Double]("value"), r.getAs[Seq[Double]]("meta").head))
      .toMap
    assert(rows((3600L, 20.0, 3.0)) === ((cell(1, 2, 1), cell(1, 2, 1) + 0.5)))
    assert(rows((0L, 10.0, 1.0)) === ((0.0, 0.5)))
    assert(rows((0L, 10.0, 2.0)) === ((10.0, 10.5)))
  }

  test("pointTransform hooks the processor chain into batch AND streaming " +
    "ingest (kelvin->celsius + 0..360 lon wrap, processorchain.py role)") {
    import graft.functions.GeoFunctions
    val f = NcFile(
      dims = Seq(NcDim("time", 1), NcDim("lat", 2), NcDim("lon", 2)),
      attrs = Nil,
      vars = Seq(
        NcVar("time", Seq("time"), NC_INT, Nil, Array(86400.0)),
        NcVar("lat", Seq("lat"), NC_DOUBLE, Nil, Array(10.0, 20.0)),
        // 0..360 spellings: 350 must land at -10
        NcVar("lon", Seq("lon"), NC_DOUBLE, Nil, Array(10.0, 350.0)),
        NcVar("sst", Seq("time", "lat", "lon"), NC_DOUBLE, Nil,
          Array(283.15, 284.15, 285.15, 286.15)))) // kelvins
    val dir = java.nio.file.Files.createTempDirectory("graft_chain").toFile
    java.nio.file.Files.write(new java.io.File(dir, "g.nc").toPath,
      NetcdfClassic.write(f))
    def chain(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("value", GeoFunctions.kelvinToCelsius(col("value")))
      .withColumn("longitude", GeoFunctions.lonTo180(col("longitude")))
    val tiles = GranuleIngest.ingestGridGranules(spark,
      dir.toString + "/*.nc", "sst", "chain_ds", 30.0, 30.0,
      pointTransform = chain)
    assert(tiles.agg(max("stats_max")).head.getDouble(0) === 13.0)
    assert(tiles.agg(min("min_lon")).head.getDouble(0) === -10.0)
    // streaming path applies the SAME transform
    val out = java.nio.file.Files.createTempDirectory("graft_chain_out")
      .toFile.getAbsolutePath + "/tiles"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_chain_ck")
      .toFile.getAbsolutePath
    val q = graft.streaming.StreamingIngest.granulePipeline(spark,
      dir.getAbsolutePath, out, ckpt, "sst", "chain_stream", 30.0, 30.0,
      pointTransform = chain).start()
    q.awaitTermination()
    val st = spark.read.parquet(out)
    assert(st.agg(max("stats_max")).head.getDouble(0) === 13.0)
    assert(st.agg(min("min_lon")).head.getDouble(0) === -10.0)
  }
}
