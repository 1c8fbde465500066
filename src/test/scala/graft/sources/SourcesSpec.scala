package graft.sources

import graft.SparkSpec
import graft.functions.Wkt
import org.apache.spark.sql.functions._

class SourcesSpec extends SparkSpec {

  test("Wkt parses polygons and ray-casts containment") {
    val sq = Wkt.parsePolygon("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    assert(sq.length === 5)
    assert(Wkt.contains(sq, 5, 5))
    assert(!Wkt.contains(sq, 15, 5))
    assert(!Wkt.contains(sq, -1, -1))
    // concave polygon (notch): point inside the notch is outside
    val notch = Wkt.parsePolygon("POLYGON ((0 0, 10 0, 10 10, 5 5, 0 10, 0 0))")
    assert(!Wkt.contains(notch, 5, 8))
    assert(Wkt.contains(notch, 2, 2))
    assert(Wkt.bbox(sq) === ((0.0, 10.0, 0.0, 10.0)))
  }

  test("containsCol filters a DataFrame by polygon") {
    import spark.implicits._
    val df = Seq((1L, 5.0, 5.0), (2L, 15.0, 5.0)).toDF("id", "x", "y")
    val in = df.where(Wkt.containsCol("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))",
      $"x", $"y")).select("id").as[Long].collect()
    assert(in.toSeq === Seq(1L))
  }

  test("ResultsStore writes/reads execution-partitioned results") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_results").toString
    ResultsStore.write(Seq((1, "a"), (2, "b")).toDF("k", "v"), path, "exec1")
    ResultsStore.write(Seq((3, "c")).toDF("k", "v"), path, "exec2")
    assert(ResultsStore.read(spark, path, "exec1").count() === 2)
    assert(ResultsStore.read(spark, path, "exec2").count() === 1)
    assert(ResultsStore.listExecutions(spark, path).count() === 2)
    assert(ResultsStore.read(spark, path, "exec1")
      .select("execution_id").distinct().as[String].collect().toSeq === Seq("exec1"))
    // an unknown id is a loud TYPED error (404 at the serving layer),
    // never a silent empty frame
    intercept[NotFoundException] {
      ResultsStore.read(spark, path, "nope")
    }
  }

  test("ResultsStore.read rejects path-traversal ids and neither lists " +
    "nor reads uncommitted execution dirs") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_results_tr").toString
    ResultsStore.write(Seq((1, "a")).toDF("k", "v"), path, "real")
    // the id arrives from an HTTP param — '../' must never resolve
    val e = intercept[IllegalArgumentException] {
      ResultsStore.read(spark, path, "real/../../..")
    }
    assert(e.getMessage.contains("directory-safe"))
    // an in-flight/crashed write: dir exists but holds only staging
    val ghost = java.nio.file.Paths.get(path, "execution_id=ghost", "_temporary")
    java.nio.file.Files.createDirectories(ghost.getParent)
    java.nio.file.Files.write(ghost, Array[Byte](1))
    assert(ResultsStore.listExecutions(spark, path)
      .as[String].collect().toSeq === Seq("real"))
    // uncommitted ⇒ the resource does not exist yet: NotFound, while
    // the traversal reject above stays the malformed-request class
    intercept[NotFoundException] {
      ResultsStore.read(spark, path, "ghost")
    }
  }

  test("ResultsStore round-trips all-digit ids with leading zeros") {
    import spark.implicits._
    // partition-type inference on the root would type execution_id as
    // int and read '0123' back as 123 — path addressing must not
    val path = java.nio.file.Files.createTempDirectory("graft_results0").toString
    ResultsStore.write(Seq((1, "a")).toDF("k", "v"), path, "0123")
    ResultsStore.write(Seq((2, "b")).toDF("k", "v"), path, "123")
    assert(ResultsStore.read(spark, path, "0123")
      .select("v").as[String].collect().toSeq === Seq("a"))
    assert(ResultsStore.read(spark, path, "123")
      .select("v").as[String].collect().toSeq === Seq("b"))
    assert(ResultsStore.listExecutions(spark, path)
      .as[String].collect().toSet === Set("0123", "123"))
  }

  test("Merge.upsert classifies insert/update/keep and survives NULL values") {
    import spark.implicits._
    val base = Seq((1L, Some(10.0), "a"), (2L, None, "b"), (3L, Some(30.0), "c"))
      .toDF("k", "price", "status")
    val upd = Seq((2L, Some(22.0), "b2"), (4L, None, "d"))
      .toDF("k", "price", "status")
    val out = Merge.upsert(base, upd, "k").orderBy("k")
      .as[(Long, Option[Double], String, String)].collect().toSeq
    assert(out === Seq(
      (1L, Some(10.0), "a", "keep"),
      (2L, Some(22.0), "b2", "update"), // base price NULL, still "update"
      (3L, Some(30.0), "c", "keep"),
      (4L, None, "d", "insert")))      // inserted row with NULL value
    // idempotency: re-applying the same batch changes nothing but op
    val again = Merge.upsert(
      Merge.upsert(base, upd, "k").drop("op"), upd, "k")
      .orderBy("k").drop("op")
      .as[(Long, Option[Double], String)].collect().toSeq
    assert(again === out.map(t => (t._1, t._2, t._3)))
  }

  test("Encoders emit JSON lines and CSV") {
    import spark.implicits._
    val df = Seq((1, "x"), (2, "y")).toDF("k", "v")
    val json = Encoders.toJsonLines(df).as[String].collect().sorted
    assert(json(0) === """{"k":1,"v":"x"}""")
    val path = java.nio.file.Files.createTempDirectory("graft_csv").toString
    Encoders.writeCsv(df, path)
    val back = spark.read.option("header", "true").csv(path)
    assert(back.count() === 2)
    assert(back.columns.toSeq === Seq("k", "v"))
  }

  test("Encoders.toNetcdf round-trips numeric result columns") {
    import spark.implicits._
    val df = Seq((1L, 1.5, "a"), (2L, Double.NaN, "b"), (3L, -0.25, "c"))
      .toDF("id", "score", "label")
    val nc = NetcdfClassic.read(Encoders.toNetcdf(df))
    assert(nc.dim("row").get.length === 3)
    assert(nc.variable("id").get.ncType === NetcdfClassic.NC_INT)
    assert(nc.variable("id").get.data.toSeq === Seq(1.0, 2.0, 3.0))
    val sc = nc.variable("score").get.data
    assert(sc(0) === 1.5 && sc(1).isNaN && sc(2) === -0.25)
    assert(nc.variable("label").isEmpty) // strings go to JSON/CSV
  }

  test("Encoders.toZip bundles readable entries") {
    import spark.implicits._
    val df = Seq((1, "x,with comma")).toDF("k", "v")
    val zip = Encoders.toZip(Seq(
      "data.csv" -> Encoders.toCsvBytes(df),
      "data.nc" -> Encoders.toNetcdf(df)))
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(zip))
    val entries = Iterator.continually(zin.getNextEntry)
      .takeWhile(_ != null)
      .map(e => e.getName -> new String(zin.readAllBytes(), "UTF-8"))
      .toMap
    assert(entries.keySet === Set("data.csv", "data.nc"))
    assert(entries("data.csv") === "k,v\n1,\"x,with comma\"\n")
    assert(entries("data.nc").startsWith("CDF"))
  }

  test("Encoders.toPng renders a grid with jet colormap, NaN transparent") {
    import spark.implicits._
    // 3 lons × 2 lats; (2,20) has a NaN value; (1,10) is ABSENT
    val df = Seq(
      (0.0, 10.0, 0.0), (1.0, 10.0, 5.0), (2.0, 10.0, 2.5),
      (0.0, 20.0, 1.0), (2.0, 20.0, Double.NaN))
      .toDF("lon", "lat", "mean")
    val png = Encoders.toPng(df, "lon", "lat", "mean", scale = 1)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img.getWidth === 3 && img.getHeight === 2)
    // lat=10 is the BOTTOM row (y=1): min value 0.0 → jet(0) = deep blue
    assert(img.getRGB(0, 1) === 0xff000080)
    // max value 5.0 → jet(1) = deep red
    assert(img.getRGB(1, 1) === 0xff800000)
    // mid value 2.5 → jet(0.5) = r 0.5·? : exact from the formula
    assert(img.getRGB(2, 1) === Encoders.jetArgb(0.5))
    // NaN cell and missing cell are fully transparent
    assert((img.getRGB(2, 0) >>> 24) === 0)
    assert((img.getRGB(1, 0) >>> 24) === 0)
    // scale=4 blows each cell up to a 4×4 block
    val big = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      Encoders.toPng(df, "lon", "lat", "mean", scale = 4)))
    assert(big.getWidth === 12 && big.getHeight === 8)
    assert(big.getRGB(3, 7) === 0xff000080) // same cell, corner pixel
  }

  test("Encoders.toPngAuto picks latitude/longitude/mean columns") {
    import spark.implicits._
    val df = Seq((10.0, 0.0, 7L, 3.25), (10.0, 1.0, 7L, 4.25))
      .toDF("latitude", "longitude", "cnt", "mean")
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      Encoders.toPngAuto(df, scale = 1)))
    assert(img.getWidth === 2 && img.getHeight === 1)
    assert(img.getRGB(0, 0) === Encoders.jetArgb(0.0)) // mean, not cnt
    assert(img.getRGB(1, 0) === Encoders.jetArgb(1.0))
  }

  test("Encoders.toPngSeries draws polylines, breaks at NaN, labels axes") {
    import spark.implicits._
    // series a: flat line at 5 with a NaN gap at t=2; series b: ramp
    val df = Seq(
      (0.0, Some(5.0), 0.0), (1.0, Some(5.0), 2.0),
      (2.0, None, 4.0), (3.0, Some(5.0), 6.0), (4.0, Some(5.0), 8.0))
      .toDF("time", "a", "b")
    val png = Encoders.toPngSeries(df, "time", Seq("a", "b"),
      width = 400, height = 200)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img.getWidth === 400 && img.getHeight === 200)
    def countColor(argb: Int): Int =
      (for (x <- 0 until img.getWidth; y <- 0 until img.getHeight
            if img.getRGB(x, y) == argb) yield 1).sum
    val Array(ca, cb) = Encoders.seriesColors.take(2)
    // both series drew something (legend swatch alone is ~20 px)
    assert(countColor(ca) > 40, "series a line missing")
    assert(countColor(cb) > 40, "series b line missing")
    // background stays white and the frame is black
    assert(img.getRGB(0, 0) === 0xffffffff)
    // series a is flat at y=5: its non-legend pixels share ONE y row;
    // the NaN gap leaves the t∈(1,3) interior of that row unpainted
    val aPix = for (x <- 0 until img.getWidth; y <- 0 until img.getHeight
                    if img.getRGB(x, y) == ca) yield (x, y)
    val lineRow = aPix.groupBy(_._2).maxBy(_._2.size)._1
    val rowXs = aPix.filter(_._2 == lineRow).map(_._1)
    // gap: no series-a pixels strictly between the x of t=1 and t=3
    // (margins: ml=70, pw=315, x domain 0..4)
    def pxOf(t: Double) = 70 + ((t / 4.0) * 315).round.toInt
    assert(!rowXs.exists(x => x > pxOf(1.2) && x < pxOf(2.8)),
      "NaN gap was painted over")
    // the flat segments on both sides of the gap exist
    assert(rowXs.exists(_ < pxOf(0.9)) && rowXs.exists(_ > pxOf(3.1)))
  }

  test("seriesAxes prefers derived mean columns over min/max/std") {
    import spark.implicits._
    val df = Seq((0L, 1.0, 0.5, 2.0, 0.1, 5L, 0.9, 1.1))
      .toDF("day_start", "mean", "min", "max", "std", "cnt",
        "mean_seasonal", "mean_lowpass")
    val (x, ys) = Encoders.seriesAxes(df)
    assert(x === "day_start")
    assert(ys === Seq("mean", "mean_seasonal", "mean_lowpass", "min"))
  }

  test("a single-point series still paints its point") {
    import spark.implicits._
    val df = Seq((0.0, 7.0)).toDF("time", "v")
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      Encoders.toPngSeries(df, "time", Seq("v"), width = 200, height = 100)))
    val c0 = Encoders.seriesColors(0)
    val pix = for (x <- 0 until 200; y <- 0 until 100
                   if img.getRGB(x, y) == c0) yield (x, y)
    // legend swatch row (y = mt+10) plus the data point itself
    assert(pix.exists(_._2 > 30), s"no data point painted: $pix")
  }

  test("Encoders.toPngSeriesAuto prefers the time-like x column") {
    import spark.implicits._
    val df = Seq((0.0, 1.0, 10.0), (1.0, 2.0, 20.0), (2.0, 3.0, 30.0))
      .toDF("mean", "time", "cnt")
    // must pick x=time (not first column "mean") and plot the others
    val png = Encoders.toPngSeriesAuto(df, width = 300, height = 150)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img.getWidth === 300 && img.getHeight === 150)
    val present = Encoders.seriesColors.take(2).map { c =>
      (for (x <- 0 until img.getWidth; y <- 0 until img.getHeight
            if img.getRGB(x, y) == c) yield 1).sum
    }
    assert(present.forall(_ > 20), "expected two plotted series")
  }

  test("ResultsStore: CONCURRENT writes to distinct executions both land") {
    import spark.implicits._
    // each execution writes into its own partition directory, so two
    // concurrent Spark write jobs never share a _temporary staging dir
    // (shared-root partitionBy writes did — the first job's commit
    // cleanup deleted the other's in-flight task files)
    val path = java.nio.file.Files.createTempDirectory("graft_conc").toString
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val ts = (1 to 4).map { i =>
      val t = new Thread(() => {
        try ResultsStore.write(
          (1 to 50).map(k => (k, s"v$i")).toDF("k", "v"), path, s"exec$i")
        catch { case e: Throwable => errs.add(e); () }
      })
      t.start(); t
    }
    ts.foreach(_.join())
    assert(errs.isEmpty, s"concurrent write failed: ${errs.peek()}")
    (1 to 4).foreach { i =>
      assert(ResultsStore.read(spark, path, s"exec$i").count() === 50, s"exec$i")
    }
    assert(ResultsStore.listExecutions(spark, path).count() === 4)
  }

  test("toNetcdf on an EMPTY result is a valid file, not a 500") {
    import spark.implicits._
    // CDF classic encodes dim length 0 as "the record dimension", so an
    // empty result must not emit a 0-length fixed dim — it emits a
    // variable-less file with a rows=0 marker instead
    val df = Seq((1L, 1.5)).toDF("id", "score").where($"id" < 0)
    val nc = NetcdfClassic.read(Encoders.toNetcdf(df))
    assert(nc.vars.isEmpty)
    assert(nc.attrs.exists(a => a.name == "rows" && a.text == "0"))
    // and the writer refuses an explicit 0-length fixed dim loudly
    val e = intercept[IllegalArgumentException] {
      NetcdfClassic.write(NetcdfClassic.NcFile(
        Seq(NetcdfClassic.NcDim("row", 0)), Nil,
        Seq(NetcdfClassic.NcVar("x", Seq("row"), NetcdfClassic.NC_DOUBLE,
          Nil, Array.empty[Double]))))
    }
    assert(e.getMessage.contains("length 0"))
  }

  test("toNetcdf carries byte and decimal columns as numeric variables") {
    import spark.implicits._
    val df = Seq((1.toByte, BigDecimal("2.50")), (2.toByte, BigDecimal("3.25")))
      .toDF("flag", "price")
    val nc = NetcdfClassic.read(Encoders.toNetcdf(df))
    assert(nc.variable("flag").get.data.toSeq === Seq(1.0, 2.0))
    assert(nc.variable("price").get.data.toSeq === Seq(2.5, 3.25))
  }

  test("toPngAuto never resolves two axes to the same column") {
    import spark.implicits._
    val df = Seq((0.0, 1.0, 5.0), (1.0, 2.0, 6.0), (2.0, 1.0, 7.0))
      .toDF("lat", "lon", "mean")
    // pngx=lat takes the y-default's column: y must skip "lat" (taken)
    // and fall through to lon, not plot lat against itself
    val bytes = Encoders.toPngAuto(df, xCol = Some("lat"))
    assert(bytes.nonEmpty)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    // lat has 3 distinct values, lon 2: x=lat,y=lon ⇒ 24x16 at scale 8;
    // the broken x==y resolution gave a square 24x24 diagonal
    assert(img.getWidth === 24 && img.getHeight === 16,
      s"got ${img.getWidth}x${img.getHeight}")
  }

  test("toPngSeries drops non-finite x instead of collapsing the scale") {
    import spark.implicits._
    val df = Seq((Double.NaN, 1.0), (0.0, 1.0), (10.0, 2.0))
      .toDF("t", "mean")
    val bytes = Encoders.toPngSeries(df, "t", Seq("mean"), width = 200, height = 100)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    // with the NaN row poisoning xs.max the x-scale collapsed to
    // [0, 1] and the x=10 point fell off-canvas; a drawn polyline
    // reaching the right plot edge proves the full span is in frame
    // probe: any series-colored pixel in the right third of the image
    val right = for {
      x <- (img.getWidth * 2 / 3) until img.getWidth
      y <- 0 until img.getHeight
      if img.getRGB(x, y) == Encoders.seriesColors(0)
    } yield (x, y)
    assert(right.nonEmpty, "no series pixels in the right third of the plot")
  }

  test("PNG encoders bound caller-supplied dimensions (driver-OOM guard)") {
    import spark.implicits._
    val grid = Seq((0.0, 0.0, 1.0), (1.0, 1.0, 2.0)).toDF("lon", "lat", "mean")
    val e1 = intercept[IllegalArgumentException] {
      Encoders.toPng(grid, "lon", "lat", "mean", scale = 1000000)
    }
    assert(e1.getMessage.contains("1.." + Encoders.MaxPngEdge))
    val series = Seq((0.0, 1.0), (1.0, 2.0)).toDF("t", "mean")
    val e2 = intercept[IllegalArgumentException] {
      Encoders.toPngSeries(series, "t", Seq("mean"), width = 2000000000)
    }
    assert(e2.getMessage.contains("pngw"))
  }
}
