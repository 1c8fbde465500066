package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** "This resource does not exist" — distinct from a malformed request
  * so the serving layer can answer 404 where the reference does
  * (webmodel.py:60: DatasetNotFoundException carries code=404, vs the
  * generic processing exception's 400/500). Thrown for an unknown
  * execution id ([[ResultsStore.read]]) and an unknown dataset
  * (Handlers /domsmetadata); everything else stays a 400.
  */
final class NotFoundException(msg: String) extends RuntimeException(msg)

/** S8 — results persistence (the reference's Cassandra `doms_data`
  * store, algorithms/doms/ResultsStorage.py:58-174): execution-keyed
  * partitioned parquet, so retrieval by execution id is partition
  * pruning, and concurrent executions never conflict (append by
  * distinct partition value).
  */
object ResultsStore {

  /** Append one execution's rows. Writes DIRECTLY into the execution's
    * own hive-style partition directory rather than `partitionBy` into
    * the shared root: concurrent Spark jobs writing the same output
    * root share `<root>/_temporary`, and the first job's commit
    * cleanup deletes it wholesale — destroying the other execution's
    * in-flight task files. One directory per execution gives each
    * write its own staging area, making the documented "concurrent
    * executions never conflict" contract actually hold. Readers
    * recover `execution_id` through partition discovery on the root.
    */
  def write(results: DataFrame, path: String, executionId: String): Unit = {
    require(executionId.matches("[A-Za-z0-9_-]+"),
      s"execution id must be directory-safe, got '$executionId'")
    results.write.mode("append").parquet(s"$path/execution_id=$executionId")
  }

  /** Read one execution's rows by opening its partition DIRECTORY
    * directly. Reading the root and filtering on the inferred
    * `execution_id` column silently loses all-digit ids with leading
    * zeros: partition inference types the column int, '0123' becomes
    * 123, and a cast-to-string filter compares '123' ≠ '0123' → empty.
    * Path addressing sidesteps inference entirely — the id is matched
    * as the literal directory name the write created. A missing id is
    * a loud error (the reference 404s an unknown execution), never a
    * silent empty frame.
    */
  def read(spark: SparkSession, path: String, executionId: String): DataFrame = {
    // the SAME directory-safe validation as write: the id reaches this
    // point straight from an HTTP query param and is spliced into a
    // filesystem path — without the check, 'X/../../<anywhere>'
    // resolves OUTSIDE the results root and any parquet directory on
    // the host becomes readable over the results endpoint
    require(executionId.matches("[A-Za-z0-9_-]+"),
      s"execution id must be directory-safe, got '$executionId'")
    val dir = new org.apache.hadoop.fs.Path(s"$path/execution_id=$executionId")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // typed, not require: an unknown id is a 404 at the serving layer
    // (the reference 404s an unknown execution), while the malformed-id
    // require above stays a 400 — the two failure classes must not
    // collapse into one status
    if (!(fs.exists(dir) && hasDataFile(fs, dir)))
      throw new NotFoundException(s"no results for execution id '$executionId'")
    spark.read.parquet(dir.toString)
      .withColumn("execution_id", lit(executionId))
  }

  /** A directory counts as a committed execution only once at least
    * one non-hidden data file exists — an in-flight write's
    * `_temporary` staging or a crashed write's empty dir must neither
    * list nor read (the pre-r12 partition-discovery listing skipped
    * them too; advertising an id whose read then fails with a schema
    * error is worse than omitting it).
    */
  private def hasDataFile(fs: org.apache.hadoop.fs.FileSystem,
                          dir: org.apache.hadoop.fs.Path): Boolean =
    fs.listStatus(dir).exists { f =>
      val n = f.getPath.getName
      f.isFile && !n.startsWith("_") && !n.startsWith(".")
    }

  /** Executions are the child directory names — listed from the
    * filesystem, not via partition discovery, for the same
    * leading-zero-id reason as [[read]].
    */
  def listExecutions(spark: SparkSession, path: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ids =
      if (!fs.exists(root)) Seq.empty[String]
      else fs.listStatus(root).toSeq
        // name filter FIRST: hasDataFile costs one listStatus RPC per
        // dir — stray non-execution dirs (_claims etc.) shouldn't pay
        .filter(d => d.isDirectory &&
          d.getPath.getName.startsWith("execution_id="))
        .filter(d => hasDataFile(fs, d.getPath))
        .map(_.getPath.getName.stripPrefix("execution_id="))
    import spark.implicits._
    ids.toDF("execution_id")
  }
}

/** S11 — MERGE-style upsert (beyond the reference, which rewrites whole
  * granules at ingest): apply a changes batch to a snapshot by key —
  * matched rows take the update's values, unmatched updates insert,
  * everything else carries over. One full-outer join on the key; at
  * 100 TB the changes batch is usually dimension-sized, so it
  * broadcasts and the snapshot never shuffles. The op column makes the
  * result self-auditing (and is what an incremental-ingest pipeline
  * writes to its change log).
  */
object Merge {

  /** Upsert `updates` into `base` on `key`. Both frames must share the
    * same schema. Returns base's columns plus `op` ∈ {insert, update,
    * keep}. Presence is tracked with explicit marker columns, so NULLs
    * in the data never masquerade as "row absent".
    */
  def upsert(base: DataFrame, updates: DataFrame, key: String): DataFrame = {
    val valueCols = base.columns.filterNot(_ == key).toSeq
    val b = valueCols.foldLeft(base)((d, c) => d.withColumnRenamed(c, s"__b_$c"))
      .withColumn("__in_b", lit(true))
    val u = valueCols.foldLeft(updates)((d, c) => d.withColumnRenamed(c, s"__u_$c"))
      .withColumn("__in_u", lit(true))
    val merged = valueCols.map { c =>
      when(col("__in_u"), col(s"__u_$c")).otherwise(col(s"__b_$c")).as(c)
    }
    val op = when(col("__in_b").isNull, "insert")
      .when(col("__in_u").isNull, "keep")
      .otherwise("update").as("op")
    b.join(u, Seq(key), "full_outer")
      .select(col(key) +: merged :+ op: _*)
  }
}

/** S9 — output encoders: JSON/CSV (webmodel.py:425-431,
  * BaseDomsHandler.py:87-242), NetCDF via the classic codec
  * (BaseDomsHandler.py:243-334 emits matchup results as NetCDF), and
  * ZIP bundling for subset downloads (subsetter.py:203-232). PNG map
  * rendering stays presentation-scope (SURVEY §7.3).
  *
  * NetCDF/ZIP encode COLLECTED results on the driver — these are the
  * reference's result-download formats, produced after the distributed
  * query has already reduced to a result table (the same place the
  * reference's handlers call the netCDF library on an in-memory
  * array). Distributed writes stay parquet/JSON/CSV.
  */
object Encoders {

  /** JSON-lines encoding of any result frame (toJSON is distributed). */
  def toJsonLines(df: DataFrame): DataFrame = df.toJSON.toDF("json")

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** Encode a result frame as a classic NetCDF file: one `row`
    * dimension, one variable per numeric column (doubles; integral
    * columns as NC_INT when they fit), string columns skipped (CDF
    * classic has no 1-D string type short of a char matrix — they go
    * in the JSON/CSV renditions). Column order is preserved.
    */
  def toNetcdf(df: DataFrame): Array[Byte] = {
    import NetcdfClassic._
    val rows = df.collect()
    if (rows.isEmpty)
      // CDF classic cannot express a 0-length FIXED dimension (a zero
      // dim length in the header designates the record dimension, which
      // the writer doesn't emit) — an empty result is a valid file with
      // no variables and an explicit rows=0 marker, not a 500
      return NetcdfClassic.write(NcFile(Nil,
        Seq(NcAttr("source", NC_CHAR, text = "graft"),
          NcAttr("rows", NC_CHAR, text = "0")), Nil))
    val dim = NcDim("row", rows.length)
    val schema = df.schema
    val vars = schema.fields.zipWithIndex.flatMap { case (f, i) =>
      f.dataType match {
        case org.apache.spark.sql.types.DoubleType |
             org.apache.spark.sql.types.FloatType |
             (_: org.apache.spark.sql.types.DecimalType) =>
          // decimals ride the double variable (java.math.BigDecimal is
          // a Number) — the JSON/CSV renditions keep full precision
          Some(NcVar(f.name, Seq("row"), NC_DOUBLE, Nil,
            rows.map(r => if (r.isNullAt(i)) Double.NaN
              else r.get(i).asInstanceOf[Number].doubleValue())))
        case org.apache.spark.sql.types.LongType |
             org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.ShortType |
             org.apache.spark.sql.types.ByteType =>
          val vs = rows.map(r => if (r.isNullAt(i)) Double.NaN
            else r.get(i).asInstanceOf[Number].doubleValue())
          // a NULL cell needs NaN, which an int variable can't carry —
          // NC_INT would silently encode it as 0; fall to NC_DOUBLE
          val t = if (vs.exists(_.isNaN)) NC_DOUBLE
            else if (vs.forall(v => v >= Int.MinValue && v <= Int.MaxValue)) NC_INT
            else NC_DOUBLE
          Some(NcVar(f.name, Seq("row"), t, Nil, vs))
        case _ => None // strings/arrays: JSON/CSV renditions carry them
      }
    }
    NetcdfClassic.write(NcFile(Seq(dim),
      Seq(NcAttr("source", NC_CHAR, text = "graft")), vars.toSeq))
  }

  /** Bundle named byte entries into one ZIP (java.util.zip — the
    * `/domssubset` download format, subsetter.py:203-232).
    */
  def toZip(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    entries.foreach { case (name, bytes) =>
      z.putNextEntry(new java.util.zip.ZipEntry(name))
      z.write(bytes)
      z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }

  /** Render a gridded result as a color-mapped PNG heatmap — the
    * reference's map images (plotting.py:40-220 `pcolormesh`/`imshow`
    * with `cm.jet`, served by TimeSeriesSpark.py:364-474-style
    * `toImage`). Pure JDK: `BufferedImage` + `javax.imageio` — no
    * imaging dependency.
    *
    * The raster is defined by the DISTINCT sorted values of `xCol`
    * (ascending, left→right) and `yCol` (ascending, bottom→top, map
    * convention — row 0 of the image is the max y). Values normalize
    * min→max onto a jet colormap; cells with no row or a NULL/NaN
    * value are fully transparent (matplotlib's masked-array behavior).
    * `scale` upsamples each cell to a scale×scale pixel block so
    * coarse grids remain legible.
    *
    * Driver-side on a collected result, like toNetcdf — maps are
    * result-shaped (one row per grid cell), never data-shaped.
    */
  /** Hard ceiling on any rendered image edge: caller parameters reach
    * this layer straight from HTTP query params (`pngscale`, `pngw`,
    * `pngh`), and an unbounded BufferedImage allocation is a one-
    * request driver OOM. 16384² ARGB is ~1 GiB — already generous.
    */
  val MaxPngEdge: Int = 16384

  private def boundEdge(what: String, v: Long): Int = {
    // Long so a cells×scale product can't Int-wrap past the check
    require(v > 0 && v <= MaxPngEdge,
      s"$what must be in 1..$MaxPngEdge, got $v")
    v.toInt
  }

  def toPng(df: DataFrame, xCol: String, yCol: String, valueCol: String,
            scale: Int = 8): Array[Byte] = {
    require(scale > 0, s"pngscale must be positive, got $scale")
    val rows = df.select(xCol, yCol, valueCol).collect()
    val cell = rows.flatMap { r =>
      if (r.isNullAt(0) || r.isNullAt(1)) None
      else {
        val v = if (r.isNullAt(2)) Double.NaN
          else r.get(2).asInstanceOf[Number].doubleValue()
        Some((r.get(0).asInstanceOf[Number].doubleValue(),
          r.get(1).asInstanceOf[Number].doubleValue()) -> v)
      }
    }.toMap
    val xs = cell.keys.map(_._1).toArray.distinct.sorted
    val ys = cell.keys.map(_._2).toArray.distinct.sorted
    require(xs.nonEmpty && ys.nonEmpty, s"no plottable rows in ($xCol,$yCol)")
    val finite = cell.values.filter(v => !v.isNaN && !v.isInfinite)
    val (lo, hi) =
      if (finite.isEmpty) (0.0, 1.0) else (finite.min, finite.max)
    val span = if (hi > lo) hi - lo else 1.0
    val img = new java.awt.image.BufferedImage(
      boundEdge("png width (cells*pngscale)", xs.length.toLong * scale),
      boundEdge("png height (cells*pngscale)", ys.length.toLong * scale),
      java.awt.image.BufferedImage.TYPE_INT_ARGB)
    for (xi <- xs.indices; yi <- ys.indices) {
      val argb = cell.get((xs(xi), ys(yi))) match {
        case Some(v) if !v.isNaN && !v.isInfinite =>
          jetArgb((v - lo) / span)
        case _ => 0 // transparent: missing cell or NaN value
      }
      val py0 = (ys.length - 1 - yi) * scale // max y at the top
      for (dx <- 0 until scale; dy <- 0 until scale)
        img.setRGB(xi * scale + dx, py0 + dy, argb)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Line-series palette (matplotlib tab10 front four), exposed so
    * specs can pixel-assert exact colors.
    */
  val seriesColors: Array[Int] = Array(
    0xff1f77b4, 0xffff7f0e, 0xff2ca02c, 0xffd62728)

  /** Render 1-D series as a line-plot PNG — the reference's
    * time-series images (TimeSeriesSpark.py:364-474: matplotlib line
    * plot, time on x, one line per series, grid + legend). Pure JDK
    * Graphics2D, no antialiasing so colors are pixel-exact.
    *
    * Rows sort ascending by `xCol`; each of `yCols` draws one polyline
    * in `seriesColors` order. A NULL/NaN y breaks the line at that x
    * (matplotlib's masked-gap behavior). Plot area has a white
    * background, black frame, light-gray grid at 5 ticks per axis with
    * numeric labels, and a legend line per series. Driver-side on a
    * collected result, like toPng — series are result-shaped.
    */
  def toPngSeries(df: DataFrame, xCol: String, yCols: Seq[String],
                  width: Int = 800, height: Int = 400,
                  style: String = "line"): Array[Byte] = {
    require(yCols.nonEmpty, "toPngSeries needs at least one y column")
    boundEdge("pngw", width.toLong)
    boundEdge("pngh", height.toLong)
    val rows = df.select((xCol +: yCols).map(org.apache.spark.sql.functions.col): _*)
      .collect()
      // a NaN x would poison xs.max (NaN sorts HIGHEST under the total
      // ordering), collapsing the x scale to [min, min+1] and drawing
      // every real point off-canvas — drop non-finite x like null x
      .filter(r => !r.isNullAt(0) && {
        val x = r.get(0).asInstanceOf[Number].doubleValue()
        !x.isNaN && !x.isInfinite
      })
      .map(r => (r.get(0).asInstanceOf[Number].doubleValue(),
        yCols.indices.map(i => if (r.isNullAt(i + 1)) Double.NaN
          else r.get(i + 1).asInstanceOf[Number].doubleValue())))
      .sortBy(_._1)
    require(rows.nonEmpty, s"no plottable rows for x=$xCol")
    val xs = rows.map(_._1)
    val finite = rows.flatMap(_._2).filter(v => !v.isNaN && !v.isInfinite)
    val (ylo, yhi) = if (finite.isEmpty) (0.0, 1.0) else (finite.min, finite.max)
    val ypad = if (yhi > ylo) (yhi - ylo) * 0.05 else 0.5
    val (y0, y1) = (ylo - ypad, yhi + ypad)
    val (x0, x1) = (xs.min, if (xs.max > xs.min) xs.max else xs.min + 1.0)
    val (ml, mr, mt, mb) = (70, 15, 12, 35) // margins: left/right/top/bottom
    val (pw, ph) = (width - ml - mr, height - mt - mb)
    // inset the data area one pixel inside the frame so extreme values
    // (including a lone point at the axis minimum) aren't overdrawn by
    // the black border
    def px(x: Double) = ml + 1 + ((x - x0) / (x1 - x0) * (pw - 2)).round.toInt
    def py(y: Double) = mt + 1 + ((y1 - y) / (y1 - y0) * (ph - 2)).round.toInt
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_ARGB)
    val g = img.createGraphics()
    try {
      g.setColor(java.awt.Color.WHITE)
      g.fillRect(0, 0, width, height)
      // grid + tick labels at 5 even divisions per axis
      g.setFont(new java.awt.Font(java.awt.Font.SANS_SERIF, 0, 10))
      for (i <- 0 to 5) {
        val gx = ml + pw * i / 5
        val gy = mt + ph * i / 5
        g.setColor(new java.awt.Color(0xdd, 0xdd, 0xdd))
        g.drawLine(gx, mt, gx, mt + ph)
        g.drawLine(ml, gy, ml + pw, gy)
        g.setColor(java.awt.Color.BLACK)
        val xv = x0 + (x1 - x0) * i / 5
        val yv = y1 - (y1 - y0) * i / 5
        // trim trailing zeros only after a decimal point — %.6g of a
        // round integer (e.g. 120000) has none, and stripping ITS zeros
        // would corrupt the label
        def lbl(v: Double): String = {
          val s = f"$v%.6g"
          if (s.contains('.') && !s.exists(c => c == 'e' || c == 'E'))
            s.replaceAll("0+$", "").stripSuffix(".")
          else s
        }
        g.drawString(lbl(xv), gx - 15, mt + ph + 14)
        g.drawString(lbl(yv), 4, gy + 4)
      }
      // series polylines; NaN breaks the segment chain
      for ((name, si) <- yCols.zipWithIndex) {
        g.setColor(new java.awt.Color(seriesColors(si % seriesColors.length), true))
        var prev: Option[(Int, Int)] = None
        for ((x, vs) <- rows) {
          val v = vs(si)
          if (v.isNaN || v.isInfinite) prev = None
          else {
            val p = (px(x), py(v))
            // "points" (the /domsplot scatter style) draws 3×3 markers
            // with no connecting segments (matplotlib scatter)
            if (style == "points") g.fillRect(p._1 - 1, p._2 - 1, 3, 3)
            else {
              prev.foreach(q => g.drawLine(q._1, q._2, p._1, p._2))
              // paint the point itself too — an isolated point
              // (single-row series, or one flanked by NaN gaps) has no
              // segments
              g.drawLine(p._1, p._2, p._1, p._2)
            }
            prev = Some(p)
          }
        }
        // legend: color swatch + name, stacked top-left inside the frame
        val ly = mt + 14 + si * 14
        g.drawLine(ml + 8, ly - 4, ml + 28, ly - 4)
        g.setColor(java.awt.Color.BLACK)
        g.drawString(name, ml + 33, ly)
      }
      // frame last so it stays crisp over grid/series edges
      g.setColor(java.awt.Color.BLACK)
      g.drawRect(ml, mt, pw, ph)
    } finally g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Matplotlib-jet approximation: piecewise-linear blue→cyan→green→
    * yellow→red over t ∈ [0,1], opaque alpha.
    */
  def jetArgb(t: Double): Int = {
    val tc = math.max(0.0, math.min(1.0, t))
    def ch(c: Double) =
      math.round(math.max(0.0, math.min(1.0, c)) * 255.0).toInt
    val r = ch(1.5 - math.abs(4.0 * tc - 3.0))
    val g = ch(1.5 - math.abs(4.0 * tc - 2.0))
    val b = ch(1.5 - math.abs(4.0 * tc - 1.0))
    (0xff << 24) | (r << 16) | (g << 8) | b
  }

  /** Line-plot PNG with series defaults: x = the first time-like
    * numeric column, y = every other numeric column (first 4) — the
    * shape every time-series endpoint result has.
    */
  /** Axis choice for the auto series plot: x = the first time-like
    * numeric column; y = up to 4 others, preferring the headline +
    * derived series (mean_seasonal/mean_lowpass from the smoothing
    * flags) over min/max/std/cnt, so a filtered request actually plots
    * the series it asked for.
    */
  def seriesAxes(df: DataFrame, xCol: Option[String] = None): (String, Seq[String]) = {
    val numeric = df.schema.fields.filter(f => f.dataType match {
      case _: org.apache.spark.sql.types.NumericType => true
      case _ => false
    }).map(_.name)
    val x = xCol.getOrElse(
      Seq("time", "day_start", "day", "date", "ts", "week", "t").find(numeric.contains)
        .orElse(numeric.headOption)
        .getOrElse(throw new IllegalArgumentException(
          s"no numeric x column for series PNG (have: ${df.columns.mkString(",")})")))
    val candidates = numeric.filterNot(_ == x).toSeq
    val preferred = Seq("mean", "mean_seasonal", "mean_lowpass", "value")
      .filter(candidates.contains)
    (x, (preferred ++ candidates.filterNot(preferred.contains)).take(4))
  }

  def toPngSeriesAuto(df: DataFrame, xCol: Option[String] = None,
                      yCols: Option[Seq[String]] = None,
                      width: Int = 800, height: Int = 400,
                      style: String = "line"): Array[Byte] = {
    val (x, autoYs) = seriesAxes(df, xCol)
    toPngSeries(df, x, yCols.getOrElse(autoYs), width, height, style)
  }

  /** PNG with map defaults: x=lon, y=lat when present (falling back
    * to the first two numeric columns), value = the first numeric
    * column that isn't a coordinate — the shape every map endpoint
    * result has (`/latitudeTimeHofMoellerSpark` etc. pass their own
    * axes explicitly via pngx=/pngy=/pngv= on the HTTP layer).
    */
  def toPngAuto(df: DataFrame, xCol: Option[String] = None,
                yCol: Option[String] = None, valueCol: Option[String] = None,
                scale: Int = 8): Array[Byte] = {
    val numeric = df.schema.fields.filter(f => f.dataType match {
      case _: org.apache.spark.sql.types.NumericType => true
      case _ => false
    }).map(_.name)
    // defaults must ALSO respect `taken`, or pngx=lat on a frame with a
    // lat column silently resolves y to the same column (x == y, a
    // degenerate diagonal plot); an EXPLICIT want is honored as given
    def pick(want: Option[String], defaults: Seq[String], taken: Set[String]) =
      want.getOrElse(
        defaults.find(d => numeric.contains(d) && !taken(d)).getOrElse(
          numeric.filterNot(taken).headOption.getOrElse(
            throw new IllegalArgumentException(
              s"no numeric column for PNG axis (have: ${df.columns.mkString(",")})"))))
    val x = pick(xCol, Seq("lon", "longitude"), Set.empty)
    val y = pick(yCol, Seq("lat", "latitude"), Set(x))
    val v = pick(valueCol, Seq("mean", "value"), Set(x, y))
    toPng(df, x, y, v, scale)
  }

  /** CSV bytes of a collected result (driver-side, for ZIP entries). */
  def toCsvBytes(df: DataFrame): Array[Byte] = {
    val sb = new StringBuilder
    sb.append(df.columns.mkString(",")).append('\n')
    df.collect().foreach(r => sb.append(csvLine(r)).append('\n'))
    sb.toString.getBytes("UTF-8")
  }

  /** One row in the same CSV dialect as [[toCsvBytes]] (no trailing
    * newline) — shared with the serving layer's STREAMING csv path,
    * which formats rows off `toLocalIterator` instead of a collected
    * array, so the two paths cannot drift.
    */
  def csvLine(r: org.apache.spark.sql.Row): String =
    (0 until r.length).map { i =>
      val v = if (r.isNullAt(i)) "" else String.valueOf(r.get(i))
      // \r quotes too: a bare carriage return splits the row in
      // RFC-4180 parsers just like \n does
      if (v.contains(",") || v.contains("\"") || v.contains("\n") ||
          v.contains("\r"))
        "\"" + v.replace("\"", "\"\"") + "\""
      else v
    }.mkString(",")
}
