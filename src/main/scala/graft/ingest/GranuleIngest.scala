package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{CfTime, H5Lite, NetcdfClassic}
import graft.sources.NetcdfClassic.{NcFile, NcVar}

/** One observation point decoded from a granule. Top-level case class:
  * Spark derives its Encoder reflectively.
  */
case class GranulePoint(granule: String, time: Long, latitude: Double,
                        longitude: Double, value: Double)

/** A point carrying secondary-variable values (`meta`, one slot per
  * requested meta variable, NaN where that variable is masked) beside
  * the primary — the reference's `meta_data` companion arrays
  * (`nexusmodel.py:34`).
  */
case class GranulePointM(granule: String, time: Long, latitude: Double,
                         longitude: Double, value: Double, meta: Seq[Double])

/** A swath point carrying its flat decode index — the per-row identity
  * the streaming replay anti-join keys on (see
  * [[GranuleIngest.swathPointsWithIndex]]).
  */
case class GranulePointI(granule: String, time: Long, latitude: Double,
                         longitude: Double, value: Double, point_index: Int)

/** S1/S2 — direct NetCDF granule ingest
  * (`tilereadingprocessor.py:130-190`: `read_grid_data` for
  * (time, lat, lon) grids, `read_swath_data` for 2-D swaths).
  *
  * Scale shape: granules load through Spark's `binaryFile` source, so
  * each file parses IN AN EXECUTOR TASK — a 100 TB archive of MB-scale
  * granules fans out across the cluster with no driver involvement and
  * no shuffle before tiling (the only shuffle in the whole ingest is
  * `pointsToTiles`' group-by-cell). Per-file memory is one granule's
  * decoded doubles — the same bound the reference's per-granule reader
  * process has. CF unpacking (_FillValue → NaN, scale/offset) happens
  * at decode, so masked pixels flow as NaN mask cells exactly like the
  * normalized-point path.
  */
object GranuleIngest {

  /** Format sniff: NetCDF classic (`CDF\x01/\x02`) or NetCDF-4/HDF5
    * (`\x89HDF`) — the same dual dispatch libnetcdf performs. `keep`
    * pushes variable projection into the codec: non-kept multi-D
    * payloads are never decoded (chunks not read / inflated), so the
    * decode cost of an ingest scales with the variables ASKED FOR,
    * not the granule's variable count.
    */
  def decode(bytes: Array[Byte],
             keep: String => Boolean = _ => true): NcFile =
    if (H5Lite.isHdf5(bytes)) H5Lite.read(bytes, keep)
    else NetcdfClassic.read(bytes, keep)

  /** Points of a gridded granule: `valueVar` spans (time, lat, lon) —
    * or (lat, lon) with a scalar/absent time — with 1-D coordinate
    * variables. Row-major decode: index = (t·nLat + i)·nLon + j.
    */
  /** Like [[gridPointsOf]] but each point carries the FILE-layout flat
    * index it decoded from — the one enumeration that owns both the
    * logical order and the physical layout, so the multi-variable path
    * reads meta arrays through the same index and can never misalign.
    */
  private[ingest] def gridPointsWithIndex(nc: NcFile, granule: String,
                   valueVar: String,
                   latVar: String = "lat", lonVar: String = "lon",
                   timeVar: String = "time",
                   dayAttr: Option[(String, String)] = None): Iterator[(GranulePoint, Int)] = {
    val v = nc.variable(valueVar).getOrElse(
      sys.error(s"granule $granule: no variable $valueVar"))
    val lats = coord(nc, latVar, granule)
    val lons = coord(nc, lonVar, granule)
    val times: Array[Double] = nc.variable(timeVar) match {
      case Some(t) => t.unpacked
      case None => Array(0.0)
    }
    val toEpoch = CfTime.converter(nc.variable(timeVar), dayEpoch(nc, dayAttr))
    val (nT, nLat, nLon) = (times.length, lats.length, lons.length)
    val data = v.unpacked
    require(data.length == nT * nLat * nLon,
      s"granule $granule: $valueVar has ${data.length} cells, " +
        s"grid wants ${nT * nLat * nLon} (time=$nT lat=$nLat lon=$nLon)")
    val idx = gridIndexer(nc, v, nT, nLat, nLon, latVar, lonVar, timeVar)
    // fill-masked COORDINATE/TIME axis entries (unpacked to NaN) have
    // no usable position: their points are skipped at the source —
    // letting a NaN time through would silently land the whole slice
    // at epoch 0 (NaN.toLong), and a NaN lat/lon would form a garbage
    // floor(NaN) tile cell downstream
    for {
      t <- Iterator.range(0, nT) if !times(t).isNaN
      i <- Iterator.range(0, nLat) if !lats(i).isNaN
      j <- Iterator.range(0, nLon) if !lons(j).isNaN
      fi = idx(t, i, j)
    } yield (GranulePoint(granule, toEpoch(times(t)), lats(i), lons(j),
      data(fi)), fi)
  }

  /** Points of a gridded granule (see [[gridPointsWithIndex]]). */
  def gridPointsOf(nc: NcFile, granule: String, valueVar: String,
                   latVar: String = "lat", lonVar: String = "lon",
                   timeVar: String = "time",
                   dayAttr: Option[(String, String)] = None): Iterator[GranulePoint] =
    gridPointsWithIndex(nc, granule, valueVar, latVar, lonVar, timeVar,
      dayAttr).map(_._1)

  /** Flat index of logical (time, lat, lon) into the value variable's
    * ACTUAL file layout. Axis ORDER comes from the variable's dim
    * identity when the coordinate variables' dim names resolve among
    * its dims — a granule laid out (lon, lat) or (time, lon, lat)
    * then decodes correctly instead of silently transposing (the
    * reference permutes such files with NCO's ncpdq before reading,
    * `callncpdq.py`; here the stride arithmetic does it in place).
    * Synthetic per-variable dim names fall back to the (time, lat,
    * lon) convention. Shared by the single- and multi-variable decode
    * paths so primary and meta arrays can never disagree on layout.
    */
  private def gridIndexer(nc: NcFile, v: NcVar, nT: Int, nLat: Int,
                          nLon: Int, latVar: String, lonVar: String,
                          timeVar: String): (Int, Int, Int) => Int = {
    val shape = nc.shape(v)
    val rowMajor = shape.scanRight(1L)((d, acc) => d * acc).tail
    def axisOf(coord: String): Option[Int] =
      nc.variable(coord).flatMap(_.dims.headOption)
        .map(v.dims.indexOf).filter(_ >= 0)
    val strides = (axisOf(latVar), axisOf(lonVar)) match {
      case (Some(la), Some(lo)) if la != lo &&
        shape(la) == nLat && shape(lo) == nLon =>
        // the time axis: by dim identity, else the one axis that is
        // neither lat nor lon (3-D grids); absent/scalar time
        // contributes stride 0
        val ta = axisOf(timeVar).filter(a => a != la && a != lo)
          .orElse(shape.indices.find(a => a != la && a != lo))
        Seq(ta.map(rowMajor).getOrElse(0L), rowMajor(la), rowMajor(lo))
      case _ =>
        Seq(nLat.toLong * nLon, nLon.toLong, 1L)
    }
    val (st, sLat, sLon) = (strides(0), strides(1), strides(2))
    (t, i, j) => (t * st + i * sLat + j * sLon).toInt
  }

  /** Midnight-UTC epoch of the granule-level day attribute, when one
    * is configured and parses — the reference's `GLBLATTR_DAY`/
    * `GLBLATTR_DAY_FORMAT` pair for files whose time axis is seconds
    * of day (`tilereadingprocessor.py:38-39`).
    */
  private def dayEpoch(nc: NcFile, dayAttr: Option[(String, String)]): Option[Long] =
    dayAttr.flatMap { case (attrName, pattern) =>
      nc.attrs.find(_.name == attrName).map(_.text)
        .flatMap(CfTime.dayStart(_, pattern))
    }

  /** Points of a swath granule: lat/lon/value are parallel 2-D (scan,
    * pixel) arrays; `timeVar` may span (scan) — per-scan-line time, the
    * common L2 layout — or (scan, pixel), or be absent (0). Swaths stay
    * POINTS (SURVEY §7.4): no diagonalization, the tiler's cell
    * group-by does the spatial binning.
    */
  def swathPointsOf(nc: NcFile, granule: String, valueVar: String,
                    latVar: String = "lat", lonVar: String = "lon",
                    timeVar: String = "time",
                    dayAttr: Option[(String, String)] = None): Iterator[GranulePoint] =
    swathPointsWithIndex(nc, granule, valueVar, latVar, lonVar, timeVar,
      dayAttr).map(_._1)

  /** Like [[swathPointsOf]] but each point carries its flat decode
    * index. Swath keys (granule, time, lat, lon) are NOT unique per
    * row — all fill-masked pixels of a scan row share one per-scan-row
    * time and NaN geolocation compares equal under Spark's join
    * semantics, and two real pixels can coincide — so replay-exact
    * idempotency (the streaming ingest's anti-join) needs the decode
    * position itself: (granule, point_index) IS the row identity, and
    * decode determinism makes it stable across replays.
    */
  def swathPointsWithIndex(nc: NcFile, granule: String, valueVar: String,
                    latVar: String = "lat", lonVar: String = "lon",
                    timeVar: String = "time",
                    dayAttr: Option[(String, String)] = None): Iterator[(GranulePoint, Int)] = {
    val v = nc.variable(valueVar).getOrElse(
      sys.error(s"granule $granule: no variable $valueVar"))
    val lat = nc.variable(latVar).getOrElse(
      sys.error(s"granule $granule: no variable $latVar"))
    val lon = nc.variable(lonVar).getOrElse(
      sys.error(s"granule $granule: no variable $lonVar"))
    val data = v.unpacked
    val lats = lat.unpacked
    val lons = lon.unpacked
    require(lats.length == data.length && lons.length == data.length,
      s"granule $granule: swath arrays disagree " +
        s"(value=${data.length} lat=${lats.length} lon=${lons.length})")
    val shape = nc.shape(v)
    val toEpoch = CfTime.converter(nc.variable(timeVar), dayEpoch(nc, dayAttr))
    // RAW axis value per point (NaN = fill-masked, filtered below);
    // the epoch conversion runs only on surviving values
    val rawTimeAt: Int => Double = nc.variable(timeVar) match {
      case Some(t) if t.data.length == data.length =>
        val ts = t.unpacked; k => ts(k)
      case Some(t) if t.data.length > 0 =>
        // a 1-D time spanning ONE axis of the swath: find that axis by
        // shared dim name (real dim identity, confirmed against the
        // axis length) or, with synthetic per-variable dims, by the
        // unique axis whose length matches — leading axis (per-scan-
        // row time, the common L2 layout) on a tie. A single-element
        // time BROADCASTS to every point, and a length matching no
        // axis fails loudly (the old axis-0 fallback indexed past the
        // array on legitimately-shaped granules).
        val ts = t.unpacked
        if (ts.length == 1) { _ => ts(0) }
        else {
          val axis: Int = t.dims.headOption.map(v.dims.indexOf)
            .filter(a => a >= 0 && shape.lift(a).contains(ts.length))
            .orElse(shape.zipWithIndex.find(_._1 == ts.length).map(_._2))
            .getOrElse(sys.error(s"granule $granule: time axis length " +
              s"${ts.length} matches no axis of $valueVar " +
              s"(shape ${shape.mkString("x")})"))
          val stride = shape.drop(axis + 1).product.max(1)
          val axisLen = shape(axis)
          k => ts((k / stride) % axisLen)
        }
      case _ => _ => 0.0
    }
    val hasTime = nc.variable(timeVar).exists(_.data.length > 0)
    // NaN GEOLOCATION is preserved (the reference's reader yields the
    // raw masked arrays — RealGranuleSpec pins the full cell count per
    // its test expectations; downstream masking drops them), but a
    // fill-masked TIME has no Long representation and would silently
    // convert to epoch 0, misdating the whole point — those points skip
    Iterator.range(0, data.length).flatMap { k =>
      val rt = rawTimeAt(k)
      if (rt.isNaN) Iterator.empty
      else Iterator.single((GranulePoint(granule,
        if (hasTime) toEpoch(rt) else 0L, lats(k), lons(k), data(k)), k))
    }
  }

  private def coord(nc: NcFile, name: String, granule: String): Array[Double] = {
    val v = nc.variable(name).getOrElse(
      sys.error(s"granule $granule: no coordinate variable $name"))
    require(v.dims.length <= 1,
      s"granule $granule: $name is ${v.dims.length}-D; gridPoints wants 1-D " +
        "coordinates (use swathPoints for 2-D geolocation)")
    v.unpacked
  }

  /** Distributed granule scan: every file matching `glob` parses in an
    * executor task; `swath = true` switches the (lat, lon) decode from
    * 1-D grid axes to 2-D per-pixel geolocation.
    */
  def readGranules(spark: SparkSession, glob: String, valueVar: String,
                   latVar: String = "lat", lonVar: String = "lon",
                   timeVar: String = "time", swath: Boolean = false): DataFrame =
    decodeFiles(spark.read.format("binaryFile").load(glob),
      valueVar, latVar, lonVar, timeVar, swath)

  /** Decode a `binaryFile`-shaped relation (path, content) to points —
    * shared by the batch glob scan above and the streaming file-watch
    * pipeline (`StreamingIngest.granulePipeline`), so bulk backfill
    * and continuous ingest can never diverge in decode semantics.
    */
  /** Shared decode core: (path, content) relation → per-granule rows.
    * ONE place owns the binaryFile projection, the codec dispatch (with
    * `keep` pushdown) and the path→granule-name rule, so the single-
    * and multi-variable pipelines cannot silently diverge.
    */
  private def granuleRows[T](files: DataFrame, keep: String => Boolean)
                            (f: (String, NcFile) => Iterator[T])
                            (implicit enc: org.apache.spark.sql.Encoder[T]): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    files
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val granule = path.substring(path.lastIndexOf('/') + 1)
        f(granule, decode(bytes, keep))
      }(enc)
      .toDF()
  }

  def decodeFiles(files: DataFrame, valueVar: String,
                  latVar: String = "lat", lonVar: String = "lon",
                  timeVar: String = "time", swath: Boolean = false): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    // projection pushdown into the codec: only the variables this
    // ingest actually reads get their payloads decoded
    granuleRows[GranulePoint](files, Set(valueVar, latVar, lonVar, timeVar)) {
      (granule, nc) =>
        if (swath) swathPointsOf(nc, granule, valueVar, latVar, lonVar, timeVar)
        else gridPointsOf(nc, granule, valueVar, latVar, lonVar, timeVar)
    }
  }

  /** Swath decode carrying the flat decode index as `point_index` —
    * the streaming pipeline's replay-identity column (unique per
    * granule; stable across replays because decode is deterministic).
    */
  def decodeFilesIndexed(files: DataFrame, valueVar: String,
                         latVar: String = "lat", lonVar: String = "lon",
                         timeVar: String = "time"): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    granuleRows[GranulePointI](files, Set(valueVar, latVar, lonVar, timeVar)) {
      (granule, nc) =>
        swathPointsWithIndex(nc, granule, valueVar, latVar, lonVar, timeVar)
          .map { case (p, k) => GranulePointI(p.granule, p.time,
            p.latitude, p.longitude, p.value, k) }
    }
  }

  /** End-to-end S1→S3: granule files → points → tiles (the
    * `pointsToTiles` chunker). Grid granules only — swath points are
    * sparse and go through the typed swath path instead.
    *
    * `metaVars` ingests SECONDARY variables alongside the primary:
    * each decodes from the same (time, lat, lon) grid (own fill mask)
    * and lands in the tile's `meta_data` map in the same row-major
    * layout as `data` — the reference's multi-variable tile shape
    * (`nexusmodel.py:34`; e.g. wind_u primary + wind_v/wind_dir meta).
    *
    * `pointTransform` is the PROCESSOR-CHAIN hook (`processorchain.py`
    * role): a DataFrame transform applied to the decoded point
    * relation before tiling — unit conversion
    * (`GeoFunctions.kelvinToCelsius`), longitude normalization
    * (`lonTo180`), climatology time snapping (`timeToMonthStart`) —
    * the reference's configurable per-dataset transforms, composed
    * with plain `.withColumn` algebra.
    */
  def ingestGridGranules(spark: SparkSession, glob: String, valueVar: String,
                         dataset: String, tileLat: Double, tileLon: Double,
                         latVar: String = "lat", lonVar: String = "lon",
                         timeVar: String = "time",
                         metaVars: Seq[String] = Nil,
                         pointTransform: DataFrame => DataFrame = identity): DataFrame =
    if (metaVars.isEmpty)
      Ingest.pointsToTiles(
        pointTransform(readGranules(spark, glob, valueVar, latVar, lonVar, timeVar)),
        tileLat, tileLon, dataset)
    else
      Ingest.pointsToTiles(
        pointTransform(decodeFilesMulti(
          spark.read.format("binaryFile").load(glob),
          valueVar, metaVars, latVar, lonVar, timeVar)),
        tileLat, tileLon, dataset, metaNames = metaVars)

  /** Multi-variable decode of a `binaryFile`-shaped relation: primary
    * points plus one `meta` slot per secondary, aligned by the shared
    * row-major grid index. Shared by the batch glob ingest and the
    * streaming `granulePipeline`.
    */
  def decodeFilesMulti(files: DataFrame, valueVar: String,
                       metaVars: Seq[String],
                       latVar: String = "lat", lonVar: String = "lon",
                       timeVar: String = "time"): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    val wanted = (Set(valueVar, latVar, lonVar, timeVar) ++ metaVars): Set[String]
    granuleRows[GranulePointM](files, wanted) { (granule, nc) =>
      // resolve the PRIMARY first so a missing primary reports itself,
      // not a confusing meta-length mismatch
      val pv = nc.variable(valueVar).getOrElse(
        sys.error(s"granule $granule: no variable $valueVar"))
      val metas = metaVars.map { mv =>
        val v = nc.variable(mv).getOrElse(
          sys.error(s"granule $granule: no meta variable $mv"))
        // equal cell COUNT is not alignment: a permuted-dims meta
        // (lon, lat) has the same product as (lat, lon) but a
        // different flat layout. Accept identical dim-name sequences;
        // when the names are synthetic per-variable (no overlap),
        // fall back to shape equality.
        val sameNames = v.dims == pv.dims
        val disjoint = v.dims.toSet.intersect(pv.dims.toSet).isEmpty
        require(sameNames || (disjoint && nc.shape(v) == nc.shape(pv)),
          s"granule $granule: meta variable $mv spans dims ${v.dims} " +
            s"(shape ${nc.shape(v)}) but primary $valueVar spans " +
            s"${pv.dims} (shape ${nc.shape(pv)})")
        v.unpacked
      }
      // ONE enumeration owns both layouts: each primary point carries
      // the file index it decoded from, and the meta arrays (same dims
      // ⇒ same layout, checked above) read through that index — a
      // permuted granule can never misalign primary and meta
      gridPointsWithIndex(nc, granule, valueVar, latVar, lonVar, timeVar)
        .map { case (p, fi) =>
          GranulePointM(p.granule, p.time, p.latitude, p.longitude,
            p.value, metas.map(m => m(fi)))
        }
    }
  }
}
