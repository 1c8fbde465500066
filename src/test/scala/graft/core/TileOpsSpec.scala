package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The canonical 5×5 grid-tile fixture (FIXTURES.md §1.1, semantics
  * from /root/reference data-access/tests/nexusmodel_test.py:12-60).
  */
class TileOpsSpec extends SparkSpec {

  private val lats = Array(-1.0f, -0.5f, 0.0f, 0.5f, 1.0f)
  private val lons = Array(-2.0f, -1.0f, 0.0f, 1.0f, 2.0f)

  private def fixtureTile(data: Array[Float], id: String = "t1"): Tile = Tile(
    tile_id = id, dataset = "ds", granule = "g.nc", section_spec = "s",
    min_lat = -1, max_lat = 1, min_lon = -2, max_lon = 2,
    min_time = 0, max_time = 0, day_of_year = 1,
    stats_min = 0, stats_max = 24, stats_mean = 12, stats_count = 25,
    latitudes = lats, longitudes = lons, times = Array(0L),
    data = data, meta_data = Map.empty)

  private val denseData = Array.tabulate(25)(_.toFloat)

  test("toPoints explodes all non-masked cells with correct coordinates") {
    import spark.implicits._
    val points = TileOps.toPoints(Seq(fixtureTile(denseData)).toDF())
    assert(points.count() === 25)
    // nexusmodel_test.py:27 — value at (lat=1.0, lon=0.0) is 22
    val at = points.where($"latitude" === 1.0 && $"longitude" === 0.0)
      .select("value").as[Double].collect()
    assert(at.toSeq === Seq(22.0))
    // nexusmodel_test.py:44 — value at (-1.0, -2.0) is 0
    val at0 = points.where($"latitude" === -1.0 && $"longitude" === -2.0)
      .select("value").as[Double].collect()
    assert(at0.toSeq === Seq(0.0))
  }

  test("NaN cells are masked out of explosion and stats") {
    import spark.implicits._
    val masked = denseData.clone()
    masked(22) = Float.NaN // (lat=1.0, lon=0.0)
    val points = TileOps.toPoints(Seq(fixtureTile(masked)).toDF())
    assert(points.count() === 24)
    assert(points.where($"latitude" === 1.0 && $"longitude" === 0.0).count() === 0)
    val stats = TileOps.tileSummaries(points).collect()(0)
    assert(stats.getAs[Long]("stats_count") === 24)
    assert(stats.getAs[Double]("stats_max") === 24.0)
  }

  test("tileSummaries computes cos-lat weighted mean") {
    import spark.implicits._
    // two points: value 10 at lat 0 (w=1), value 20 at lat 60 (w=0.5)
    val pts = Seq(
      ("t", "ds", 0.0, 0.0, 0L, 10.0),
      ("t", "ds", 60.0, 0.0, 0L, 20.0)
    ).toDF("tile_id", "dataset", "latitude", "longitude", "time", "value")
    val m = TileOps.tileSummaries(pts).collect()(0).getAs[Double]("stats_mean")
    val expected = (10.0 * 1.0 + 20.0 * 0.5) / 1.5
    assert(math.abs(m - expected) < 1e-9)
  }

  test("dailyStats groups by day and weights the mean only") {
    import spark.implicits._
    val day = 86400L
    val pts = Seq(
      ("t", "ds", 0.0, 0.0, 10L, 1.0),
      ("t", "ds", 0.0, 1.0, 20L, 3.0),
      ("t", "ds", 0.0, 0.0, day + 5L, 5.0)
    ).toDF("tile_id", "dataset", "latitude", "longitude", "time", "value")
    val rows = TileOps.dailyStats(pts).orderBy("day_start").collect()
    assert(rows.length === 2)
    assert(rows(0).getAs[Double]("mean") === 2.0) // lat 0 ⇒ equal weights
    assert(rows(0).getAs[Double]("min") === 1.0)
    assert(rows(0).getAs[Double]("max") === 3.0)
    assert(rows(1).getAs[Long]("cnt") === 1L)
  }

  test("dailyStats floor-buckets pre-1970 times into the correct day") {
    import spark.implicits._
    val pts = Seq(
      ("t", "ds", 0.0, 0.0, -1L, 1.0),      // 1969-12-31 23:59:59
      ("t", "ds", 0.0, 0.0, -86400L, 2.0),  // 1969-12-31 00:00:00
      ("t", "ds", 0.0, 0.0, 1L, 3.0)        // 1970-01-01
    ).toDF("tile_id", "dataset", "latitude", "longitude", "time", "value")
    val days = TileOps.dailyStats(pts).select("day_start").as[Long]
      .collect().sorted
    assert(days.toSeq === Seq(-86400L, 0L)) // both 1969 points share a day
  }

  test("approxValueAt picks the nearest grid point") {
    import spark.implicits._
    val points = TileOps.toPoints(Seq(fixtureTile(denseData)).toDF())
    // probe (0.9, 0.1) → nearest grid point (1.0, 0.0) → value 22
    val v = TileOps.approxValueAt(points, 0.9, 0.1)
      .select("value").as[Double].collect()
    assert(v.toSeq === Seq(22.0))
  }

  test("corrMap yields r=1 for linearly related co-located datasets") {
    import spark.implicits._
    val a = Seq(("t", "ds", 0.0, 0.0, 0L, 1.0), ("t", "ds", 0.0, 0.0, 1L, 2.0),
      ("t", "ds", 0.0, 0.0, 2L, 3.0))
      .toDF("tile_id", "dataset", "latitude", "longitude", "time", "value")
    val b = a.withColumn("value", $"value" * 2 + 1)
    val r = TileOps.corrMap(a, b).collect()(0)
    assert(math.abs(r.getAs[Double]("r") - 1.0) < 1e-9)
    assert(r.getAs[Long]("n") === 3L)
  }
}
