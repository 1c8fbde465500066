package graft.index

import graft.SparkSpec
import graft.core.TileOps
import graft.ingest.Ingest
import org.apache.spark.sql.functions._

class SummaryPushdownSpec extends SparkSpec {

  /** 6×6 grid at lat/lon 0.5..5.5, values = row-major index, one day. */
  private lazy val tiles = {
    import spark.implicits._
    val pts = for { li <- 0 until 6; lo <- 0 until 6 }
      yield ("g.nc", li + 0.5, lo + 0.5, 0L, (li * 6 + lo).toDouble)
    Ingest.pointsToTiles(
      pts.toDF("granule", "latitude", "longitude", "time", "value"), 2.0, 2.0, "ds")
  }

  test("summaries-first equals the count-weighted combine of tile means") {
    // bbox covering everything: all tiles inner, answer from summaries
    val fast = SummaryPushdown.dailyMeanFromSummaries(tiles, 0, 6, 0, 6).collect()(0)
    // the defined semantic (reference A11/A12): count-weighted mean of
    // the per-tile cos-lat-weighted means
    val expected = TileOps.tileSummaries(TileOps.toPoints(tiles))
      .agg((sum(col("stats_mean") * col("stats_count")) / sum(col("stats_count")))
        .as("mean"), sum("stats_count").as("cnt")).collect()(0)
    assert(fast.getAs[Long]("cnt") === expected.getAs[Long]("cnt"))
    assert(math.abs(fast.getAs[Double]("mean") - expected.getAs[Double]("mean")) < 1e-9)
    // vs the exact unweighted mean it is an approximation (cos-lat
    // weighting inside tiles) — small at these latitudes
    val exact = TileOps.toPoints(tiles).agg(avg("value")).collect()(0).getDouble(0)
    assert(math.abs(fast.getAs[Double]("mean") - exact) < 0.01)
  }

  test("boundary tiles are recomputed, clipped, and weighted like summaries") {
    // bbox [0,3]×[0,3]: tile (0,0) inner; tiles straddling lat/lon=2..4
    // are boundary and must contribute only their in-bbox points
    val fast = SummaryPushdown.dailyMeanFromSummaries(tiles, 0, 3, 0, 3).collect()(0)
    // expected = count-weighted combine of per-tile cos-lat-weighted
    // means over the MASKED domain — identical semantics for inner and
    // border streams
    val masked = TileOps.maskPointsToBBox(TileOps.toPoints(tiles), 0, 3, 0, 3)
    val expect = TileOps.tileSummaries(masked)
      .agg((sum(col("stats_mean") * col("stats_count")) / sum(col("stats_count")))
        .as("mean"), sum("stats_count").as("cnt")).collect()(0)
    assert(fast.getAs[Long]("cnt") === expect.getAs[Long]("cnt"))
    assert(fast.getAs[Long]("cnt") === 9L) // 3×3 grid points inside
    assert(math.abs(fast.getAs[Double]("mean") - expect.getAs[Double]("mean")) < 1e-9)
  }

  test("multi-day tiles route to the explode path, not the summary path") {
    import spark.implicits._
    import graft.core.Tile
    // one tile spanning two days: 1×1×2 layout, values 10 (day 0) and
    // 20 (day 1); the summary path would credit both points to day 0
    val t = Tile("mt", "ds", "g", "s", 0, 0, 0, 0, 0L, 86400L, 1,
      10, 20, 15, 2, Array(0f), Array(0f), Array(0L, 86400L),
      Array(10f, 20f), Map.empty)
    val out = SummaryPushdown.dailyMeanFromSummaries(Seq(t).toDS().toDF(),
        -1, 1, -1, 1)
      .orderBy("day_start").collect()
    assert(out.length === 2)
    assert(out(0).getAs[Double]("mean") === 10.0)
    assert(out(1).getAs[Double]("mean") === 20.0)
  }

  test("inner path never touches the array columns") {
    val innerOnly = SummaryPushdown.dailyMeanFromSummaries(
      tiles.drop("data", "latitudes", "longitudes", "times")
        .withColumn("data", lit(null).cast("array<float>"))
        .withColumn("latitudes", lit(null).cast("array<float>"))
        .withColumn("longitudes", lit(null).cast("array<float>"))
        .withColumn("times", lit(null).cast("array<long>")),
      0, 6, 0, 6)
    // with a fully-covering bbox there are no boundary tiles, so the
    // null payloads are never read and the query still answers
    assert(innerOnly.collect()(0).getAs[Long]("cnt") === 36L)
  }
}
