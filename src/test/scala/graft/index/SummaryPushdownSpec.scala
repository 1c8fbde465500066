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

  test("boundary tiles are recomputed and clipped to the bbox") {
    // bbox [0,3]×[0,3]: tile (0,0) inner; tiles straddling lat/lon=2..4
    // are boundary and must contribute only their in-bbox points
    val fast = SummaryPushdown.dailyMeanFromSummaries(tiles, 0, 3, 0, 3).collect()(0)
    val expect = TileOps.maskPointsToBBox(TileOps.toPoints(tiles), 0, 3, 0, 3)
      .agg(sum("value"), count(lit(1))).collect()(0)
    // 3×3 grid points fall inside ⇒ 9 points
    assert(fast.getAs[Long]("cnt") === expect.getLong(1))
    assert(fast.getAs[Long]("cnt") === 9L)
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
