package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TypedTileOpsSpec extends SparkSpec {

  private val lats = Array(-1.0f, -0.5f, 0.0f, 0.5f, 1.0f)
  private val lons = Array(-2.0f, -1.0f, 0.0f, 1.0f, 2.0f)

  private def tile(data: Array[Float],
                   meta: Map[String, Array[Float]] = Map.empty) = Tile(
    "t1", "ds", "g.nc", "s", -1, 1, -2, 2, 0, 0, 1, 0, 24, 12, 25,
    lats, lons, Array(0L), data, meta)

  test("typed toPoints matches the untyped explosion") {
    import spark.implicits._
    val data = Array.tabulate(25)(_.toFloat)
    data(7) = Float.NaN
    val ds = Seq(tile(data)).toDS()
    val typed = TypedTileOps.toPoints(ds)
      .collect().map(p => (p.latitude, p.longitude, p.value)).toSet
    val untyped = TileOps.toPoints(ds.toDF())
      .select("latitude", "longitude", "value")
      .as[(Double, Double, Double)].collect().toSet
    assert(typed === untyped)
    assert(typed.size === 24)
    assert(typed.contains((1.0, 0.0, 22.0)))
  }

  test("swathToPoints normalizes parallel swath arrays to points") {
    import spark.implicits._
    val swath = Seq(("sw1", "swath_ds",
      Array(10f, 11f, 12f, 13f), Array(100f, 101f, 102f, 103f),
      Array(0L, 1L, 2L, 3L), Array(1f, Float.NaN, 3f, 4f))).toDS()
    val pts = TypedTileOps.swathToPoints(spark, swath).collect()
    assert(pts.length === 3) // NaN observation masked
    assert(pts.map(_.latitude).toSet === Set(10.0, 12.0, 13.0))
    // the diagonal identity the reference materializes: obs i keeps
    // its own (lat_i, lon_i, t_i)
    assert(pts.find(_.time == 2L).get.longitude === 102.0)
  }

  test("toPointsWithMeta explodes secondary variables beside the primary") {
    import spark.implicits._
    val data = Array.tabulate(25)(_.toFloat)
    val std = Array.tabulate(25)(i => i.toFloat / 10)
    std(3) = Float.NaN
    val df = Seq(tile(data, Map("analysed_sst_std" -> std))).toDS().toDF()
    val pts = TypedTileOps.toPointsWithMeta(df)
    val byVar = pts.groupBy("variable").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byVar === Map("primary" -> 25L, "analysed_sst_std" -> 24L))
    // meta values land on the same coordinates as the primary grid
    val v = pts.where(col("variable") === "analysed_sst_std" &&
        col("latitude") === 1.0 && col("longitude") === 0.0)
      .select("value").collect()(0).getDouble(0)
    assert(math.abs(v - 2.2) < 1e-6)
  }
}
