package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GeoFunctionsSpec extends SparkSpec {

  test("haversine matches known distances") {
    import spark.implicits._
    val df = Seq(
      (0.0, 0.0, 0.0, 1.0),   // 1° lon at equator ≈ 111.19 km
      (2.0, 1.0, 3.0, 1.0),   // 1° lat ≈ 111.19 km
      (0.0, 0.0, 0.0, 0.0)    // zero
    ).toDF("lat1", "lon1", "lat2", "lon2")
    val d = df.select(GeoFunctions.haversineKm($"lat1", $"lon1", $"lat2", $"lon2"))
      .as[Double].collect()
    assert(math.abs(d(0) - 111.19) < 0.5)
    assert(math.abs(d(1) - 111.19) < 0.5)
    assert(d(2) === 0.0)
  }

  test("wind U/V round-trips speed; direction returns FROM convention") {
    import spark.implicits._
    val df = Seq((10.0, 45.0), (3.5, 200.0), (0.5, 359.0)).toDF("speed", "dir")
    val u = GeoFunctions.windU($"speed", $"dir")
    val v = GeoFunctions.windV($"speed", $"dir")
    val rt = df.select(GeoFunctions.uvToSpeed(u, v).as("s"),
      GeoFunctions.uvToDirDeg(u, v).as("d")).as[(Double, Double)].collect()
    df.select($"speed", $"dir").as[(Double, Double)].collect().zip(rt).foreach {
      case ((s, d), (s2, d2)) =>
        assert(math.abs(s - s2) < 1e-9)
        // windU/windV build the TOWARD vector; uvToDirDeg reports the
        // FROM direction (reference convention) = dir + 180 mod 360
        assert(math.abs((d + 180) % 360 - d2) < 1e-9)
        assert(d2 >= 0 && d2 < 360)
    }
  }

  test("unit conversions") {
    import spark.implicits._
    val df = Seq((273.15, 190.0), (300.0, 350.0)).toDF("k", "lon")
    val r = df.select(GeoFunctions.kelvinToCelsius($"k").as("c"),
      GeoFunctions.lonTo180($"lon").as("l")).as[(Double, Double)].collect()
    assert(r(0) === ((0.0, -170.0)))
    assert(r(1) === ((26.850000000000023, -10.0)))
  }

  test("weightedMean weights by cos(lat)") {
    import spark.implicits._
    val df = Seq((10.0, 0.0), (20.0, 60.0)).toDF("v", "lat")
    val m = df.agg(GeoFunctions.weightedMean($"v",
      GeoFunctions.cosLatWeight($"lat"))).as[Double].collect()(0)
    assert(math.abs(m - (10.0 + 20.0 * 0.5) / 1.5) < 1e-9)
  }
}
