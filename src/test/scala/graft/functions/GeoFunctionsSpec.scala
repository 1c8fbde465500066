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

  test("u/v -> speed+FROM-direction pins the reference kernel's cardinal " +
    "vectors (computespeeddirfromuv_test.py:30-87)") {
    import spark.implicits._
    // (u, v, expected speed, expected FROM-direction degrees)
    val cases = Seq(
      (0.0, -1.0, 1.0, 0.0),    // blowing south = FROM North
      (-1.0, 0.0, 1.0, 90.0),   // blowing west = FROM East
      (0.0, 1.0, 1.0, 180.0),   // blowing north = FROM South
      (1.0, 0.0, 1.0, 270.0),   // blowing east = FROM West
      (2.0, 2.0, 2.8284271, 225.0)) // from the southwest
    val got = cases.map { case (u, v, _, _) => (u, v) }.toDF("u", "v")
      .select(GeoFunctions.uvToSpeed($"u", $"v").as("s"),
        GeoFunctions.uvToDirDeg($"u", $"v").as("d"))
      .as[(Double, Double)].collect()
    cases.zip(got).foreach { case ((u, v, es, ed), (s, d)) =>
      assert(math.abs(s - es) < 1e-6, s"speed($u,$v)")
      assert(math.abs(d - ed) < 1e-9, s"dir($u,$v)")
    }
  }

  test("timeToMonthStart replaces the day, KEEPS the time of day " +
    "(normalizetimebeginningofmonth.py:25-30)") {
    import spark.implicits._
    val cases = Seq(
      // 2016-05-17T13:45:30Z -> 2016-05-01T13:45:30Z
      (1463492730L, 1462110330L),
      // already day 1: unchanged
      (1462060800L, 1462060800L),
      // leap-February 29th 23:59:59 -> Feb 1 23:59:59
      (1456790399L, 1454371199L))
    val got = cases.map(_._1).toDF("t")
      .select(graft.functions.GeoFunctions.timeToMonthStart($"t"))
      .as[Long].collect()
    assert(got.toSeq === cases.map(_._2))
    // the UTC calendar must hold in a NON-UTC session too: a May
    // instant 30 min past UTC midnight renders as April 30 in New
    // York, and a timestamp-based dayofmonth would snap it to April
    val tzBefore = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val v = Seq(1462069800L).toDF("t") // 2016-05-01T00:30:00Z
        .select(graft.functions.GeoFunctions.timeToMonthStart($"t"))
        .as[Long].head()
      assert(v === 1462069800L, "May 1 instant must stay in May")
    } finally spark.conf.set("spark.sql.session.timeZone", tzBefore)
  }

  test("unit conversions") {
    import spark.implicits._
    val df = Seq((273.15, 190.0), (300.0, 350.0)).toDF("k", "lon")
    val r = df.select(GeoFunctions.kelvinToCelsius($"k").as("c"),
      GeoFunctions.lonTo180($"lon").as("l")).as[(Double, Double)].collect()
    assert(r(0) === ((0.0, -170.0)))
    assert(r(1) === ((26.850000000000023, -10.0)))
  }

  test("geodesic (Vincenty/WGS84) matches known arc lengths") {
    // equator, 1° of longitude: exactly a·π/180 = 111.3195 km
    assert(math.abs(GeoDistance.vincentyM(0, 0, 0, 1) / 1000 - 111.3195) < 0.001)
    // meridian, equator → 1°N: 110.5743 km on WGS84 (vs 111.195 spherical)
    assert(math.abs(GeoDistance.vincentyM(0, 0, 1, 0) / 1000 - 110.5743) < 0.001)
    // coincident and near-antipodal (haversine fallback) stay finite
    assert(GeoDistance.vincentyM(10, 20, 10, 20) === 0.0)
    val anti = GeoDistance.vincentyM(0, 0, 0.0, 179.99999) / 1000
    assert(anti > 19000 && anti < 20100)
    // symmetric
    assert(GeoDistance.vincentyM(35, -120, 40, -70) ===
      GeoDistance.vincentyM(40, -70, 35, -120))
  }

  test("geodesicKm Column expression evaluates under codegen") {
    import spark.implicits._
    val df = Seq((0.0, 0.0, 0.0, 1.0), (0.0, 0.0, 1.0, 0.0))
      .toDF("a", "b", "c", "d")
    val got = df.select(
      GeoDistance.geodesicKm($"a", $"b", $"c", $"d").as("km"))
      .as[Double].collect()
    assert(math.abs(got(0) - 111.3195) < 0.001)
    assert(math.abs(got(1) - 110.5743) < 0.001)
  }

  test("weightedMean weights by cos(lat)") {
    import spark.implicits._
    val df = Seq((10.0, 0.0), (20.0, 60.0)).toDF("v", "lat")
    val m = df.agg(GeoFunctions.weightedMean($"v",
      GeoFunctions.cosLatWeight($"lat"))).as[Double].collect()(0)
    assert(math.abs(m - (10.0 + 20.0 * 0.5) / 1.5) < 1e-9)
  }
}
