package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GeoMatchupSpec extends SparkSpec {

  /** Reference tolerance cases (Matchup_test.py:16-125 / FIXTURES §2),
    * plus a high-latitude case where naive flat lon-bucketing loses
    * matches.
    */
  test("geo matchup reproduces reference tolerance semantics") {
    import spark.implicits._
    val primary = Seq((1L, 2.0, 1.0, 1000L)).toDF("pid", "plat", "plon", "pt")
    val secondary = Seq(
      (10L, 2.0, 1.0, 1000L),    // exact
      (11L, 3.0, 1.0, 1000L),    // ~111 km north
      (12L, 2.0, 1.001, 1000L),  // ~111 m east
      (13L, 4.0, 1.0, 1000L),    // ~222 km north
      (14L, 2.0, 1.0, 90000L)    // exact location, out of time window
    ).toDF("sid", "slat", "slon", "st")

    def ids(rt: Double, tt: Long) = GeoMatchup.matchup(
      primary, secondary, $"plat", $"plon", $"pt", $"slat", $"slon", $"st",
      rt, tt).select("sid").as[Long].collect().toSet

    assert(ids(150000, 86400) === Set(10L, 11L, 12L))
    assert(ids(200, 86400) === Set(10L, 12L))
    assert(ids(100, 86400) === Set(10L))
    assert(ids(150000, 60) === Set(10L, 11L, 12L)) // 14 excluded by time
    // tt=0 is a valid EXACT-TIME matchup (the reference's Matchup.py
    // accepts it — get_int_arg('tt') has no lower bound): only the
    // same-timestamp candidates survive, and the time-cell key must
    // not divide by zero
    assert(ids(150000, 0) === Set(10L, 11L, 12L)) // all at t=1000 exactly
    assert(ids(100, 0) === Set(10L))
    val negTt = intercept[IllegalArgumentException] {
      ids(150000, -1)
    }
    assert(negTt.getMessage.contains("non-negative"))
  }

  test("matches survive at high latitude (lon cells shrink with cos)") {
    import spark.implicits._
    // at 60°N, 1° of longitude ≈ 55.7 km — two points 0.5° apart ≈ 28 km
    val primary = Seq((1L, 60.0, 10.0, 0L)).toDF("pid", "plat", "plon", "pt")
    val secondary = Seq((2L, 60.0, 10.5, 0L)).toDF("sid", "slat", "slon", "st")
    val m = GeoMatchup.matchup(primary, secondary,
      $"plat", $"plon", $"pt", $"slat", $"slon", $"st",
      rtMeters = 30000, ttSeconds = 3600)
    assert(m.count() === 1)
    val d = m.select("dist_km").as[Double].collect()(0)
    assert(d > 25 && d < 30)
  }

  test("cross-antimeridian pairs match without pre-rotation") {
    import spark.implicits._
    // 179.95°E and 179.95°W at the equator are ~11.1 km apart across
    // the seam (and ~39 989 km apart the linear way)
    val primary = Seq((1L, 0.0, 179.95, 0L)).toDF("pid", "plat", "plon", "pt")
    val secondary = Seq(
      (2L, 0.0, -179.95, 0L),  // 0.1° across the seam — admissible
      (3L, 0.0, -178.0, 0L)    // 2.05° across the seam — out of range
    ).toDF("sid", "slat", "slon", "st")
    for (geo <- Seq(false, true)) {
      val m = GeoMatchup.matchup(primary, secondary,
        $"plat", $"plon", $"pt", $"slat", $"slon", $"st",
        rtMeters = 20000, ttSeconds = 3600, geodesic = geo)
      val rows = m.select($"sid", $"dist_km").as[(Long, Double)].collect()
      assert(rows.map(_._1).toSet === Set(2L), s"geodesic=$geo: $rows")
      // the distance must be the short way (≈11.1 km), not the wrap
      assert(rows(0)._2 > 10 && rows(0)._2 < 12.5, s"geodesic=$geo: $rows")
    }
    // same seam pair at 60°N: the zonal gap shrinks with cos(lat)
    val pHigh = Seq((1L, 60.0, 179.95, 0L)).toDF("pid", "plat", "plon", "pt")
    val sHigh = Seq((2L, 60.0, -179.95, 0L)).toDF("sid", "slat", "slon", "st")
    assert(GeoMatchup.matchup(pHigh, sHigh,
      $"plat", $"plon", $"pt", $"slat", $"slon", $"st",
      rtMeters = 20000, ttSeconds = 3600).count() === 1)
  }

  test("huge tolerance (few lon cells) does not duplicate pairs") {
    import spark.implicits._
    // rt = 2000 km at maxAbsLat 66° → very wide lon cells; modular ±1
    // neighbors collide and must be deduplicated, not double-joined
    val primary = Seq((1L, 0.0, 0.0, 0L)).toDF("pid", "plat", "plon", "pt")
    val secondary = Seq((2L, 0.0, 10.0, 0L)).toDF("sid", "slat", "slon", "st")
    val m = GeoMatchup.matchup(primary, secondary,
      $"plat", $"plon", $"pt", $"slat", $"slon", $"st",
      rtMeters = 2000000, ttSeconds = 3600)
    assert(m.count() === 1)
  }

  test("time tolerance bounds matches") {
    import spark.implicits._
    val primary = Seq((1L, 0.0, 0.0, 0L)).toDF("pid", "plat", "plon", "pt")
    val secondary = Seq(
      (2L, 0.0, 0.0, 3599L), (3L, 0.0, 0.0, 3601L)
    ).toDF("sid", "slat", "slon", "st")
    val ids = GeoMatchup.matchup(primary, secondary,
        $"plat", $"plon", $"pt", $"slat", $"slon", $"st", 1000, 3600)
      .select("sid").as[Long].collect().toSet
    assert(ids === Set(2L))
  }

  /** F11b: WGS84 vs sphere flips membership at the tolerance boundary.
    * A 0.9° meridian pair at the equator measures ≈100.07 km on the
    * R=6371 sphere but ≈99.52 km on the ellipsoid (meridian degrees are
    * SHORT near the equator) — at rt = 99.8 km only the geodesic
    * predicate admits the pair, which is the reference's measurement
    * (Matchup.py:464-468).
    */
  test("geodesic option admits boundary pairs haversine rejects") {
    import spark.implicits._
    val primary = Seq((1L, 0.0, 10.0, 0L)).toDF("pid", "plat", "plon", "pt")
    val secondary = Seq((2L, 0.9, 10.0, 0L)).toDF("sid", "slat", "slon", "st")
    def ids(geodesic: Boolean) = GeoMatchup.matchup(
        primary, secondary, $"plat", $"plon", $"pt", $"slat", $"slon", $"st",
        rtMeters = 99800, ttSeconds = 60, geodesic = geodesic)
      .select("sid").as[Long].collect().toSet
    assert(ids(geodesic = false) === Set.empty[Long])
    assert(ids(geodesic = true) === Set(2L))
  }

  /** r15: the packed-long cell key (default) must reproduce the
    * struct-keyed r13 form pair for pair — including modular lon
    * wrap, the antimeridian seam, and both polar-cap passes.
    */
  test("packed cell keys return exactly the struct-keyed twin's pairs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    def pts(n: Int, idBase: Long) = (0 until n).map { i =>
      (idBase + i,
        rnd.nextDouble() * 178 - 89,           // lat, incl. near-cap
        rnd.nextDouble() * 360 - 180,          // lon, incl. seam
        (rnd.nextInt(20000) - 10000).toLong)   // time
    }
    val primary = pts(150, 0).toDF("pid", "plat", "plon", "pt")
    val secondary = pts(150, 1000).toDF("sid", "slat", "slon", "st")
    def pairs(structKeys: Boolean) = GeoMatchup.matchup(
        primary, secondary, $"plat", $"plon", $"pt", $"slat", $"slon", $"st",
        rtMeters = 500000, ttSeconds = 3600, maxAbsLat = 90.0,
        structKeys = structKeys)
      .select($"pid", $"sid").as[(Long, Long)].collect().toSeq.sorted
    val packed = pairs(structKeys = false)
    val structK = pairs(structKeys = true)
    assert(packed === structK)
    assert(packed.nonEmpty)
  }

  /** VERDICT r4 #8: at |lat| -> 90 the zonal cell bound degenerates;
    * the polar-cap passes must keep pairs that cross the pole (or sit
    * at wildly different longitudes near it) without disturbing the
    * sub-cap grid path.
    */
  test("polar cap: pairs across the pole and across the cap boundary match") {
    import spark.implicits._
    val primary = Seq(
      (1L, 89.9, 0.0, 0L),     // near north pole
      (2L, 84.5, 10.0, 0L),    // just below the cap boundary
      (3L, -89.9, 0.0, 0L)     // near south pole
    ).toDF("pid", "plat", "plon", "pt")
    val secondary = Seq(
      (10L, 89.9, 180.0, 0L),  // across the pole from pid 1: ~22.2 km
      (11L, 89.9, 90.0, 0L),   // 90 degrees of lon away: ~15.7 km
      (12L, 85.5, 10.0, 0L),   // ~111 km poleward of pid 2, in the cap
      (13L, 89.0, 10.0, 0L)    // ~100 km equatorward of pid 1 pole... far from 2
    ).toDF("sid", "slat", "slon", "st")
    def pairs(rt: Double) = GeoMatchup.matchup(primary, secondary,
        $"plat", $"plon", $"pt", $"slat", $"slon", $"st",
        rtMeters = rt, ttSeconds = 3600, maxAbsLat = 90.0)
      .select($"pid", $"sid").as[(Long, Long)].collect().toSet
    // 30 km: only the two near-pole geometries admit
    assert(pairs(30000) === Set((1L, 10L), (1L, 11L)))
    // 120 km: the boundary-straddling pair and the 89.0-lat one join in
    assert(pairs(120000) ===
      Set((1L, 10L), (1L, 11L), (2L, 12L), (1L, 13L)))
    // the south-pole primary matches nothing (its cap is empty) and no
    // cross-hemisphere pair ever forms
    assert(!pairs(120000).exists(_._1 == 3L))
    // sub-cap maxAbsLat keeps the pure grid path: same call with the
    // polar rows filtered away must equal the grid answer exactly
    val subP = primary.where($"plat".between(-66, 66))
    val subS = secondary.where($"slat".between(-66, 66))
    assert(GeoMatchup.matchup(subP, subS,
      $"plat", $"plon", $"pt", $"slat", $"slon", $"st",
      rtMeters = 120000, ttSeconds = 3600, maxAbsLat = 66.0).count() === 0)
  }
}
