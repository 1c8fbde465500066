package graft.ops

import graft.SparkSpec
import graft.functions.GeoFunctions
import org.apache.spark.sql.functions._

class OpsSpec extends SparkSpec {

  test("asOfPick takes the latest row per key at-or-before implicit cutoff order") {
    import spark.implicits._
    // climatology fixture (FIXTURES.md §3): days {30, 32} per bbox
    val clim = Seq(("B1", 30, "a"), ("B1", 32, "b"), ("B2", 30, "c"))
      .toDF("bbox", "doy", "v")
    // query day 31 → must pick 30; query day 32 → picks 32
    val at31 = TileIndexOps.asOfPick(clim.where($"doy" <= 31),
      Seq($"bbox"), $"doy", $"v")
    assert(at31.where($"bbox" === "B1").select("doy").as[Int].collect().toSeq === Seq(30))
    val at32 = TileIndexOps.asOfPick(clim.where($"doy" <= 32),
      Seq($"bbox"), $"doy", $"v")
    assert(at32.where($"bbox" === "B1").select("doy").as[Int].collect().toSeq === Seq(32))
  }

  test("overlaps covers all three reference overlap cases") {
    import spark.implicits._
    // (lo, hi) vs query [10, 20]
    val df = Seq((5, 12), (15, 25), (5, 25), (1, 5), (25, 30))
      .toDF("lo", "hi")
    val hit = df.where(TileIndexOps.overlaps($"lo", $"hi", lit(10), lit(20)))
    assert(hit.count() === 3)
  }

  test("boundary = intersects but not within") {
    import spark.implicits._
    val df = Seq((12, 18), (5, 12), (5, 25)).toDF("lo", "hi")
    val b = df.where(TileIndexOps.boundary($"lo", $"hi", lit(10), lit(20)))
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(b.toSet === Set((5, 12), (5, 25)))
  }

  test("AsofJoin.lastEarlier matches the latest earlier right row per key") {
    import spark.implicits._
    val left = Seq((1L, 100L, "p1"), (1L, 50L, "p2"), (2L, 10L, "p3"))
      .toDF("k", "t", "pid")
    val right = Seq((1L, 90L, "r1"), (1L, 100L, "r2"), (1L, 110L, "r3"),
      (2L, 20L, "r4")).toDF("k", "rt", "rid")
    val out = AsofJoin.lastEarlier(left, right, Seq("k"), col("t"), col("rt"),
      Seq("rid", "rt"), rightTie = "rid")
    val m = out.select("pid", "matched_rid").as[(String, String)].collect().toMap
    assert(m("p1") === "r2") // at-or-before: equal time matches
    assert(m("p2") === null) // no earlier right row
    assert(m("p3") === null) // right row is later
  }

  test("lastEarlier carries the whole matched row, not stitched fields") {
    import spark.implicits._
    val left = Seq((1L, 25L, "p")).toDF("k", "t", "pid")
    val right = Seq((1L, 10L, Option("a1"), "b1"), (1L, 20L, None, "b2"))
      .toDF("k", "rt", "a", "b")
    val out = AsofJoin.lastEarlier(left, right, Seq("k"), col("t"), col("rt"),
      Seq("a", "b"), rightTie = "rt")
    val r = out.select("matched_a", "matched_b").collect()(0)
    // latest row is (NULL, b2): fields must come from THAT row, not a
    // per-column last-non-null mix like ("a1", "b2")
    assert(r.isNullAt(0))
    assert(r.getString(1) === "b2")
  }

  /** Matchup tolerance cases from the reference test suite
    * (FIXTURES.md §2 / Matchup_test.py:16-125), via haversine + band
    * join on a degenerate single-dim key.
    */
  test("ToleranceJoin reproduces reference matchup tolerance cases") {
    import spark.implicits._
    val primary = Seq((1L, 2.0, 1.0)).toDF("pid", "plat", "plon")
    val secondary = Seq(
      (10L, 2.0, 1.0),     // exact
      (11L, 3.0, 1.0),     // ~111 km north
      (12L, 2.0, 1.001),   // ~111 m east
      (13L, 4.0, 1.0)      // ~222 km north
    ).toDF("sid", "slat", "slon")

    def matches(rtMeters: Double): Set[Long] = {
      val distKm = GeoFunctions.haversineKm(col("plat"), col("plon"),
        col("slat"), col("slon"))
      ToleranceJoin.bandJoin(primary, secondary,
          col("plat"), col("slat"), tol = 4, // 4° band ≥ any test radius
          distKm <= rtMeters / 1000.0)
        .select("sid").as[Long].collect().toSet
    }
    assert(matches(150000) === Set(10L, 11L, 12L)) // 150 km: not the 222 km pt
    assert(matches(200) === Set(10L, 12L))         // 200 m: exact + 111 m
    assert(matches(100) === Set(10L))              // 100 m: only exact
  }

  test("bandJoin2 returns exactly bandJoin's pairs on a 2-D tolerance") {
    import spark.implicits._
    // randomized-ish grid straddling cell boundaries, negative keys too
    val l = (0 until 60).map(i =>
      (i.toLong, (i * 37 % 200 - 100).toLong, (i * 13 % 40 - 20) / 3.0))
      .toDF("lid", "lt", "lv")
    val r = (0 until 60).map(i =>
      (1000L + i, (i * 53 % 200 - 100).toLong, (i * 29 % 40 - 20) / 3.0))
      .toDF("rid", "rt", "rv")
    val exact = abs(col("lt") - col("rt")) <= 10L &&
      abs(col("lv") - col("rv")) <= 2.0
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("lid", "rid").as[(Long, Long)].collect().toSet
    val oneD = pairs(ToleranceJoin.bandJoin(l, r, col("lt"), col("rt"), 10L, exact))
    val twoD = pairs(ToleranceJoin.bandJoin2(l, r, col("lt"), col("rt"), 10L,
      col("lv"), col("rv"), 2.0, exact))
    assert(twoD === oneD)
    assert(oneD.nonEmpty)
  }

  test("packed-long bandJoin2 returns exactly the struct-keyed twin's " +
    "pairs (r15 LongHashedRelation key packing)") {
    import spark.implicits._
    // denser corpus than the 1-D test: negative keys, fractional second
    // dimension, values straddling every band boundary
    val l = (0 until 200).map(i =>
      (i.toLong, (i * 37 % 400 - 200).toLong, (i * 13 % 80 - 40) / 3.0))
      .toDF("lid", "lt", "lv")
    val r = (0 until 200).map(i =>
      (1000L + i, (i * 53 % 400 - 200).toLong, (i * 29 % 80 - 40) / 3.0))
      .toDF("rid", "rt", "rv")
    val exact = abs(col("lt") - col("rt")) <= 10L &&
      abs(col("lv") - col("rv")) <= 2.0
    def pairs(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      df.select("lid", "rid").as[(Long, Long)].collect().toSeq.sorted
    val packed = pairs(ToleranceJoin.bandJoin2(l, r, col("lt"), col("rt"), 10L,
      col("lv"), col("rv"), 2.0, exact))
    val structK = pairs(ToleranceJoin.bandJoin2Struct(l, r, col("lt"), col("rt"), 10L,
      col("lv"), col("rv"), 2.0, exact))
    assert(packed === structK) // multiset equality incl. duplicates
    assert(packed.nonEmpty)
  }

  test("bandJoin2 fails loudly outside the packable band domain " +
    "instead of wrapping into a silent duplicate/missing pair") {
    import spark.implicits._
    val l = Seq((1L, 0L, math.pow(2, 21) * 2.0)).toDF("lid", "lt", "lv")
    val r = Seq((2L, 0L, 0.0)).toDF("rid", "rt", "rv")
    val e = intercept[Exception] {
      ToleranceJoin.bandJoin2(l, r, col("lt"), col("rt"), 10L,
        col("lv"), col("rv"), 2.0, lit(true)).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("packable"))
  }

  test("matchOnce keeps the nearest match per primary") {
    import spark.implicits._
    val pairs = Seq((1L, 10L, 5.0), (1L, 11L, 2.0), (1L, 12L, 9.0),
      (2L, 13L, 1.0)).toDF("pid", "sid", "dist")
    val once = ToleranceJoin.matchOnce(pairs, col("pid"), col("dist"), col("sid"))
    val m = once.select("pid", "sid").as[(Long, Long)].collect().toMap
    assert(m === Map(1L -> 11L, 2L -> 13L))
  }
}
