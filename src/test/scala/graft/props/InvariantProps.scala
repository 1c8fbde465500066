package graft.props

import graft.SparkSpec
import graft.core.{Tile, TileOps}
import graft.functions.GeoFunctions
import graft.ops.TileIndexOps
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property tests (raw ScalaCheck; run by sbt's scalacheck framework)
  * for the invariants SURVEY §5 calls out: weighted-mean bounds,
  * NaN-mask propagation through explosion and stats, and the
  * interval-overlap algebra.
  */
object InvariantProps extends Properties("graft.invariants") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  property("weighted mean bounded by min/max (cos-lat weights)") =
    Prop.forAll(Gen.listOfN(3, Gen.choose(-80.0, 80.0)),
      Gen.listOfN(3, Gen.choose(-100.0, 100.0))) { (lats, vals) =>
      val df = lats.zip(vals).toDF("lat", "v")
      val m = df.agg(GeoFunctions.weightedMean($"v",
        GeoFunctions.cosLatWeight($"lat"))).collect()(0).getDouble(0)
      m >= vals.min - 1e-9 && m <= vals.max + 1e-9
    }

  property("NaN mask propagates through explosion and stats") =
    Prop.forAll(Gen.listOfN(8, Gen.oneOf(true, false))) { mask =>
      val data = Array.tabulate(8)(i =>
        if (mask(i)) Float.NaN else (i + 1).toFloat)
      val tile = Tile("t", "d", "g", "s", 0, 1, 0, 3, 0, 0, 1,
        0, 0, 0, 0,
        latitudes = Array(0f, 1f), longitudes = Array(0f, 1f, 2f, 3f),
        times = Array(0L), data = data, meta_data = Map.empty)
      val points = TileOps.toPoints(Seq(tile).toDF())
      val live = mask.count(!_)
      val countOk = points.count() == live
      val statsOk = live == 0 || {
        val s = TileOps.tileSummaries(points).collect()(0)
        val liveVals = data.filterNot(_.isNaN).map(_.toDouble)
        s.getAs[Long]("stats_count") == live &&
          s.getAs[Double]("stats_min") == liveVals.min &&
          s.getAs[Double]("stats_max") == liveVals.max
      }
      countOk && statsOk
    }

  property("overlap ≡ !(hi < s || lo > e)") =
    Prop.forAll(Gen.choose(-50, 50), Gen.choose(0, 30), Gen.choose(-50, 50),
      Gen.choose(0, 30)) { (lo, w1, s, w2) =>
      val hi = lo + w1
      val e = s + w2
      val got = Seq((lo, hi)).toDF("lo", "hi")
        .where(TileIndexOps.overlaps(col("lo"), col("hi"), lit(s), lit(e)))
        .count() == 1
      got == !(hi < s || lo > e)
    }

  property("haversine symmetric, non-negative, zero on identity") =
    Prop.forAll(Gen.choose(-80.0, 80.0), Gen.choose(-170.0, 170.0),
      Gen.choose(-80.0, 80.0), Gen.choose(-170.0, 170.0)) { (la1, lo1, la2, lo2) =>
      val r = Seq((la1, lo1, la2, lo2)).toDF("a", "b", "c", "d").select(
        GeoFunctions.haversineKm(col("a"), col("b"), col("c"), col("d")),
        GeoFunctions.haversineKm(col("c"), col("d"), col("a"), col("b")),
        GeoFunctions.haversineKm(col("a"), col("b"), col("a"), col("b")))
        .collect()(0)
      val (fwd, rev, self) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
      math.abs(fwd - rev) < 1e-9 && fwd >= 0.0 && self == 0.0
    }
}
