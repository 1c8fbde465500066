package graft.props

import graft.SparkSpec
import graft.ingest.Ingest
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Properties of the Morton (Z-order) sort key used by the tile-store
  * compaction: bijective on grid cells (no two cells collide, so the
  * sort is a total spatial order) and bounded (fits the bit budget).
  */
object ZorderProps extends Properties("graft.zorder") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  property("bijective on an aligned grid; bounded by 2^(2·bits)") =
    Prop.forAll(Gen.choose(2, 5), Gen.choose(-80.0, 60.0),
      Gen.choose(-170.0, 150.0)) { (bits, lat0, lon0) =>
      val n = 1 << bits // one point per quantization cell
      val latSpan = 20.0
      val lonSpan = 25.0
      val cells = for (i <- 0 until n; j <- 0 until n)
        yield (lat0 + latSpan * (i + 0.5) / n, lon0 + lonSpan * (j + 0.5) / n)
      val z = cells.toDF("lat", "lon")
        .select(Ingest.zorder2(
          $"lat", lit(lat0), lit(lat0 + latSpan),
          $"lon", lit(lon0), lit(lon0 + lonSpan), bits).as("z"))
        .as[Long].collect()
      z.distinct.length == n * n && z.forall(v => v >= 0 && v < (1L << (2 * bits)))
    }

  property("1-D locality: adjacent cells in one row differ only in x bits") =
    Prop.forAll(Gen.choose(2, 6)) { bits =>
      val n = 1 << bits
      // fixed y → z restricted to even bit positions, monotone in x
      val z = (0 until n).map(_.toDouble).toDF("x")
        .select(Ingest.zorder2($"x", lit(0.0), lit(n.toDouble),
          lit(0.0), lit(0.0), lit(1.0), bits).as("z"))
        .as[Long].collect().toSeq
      z == z.sorted && z.distinct.length == n
    }
}
