package graft.props

import graft.SparkSpec
import graft.functions.GeoFunctions
import graft.ops.{GeoMatchup, ToleranceJoin}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Completeness properties for the candidate-generation joins: the
  * banded/grid equi-join strategies must find EXACTLY the pairs the
  * naive theta-join finds — no border losses, no duplicates — for
  * random inputs and random tolerances.
  */
object JoinCompletenessProps extends Properties("graft.join.completeness") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  property("bandJoin ≡ naive theta join on random 1-D data") =
    Prop.forAll(
      Gen.listOfN(25, Gen.choose(0L, 1000L)),
      Gen.listOfN(25, Gen.choose(0L, 1000L)),
      Gen.choose(20L, 300L)) { (ls, rs, tol) =>
      val left = ls.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("lid", "lv")
      val right = rs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("rid", "rv")
      val banded = ToleranceJoin.bandJoin(left, right, col("lv"), col("rv"), tol,
          abs(col("lv") - col("rv")) <= tol)
        .select("lid", "rid").as[(Long, Long)].collect().toSet
      val naive = (for {
        (lv, li) <- ls.zipWithIndex
        (rv, ri) <- rs.zipWithIndex
        if math.abs(lv - rv) <= tol
      } yield (li.toLong, ri.toLong)).toSet
      banded == naive
    }

  property("GeoMatchup ≡ naive haversine join on random points") =
    Prop.forAll(
      Gen.listOfN(12, Gen.zip(Gen.choose(-60.0, 60.0), Gen.choose(-170.0, 170.0),
        Gen.choose(0L, 100000L))),
      Gen.listOfN(12, Gen.zip(Gen.choose(-60.0, 60.0), Gen.choose(-170.0, 170.0),
        Gen.choose(0L, 100000L))),
      Gen.choose(50000.0, 500000.0),
      Gen.choose(1000L, 50000L)) { (ps, ss, rt, tt) =>
      val p = ps.zipWithIndex.map { case ((la, lo, t), i) => (i.toLong, la, lo, t) }
        .toDF("pid", "plat", "plon", "pt")
      val s = ss.zipWithIndex.map { case ((la, lo, t), i) => (i.toLong, la, lo, t) }
        .toDF("sid", "slat", "slon", "st")
      val grid = GeoMatchup.matchup(p, s, col("plat"), col("plon"), col("pt"),
          col("slat"), col("slon"), col("st"), rt, tt, maxAbsLat = 61.0)
        .select("pid", "sid").as[(Long, Long)].collect().toSet
      val naive = (for {
        ((pla, plo, pt), pi) <- ps.zipWithIndex
        ((sla, slo, st), si) <- ss.zipWithIndex
        if math.abs(pt - st) <= tt && hav(pla, plo, sla, slo) * 1000 <= rt
      } yield (pi.toLong, si.toLong)).toSet
      grid == naive
    }

  /** The polar-cap decomposition (main/A/B passes above CapLat) must
    * partition the pair space exactly: random points drawn INTO both
    * caps, the cap-adjacent bands, and the mid-latitudes, matched with
    * maxAbsLat = 90, must reproduce the naive haversine join with no
    * duplicates and no drops — including pairs straddling the cap
    * boundary and pairs across the pole.
    */
  property("polar-cap GeoMatchup ≡ naive haversine join near the poles") =
    Prop.forAll(
      Gen.listOfN(12, Gen.zip(polarLat, Gen.choose(-180.0, 180.0),
        Gen.choose(0L, 50000L))),
      Gen.listOfN(12, Gen.zip(polarLat, Gen.choose(-180.0, 180.0),
        Gen.choose(0L, 50000L))),
      Gen.choose(50000.0, 400000.0),
      Gen.choose(1000L, 50000L)) { (ps, ss, rt, tt) =>
      val p = ps.zipWithIndex.map { case ((la, lo, t), i) => (i.toLong, la, lo, t) }
        .toDF("pid", "plat", "plon", "pt")
      val s = ss.zipWithIndex.map { case ((la, lo, t), i) => (i.toLong, la, lo, t) }
        .toDF("sid", "slat", "slon", "st")
      val grid = GeoMatchup.matchup(p, s, col("plat"), col("plon"), col("pt"),
          col("slat"), col("slon"), col("st"), rt, tt, maxAbsLat = 90.0)
        .select("pid", "sid").as[(Long, Long)].collect()
      val naive = (for {
        ((pla, plo, pt), pi) <- ps.zipWithIndex
        ((sla, slo, st), si) <- ss.zipWithIndex
        if math.abs(pt - st) <= tt && hav(pla, plo, sla, slo) * 1000 <= rt
      } yield (pi.toLong, si.toLong)).toSet
      Prop(grid.length == grid.toSet.size) :| "no duplicate pairs" &&
        Prop(grid.toSet == naive) :|
          s"missing=${naive -- grid.toSet} extra=${grid.toSet -- naive}"
    }

  /** Latitudes concentrated where the cap logic switches: both caps,
    * both boundary bands, and a mid-latitude control group.
    */
  private def polarLat: Gen[Double] = Gen.oneOf(
    Gen.choose(85.5, 90.0), Gen.choose(-90.0, -85.5),   // inside the caps
    Gen.choose(80.0, 85.5), Gen.choose(-85.5, -80.0),   // boundary bands
    Gen.choose(-45.0, 45.0))                            // control

  private def hav(la1: Double, lo1: Double, la2: Double, lo2: Double): Double = {
    val dLat = math.toRadians(la2 - la1)
    val dLon = math.toRadians(lo2 - lo1)
    val a = math.pow(math.sin(dLat / 2), 2) +
      math.cos(math.toRadians(la1)) * math.cos(math.toRadians(la2)) *
        math.pow(math.sin(dLon / 2), 2)
    2 * GeoFunctions.EarthRadiusKm * math.asin(math.sqrt(a))
  }
}

/** connectedComponents must equal brute-force union-find on random
  * graphs: same partition of nodes into components, min-id labels.
  */
object ConnectedComponentsProps extends Properties("graft.dedup.cc") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  property("connectedComponents ≡ union-find on random graphs") =
    Prop.forAll(
      Gen.choose(2, 24),
      Gen.listOfN(30, Gen.zip(Gen.choose(0L, 23L), Gen.choose(0L, 23L)))) { (n, rawEdges) =>
      val edges = rawEdges.map { case (a, b) => (a % n, b % n) }
        .filter { case (a, b) => a != b }
      val expected = unionFind(n, edges)
      val edgeDf =
        if (edges.isEmpty) Seq.empty[(Long, Long)].toDF("src", "dst")
        else edges.toDF("src", "dst")
      val got = graft.dedup.Dedup.connectedComponents(
          edgeDf, (0L until n.toLong).toDF("id"), maxIter = 30)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      Prop(got == expected) :| s"n=$n edges=$edges got=$got want=$expected"
    }
}
