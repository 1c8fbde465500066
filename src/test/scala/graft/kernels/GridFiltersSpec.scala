package graft.kernels

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GridFiltersSpec extends SparkSpec {
  import spark.implicits._

  private val uniform = Seq(Seq(1, 1, 1), Seq(1, 1, 1), Seq(1, 1, 1))
  private val gaussian = Seq(Seq(1, 2, 1), Seq(2, 4, 2), Seq(1, 2, 1))

  private def full3x3(epoch: String) =
    for { i <- 0 until 3; j <- 0 until 3 }
      yield (epoch, i.toLong, j.toLong, (i * 3 + j + 1).toDouble)

  test("spatialFilter uniform kernel on a full grid averages the window") {
    val cells = full3x3("d1").toDF("e", "lat", "lon", "v")
    val out = GridFilters.spatialFilter(cells, "e", "lat", "lon", "v",
        uniform, normalization = 9.0, latN = 3, lonN = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getLong(3))).toMap
    // center sees all 9 values 1..9: mean = 45/9 = 5
    assert(math.abs(out((1L, 1L))._1 - 5.0) < 1e-12)
    // corner (0,0) sees only the present 2x2 window {1,2,4,5} but still
    // divides by the full normalization (reference semantics)
    assert(math.abs(out((0L, 0L))._1 - 12.0 / 9.0) < 1e-12)
    assert(out.values.forall(_._2 == 1L)) // single epoch everywhere
  }

  test("spatialFilter applies asymmetric-position weights correctly") {
    // single cell at (1,1): each center receives exactly filter(Δ)·v/norm
    val cells = Seq(("d1", 1L, 1L, 16.0)).toDF("e", "lat", "lon", "v")
    val out = GridFilters.spatialFilter(cells, "e", "lat", "lon", "v",
        gaussian, normalization = 16.0, latN = 3, lonN = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out((1L, 1L)) === 4.0) // center weight 4: 4*16/16
    assert(out((0L, 1L)) === 2.0) // edge-adjacent weight 2
    assert(out((0L, 0L)) === 1.0) // diagonal weight 1
    assert(out.size === 9)
  }

  test("spatialFilter averages only over epochs whose window has data") {
    val cells = (full3x3("d1") :+ ("d2", 0L, 0L, 9.0))
      .toDF("e", "lat", "lon", "v")
    val out = GridFilters.spatialFilter(cells, "e", "lat", "lon", "v",
        uniform, normalization = 9.0, latN = 3, lonN = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getLong(3))).toMap
    // (2,2) is out of d2's window: only d1 counts
    assert(out((2L, 2L))._2 === 1L)
    // (0,0): d1 gives 12/9, d2 gives 9/9 = 1 → mean of the two
    assert(out((0L, 0L))._2 === 2L)
    assert(math.abs(out((0L, 0L))._1 - (12.0 / 9.0 + 1.0) / 2.0) < 1e-12)
  }

  test("gaussInterp reproduces a constant field exactly") {
    val cells = (for { i <- 0 until 3; j <- 0 until 3; d <- 0 until 2 }
      yield (d.toLong, i.toLong, j.toLong, 7.5)).toDF("ed", "lat", "lon", "v")
    val out = GridFilters.gaussInterp(cells, col("ed"), "lat", "lon", "v",
        radius = 1, slat = 1.0, slon = 1.0, stime = 1.0,
        vfactor = -0.6931, midEpochDay = lit(1), latN = 3, lonN = 3)
      .collect()
    assert(out.length === 9)
    // Σw·c/Σw = c regardless of the weights
    assert(out.forall(r => math.abs(r.getDouble(2) - 7.5) < 1e-12))
  }

  test("gaussInterp matches the hand-computed weight formula") {
    // two cells, one epoch at the mid time: center (0,0) hears itself
    // at weight 1 and (0,1) at weight exp(vf·(1/slon)²)
    val cells = Seq((0L, 0L, 0L, 2.0), (0L, 0L, 1L, 10.0))
      .toDF("ed", "lat", "lon", "v")
    val vf = -0.5
    val out = GridFilters.gaussInterp(cells, col("ed"), "lat", "lon", "v",
        radius = 1, slat = 2.0, slon = 2.0, stime = 1.0,
        vfactor = vf, midEpochDay = lit(0), latN = 2, lonN = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    val wNear = math.exp(vf * 0.25) // one cell away, slon=2
    val expected = (2.0 + wNear * 10.0) / (1.0 + wNear)
    val (interp, wsum, n) = out((0L, 0L))
    assert(n === 2L)
    assert(math.abs(wsum - (1.0 + wNear)) < 1e-12)
    assert(math.abs(interp - expected) < 1e-12)
  }

  test("gaussInterp downweights epochs away from the mid time") {
    // same cell observed at the mid epoch (v=0) and 2 days later (v=10):
    // the interp must sit below the plain mean of 5
    val cells = Seq((5L, 1L, 1L, 0.0), (7L, 1L, 1L, 10.0))
      .toDF("ed", "lat", "lon", "v")
    val out = GridFilters.gaussInterp(cells, col("ed"), "lat", "lon", "v",
        radius = 0, slat = 1.0, slon = 1.0, stime = 1.0,
        vfactor = -0.6931, midEpochDay = lit(5), latN = 3, lonN = 3)
      .collect()
    assert(out.length === 1)
    val interp = out.head.getDouble(2)
    val wFar = math.exp(-0.6931 * 4.0)
    assert(math.abs(interp - wFar * 10.0 / (1.0 + wFar)) < 1e-12)
    assert(interp < 5.0)
  }

  test("spatialFilter and gaussInterp clip windows to the grid bounds") {
    val cells = Seq(("d1", 0L, 0L, 1.0), ("d1", 9L, 9L, 1.0))
      .toDF("e", "lat", "lon", "v")
    val sf = GridFilters.spatialFilter(cells, "e", "lat", "lon", "v",
      uniform, 9.0, latN = 10, lonN = 10)
    assert(sf.where(col("lat") < 0 || col("lat") > 9 ||
      col("lon") < 0 || col("lon") > 9).count() === 0)
    assert(sf.count() === 8) // two disjoint corner neighborhoods of 4
    val gi = GridFilters.gaussInterp(cells.withColumn("ed", lit(0L)),
      col("ed"), "lat", "lon", "v", 1, 1.0, 1.0, 1.0, -0.6931, lit(0),
      latN = 10, lonN = 10)
    assert(gi.where(col("lat") < 0 || col("lat") > 9 ||
      col("lon") < 0 || col("lon") > 9).count() === 0)
    assert(gi.count() === 8)
  }
}
