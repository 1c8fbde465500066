package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** WKT polygon support (SURVEY F13/P3): parser for `POLYGON ((...))`
  * outer rings and an even-odd ray-casting containment test.
  *
  * Per SURVEY §4: a UDF suffices for exact containment; queries pair it
  * with a pushdown-friendly bbox prefilter (polygon → bbox range
  * conjunction, the reference's own `geo:[.. TO ..]` trick,
  * SolrProxy.pyx:193) so the scan prunes before the exact test runs.
  */
object Wkt {

  /** Parse the outer ring of `POLYGON ((x y, x y, ...))`. Returns
    * closed-or-open ring vertices as (x, y).
    */
  def parsePolygon(wkt: String): Array[(Double, Double)] = {
    val inner = wkt.trim
      .stripPrefix("POLYGON").trim
      .stripPrefix("((").takeWhile(_ != ')')
    inner.split(",").map { pair =>
      val parts = pair.trim.split("\\s+")
      (parts(0).toDouble, parts(1).toDouble)
    }
  }

  /** Even-odd ray casting; boundary behavior is half-open (standard). */
  def contains(poly: Array[(Double, Double)], x: Double, y: Double): Boolean = {
    var inside = false
    var j = poly.length - 1
    var i = 0
    while (i < poly.length) {
      val (xi, yi) = poly(i)
      val (xj, yj) = poly(j)
      if ((yi > y) != (yj > y) &&
        x < (xj - xi) * (y - yi) / (yj - yi) + xi) inside = !inside
      j = i
      i += 1
    }
    inside
  }

  def bbox(poly: Array[(Double, Double)]): (Double, Double, Double, Double) =
    (poly.map(_._1).min, poly.map(_._1).max, poly.map(_._2).min, poly.map(_._2).max)

  private val containsFn =
    udf((wkt: String, x: Double, y: Double) => contains(parsePolygon(wkt), x, y))

  /** Exact point-in-polygon Column predicate (UDF — apply it *after* a
    * bbox prefilter so it never sees pruned rows).
    */
  def containsCol(wkt: String, x: Column, y: Column): Column =
    containsFn(org.apache.spark.sql.functions.lit(wkt), x, y)
}
