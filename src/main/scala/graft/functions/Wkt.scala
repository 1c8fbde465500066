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
    * closed-or-open ring vertices as (x, y). Whitespace between WKT
    * tokens is legal (`POLYGON ( (30 10, ...) )`), so parens are
    * located structurally rather than by exact-prefix match.
    */
  def parsePolygon(wkt: String): Array[(Double, Double)] = {
    val t = wkt.trim
    require(t.toUpperCase.startsWith("POLYGON"),
      s"not a WKT POLYGON: '${t.take(32)}'")
    val body = t.drop("POLYGON".length)
    // outer ring = text between the SECOND '(' and the next ')'
    val open1 = body.indexOf('(')
    val open2 = if (open1 < 0) -1 else body.indexOf('(', open1 + 1)
    val close = if (open2 < 0) -1 else body.indexOf(')', open2 + 1)
    require(open2 >= 0 && close > open2,
      s"malformed WKT POLYGON ring: '${t.take(48)}'")
    body.substring(open2 + 1, close).split(",").map { pair =>
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

  /** Exact point-in-polygon Column predicate (UDF — apply it *after* a
    * bbox prefilter so it never sees pruned rows). The ring parses
    * ONCE at Column construction — the wkt argument is a constant per
    * query, and re-parsing the string inside the per-row hot loop was
    * pure waste (it also means a malformed polygon fails at plan
    * build, not per-task).
    */
  def containsCol(wkt: String, x: Column, y: Column): Column = {
    val ring = parsePolygon(wkt)
    val f = udf((px: Double, py: Double) => contains(ring, px, py))
    f(x, y)
  }
}
