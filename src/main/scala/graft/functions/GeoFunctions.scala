package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar geo/unit kernels from the reference's ingest processors and
  * matchup math (SURVEY §2.6), expressed as codegen-friendly Column
  * expressions (no UDFs — every one of these stays inside
  * whole-stage codegen).
  *
  * References (semantics only, /root/reference/):
  *  - kelvin→celsius: nexus-ingest/nexus-xd-python-modules/nexusxd/kelvintocelsius.py:11-22
  *  - wind dir/speed ↔ U/V: nexusxd/winddirspeedtouv.py, computespeeddirfromuv.py
  *  - longitude wrap 0..360 → −180..180: nexusxd/subtract180longitude.py:10-31
  *  - haversine: analysis/webservice/algorithms/doms/geo.py:17-48
  *  - cos-latitude area weight: data-access/nexustiles/model/nexusmodel.py:102-103
  */
object GeoFunctions {
  val EarthRadiusKm = 6371.0

  def kelvinToCelsius(k: Column): Column = k - lit(273.15)

  /** Wrap a longitude in [0, 360) into (−180, 180]. */
  def lonTo180(lon: Column): Column =
    when(lon > 180, lon - 360).otherwise(lon)

  /** Meteorological wind (speed, direction-degrees) → U (eastward) component. */
  def windU(speed: Column, dirDeg: Column): Column =
    speed * cos(radians(lit(90) - dirDeg))

  /** Meteorological wind (speed, direction-degrees) → V (northward) component. */
  def windV(speed: Column, dirDeg: Column): Column =
    speed * sin(radians(lit(90) - dirDeg))

  def uvToSpeed(u: Column, v: Column): Column = sqrt(u * u + v * v)

  /** Meteorological FROM-direction in [0, 360) — the reference kernel's
    * convention (computespeeddirfromuv.py: degrees(atan2(−u, −v)) mod
    * 360). Note windU/windV build the TOWARD vector, so a round trip
    * returns the original direction + 180° (mod 360), exactly as the
    * reference pair does.
    */
  def uvToDirDeg(u: Column, v: Column): Column = {
    val d = degrees(atan2(-u, -v))
    when(d < 0, d + 360).otherwise(d)
  }

  /** Great-circle distance in km between two (lat, lon) points, degrees in. */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1)
    val dLon = radians(lon2 - lon1)
    val a = pow(sin(dLat / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon / 2), 2)
    lit(2 * EarthRadiusKm) * asin(sqrt(a))
  }

  /** Area weight for grid-cell statistics: cos(latitude). */
  def cosLatWeight(latDeg: Column): Column = cos(radians(latDeg))

  /** Snap an epoch-seconds time to DAY 1 of its UTC month, KEEPING the
    * time of day — exactly the reference's climatology-normalization
    * processor (`normalizetimebeginningofmonth.py:25-30`:
    * `timeObj.replace(day=1)`, not a truncation to midnight). The UTC
    * calendar date comes from pure DATE arithmetic (epoch day count
    * added to 1970-01-01), which is timezone-free — extracting
    * dayofmonth from a TIMESTAMP would read the SESSION timezone and
    * snap near-midnight instants into the wrong month on non-UTC
    * sessions. UTC days are uniform 86400 s, so subtracting
    * (day-of-month − 1) days is the closed codegen form.
    */
  def timeToMonthStart(epochSec: Column): Column = {
    val utcDate = date_add(to_date(lit("1970-01-01")),
      floor(epochSec / 86400.0).cast("int"))
    epochSec - (dayofmonth(utcDate) - 1).cast("long") * 86400L
  }

  /** Weighted mean as a single expression: sum(v*w)/sum(w) (null-skipping). */
  def weightedMean(v: Column, w: Column): Column = sum(v * w) / sum(w)
}
