package graft.core

import org.apache.spark.sql.types._

/** The engine's core data model: the Tile (SURVEY §1.1, FIXTURES §1).
  *
  * One row per tile: scalar summary columns (the reference's Solr index
  * doc, TileSummary in NexusContent.proto:50-76) plus the array payload
  * (the reference's Cassandra blob, nexusmodel.py:14-34) — collapsed
  * into a single columnar table so "index scan" is predicate pushdown
  * on the scalar columns and "blob fetch" is projection of the array
  * columns. NaN is the mask value throughout (the reference's
  * numpy.ma.masked_invalid convention, CassandraProxy.pyx:41-43).
  *
  * `data` is row-major time × lat × lon (grid tiles have one time).
  */
case class Tile(
    tile_id: String,
    dataset: String,
    granule: String,
    section_spec: String,
    min_lat: Double, max_lat: Double,
    min_lon: Double, max_lon: Double,
    min_time: Long, max_time: Long,
    day_of_year: Int,
    stats_min: Double, stats_max: Double, stats_mean: Double, stats_count: Long,
    latitudes: Array[Float],
    longitudes: Array[Float],
    times: Array[Long],
    data: Array[Float],
    meta_data: Map[String, Array[Float]])

/** Point view of tile contents (nexus_point_generator,
  * nexusmodel.py:69-86): one row per non-masked cell.
  */
case class TilePoint(
    tile_id: String,
    dataset: String,
    latitude: Double,
    longitude: Double,
    time: Long,
    value: Double)

object TileModel {
  val pointSchema: StructType = StructType(Seq(
    StructField("tile_id", StringType),
    StructField("dataset", StringType),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("time", LongType),
    StructField("value", DoubleType)))
}
