package graft.core

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed `Dataset[Tile]` surface for kernels that want compile-time
  * schemas (the engine's `Dataset[T]`-where-type-safety-helps layer);
  * the untyped DataFrame operators in TileOps remain the dynamic-schema
  * path. Conversions are encoder-only — no extra shuffle or copy.
  */
object TypedTileOps {

  def asTiles(df: org.apache.spark.sql.DataFrame): Dataset[Tile] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.as[Tile]
  }

  /** Typed point explosion — same semantics as TileOps.toPoints
    * (NaN-masked cells dropped), with a typed output.
    */
  def toPoints(tiles: Dataset[Tile]): Dataset[TilePoint] = {
    val spark = tiles.sparkSession
    import spark.implicits._
    tiles.flatMap { t =>
      val nlat = t.latitudes.length
      val nlon = t.longitudes.length
      t.data.iterator.zipWithIndex.collect {
        case (v, idx) if !v.isNaN =>
          val ti = idx / (nlat * nlon)
          val li = idx % (nlat * nlon) / nlon
          val gi = idx % nlon
          TilePoint(t.tile_id, t.dataset,
            t.latitudes(li).toDouble, t.longitudes(gi).toDouble,
            t.times(ti), v.toDouble)
      }
    }
  }

  /** Swath normalization (SURVEY S2 / FIXTURES §1.2): a swath
    * observation list (2-d lat/lon/time flattened to parallel arrays of
    * equal length) becomes point rows directly — equivalent results to
    * the reference's O(n²) diagonalized array
    * (CassandraProxy.pyx:86-107) without materializing the diagonal.
    */
  def swathToPoints(spark: SparkSession,
                    swaths: Dataset[(String, String, Array[Float], Array[Float], Array[Long], Array[Float])])
      : Dataset[TilePoint] = {
    import spark.implicits._
    swaths.flatMap { case (tileId, dataset, lats, lons, times, values) =>
      require(lats.length == lons.length && lons.length == times.length &&
        times.length == values.length, "swath arrays must be parallel")
      values.iterator.zipWithIndex.collect {
        case (v, i) if !v.isNaN =>
          TilePoint(tileId, dataset, lats(i).toDouble, lons(i).toDouble,
            times(i), v.toDouble)
      }
    }
  }

  /** Secondary-variable explosion (the reference's `meta_data` dict of
    * named arrays, nexusmodel.py:34): one point row per (cell,
    * variable), variable name carried as a column.
    */
  def toPointsWithMeta(tiles: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val primary = TileOps.toPoints(tiles).withColumn("variable", lit("primary"))
    val nlat = size(col("latitudes"))
    val nlon = size(col("longitudes"))
    val meta = tiles
      .select(col("tile_id"), col("dataset"), col("latitudes"), col("longitudes"),
        col("times"), nlat.as("nlat"), nlon.as("nlon"),
        explode(col("meta_data")).as(Seq("variable", "marr")))
      .select(col("tile_id"), col("dataset"), col("latitudes"), col("longitudes"),
        col("times"), col("nlat"), col("nlon"), col("variable"),
        posexplode(col("marr")).as(Seq("idx", "value")))
      .where(!isnan(col("value")))
      .select(col("tile_id"), col("dataset"),
        element_at(col("latitudes"), (col("idx") % (col("nlat") * col("nlon")) / col("nlon")).cast("int") + 1)
          .cast("double").as("latitude"),
        element_at(col("longitudes"), (col("idx") % col("nlon")).cast("int") + 1)
          .cast("double").as("longitude"),
        element_at(col("times"), (col("idx") / (col("nlat") * col("nlon"))).cast("int") + 1)
          .as("time"),
        col("value").cast("double").as("value"),
        col("variable"))
    primary.unionByName(meta)
  }
}
