package graft.kernels

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Climatology-generation grid smoothers (SURVEY §2.10): the reference's
  * `spatialFilter` and `gaussInterp` averaging functions re-expressed as
  * sparse neighbor-explode aggregations.
  *
  * Both kernels turn "every output cell reads a neighborhood of input
  * cells" into "every input cell is exploded to the windows it
  * contributes to, then a groupBy of the window center": partial
  * aggregation happens map-side, the shuffle key (epoch, cell) is as
  * uniform as the grid itself, and the only data amplification is the
  * fixed window size. The dense alternative (co-locate the full grid
  * per partition and slide an array window) needs the whole grid
  * resident per task; this form needs nothing but the sparse cell
  * table, so it survives any grid resolution.
  */
object GridFilters {

  /** Fixed 3×3 spatial filter, then mean over epochs
    * (climatology/clim/spatialFilter.py:11-35; Fortran kernel
    * spatialFilter_f.f:80-118): per epoch, each in-bounds center cell
    * receives Σ filter(Δlat,Δlon)·v over PRESENT neighbors divided by
    * the filter's fixed `normalization` — absent neighbors contribute
    * zero, exactly like the reference's mask — and epochs whose whole
    * window is empty don't count toward the final mean. Centers never
    * touched by any data are absent from the sparse output (the
    * reference writes `missingValue` there).
    *
    * `filter` is indexed `[Δlat+1][Δlon+1]` where Δ is the source cell
    * minus the center cell. Output: (latCol, lonCol, filtered,
    * n_epochs), unrounded.
    */
  def spatialFilter(cells: DataFrame, epochCol: String, latCol: String,
                    lonCol: String, valueCol: String,
                    filter: Seq[Seq[Int]], normalization: Double,
                    latN: Int, lonN: Int): DataFrame = {
    require(filter.size == 3 && filter.forall(_.size == 3),
      "spatial filter must be 3x3")
    // each source cell contributes to the 9 windows centered at
    // (lat+di, lon+dj); its offset from that center is (-di,-dj)
    val contribs = for { di <- -1 to 1; dj <- -1 to 1 } yield
      struct((col(latCol) + di).as("c_lat"), (col(lonCol) + dj).as("c_lon"),
        lit(filter(1 - di)(1 - dj)).as("w"))
    cells
      .select(col(epochCol).as("e"), col(valueCol).as("v"),
        explode(array(contribs: _*)).as("c"))
      .select(col("e"), col("c.c_lat").as(latCol), col("c.c_lon").as(lonCol),
        (col("c.w") * col("v")).as("wv"))
      .where(col(latCol).between(0, latN - 1) &&
        col(lonCol).between(0, lonN - 1))
      .groupBy(col("e"), col(latCol), col(lonCol))
      .agg((sum(col("wv")) / normalization).as("e_filtered"))
      .groupBy(col(latCol), col(lonCol))
      .agg(avg(col("e_filtered")).as("filtered"),
        count(lit(1)).as("n_epochs"))
  }

  /** Gaussian-weighted interpolation onto the input grid at a center
    * epoch (climatology/clim/gaussInterp_slow.py:8-61; Fortran kernel
    * gaussInterp_f.f): each contribution is weighted
    * `exp(vfactor·((Δlat/slat)² + (Δlon/slon)² + (Δt/stime)²))` over a
    * ±`radius`-cell window in lat/lon and ALL epochs (time is
    * unbounded, the weight decays); the output per cell is
    * Σ w·v / Σ w. Δt is `epochDay − midEpochDay` in day units — the
    * reference interpolates to its median epoch.
    *
    * Distances are in grid-step units (the reference uses degrees; the
    * grid step is the unit conversion). Output: (latCol, lonCol,
    * interp, wsum, n_contrib), unrounded.
    */
  def gaussInterp(cells: DataFrame, epochDay: Column, latCol: String,
                  lonCol: String, valueCol: String, radius: Int,
                  slat: Double, slon: Double, stime: Double,
                  vfactor: Double, midEpochDay: Column,
                  latN: Int, lonN: Int): DataFrame = {
    require(radius >= 0, "window radius must be non-negative")
    val offs = for { di <- -radius to radius; dj <- -radius to radius } yield
      struct((col(latCol) + di).as("c_lat"), (col(lonCol) + dj).as("c_lon"),
        // spatial part of the squared normalized distance: constant per
        // offset (Δ² is symmetric, so the explode direction is moot)
        lit(di / slat * (di / slat) + dj / slon * (dj / slon)).as("d2_space"))
    val dt = (epochDay - midEpochDay).cast("double") / stime
    cells
      .select(col(valueCol).as("v"), (dt * dt).as("dt2"),
        explode(array(offs: _*)).as("c"))
      .select(col("c.c_lat").as(latCol), col("c.c_lon").as(lonCol),
        exp(lit(vfactor) * (col("c.d2_space") + col("dt2"))).as("w"),
        col("v"))
      .where(col(latCol).between(0, latN - 1) &&
        col(lonCol).between(0, lonN - 1))
      .groupBy(col(latCol), col(lonCol))
      .agg((sum(col("w") * col("v")) / sum(col("w"))).as("interp"),
        sum(col("w")).as("wsum"),
        count(lit(1)).as("n_contrib"))
  }
}
