package graft.kernels

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Post-aggregation series filters (SURVEY §2.5 W6/W7). These operate
  * on *result* series (one row per time step — thousands of rows at
  * most), mirroring the reference's driver-side filtering of collected
  * time series (Filtering.py).
  */
object SeriesFilters {

  /** W6 — seasonal de-cycling: subtract the month-of-year mean
    * (Filtering.applySeasonalCycleFilter1d, Filtering.py:40-51), as a
    * window aggregate (stays distributed, unlike the reference).
    * `seriesKeys` partitions the cycle per series (multi-dataset time
    * series); `out` names the result column.
    */
  def deseasonalize(series: DataFrame, timeCol: Column, valueCol: Column,
                    seriesKeys: Seq[String] = Nil,
                    out: String = "deseasoned"): DataFrame =
    series.withColumn(out,
      valueCol - avg(valueCol).over(
        Window.partitionBy(seriesKeys.map(col) :+ month(timeCol): _*)))

  /** W7 — zero-phase low-pass filter (Filtering.py:87-97 applies scipy
    * Butterworth `filtfilt`). This is the DISTRIBUTED path; for exact
    * reference parity on a collected series use
    * [[Butterworth.lowpassDriver]] (identical coefficients + filtfilt
    * padding to scipy's). Implemented as an order-`n` forward +
    * backward moving-average cascade — zero-phase, monotone frequency
    * response; runs as window aggregates so it needs no collect. The
    * reference applies this only to final (small) series; here it works
    * at any scale, partitioned by `seriesKeys`.
    */
  def lowPass(series: DataFrame, seriesKeys: Seq[String], timeCol: String,
              valueCol: String, windowSize: Int, passes: Int = 2): DataFrame = {
    require(windowSize >= 1 && passes >= 1)
    // single-series callers (one dataset's final daily series, bounded
    // by construction) key on a constant-but-non-foldable expression
    // (a plain literal constant-folds away, and `x * 0` is simplified
    // out by the optimizer too — pmod(hash, 1) survives): same
    // one-partition execution, but out of Spark's "No Partition
    // Defined" warning, so a REAL unbounded global window elsewhere
    // stays visible in logs. xxhash64 accepts ANY input type (a bare
    // bigint cast of the time column failed analysis on DateType —
    // date→numeric casts are illegal since Spark 3.0) and pmod(·,1)
    // of its long output is always 0.
    val keys =
      if (seriesKeys.isEmpty) Seq(pmod(xxhash64(col(timeCol)), lit(1)))
      else seriesKeys.map(col)
    def smooth(df: DataFrame, c: String, out: String, reverse: Boolean): DataFrame = {
      val ord = if (reverse) col(timeCol).desc else col(timeCol).asc
      val w = Window.partitionBy(keys: _*).orderBy(ord)
        .rowsBetween(-(windowSize - 1), 0)
      df.withColumn(out, avg(col(c)).over(w))
    }
    (1 to passes).foldLeft(series.withColumn("lowpass", col(valueCol))) {
      (df, _) =>
        val f = smooth(df, "lowpass", "__f", reverse = false)
        smooth(f, "__f", "lowpass", reverse = true).drop("__f")
    }
  }
}
