package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Remaining source/function coverage: the in-situ JSON source (S7) and
  * offline climatology generation (SURVEY §2.10).
  */
object MiscQueries extends QueryModule {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S7 — in-situ EDGE source: semi-structured point records with a
    // JSON payload column, parsed and filtered engine-side
    // (Matchup.query_edge:639-691; the JSON paging becomes a JSON
    // column parse).
    "s7_insitu_json" -> { (s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"),
          round(col("value") + lit(1e-9), 4).as("value_r"))
        .where(col("k").between(10, 50))
        .orderBy("event_id")
    },

    // §2.10 — climatology generation: N-day (weekly) day-of-year
    // buckets averaged across all years (ClimatologySpark
    // .climByAveragingPeriods:99-180) — the offline job that *produces*
    // a _CLIM dataset.
    "c10_clim_generation" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(expr("dayofyear(l_shipdate) DIV 7").as("week_of_year"),
          col("l_returnflag"))
        .agg(round(avg(col("l_quantity")) + 1e-9, 4).as("clim_mean"),
          count(lit(1)).as("cnt"),
          countDistinct(year(col("l_shipdate"))).as("n_years"))
        .orderBy("week_of_year", "l_returnflag")
    }
  )

  def oracle: Map[String, String] = Map(
    "s7_insitu_json" ->
      """SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k,
        |       round(value + 1e-9, 4) AS value_r
        |FROM events
        |WHERE CAST(json_extract(props, '$.k') AS BIGINT) BETWEEN 10 AND 50
        |ORDER BY event_id""".stripMargin,

    "c10_clim_generation" ->
      """SELECT dayofyear(l_shipdate) // 7 AS week_of_year, l_returnflag,
        |       round(avg(l_quantity) + 1e-9, 4) AS clim_mean, count(*) AS cnt,
        |       count(DISTINCT year(l_shipdate)) AS n_years
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
