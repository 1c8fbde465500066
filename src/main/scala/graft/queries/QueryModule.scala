package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named group of driver-checkable queries.
  *
  * Each entry pairs a Spark plan builder with (when SQL-expressible) an
  * ANSI-SQL oracle the driver runs in DuckDB over the same parquet
  * tables. Conventions that keep the cross-engine hash compare exact:
  *  - every output column is aliased identically in both engines;
  *  - every query ends in a total ORDER BY (unique tie-break);
  *  - doubles are rounded (usually to 4 decimals) *inside* the query;
  *  - timestamps leave the query as epoch-micros BIGINT or formatted
  *    strings, never as native timestamp/date columns.
  */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracle: Map[String, String]
}
