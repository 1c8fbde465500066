package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY §2 registers one named query
  * (a Spark plan over the driver's testdata tables) and, when
  * SQL-expressible, a DuckDB oracle with identical column names and
  * ordering (see QueryModule for the cross-engine determinism rules).
  */
object SparkEntry {
  /** Query modules, each covering one SURVEY §2 area. */
  private val modules: Seq[QueryModule] = Seq(
    IndexQueries,
    AggQueries,
    JoinQueries,
    SeriesQueries,
    TextQueries,
    SimilarityQueries,
    TileQueries,
    PipelineQueries,
    MiscQueries
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's headline op: /timeSeriesSpark daily weighted stats
    * (SURVEY §3.1) re-expressed over lineitem.
    */
  def entry(spark: SparkSession): DataFrame =
    AggQueries.queries("a1_daily_stats")(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracle).toMap
}
