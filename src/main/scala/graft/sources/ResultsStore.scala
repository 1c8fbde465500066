package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S8 — results persistence (the reference's Cassandra `doms_data`
  * store, algorithms/doms/ResultsStorage.py:58-174): execution-keyed
  * partitioned parquet, so retrieval by execution id is partition
  * pruning, and concurrent executions never conflict (append by
  * distinct partition value).
  */
object ResultsStore {

  def write(results: DataFrame, path: String, executionId: String): Unit =
    results.withColumn("execution_id", lit(executionId))
      .write.mode("append").partitionBy("execution_id").parquet(path)

  def read(spark: SparkSession, path: String, executionId: String): DataFrame =
    spark.read.parquet(path).where(col("execution_id") === executionId)

  def listExecutions(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).select("execution_id").distinct()
}

/** S9 — output encoders: the engine keeps JSON/CSV (webmodel.py:425-431,
  * BaseDomsHandler.py:87-242); NetCDF/PNG are presentation-layer
  * renderings out of engine scope (SURVEY §7.3).
  */
object Encoders {

  /** JSON-lines encoding of any result frame (toJSON is distributed). */
  def toJsonLines(df: DataFrame): DataFrame = df.toJSON.toDF("json")

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)
}
