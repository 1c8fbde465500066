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

/** S11 — MERGE-style upsert (beyond the reference, which rewrites whole
  * granules at ingest): apply a changes batch to a snapshot by key —
  * matched rows take the update's values, unmatched updates insert,
  * everything else carries over. One full-outer join on the key; at
  * 100 TB the changes batch is usually dimension-sized, so it
  * broadcasts and the snapshot never shuffles. The op column makes the
  * result self-auditing (and is what an incremental-ingest pipeline
  * writes to its change log).
  */
object Merge {

  /** Upsert `updates` into `base` on `key`. Both frames must share the
    * same schema. Returns base's columns plus `op` ∈ {insert, update,
    * keep}. Presence is tracked with explicit marker columns, so NULLs
    * in the data never masquerade as "row absent".
    */
  def upsert(base: DataFrame, updates: DataFrame, key: String): DataFrame = {
    val valueCols = base.columns.filterNot(_ == key).toSeq
    val b = valueCols.foldLeft(base)((d, c) => d.withColumnRenamed(c, s"__b_$c"))
      .withColumn("__in_b", lit(true))
    val u = valueCols.foldLeft(updates)((d, c) => d.withColumnRenamed(c, s"__u_$c"))
      .withColumn("__in_u", lit(true))
    val merged = valueCols.map { c =>
      when(col("__in_u"), col(s"__u_$c")).otherwise(col(s"__b_$c")).as(c)
    }
    val op = when(col("__in_b").isNull, "insert")
      .when(col("__in_u").isNull, "keep")
      .otherwise("update").as("op")
    b.join(u, Seq(key), "full_outer")
      .select(col(key) +: merged :+ op: _*)
  }
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
