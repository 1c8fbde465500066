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

/** S9 — output encoders: JSON/CSV (webmodel.py:425-431,
  * BaseDomsHandler.py:87-242), NetCDF via the classic codec
  * (BaseDomsHandler.py:243-334 emits matchup results as NetCDF), and
  * ZIP bundling for subset downloads (subsetter.py:203-232). PNG map
  * rendering stays presentation-scope (SURVEY §7.3).
  *
  * NetCDF/ZIP encode COLLECTED results on the driver — these are the
  * reference's result-download formats, produced after the distributed
  * query has already reduced to a result table (the same place the
  * reference's handlers call the netCDF library on an in-memory
  * array). Distributed writes stay parquet/JSON/CSV.
  */
object Encoders {

  /** JSON-lines encoding of any result frame (toJSON is distributed). */
  def toJsonLines(df: DataFrame): DataFrame = df.toJSON.toDF("json")

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** Encode a result frame as a classic NetCDF file: one `row`
    * dimension, one variable per numeric column (doubles; integral
    * columns as NC_INT when they fit), string columns skipped (CDF
    * classic has no 1-D string type short of a char matrix — they go
    * in the JSON/CSV renditions). Column order is preserved.
    */
  def toNetcdf(df: DataFrame): Array[Byte] = {
    import NetcdfClassic._
    val rows = df.collect()
    val dim = NcDim("row", rows.length)
    val schema = df.schema
    val vars = schema.fields.zipWithIndex.flatMap { case (f, i) =>
      f.dataType match {
        case org.apache.spark.sql.types.DoubleType |
             org.apache.spark.sql.types.FloatType =>
          Some(NcVar(f.name, Seq("row"), NC_DOUBLE, Nil,
            rows.map(r => if (r.isNullAt(i)) Double.NaN
              else r.get(i).asInstanceOf[Number].doubleValue())))
        case org.apache.spark.sql.types.LongType |
             org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.ShortType =>
          val vs = rows.map(r => if (r.isNullAt(i)) Double.NaN
            else r.get(i).asInstanceOf[Number].doubleValue())
          val t = if (vs.forall(v => v.isNaN ||
            (v >= Int.MinValue && v <= Int.MaxValue))) NC_INT else NC_DOUBLE
          Some(NcVar(f.name, Seq("row"), t, Nil, vs))
        case _ => None // strings/arrays: JSON/CSV renditions carry them
      }
    }
    NetcdfClassic.write(NcFile(Seq(dim),
      Seq(NcAttr("source", NC_CHAR, text = "graft")), vars.toSeq))
  }

  /** Bundle named byte entries into one ZIP (java.util.zip — the
    * `/domssubset` download format, subsetter.py:203-232).
    */
  def toZip(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    entries.foreach { case (name, bytes) =>
      z.putNextEntry(new java.util.zip.ZipEntry(name))
      z.write(bytes)
      z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }

  /** CSV bytes of a collected result (driver-side, for ZIP entries). */
  def toCsvBytes(df: DataFrame): Array[Byte] = {
    val sb = new StringBuilder
    sb.append(df.columns.mkString(",")).append('\n')
    df.collect().foreach { r =>
      sb.append((0 until r.length).map { i =>
        val v = if (r.isNullAt(i)) "" else String.valueOf(r.get(i))
        if (v.contains(",") || v.contains("\"") || v.contains("\n"))
          "\"" + v.replace("\"", "\"\"") + "\""
        else v
      }.mkString(",")).append('\n')
    }
    sb.toString.getBytes("UTF-8")
  }
}
