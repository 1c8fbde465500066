package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided deterministic test tables
  * (`/root/testdata/sf*`, see TESTDATA.md).
  *
  * The `events` table is written with nanosecond-precision timestamps,
  * which Spark's Parquet reader rejects by default
  * (PARQUET_TYPE_ILLEGAL). We read nanos as a long
  * (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to
  * microseconds — exactly what DuckDB does on read — so both engines
  * see identical µs-precision timestamps and the oracle comparison is
  * bit-exact.
  */
object Tables {

  /** Per-JVM cache of each testdata file's parquet SCHEMA (metadata
    * only, never data): without it every query construction re-lists
    * and re-reads the file footer to infer the schema — a driver-side
    * tax paid once per table reference per query (~130 queries × 1-3
    * references in a bench run). The files are immutable inputs; a
    * production deployment gets the same effect from a catalog table.
    */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  private def readCached(spark: SparkSession, path: String): DataFrame = {
    val cached = schemaCache.get(path)
    if (cached != null) spark.read.schema(cached).parquet(path)
    else {
      val df = spark.read.parquet(path)
      schemaCache.put(path, df.schema)
      df
    }
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    name match {
      case "events" => events(spark, dir)
      case _        => readCached(spark, s"$dir/$name.parquet")
    }

  def region(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** Documents spread across all cores. The testdata parquet is one
    * row group, so a plain scan is one task — and every downstream
    * per-row text kernel (tokenize, shingle, md5) would run on one
    * core. A round-robin repartition costs one tiny shuffle of the
    * raw docs and buys full-width execution for the explode-heavy
    * stage above it. On a real 100 TB corpus the source has thousands
    * of splits and this is a no-op to remove.
    */
  def documentsSpread(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)

  /** Events spread across all cores (same single-row-group rationale
    * as [[documentsSpread]]) for queries whose per-row kernel work
    * dominates the scan.
    */
  def eventsSpread(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)

  /** Embeddings spread across all cores (same single-row-group
    * rationale as [[documentsSpread]] — dimension explodes and
    * per-row vector math otherwise run in one task).
    */
  def embeddingsSpread(spark: SparkSession, dir: String): DataFrame =
    embeddings(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)

  /** `ts` is normalized to a µs-precision TimestampType (UTC session
    * zone) whatever the file encodes — generator output has varied
    * across rounds:
    *  - TIMESTAMP(NANOS): read as long (`nanosAsLong`) and truncated
    *    with integer division (ns epoch values exceed 2^53, so float
    *    division would corrupt them), exactly DuckDB's read behavior;
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): arrives as
    *    TIMESTAMP_NTZ; the cast reinterprets the wall time as UTC —
    *    the same epoch micros DuckDB sees.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the NTZ→timestamp cast below interprets wall time in the SESSION
    // zone — pin it to UTC here (like nanosAsLong above) so a caller
    // with a local-zone session still gets the file's epoch values
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    // schema cached AFTER the conf pins above, so the cached sniff is
    // the same one an uncached read would produce
    val raw = readCached(spark, s"$dir/events.parquet")
    val ts = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        timestamp_micros(expr("ts DIV 1000"))
      case _ => col("ts").cast("timestamp")
    }
    raw.withColumn("ts", ts)
  }
}
