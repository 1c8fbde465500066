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

  /** Per-(session, path) cache of the RESOLVED table DataFrame (r15,
    * guide §7.3 driver overheads): even with the schema supplied,
    * every `spark.read.parquet(path)` re-runs the analyzer's
    * ResolveDataSource rule — relation construction + file listing —
    * once per table reference per query construction. Measured with
    * RuleExecutor.dumpTimeSpent over the full suite: ~0.8 s/pass, the
    * single most expensive analysis rule. The analyzer skips
    * already-analyzed subtrees (AnalysisHelper), so handing every
    * gate the same resolved DataFrame object removes both the
    * re-resolution and the subtree's share of every later analyzer
    * traversal. Plans (and therefore results) are unchanged — this is
    * the analyzed-plan twin of the schema cache above, and what a
    * production metastore's cached relation provides. Sessions are
    * WEAK keys: ScalaTest creates dozens of short-lived sessions, and
    * a strong key would pin each one (and its SparkContext) for the
    * JVM's lifetime.
    */
  private val dfCache =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, DataFrame]]()

  private def sessionCache(spark: SparkSession) = dfCache.synchronized {
    var m = dfCache.get(spark)
    if (m == null) {
      m = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
      dfCache.put(spark, m)
    }
    m
  }

  private def cachedDf(spark: SparkSession, key: String)
                      (build: => DataFrame): DataFrame = {
    val m = sessionCache(spark)
    val hit = m.get(key)
    if (hit != null) hit
    else {
      val df = build
      df.queryExecution.assertAnalyzed() // memoize a fully analyzed plan
      m.put(key, df)
      df
    }
  }

  private def readCached(spark: SparkSession, path: String): DataFrame =
    cachedDf(spark, path) {
      val cached = schemaCache.get(path)
      if (cached != null) spark.read.schema(cached).parquet(path)
      else {
        val df = spark.read.parquet(path)
        schemaCache.put(path, df.schema)
        df
      }
    }

  /** Resolved-relation cache for OTHER immutable parquet paths (e.g.
    * a12b's write-once materialized tile store): same contract as
    * [[readCached]] — the path's contents must never change within the
    * JVM's lifetime after the first read.
    */
  def parquetCached(spark: SparkSession, path: String): DataFrame =
    readCached(spark, path)

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

  /** Round-robin spread, SCALE-ADAPTIVE (r14, guide §2: derive
    * partitioning from the input instead of tuning a constant): the
    * repartition fires only when the scan has fewer splits than cores.
    * The driver's testdata parquets are one row group each — a plain
    * scan is one task, serializing every downstream per-row kernel —
    * so at the graded SFs this always spreads (plans there are
    * unchanged from r13); a source that already has enough splits
    * (any real corpus; the 10× replica probe measured the
    * unconditional shuffle at +13% on e_quantized_ann) passes through
    * untouched. Partition-count inspection is plan-time metadata — no
    * job runs. (At defaultParallelism = 1 the spread correctly
    * degenerates to a no-op — the old unconditional form paid a
    * 1-partition shuffle there for nothing; plan-shape spec pins run
    * at local[4], where a single-row-group scan always spreads.)
    */
  /** Whether `path`'s scan needs the round-robin spread, memoized per
    * (path, parallelism): inspecting the scan's split count plans a
    * one-table RDD (driver-side, no job) — cheap once, not worth
    * re-paying on every query construction for an immutable file.
    */
  private val needsSpreadCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), java.lang.Boolean]()

  private def spread(df: DataFrame, path: String): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    val needs = needsSpreadCache.computeIfAbsent((path, p),
      _ => java.lang.Boolean.valueOf(df.rdd.getNumPartitions < p))
    if (needs)
      cachedDf(df.sparkSession, s"spread:$p:$path")(df.repartition(p))
    else df
  }

  /** Documents spread across all cores (see [[spread]]): every
    * downstream per-row text kernel (tokenize, shingle, md5) would
    * otherwise run on one core at bench scale.
    */
  def documentsSpread(spark: SparkSession, dir: String): DataFrame =
    spread(documents(spark, dir), s"$dir/documents.parquet")

  /** Events spread across all cores (same rationale as
    * [[documentsSpread]]) for queries whose per-row kernel work
    * dominates the scan.
    */
  def eventsSpread(spark: SparkSession, dir: String): DataFrame =
    spread(events(spark, dir), s"$dir/events.parquet")

  /** Embeddings spread across all cores (same rationale as
    * [[documentsSpread]] — dimension explodes and per-row vector math
    * otherwise run in one task).
    */
  def embeddingsSpread(spark: SparkSession, dir: String): DataFrame =
    spread(embeddings(spark, dir), s"$dir/embeddings.parquet")

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
    // the ts-normalizing projection is memoized WITH the scan (r15):
    // the conf pins above still run per call (they are what make the
    // cached plan correct to execute), but the withColumn's analysis
    // is paid once per session instead of 2-4 times per gate
    cachedDf(spark, s"events:$dir") {
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
}
