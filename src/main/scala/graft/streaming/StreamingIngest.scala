package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.Row

/** Structured-Streaming ingest (SURVEY §2.7). The reference's Spring XD
  * pipelines are micro-batch file-watch → transform → sink chains
  * (stream-definitions:1, processorchain.py); here the same chain is a
  * `readStream` source → the identical batch transforms → a
  * partitioned sink, with `dropDuplicates` on the deterministic tile id
  * standing in for the reference's idempotent UUID5 writes.
  */
object StreamingIngest {

  /** Watermark only applies to streaming relations; batch callers run
    * the identical plan without one.
    */
  private def withEventTimeWatermark(events: DataFrame, watermark: String): DataFrame =
    if (events.isStreaming) events.withWatermark("ts", watermark) else events

  /** Windowed per-source statistics with late-data handling — the
    * streaming form of the engine's A1 kernel. Works on any streaming
    * or batch point/event relation with (ts, event_type, value).
    */
  def windowedStats(events: DataFrame, window_ : String, watermark: String): DataFrame = {
    withEventTimeWatermark(events, watermark)
      .groupBy(window(col("ts"), window_).as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), avg(col("value")).as("avg_v"),
        min(col("value")).as("min_v"), max(col("value")).as("max_v"))
      .select(col("w.start").as("w_start"), col("event_type"), col("cnt"),
        col("avg_v"), col("min_v"), col("max_v"))
  }

  /** Session-window statistics: activity bursts separated by more than
    * `gap` become separate sessions (stateful aggregation bounded by
    * the watermark) — the sessionized counterpart of windowedStats for
    * burst-shaped sources.
    */
  def sessionStats(events: DataFrame, gap: String, watermark: String): DataFrame = {
    withEventTimeWatermark(events, watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), avg(col("value")).as("avg_v"))
      .select(col("w.start").as("w_start"), col("w.end").as("w_end"),
        col("event_type"), col("cnt"), col("avg_v"))
  }

  /** Idempotent dedup on tile/event id within the watermark horizon —
    * replaces the reference's UUID5 upsert idempotency. Streaming uses
    * `dropDuplicatesWithinWatermark` so dedup state is EVICTED as the
    * watermark advances (plain `dropDuplicates(id)` would hold every id
    * ever seen and grow state without bound).
    */
  def dedupedStream(events: DataFrame, idCol: String, watermark: String): DataFrame = {
    val withWm = withEventTimeWatermark(events, watermark)
    if (events.isStreaming) withWm.dropDuplicatesWithinWatermark(idCol)
    else withWm.dropDuplicates(idCol)
  }

  /** Stream-stream interval join (append mode): pairs each left row
    * with the right rows of matching key whose event time falls in
    * `[leftTs − lookbackSeconds, leftTs]`. Both sides carry the
    * watermark, so the join state is BOUNDED: a buffered right row is
    * evicted once the watermark passes `rightTs + lookback` (no future
    * left row can reach back to it), and a left row once the watermark
    * passes its own time — the condition Spark needs to run this in
    * append mode with finite state on an unbounded stream. Batch
    * callers run the identical plan as a plain range join.
    */
  def intervalJoin(left: DataFrame, leftTsCol: String,
                   right: DataFrame, rightTsCol: String,
                   keyCond: org.apache.spark.sql.Column,
                   lookbackSeconds: Long,
                   watermark: String): DataFrame = {
    val l = if (left.isStreaming) left.withWatermark(leftTsCol, watermark) else left
    val r = if (right.isStreaming) right.withWatermark(rightTsCol, watermark) else right
    l.join(r, keyCond &&
      col(rightTsCol) >= col(leftTsCol) - expr(s"INTERVAL $lookbackSeconds SECONDS") &&
      col(rightTsCol) <= col(leftTsCol))
  }

  /** File-watch ingest pipeline: parquet directory source → transform →
    * partitioned parquet sink (the XD `--pattern=*.nc --fixedDelay=60`
    * chain). Caller starts/stops the returned writer.
    */
  def filePipeline(sparkReadStreamDir: DataFrame, outPath: String,
                   checkpoint: String): DataStreamWriter[Row] =
    sparkReadStreamDir.writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())

  /** Continuous GRANULE ingest — the reference's file-watch → decode →
    * tile pipeline (`stream-definitions:1`, `tilereadingprocessor.py`)
    * as one Structured Streaming query: new NetCDF/HDF5 files under
    * `watchDir` decode in executor tasks and land as tiles in the
    * partitioned store at `outPath`.
    *
    * Scale/exactly-once shape:
    *  - `foreachBatch` reuses the EXACT batch path
    *    (`GranuleIngest.decodeFiles` → `Ingest.pointsToTiles`), so
    *    continuous ingest and bulk backfill cannot diverge; the only
    *    shuffle per micro-batch is the tiler's granule-local group-by.
    *  - Replays (checkpoint recovery, or re-listing after a checkpoint
    *    loss) are made idempotent the way the reference's UUID5 →
    *    Cassandra upsert is: tiles anti-join the store on the
    *    deterministic `tile_id` BEFORE the append, with the store side
    *    pruned to the batch's own (dataset, time_bucket) partitions —
    *    the lookup cost scales with the batch's time span, not the
    *    archive size.
    */
  def granulePipeline(spark: org.apache.spark.sql.SparkSession,
                      watchDir: String, outPath: String, checkpoint: String,
                      valueVar: String, dataset: String,
                      tileLat: Double, tileLon: Double,
                      latVar: String = "lat", lonVar: String = "lon",
                      timeVar: String = "time",
                      swath: Boolean = false,
                      metaVars: Seq[String] = Nil,
                      pointTransform: DataFrame => DataFrame = identity,
                      trigger: Trigger = Trigger.AvailableNow()): DataStreamWriter[Row] = {
    require(metaVars.isEmpty || !swath,
      "granulePipeline: metaVars applies to grid granules only")
    // streaming file sources demand an explicit schema; binaryFile's
    // is fixed by the format
    val binarySchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.BinaryType)))
    val files = spark.readStream.format("binaryFile")
      .schema(binarySchema).load(watchDir)
    files.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        if (swath) {
          // swaths stay POINT relations (SURVEY §7.4's deliberate
          // deviation — no diagonalization, no dense-grid tiler, which
          // would reject sparse geolocation loudly). Point relations
          // are NaN-free by convention (TileOps.toPoints /
          // TypedTileOps.swathToPoints filter masks before emitting):
          // fill-valued pixels and fill-valued geolocation never land
          // as rows
          val pts = pointTransform(graft.ingest.GranuleIngest
              .decodeFilesIndexed(batch, valueVar, latVar, lonVar, timeVar))
            .where(!isnan(col("value")) && !isnan(col("latitude")) &&
              !isnan(col("longitude")))
            .withColumn("dataset", lit(dataset))
            .withColumn("time_bucket",
              graft.ingest.Ingest.timeBucket(col("time")))
          // the replay identity must SURVIVE the processor chain: a
          // transform that projects point_index away would silently
          // turn every replay into a duplicating append
          require(pts.columns.contains("point_index"),
            "granulePipeline(swath): pointTransform must preserve the " +
              "point_index column — it is the replay row identity")
          // ROW-level identity (granule, point_index) — the flat decode
          // position, unique per row — not (granule, time_bucket): a
          // crash inside the parquet job commit can leave a PARTIAL
          // granule-bucket visible (task file moves are not atomic
          // across a job), and a coarser key would make the replay
          // anti-join treat the bucket as done and drop its missing
          // remainder forever. Nor (granule, time, lat, lon): swath
          // keys are not unique per row (per-scan-row time is shared
          // by a whole scan line, and coincident pixels exist), so a
          // partial commit that persisted one of two same-key siblings
          // would silently drop the other on replay. Decode is
          // deterministic, so the replay regenerates the same
          // (granule, point_index) rows and the anti-join fills
          // precisely the gap.
          appendDeduped(pts, outPath, dataset,
            keyCols = Seq("granule", "point_index"),
            // stores written before point_index existed dedup on the
            // coordinate key they carry (the pre-upgrade behavior —
            // no worse than before; compaction migrates them)
            legacyKeyCols = Seq("granule", "time", "latitude", "longitude"))
        } else {
          val pts = pointTransform(
            if (metaVars.isEmpty)
              graft.ingest.GranuleIngest.decodeFiles(
                batch, valueVar, latVar, lonVar, timeVar, swath = false)
            else graft.ingest.GranuleIngest.decodeFilesMulti(
              batch, valueVar, metaVars, latVar, lonVar, timeVar))
          val tiles = graft.ingest.Ingest
            .pointsToTiles(pts, tileLat, tileLon, dataset, metaNames = metaVars)
            .withColumn("time_bucket",
              graft.ingest.Ingest.timeBucket(col("min_time")))
          appendDeduped(tiles, outPath, dataset, keyCols = Seq("tile_id"))
        }
        ()
      }
      .option("checkpointLocation", checkpoint)
      // AvailableNow by default: process everything present, then stop
      // (the run-to-completion / scheduler-restart contract — also what
      // the specs drive). A WATCHING deployment that should keep
      // polling watchDir passes Trigger.ProcessingTime(...) — the
      // reference's fixedDelay=60 poll — since AvailableNow terminates
      // once caught up and later granules would wait for a restart.
      .trigger(trigger)
  }

  /** Append `rows` to the partitioned store, dropping rows whose
    * `keyCols` already exist in the store's matching partitions.
    *
    * Partition-pruned idempotency: only the batch's own time buckets
    * are consulted (bounded driver collect), and ONLY their partition
    * directories are listed/read — a whole-store `read.parquet` would
    * pay driver-side file listing proportional to the archive on every
    * batch, and would poison the query permanently if the store dir
    * existed with no data files yet (unschemable).
    */
  private def appendDeduped(rows: DataFrame, outPath: String,
                            dataset: String, keyCols: Seq[String],
                            legacyKeyCols: Seq[String] = Nil): Unit = {
    val s = rows.sparkSession
    val cached = rows.persist()
    try {
      val buckets = cached.select(col("time_bucket")).distinct()
        .collect().map(_.getLong(0))
      val esc = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      val fs = new org.apache.hadoop.fs.Path(outPath)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      val partDirs = buckets.map(b => new org.apache.hadoop.fs.Path(
          s"$outPath/${esc.getPartitionPathString("dataset", dataset)}/" +
            esc.getPartitionPathString("time_bucket", String.valueOf(b))))
        .filter(d => fs.exists(d) && fs.listStatus(d)
          .exists(_.getPath.getName.endsWith(".parquet")))
      val fresh =
        if (partDirs.isEmpty) cached
        else {
          // mergeSchema, deliberately: the default samples ONE file's
          // footer, so a MIXED store (old files without the key column
          // beside new files with it) would flip between key choices
          // per batch depending on which footer was sampled. The merged
          // schema is deterministic: the new key column is visible iff
          // ANY file carries it.
          val store = s.read.option("basePath", outPath)
            .option("mergeSchema", "true")
            .parquet(partDirs.map(_.toString).toIndexedSeq: _*)
          // a store written before the current key columns existed
          // (schema evolution — e.g. pre-point_index swath stores)
          // dedups on its legacy key: the pre-upgrade behavior, loudly,
          // rather than an AnalysisException that wedges the pipeline
          // or a null-keyed anti-join that silently duplicates.
          // (A MIXED store — some files carrying the new column, some
          // not — deterministically resolves to the new key; its old
          // files' null keys can re-append on a checkpoint-loss replay
          // of old granules. Compaction migrates either shape.)
          val useKeys =
            if (keyCols.forall(store.columns.contains)) keyCols
            else {
              require(legacyKeyCols.nonEmpty &&
                legacyKeyCols.forall(store.columns.contains),
                s"store at $outPath lacks replay key columns " +
                  s"${keyCols.mkString(",")} and no legacy key applies — " +
                  "compact the store to the current schema")
              org.slf4j.LoggerFactory.getLogger(getClass).warn(
                s"store at $outPath predates ${keyCols.mkString(",")}; " +
                  s"replay dedup falls back to ${legacyKeyCols.mkString(",")} " +
                  "for this batch — compact the store to upgrade")
              legacyKeyCols
            }
          cached.join(
            store.select(useKeys.map(col): _*).distinct(),
            useKeys, "left_anti")
        }
      fresh.write.mode("append")
        .partitionBy("dataset", "time_bucket")
        .parquet(outPath)
    } finally cached.unpersist()
  }
}
