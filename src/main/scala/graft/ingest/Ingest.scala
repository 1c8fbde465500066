package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GeoFunctions

/** Granule → tiles ingest chunking (SURVEY §2.1 S1–S3, §2.6 F8/F9,
  * §2.4 A7, §2.2 P11).
  *
  * Input is a point relation (granule, lat, lon, time, value) — the
  * normalized form of both grid and swath reads (swaths are kept as
  * points rather than diagonalized, the deliberate deviation noted in
  * SURVEY §7.4). The chunker assigns each point to a fixed-size
  * lat×lon tile cell, then assembles one row per tile with coordinate
  * axes, row-major data array, pre-aggregated summary stats, and a
  * deterministic tile id. All group-bys key on (granule, tile cell) —
  * a uniform shuffle key at any scale.
  */
object Ingest {

  /** Deterministic tile id (generate-tile-id.groovy:28 — name-UUID of
    * granule + section spec + salt): md5 here.
    */
  def tileId(granule: Column, sectionSpec: Column, salt: String = ""): Column =
    md5(concat_ws("|", granule, sectionSpec, lit(salt)))

  /** Chunk points into tileLat × tileLon-degree tiles, one tile per
    * (granule, cell, time). Points with NaN value are kept as mask
    * cells in the array but excluded from stats; fully-masked tiles are
    * dropped (emptytilefilter.py:16-29).
    *
    * `metaNames` (secondary variables, reference `nexusmodel.py:34`
    * `meta_data` — wind_v / wind_dir / *_std …): when non-empty, the
    * points relation must carry a `meta: array<double>` column with
    * one slot per name; each name lands in the tile's `meta_data` map
    * as an array in the SAME row-major layout as `data` (independent
    * NaN masks within a surviving tile — a point masked in the
    * primary still carries meta and vice versa; a tile whose PRIMARY
    * is fully masked is still dropped by the P11 empty-tile filter
    * above, meta notwithstanding, matching the reference). Tile stats
    * stay primary-only, like the reference's `TileSummary.DataStats`.
    */
  def pointsToTiles(points: DataFrame, tileLat: Double, tileLon: Double,
                    dataset: String, metaNames: Seq[String] = Nil): DataFrame = {
    val cellLat = floor(col("latitude") / tileLat)
    val cellLon = floor(col("longitude") / tileLon)
    val w = GeoFunctions.cosLatWeight(col("latitude"))
    val validVal = when(isnan(col("value")), lit(null)).otherwise(col("value"))
    // structs sort by field order (latitude, longitude lead), so the
    // appended meta slot cannot perturb the row-major cell order
    val cellStruct =
      if (metaNames.isEmpty) struct(col("latitude"), col("longitude"), col("value"))
      else struct(col("latitude"), col("longitude"), col("value"), col("meta"))

    points
      .withColumn("cell_lat", cellLat)
      .withColumn("cell_lon", cellLon)
      .groupBy(col("granule"), col("cell_lat"), col("cell_lon"), col("time"))
      .agg(
        min(col("latitude")).as("min_lat"), max(col("latitude")).as("max_lat"),
        min(col("longitude")).as("min_lon"), max(col("longitude")).as("max_lon"),
        sort_array(collect_set(col("latitude"))).as("lats_d"),
        sort_array(collect_set(col("longitude"))).as("lons_d"),
        // row-major lat-then-lon order via (lat, lon)-sorted structs
        sort_array(collect_list(cellStruct)).as("cells"),
        min(validVal).as("stats_min"),
        max(validVal).as("stats_max"),
        (sum(validVal * w) / sum(when(validVal.isNotNull, w))).as("stats_mean"),
        count(validVal).as("stats_count"))
      .where(col("stats_count") > 0) // P11: drop fully-masked tiles
      .withColumn("section_spec",
        concat_ws(",", concat(lit("lat:"), col("cell_lat")),
          concat(lit("lon:"), col("cell_lon")), concat(lit("t:"), col("time"))))
      // the row-major data layout requires a COMPLETE distinct-lats ×
      // distinct-lons grid per cell with one point per coordinate
      // (readers emit NaN for missing cells); a sparse or duplicated
      // grid would silently scramble toPoints' index arithmetic, so
      // fail loudly instead. Both counts are checked: a duplicate point
      // compensating for a missing slot keeps size==expected but
      // lowers the distinct-coordinate count.
      .withColumn("__expected", size(col("lats_d")) * size(col("lons_d")))
      // distinct coordinate count derived post-agg from the sorted
      // cells array (a countDistinct in the hot groupBy would force the
      // planner's extra one-distinct aggregate stages)
      .withColumn("n_coords", size(array_distinct(transform(col("cells"),
        c => struct(c.getField("latitude"), c.getField("longitude"))))))
      .withColumn("cells",
        when(size(col("cells")) === col("__expected") &&
            col("n_coords") === col("__expected"), col("cells"))
          .otherwise(raise_error(concat(lit("pointsToTiles: non-dense grid for granule "),
            col("granule"), lit(" cell ("), col("cell_lat"), lit(","), col("cell_lon"),
            lit("): "), size(col("cells")).cast("string"), lit(" points vs "),
            col("__expected").cast("string"), lit(" grid slots — densify or "),
            lit("use TypedTileOps.swathToPoints for sparse observations")))))
      .select(
        tileId(col("granule"), col("section_spec")).as("tile_id"),
        lit(dataset).as("dataset"),
        col("granule"), col("section_spec"),
        col("min_lat"), col("max_lat"), col("min_lon"), col("max_lon"),
        col("time").as("min_time"), col("time").as("max_time"),
        // zone-FREE day-of-year: dayofyear over a timestamp extracts in
        // the session timezone, so the same granule ingested on a
        // non-UTC cluster would store a different value near midnight;
        // date arithmetic from the epoch day is deterministic (UTC
        // sessions — all of ours — get the identical result)
        dayofyear(date_add(lit("1970-01-01").cast("date"),
          floor(col("time") / 86400L).cast("int"))).as("day_of_year"),
        col("stats_min"), col("stats_max"), col("stats_mean"), col("stats_count"),
        col("lats_d").cast("array<float>").as("latitudes"),
        col("lons_d").cast("array<float>").as("longitudes"),
        array(col("time")).as("times"),
        transform(col("cells"), c => coalesce(c.getField("value"), lit(Double.NaN)))
          .cast("array<float>").as("data"),
        (if (metaNames.isEmpty) map().cast("map<string,array<float>>")
         else map_from_arrays(
           array(metaNames.map(lit): _*),
           array(metaNames.indices.map(i =>
             transform(col("cells"), c =>
               coalesce(element_at(c.getField("meta"), i + 1), lit(Double.NaN)))
               .cast("array<float>")): _*))).as("meta_data"))
  }

  /** Month-scale store partition key — ONE definition shared by every
    * writer (batch sink below, streaming `granulePipeline`), so batch-
    * and stream-written stores can never diverge in partition layout
    * (a divergent bucket width would silently break the streaming
    * idempotency anti-join's partition pruning).
    */
  val TimeBucketSeconds = 2592000L
  def timeBucket(minTime: Column): Column =
    (minTime / TimeBucketSeconds).cast("long")

  /** S6 — partitioned columnar sink: `dataset` + time-bucket partition
    * keys give partition pruning for every P-layer predicate.
    * DYNAMIC partition overwrite: only the partitions present in THIS
    * batch are replaced — the default static mode deletes the whole
    * root first, which on the shared batch+stream store layout
    * documented at [[timeBucket]] would silently destroy every other
    * dataset's ingested tiles.
    */
  def writeTiles(tiles: DataFrame, path: String): Unit =
    tiles
      .withColumn("time_bucket", timeBucket(col("min_time")))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("dataset", "time_bucket")
      .parquet(path)

  /** Z-order (Morton) value for two dimensions: each coordinate is
    * normalized to a `bits`-bit integer over [lo, hi] and the bits are
    * interleaved, so rows close on the curve are close in BOTH
    * dimensions. Sorting a tile store by this value keeps every row
    * group's (min_lat, max_lat, min_lon, max_lon) ranges tight
    * simultaneously — a lexicographic (lat, lon) sort only bounds lat,
    * and a bbox predicate then reads every row group of a matching lat
    * band. Pure Column bit algebra (whole-stage codegen, no UDF).
    */
  def zorder2(x: Column, xLo: Column, xHi: Column,
              y: Column, yLo: Column, yHi: Column, bits: Int = 16): Column = {
    val maxCell = (1L << bits) - 1
    def quant(c: Column, lo: Column, hi: Column): Column =
      least(lit(maxCell), greatest(lit(0L),
        floor((c - lo) / greatest(hi - lo, lit(1e-30)) * (maxCell + 1))
          .cast("long")))
    val qx = quant(x, xLo, xHi)
    val qy = quant(y, yLo, yHi)
    (0 until bits).map { i =>
      (shiftleft(qx.bitwiseAND(1L << i), i) +
        shiftleft(qy.bitwiseAND(1L << i), i + 1)).cast("long")
    }.reduce(_ + _)
  }

  /** Small-file compaction for a partitioned tile store. Streaming
    * micro-batch ingest (§2.7) appends a file per batch per partition;
    * after months of 1-minute batches a partition holds thousands of
    * KB-sized files and scan planning, not IO, dominates queries — the
    * classic small-files failure at 100 TB. Rewrites each partition
    * into ⌈bytes / targetBytes⌉ files, sorted spatially so parquet
    * row-group min/max stats align with bbox predicates (row-group
    * skipping for the P-layer): Z-order over (min_lat, min_lon) by
    * default (tight row-group ranges in both dimensions), or the
    * simpler lexicographic sort with `zorder = false`.
    * Rewrite-then-swap keeps the store readable throughout.
    */
  def compactTiles(spark: org.apache.spark.sql.SparkSession, path: String,
                   targetBytes: Long = 128L * 1024 * 1024,
                   zorder: Boolean = true): Unit = {
    recoverStore(spark, path)
    val src = new org.apache.hadoop.fs.Path(path)
    val fs = src.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(src).getLength
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    // suffix() builds the sibling from the NORMALIZED path — raw string
    // concatenation with a trailing slash on `path` would nest the tmp
    // dir inside the store, and the final swap rename (a dir into its
    // own subdirectory) then fails after the whole rewrite completed
    val tmp = src.suffix("__compact_tmp")
    // partition columns lead the sort: the dynamic-partition writer
    // requires rows ordered by them and would otherwise inject its own
    // sort on JUST those columns, destroying the spatial order
    val tiles = spark.read.parquet(path)
    // global lat/lon extent for Z-order normalization: one tiny agg
    // over the summary columns (min/max only — no array reads)
    val ext = tiles.agg(min("min_lat").as("lat_lo"), max("min_lat").as("lat_hi"),
      min("min_lon").as("lon_lo"), max("min_lon").as("lon_hi")).head()
    val sortKey: Column =
      // empty store ⇒ the extent row is all-NULL; fall back to the
      // lexicographic key instead of NPE-ing on getDouble
      if (zorder && !ext.isNullAt(0))
        zorder2(col("min_lat"), lit(ext.getDouble(0)), lit(ext.getDouble(1)),
          col("min_lon"), lit(ext.getDouble(2)), lit(ext.getDouble(3)))
      else col("min_lat")
    tiles
      // range partition on the same key the files are sorted by: the
      // clustering is then GLOBAL (file-level min/max prune whole
      // files, row-group stats prune within), unlike a round-robin
      // repartition where every file spans the whole space
      .repartitionByRange(nFiles, col("dataset"), col("time_bucket"), sortKey)
      .sortWithinPartitions(col("dataset"), col("time_bucket"), sortKey,
        col("min_lon"))
      .write.mode("overwrite")
      .partitionBy("dataset", "time_bucket")
      .parquet(tmp.toString)
    val bak = src.suffix("__compact_old") // sibling via normalized path
    if (fs.exists(bak)) fs.delete(bak, true)
    if (!fs.rename(src, bak)) sys.error(s"compactTiles: cannot displace $src")
    if (!fs.rename(tmp, src)) { // roll back, never leave the store missing
      fs.rename(bak, src)
      sys.error(s"compactTiles: cannot install $tmp")
    }
    fs.delete(bak, true)
  }

  /** S10 physical side — delete-by-query against the tile store (the
    * reference's tools/deletebyquery.py dropped tiles from Solr and
    * Cassandra; here it is a partition-scoped rewrite). Only
    * partitions that CONTAIN matches are read and rewritten —
    * everything else is untouched on disk, so a delete bounded to one
    * dataset/month costs one partition's IO regardless of store size.
    * Returns the number of rows deleted.
    *
    * ATOMIC across partitions (manifest-last commit): every affected
    * partition's survivor rewrite is STAGED under the hidden
    * `_delete_staging/` root first (underscore-prefixed — invisible to
    * Spark readers), then one manifest file is renamed into place —
    * the commit point — and only then are partitions swapped, in
    * manifest order, each swap idempotent. A crash anywhere leaves a
    * state [[recoverStore]] resolves deterministically: manifest
    * present → roll FORWARD (finish every swap/drop; staged files are
    * complete by construction since the manifest is written last);
    * manifest absent → roll BACK (discard staging; the delete never
    * happened). Both entry points call recovery first, so a torn
    * earlier run completes before a new one begins.
    *
    * Single-writer contract (same as compaction, and as the reference's
    * one deletebyquery process): concurrent mutators of one store are
    * not coordinated — run deletes/compactions from one scheduler
    * slot. Readers stay safe throughout (staging is hidden, swaps are
    * per-directory renames).
    */
  def deleteTiles(spark: org.apache.spark.sql.SparkSession, path: String,
                  predicate: Column): Long =
    deleteTilesImpl(spark, path, predicate, Int.MaxValue)

  /** Test seam: `killAfter` = crash (exception) after that many
    * manifest entries have been applied — the kill-point the
    * IngestSpec recovery test drives. Production path passes MaxValue.
    */
  private[graft] def deleteTilesImpl(spark: org.apache.spark.sql.SparkSession,
                                     path: String, predicate: Column,
                                     killAfter: Int): Long = {
    recoverStore(spark, path)
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val affected = spark.read.parquet(path).where(predicate)
      .groupBy(col("dataset"), col("time_bucket"))
      .agg(count(lit(1)).as("n_matches"))
      .collect()
    var deleted = 0L
    // ---- stage: write every survivor set under _delete_staging ----
    // manifest lines carry the ESCAPED partition path segments
    // (dataset=a%09b), never raw values: escaping guarantees no tab or
    // newline survives into the tab/newline-delimited manifest format
    // (a raw tab would silently mis-split; a raw newline would crash
    // every recovery attempt)
    val esc = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    val entries = affected.map { r =>
      val dsSeg = esc.getPartitionPathString("dataset", String.valueOf(r.get(0)))
      val bSeg = esc.getPartitionPathString("time_bucket", String.valueOf(r.get(1)))
      deleted += r.getLong(2)
      // survivors-empty ⟺ every partition row matched: compare
      // n_matches against the partition's total row count, which
      // parquet answers from footer metadata (a count() with no
      // grouping/filter never scans data) — the previous isEmpty()
      // probe re-scanned the partition once and the staging write then
      // scanned it again; fully-deleted partitions now skip the
      // survivor scan entirely
      val total = spark.read.parquet(s"$path/$dsSeg/$bSeg").count()
      if (r.getLong(2) == total) s"drop\t$dsSeg\t$bSeg"
      else {
        // basePath keeps the partition columns visible to the
        // predicate. NULL-predicate rows must SURVIVE: where(!predicate)
        // alone drops them (NULL is not true), silently deleting rows
        // the query never matched (they are also absent from n_matches
        // above).
        spark.read.option("basePath", path)
          .parquet(s"$path/$dsSeg/$bSeg")
          .where(!coalesce(predicate, lit(false)))
          .drop("dataset", "time_bucket") // constant within the partition
          .write.mode("overwrite")
          .parquet(s"$path/$StagingName/tmp/$dsSeg/$bSeg")
        s"swap\t$dsSeg\t$bSeg"
      }
    }
    if (entries.nonEmpty) {
      // ---- commit point: manifest renamed into place atomically ----
      val inProgress = new org.apache.hadoop.fs.Path(path, ManifestName + ".inprogress")
      val manifest = new org.apache.hadoop.fs.Path(path, ManifestName)
      val out = fs.create(inProgress, true)
      try out.write((entries.mkString("\n") + "\n").getBytes("UTF-8"))
      finally out.close()
      if (!fs.rename(inProgress, manifest))
        sys.error(s"deleteTiles: cannot commit manifest $manifest")
      // ---- apply (same code recovery replays), then clear manifest ----
      applyManifest(fs, path, entries.toSeq, killAfter)
      fs.delete(manifest, false)
      fs.delete(new org.apache.hadoop.fs.Path(path, StagingName), true)
    }
    deleted
  }

  private val StagingName = "_delete_staging"
  private val ManifestName = "_delete_manifest"

  /** Apply manifest entries (action + ESCAPED path segments) in order —
    * IDEMPOTENT per entry, so a crashed apply replays from the top on
    * recovery:
    *  - swap: tmp present → displace the live partition to old/ and
    *    install tmp (a missing live dir means the previous attempt
    *    died between the two renames — just install); tmp absent →
    *    already applied, clear any leftover old/.
    *  - drop: delete the partition if still present.
    * Emptied dataset= parents are pruned only AFTER every entry
    * applied: pruning inline could remove a parent a later swap still
    * installs into, and rename into a missing parent fails on
    * HDFS-semantics filesystems (mkdirs before the install guards the
    * same window on replay).
    */
  private def applyManifest(fs: org.apache.hadoop.fs.FileSystem, path: String,
                            entries: Seq[String], killAfter: Int): Unit = {
    var applied = 0
    entries.foreach { e =>
      if (applied >= killAfter)
        sys.error(s"deleteTiles: injected kill after $applied entries")
      val Array(action, dsSeg, bSeg) = e.split("\t", 3)
      val partDir = new org.apache.hadoop.fs.Path(s"$path/$dsSeg/$bSeg")
      action match {
        case "drop" =>
          if (fs.exists(partDir)) fs.delete(partDir, true)
        case "swap" =>
          val tmp = new org.apache.hadoop.fs.Path(
            s"$path/$StagingName/tmp/$dsSeg/$bSeg")
          val old = new org.apache.hadoop.fs.Path(
            s"$path/$StagingName/old/$dsSeg/$bSeg")
          if (fs.exists(tmp)) {
            if (fs.exists(partDir)) {
              if (fs.exists(old)) fs.delete(old, true)
              fs.mkdirs(old.getParent)
              if (!fs.rename(partDir, old))
                sys.error(s"deleteTiles: cannot displace $partDir")
            }
            fs.mkdirs(partDir.getParent)
            if (!fs.rename(tmp, partDir))
              sys.error(s"deleteTiles: cannot install $tmp")
          }
          if (fs.exists(old)) fs.delete(old, true)
        case other => sys.error(s"deleteTiles: unknown manifest action '$other'")
      }
      applied += 1
    }
    // prune dataset= dirs an applied drop emptied (post-pass, see doc)
    entries.foreach { e =>
      val parent = new org.apache.hadoop.fs.Path(
        s"$path/${e.split("\t", 3)(1)}")
      if (fs.exists(parent) && fs.listStatus(parent).isEmpty)
        fs.delete(parent, true)
    }
  }

  /** Crash recovery for the tile store's two multi-step mutations —
    * called on entry by [[deleteTiles]] and [[compactTiles]], and
    * callable directly at store open:
    *
    *  - torn COMPACTION (the store root itself was mid-swap): the
    *    store dir missing with `__compact_old` present → the rewrite
    *    had fully completed (renames only start after the write
    *    returns), so install `__compact_tmp` if it carries _SUCCESS,
    *    else restore the old store; a stray tmp/old beside an intact
    *    store is discarded (the swap never started — tmp may be a
    *    partial write).
    *  - torn DELETE: manifest present → staged files are complete
    *    (manifest is written last), so replay [[applyManifest]] to
    *    the end and clear; no manifest → any staging dir or
    *    in-progress manifest is a pre-commit crash, discarded whole.
    */
  def recoverStore(spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // siblings from the NORMALIZED root (same trailing-slash reasoning
    // as compactTiles — a raw-string concat would look INSIDE the store)
    val tmp = root.suffix("__compact_tmp")
    val bak = root.suffix("__compact_old")
    if (!fs.exists(root) && fs.exists(bak)) {
      val success = new org.apache.hadoop.fs.Path(tmp, "_SUCCESS")
      if (fs.exists(tmp) && fs.exists(success)) {
        if (!fs.rename(tmp, root)) sys.error(s"recoverStore: cannot install $tmp")
        fs.delete(bak, true)
      } else {
        if (!fs.rename(bak, root)) sys.error(s"recoverStore: cannot restore $bak")
        if (fs.exists(tmp)) fs.delete(tmp, true)
      }
    } else if (fs.exists(root)) {
      if (fs.exists(tmp)) fs.delete(tmp, true)
      if (fs.exists(bak)) fs.delete(bak, true)
    }
    if (!fs.exists(root)) return
    val manifest = new org.apache.hadoop.fs.Path(path, ManifestName)
    val staging = new org.apache.hadoop.fs.Path(path, StagingName)
    val inProgress = new org.apache.hadoop.fs.Path(path, ManifestName + ".inprogress")
    if (fs.exists(manifest)) {
      val in = fs.open(manifest)
      val text =
        try {
          val buf = new java.io.ByteArrayOutputStream()
          val b = new Array[Byte](8192)
          var n = in.read(b)
          while (n >= 0) { buf.write(b, 0, n); n = in.read(b) }
          buf.toString("UTF-8")
        } finally in.close()
      val entries = text.split("\n").iterator.map(_.trim).filter(_.nonEmpty).toSeq
      applyManifest(fs, path, entries, Int.MaxValue)
      fs.delete(manifest, false)
    }
    if (fs.exists(staging)) fs.delete(staging, true)
    if (fs.exists(inProgress)) fs.delete(inProgress, false)
  }

  /** Bucketed sink for co-located joins: two tables bucketed the same
    * way on the join key (e.g. tiles and a climatology keyed by the
    * tile cell) join WITHOUT any shuffle — the planner proves
    * co-partitioning from the bucket spec. At 100 TB this removes the
    * dominant exchange from every data↔climatology join.
    */
  def writeBucketedTable(df: DataFrame, table: String, bucketCol: String,
                         numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
}
