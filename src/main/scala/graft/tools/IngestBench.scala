package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.H5Lite
import graft.sources.NetcdfClassic._

/** Ingest-at-production-shape benchmark (VERDICT r4 #5): synthesize N
  * full-size quarter-degree global granules (720×1440 float cells,
  * chunked+deflate NetCDF-4 — the MUR/AVHRR-class shape the reference
  * ingests daily, `stream-definitions:1`), stream them through
  * [[graft.streaming.StreamingIngest.granulePipeline]] into the
  * partitioned tile store, then measure what compaction does to the
  * store's file count and to a P2-style (bbox + time) scan.
  *
  * Run: `sbt "runMain graft.tools.IngestBench [nGranules] [outDir]"`;
  * one JSON summary line lands on stdout, numbers go to SCALING.md.
  */
object IngestBench {

  /** One synthetic global granule: value = smooth field + per-day
    * phase, ~5% fill holes; float payload like real L4 files.
    */
  private def granuleBytes(day: Int): Array[Byte] = {
    val (nLat, nLon) = (720, 1440)
    val lats = Array.tabulate(nLat)(i => -89.875 + i * 0.25)
    val lons = Array.tabulate(nLon)(j => -179.875 + j * 0.25)
    val fill = -32768.0
    val data = new Array[Double](nLat * nLon)
    var i = 0
    while (i < nLat) {
      var j = 0
      while (j < nLon) {
        val k = i * nLon + j
        // deterministic hole pattern ~5%
        data(k) =
          if ((k * 2654435761L + day) % 20 == 0) fill
          else 290.0 + 10.0 * math.sin(math.toRadians(lats(i))) *
            math.cos(math.toRadians(lons(j)) + day * 0.1)
        j += 1
      }
      i += 1
    }
    H5Lite.write(NcFile(
      dims = Seq(NcDim("time", 1), NcDim("lat", nLat), NcDim("lon", nLon)),
      attrs = Nil,
      vars = Seq(
        NcVar("time", Seq("time"), NC_INT, Nil, Array(day * 86400.0)),
        NcVar("lat", Seq("lat"), NC_FLOAT, Nil, lats),
        NcVar("lon", Seq("lon"), NC_FLOAT, Nil, lons),
        NcVar("sst", Seq("time", "lat", "lon"), NC_FLOAT,
          Seq(NcAttr("_FillValue", NC_FLOAT, nums = Seq(fill))), data))),
      chunking = Map("sst" -> H5Lite.Chunking(Seq(1, 180, 360),
        fletcher32 = true))) // shuffle+deflate are the Chunking defaults
  }

  private def parquetFiles(spark: SparkSession, path: String): Int = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var n = 0
    while (it.hasNext) {
      if (it.next().getPath.getName.endsWith(".parquet")) n += 1
    }
    n
  }

  def main(args: Array[String]): Unit = {
    val nGranules = args.headOption.map(_.toInt).getOrElse(24)
    val base = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft_ingest_bench").toString)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-ingest-bench")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val watch = s"$base/granules"
    val store = s"$base/tiles"
    val ckpt = s"$base/ckpt"
    new java.io.File(watch).mkdirs()

    // ---- 1. synthesize granules IN EXECUTORS (the writer is static)
    val tGen0 = System.nanoTime()
    spark.sparkContext.parallelize(1 to nGranules, nGranules).foreach { day =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$watch/g$day.nc"), granuleBytes(day))
    }
    val genSec = (System.nanoTime() - tGen0) / 1e9
    val granuleMb = new java.io.File(watch).listFiles()
      .map(_.length()).sum / 1e6

    // ---- 1b. batch decode+tile+write reference point (plain parquet
    // snapshot: no checkpoint, no dedup anti-join, no partition sort) —
    // isolates what the streaming idempotency machinery costs. A bare
    // count() would NOT be fair: Catalyst prunes the tile payload
    // aggregations out of a count-only plan. Skipped for large runs:
    // the comparison point is established at small N, and doubling a
    // long run buys nothing new.
    val (batchSec, batchTiles) =
      if (nGranules > 48) (0.0, 0L)
      else {
        val tB0 = System.nanoTime()
        graft.ingest.GranuleIngest.ingestGridGranules(
          spark, s"$watch/*.nc", "sst", "sst_batch",
          tileLat = 10.0, tileLon = 10.0)
          .write.mode("overwrite").parquet(s"$base/batch_tiles")
        ((System.nanoTime() - tB0) / 1e9,
          spark.read.parquet(s"$base/batch_tiles").count())
      }

    // ---- 2. streaming ingest, AvailableNow
    val tIn0 = System.nanoTime()
    val q = graft.streaming.StreamingIngest.granulePipeline(
      spark, watch, store, ckpt, "sst", "sst_bench",
      tileLat = 10.0, tileLon = 10.0).start()
    q.awaitTermination()
    val ingestSec = (System.nanoTime() - tIn0) / 1e9
    val points = nGranules.toLong * 720 * 1440

    // ---- 3. store shape before compaction
    val filesBefore = parquetFiles(spark, store)
    val tiles = spark.read.parquet(store)
    val tileCount = tiles.count()

    def p2Scan(): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = spark.read.parquet(store)
        .where(col("max_lat") >= 0 && col("min_lat") <= 30 &&
          col("max_lon") >= 0 && col("min_lon") <= 60 &&
          col("min_time") <= (nGranules / 2) * 86400L)
        .agg(count(lit(1)), sum("stats_count")).head().getLong(0)
      ((System.nanoTime() - t0) / 1e9, n)
    }
    val (scanBefore, nHits) = p2Scan()

    // ---- 4. compact + rescan
    val tC0 = System.nanoTime()
    graft.ingest.Ingest.compactTiles(spark, store)
    val compactSec = (System.nanoTime() - tC0) / 1e9
    val filesAfter = parquetFiles(spark, store)
    val (scanAfter, nHits2) = p2Scan()
    require(nHits == nHits2, s"compaction changed P2 results: $nHits -> $nHits2")

    println(f"""{"granules":$nGranules,"granule_mb":$granuleMb%.1f,"gen_sec":$genSec%.2f,"batch_tile_sec":$batchSec%.2f,"batch_tiles":$batchTiles,"ingest_sec":$ingestSec%.2f,"granules_per_sec":${nGranules / ingestSec}%.2f,"points_per_sec":${points / ingestSec}%.0f,"tiles":$tileCount,"files_before":$filesBefore,"files_after":$filesAfter,"compact_sec":$compactSec%.2f,"p2_scan_before_sec":$scanBefore%.3f,"p2_scan_after_sec":$scanAfter%.3f,"p2_tiles_hit":$nHits}""")
    spark.stop()
  }
}
