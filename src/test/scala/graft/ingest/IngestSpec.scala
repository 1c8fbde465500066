package graft.ingest

import graft.SparkSpec
import graft.core.TileOps
import org.apache.spark.sql.functions._

class IngestSpec extends SparkSpec {

  /** 4×4 grid granule at t=0, values = lat*4+lon index, chunked into
    * 2°×2° tiles → 4 tiles of 2×2.
    */
  private def gridPoints = {
    import spark.implicits._
    (for {
      li <- 0 until 4; lo <- 0 until 4
    } yield ("g1.nc", li + 0.5, lo + 0.5, 0L, (li * 4 + lo).toDouble))
      .toDF("granule", "latitude", "longitude", "time", "value")
  }

  test("pointsToTiles chunks a granule into dense tiles with stats") {
    val tiles = Ingest.pointsToTiles(gridPoints, 2.0, 2.0, "test_ds")
    assert(tiles.count() === 4)
    val t00 = tiles.where(col("min_lat") === 0.5 && col("min_lon") === 0.5)
      .collect()(0)
    // cell (0,0) holds grid values 0,1,4,5
    assert(t00.getAs[Double]("stats_min") === 0.0)
    assert(t00.getAs[Double]("stats_max") === 5.0)
    assert(t00.getAs[Long]("stats_count") === 4L)
    assert(t00.getAs[Seq[Float]]("data").length === 4)
    assert(t00.getAs[String]("tile_id").length === 32)
  }

  test("tile ids are deterministic") {
    val a = Ingest.pointsToTiles(gridPoints, 2.0, 2.0, "test_ds")
      .select("tile_id").collect().map(_.getString(0)).sorted
    val b = Ingest.pointsToTiles(gridPoints, 2.0, 2.0, "test_ds")
      .select("tile_id").collect().map(_.getString(0)).sorted
    assert(a.toSeq === b.toSeq)
  }

  test("fully-masked tiles are dropped (P11)") {
    import spark.implicits._
    val masked = gridPoints.withColumn("value",
      when(col("latitude") < 2.0 && col("longitude") < 2.0, lit(Double.NaN))
        .otherwise(col("value")))
    val tiles = Ingest.pointsToTiles(masked, 2.0, 2.0, "test_ds")
    assert(tiles.count() === 3) // cell (0,0) all-NaN → dropped
  }

  test("writeTiles partitions by dataset+time_bucket and prunes at read") {
    val out = java.nio.file.Files.createTempDirectory("graft_tiles").toString
    val tiles = Ingest.pointsToTiles(gridPoints, 2.0, 2.0, "ds_a")
      .unionByName(Ingest.pointsToTiles(
        gridPoints.withColumn("time", org.apache.spark.sql.functions.lit(2592000L)),
        2.0, 2.0, "ds_b"))
    Ingest.writeTiles(tiles, out)
    // partition directories exist for both datasets
    val dirs = new java.io.File(out).listFiles().map(_.getName).filter(_.startsWith("dataset="))
    assert(dirs.toSet === Set("dataset=ds_a", "dataset=ds_b"))
    // a dataset+time predicate becomes PartitionFilters (pruned scan)
    val read = spark.read.parquet(out)
      .where(col("dataset") === "ds_a" && col("time_bucket") === 0L)
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.contains("ds_a"), plan) // the partition predicate itself
    assert(read.count() === 4)
  }

  test("non-dense grids fail loudly instead of scrambling coordinates") {
    import spark.implicits._
    // two points on a diagonal: 2 distinct lats × 2 distinct lons but
    // only 2 of 4 grid slots present
    val sparse = Seq(
      ("g.nc", 0.5, 0.5, 0L, 1.0),
      ("g.nc", 1.5, 1.5, 0L, 2.0)
    ).toDF("granule", "latitude", "longitude", "time", "value")
    val e = intercept[Exception] {
      Ingest.pointsToTiles(sparse, 2.0, 2.0, "ds").collect()
    }
    assert(e.getMessage.contains("non-dense grid"))
  }

  test("duplicate coordinates fail loudly even when counts balance") {
    import spark.implicits._
    // 4 points, 2x2 distinct lats/lons, but (0.5,0.5) duplicated and
    // (1.5,0.5) missing: size==expected yet the grid is wrong
    val dup = Seq(
      ("g.nc", 0.5, 0.5, 0L, 1.0), ("g.nc", 0.5, 0.5, 0L, 2.0),
      ("g.nc", 0.5, 1.5, 0L, 3.0), ("g.nc", 1.5, 1.5, 0L, 4.0)
    ).toDF("granule", "latitude", "longitude", "time", "value")
    val e = intercept[Exception] {
      Ingest.pointsToTiles(dup, 2.0, 2.0, "ds").collect()
    }
    assert(e.getMessage.contains("non-dense grid"))
  }

  test("bucketed tables join without a shuffle") {
    import spark.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = (1 to 200).map(i => (i.toLong, i * 1.0)).toDF("k", "va")
      val b = (1 to 200).map(i => (i.toLong, i * 2.0)).toDF("k", "vb")
      Ingest.writeBucketedTable(a, "graft_bucket_a", "k", numBuckets = 4)
      Ingest.writeBucketedTable(b, "graft_bucket_b", "k", numBuckets = 4)
      val joined = spark.table("graft_bucket_a")
        .join(spark.table("graft_bucket_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() === 200)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_a")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_b")
    }
  }

  test("tiles round-trip through toPoints") {
    val tiles = Ingest.pointsToTiles(gridPoints, 2.0, 2.0, "test_ds")
    val points = TileOps.toPoints(tiles)
    assert(points.count() === 16)
    val total = points.agg(sum("value")).collect()(0).getDouble(0)
    assert(total === (0 until 16).sum.toDouble)
  }

  test("compactTiles merges small files, preserves rows, keeps store readable") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString + "/tiles"
    // simulate micro-batch appends: 8 tiny files in one partition
    val rows = (1 to 200).map(i =>
      (i.toLong, "ds1", (i % 10).toDouble, (i % 7).toDouble, i * 86400L))
    rows.grouped(25).foreach { g =>
      g.toDF("tile_id", "dataset", "min_lat", "min_lon", "min_time")
        .withColumn("time_bucket", lit(0L))
        .write.mode("append").partitionBy("dataset", "time_bucket").parquet(dir)
    }
    def dataFiles = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(dir)).filter(_.getName.endsWith(".parquet"))
    }
    val before = dataFiles.length
    assert(before >= 8)
    val expected = spark.read.parquet(dir).orderBy("tile_id").collect().toSeq
    Ingest.compactTiles(spark, dir, targetBytes = 1L << 30, zorder = false)
    assert(dataFiles.length < before)
    val after = spark.read.parquet(dir).orderBy("tile_id").collect().toSeq
    assert(after === expected)
    // spatial sort within the compacted files: min_lat non-decreasing
    // per file (row-group min/max stats then align with bbox filters)
    dataFiles.foreach { f =>
      val lats = spark.read.parquet(f.getPath).select("min_lat")
        .collect().map(_.getDouble(0)).toSeq
      assert(lats === lats.sorted, s"unsorted compacted file $f")
    }
  }

  test("deleteTiles rewrites only affected partitions and counts deletions") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_del").toString + "/tiles"
    val rows = (1 to 100).map(i =>
      (i.toLong, if (i <= 50) "ds1" else "ds2", (i % 10).toDouble, i * 86400L))
    rows.toDF("tile_id", "dataset", "min_lat", "min_time")
      .withColumn("time_bucket", lit(0L))
      .write.partitionBy("dataset", "time_bucket").parquet(dir)
    def filesIn(ds: String) =
      new java.io.File(s"$dir/dataset=$ds/time_bucket=0").listFiles()
        .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified).toSeq
    val ds2Before = filesIn("ds2")
    // predicate matches only ds1 rows
    val n = Ingest.deleteTiles(spark, dir,
      col("dataset") === "ds1" && col("min_lat") < 5.0)
    assert(n === 25)
    val back = spark.read.parquet(dir)
    assert(back.count() === 75)
    assert(back.where(col("dataset") === "ds1" && col("min_lat") < 5.0).count() === 0)
    // untouched partition: same files, same mtimes
    assert(filesIn("ds2") === ds2Before)
    // deleting everything in a partition removes its directory
    Ingest.deleteTiles(spark, dir, col("dataset") === "ds2")
    assert(!new java.io.File(s"$dir/dataset=ds2").exists())
    assert(spark.read.parquet(dir).count() === 25)
  }

  test("deleteTiles keeps NULL-predicate rows and handles special chars in partition values") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_deln").toString + "/tiles"
    // dataset value with a space and colon: Spark URL-escapes these in
    // the partition dir name; min_lat NULL on some rows makes the
    // delete predicate evaluate to NULL there
    // the tab/newline dataset exercises the manifest encoding: raw
    // values would mis-split the tab-delimited manifest (silent
    // non-delete) or crash recovery on the newline — escaped path
    // segments in the manifest keep both well-formed
    val rows = Seq(
      (1L, "sst v2:final", Some(1.0), 86400L),
      (2L, "sst v2:final", Some(9.0), 86400L),
      (3L, "sst v2:final", None, 86400L),
      (4L, "sst\tv3\nnightly", Some(1.0), 86400L),
      (5L, "sst\tv3\nnightly", Some(9.0), 86400L))
    rows.toDF("tile_id", "dataset", "min_lat", "min_time")
      .withColumn("time_bucket", lit(0L))
      .write.partitionBy("dataset", "time_bucket").parquet(dir)
    val n = Ingest.deleteTiles(spark, dir, col("min_lat") < 5.0)
    assert(n === 2)
    val back = spark.read.parquet(dir)
    // the NULL-stat row SURVIVES: the predicate never matched it
    assert(back.count() === 3)
    assert(back.select("tile_id").as[Long].collect().toSet === Set(2L, 3L, 5L))
    assert(back.select("dataset").distinct().count() === 2)
  }

  test("deleteTiles kill-point: crash between partition swaps recovers whole") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_delkill").toString + "/tiles"
    // 4 affected partitions (2 datasets x 2 time buckets), matches and
    // survivors in every one
    val rows = (1 to 120).map { i =>
      (i.toLong, if (i <= 60) "ds1" else "ds2", (i % 10).toDouble,
        (i % 2) * Ingest.TimeBucketSeconds)
    }
    rows.toDF("tile_id", "dataset", "min_lat", "min_time")
      .withColumn("time_bucket", Ingest.timeBucket(col("min_time")))
      .write.partitionBy("dataset", "time_bucket").parquet(dir)
    val pred = col("min_lat") < 5.0
    val expected = spark.read.parquet(dir)
      .where(!coalesce(pred, lit(false)))
      .select("tile_id").as[Long].collect().toSet
    // crash after ONE of the four manifest entries was applied
    val e = intercept[RuntimeException] {
      Ingest.deleteTilesImpl(spark, dir, pred, killAfter = 1)
    }
    assert(e.getMessage.contains("injected kill"))
    // torn state: commit manifest on disk, delete only partially applied
    assert(new java.io.File(s"$dir/_delete_manifest").exists())
    val torn = spark.read.parquet(dir).select("tile_id").as[Long].collect().toSet
    assert((torn !== expected) && expected.subsetOf(torn),
      "kill-point should leave some partitions unrewritten")
    // reopen-time recovery rolls the commit FORWARD to full application
    Ingest.recoverStore(spark, dir)
    assert(spark.read.parquet(dir).select("tile_id").as[Long].collect().toSet
      === expected)
    assert(!new java.io.File(s"$dir/_delete_manifest").exists())
    assert(!new java.io.File(s"$dir/_delete_staging").exists())
    // recovery is idempotent; a fresh delete runs clean afterwards
    Ingest.recoverStore(spark, dir)
    assert(Ingest.deleteTiles(spark, dir, col("min_lat") >= 9.0) === 12)
  }

  test("recoverStore: pre-commit staging rolls back; torn compaction resolves") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_recov").toString + "/tiles"
    (1 to 20).map(i => (i.toLong, "ds1", i.toDouble, 0L))
      .toDF("tile_id", "dataset", "min_lat", "min_time")
      .withColumn("time_bucket", lit(0L))
      .write.partitionBy("dataset", "time_bucket").parquet(dir)
    val expected = spark.read.parquet(dir).select("tile_id")
      .as[Long].collect().toSet
    // (1) crash BEFORE the manifest commit: staging + in-progress
    // manifest present, no manifest — the delete never happened
    val staging = new java.io.File(s"$dir/_delete_staging/tmp")
    staging.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/_delete_manifest.inprogress"),
      "swap\tds1\t0\n".getBytes("UTF-8"))
    Ingest.recoverStore(spark, dir)
    assert(!new java.io.File(s"$dir/_delete_staging").exists())
    assert(!new java.io.File(s"$dir/_delete_manifest.inprogress").exists())
    assert(spark.read.parquet(dir).select("tile_id").as[Long].collect().toSet
      === expected)
    // (2) torn compaction, mid-swap: store dir missing, old + completed
    // tmp (_SUCCESS) present — recovery installs the rewrite
    spark.read.parquet(dir).write.parquet(dir + "__compact_tmp")
    assert(new java.io.File(dir + "__compact_tmp/_SUCCESS").exists())
    assert(new java.io.File(dir).renameTo(new java.io.File(dir + "__compact_old")))
    Ingest.recoverStore(spark, dir)
    assert(spark.read.parquet(dir).select("tile_id").as[Long].collect().toSet
      === expected)
    assert(!new java.io.File(dir + "__compact_tmp").exists())
    assert(!new java.io.File(dir + "__compact_old").exists())
    // (3) stray tmp beside an INTACT store (write crashed pre-swap,
    // possibly partial): discarded, store untouched
    new java.io.File(dir + "__compact_tmp").mkdirs()
    Ingest.recoverStore(spark, dir)
    assert(!new java.io.File(dir + "__compact_tmp").exists())
    assert(spark.read.parquet(dir).count() === 20)
  }

  test("zorder2 interleaves and orders 2-D neighbors together") {
    import spark.implicits._
    val df = Seq((0.0, 0.0), (1.0, 0.0), (0.0, 1.0), (1.0, 1.0))
      .toDF("x", "y")
    val z = df.select(Ingest.zorder2(col("x"), lit(0.0), lit(1.0),
        col("y"), lit(0.0), lit(1.0), bits = 1).as("z"))
      .as[Long].collect().toSeq
    // 1-bit quantization: (0,0)→0, (1,0)→1, (0,1)→2, (1,1)→3
    assert(z === Seq(0L, 1L, 2L, 3L))
  }

  test("Z-order compaction prunes more files than a lat-sorted layout") {
    import spark.implicits._
    // 32×32 grid of tiles, written unordered
    def freshStore(): String = {
      val dir = java.nio.file.Files.createTempDirectory("graft_z").toString + "/tiles"
      val rows = scala.util.Random.shuffle(
        (for (la <- 0 until 32; lo <- 0 until 32)
          yield (la * 32L + lo, "ds1", la.toDouble, lo.toDouble, 0L)).toSeq)
      rows.toDF("tile_id", "dataset", "min_lat", "min_lon", "min_time")
        .withColumn("time_bucket", lit(0L))
        .write.mode("overwrite").partitionBy("dataset", "time_bucket").parquet(dir)
      dir
    }
    def filesTouched(dir: String, lonLo: Double, lonHi: Double): (Int, Int) = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      val files = walk(new java.io.File(dir))
        .filter(_.getName.endsWith(".parquet"))
      val touched = files.count { f =>
        val r = spark.read.parquet(f.getPath)
          .agg(min("min_lon"), max("min_lon")).head()
        r.getDouble(0) <= lonHi && r.getDouble(1) >= lonLo
      }
      (touched, files.length)
    }
    // force ~16 files: store is tiny, so target a fraction of its size
    def sized(dir: String): Long = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(dir)).filter(_.getName.endsWith(".parquet"))
        .map(_.length()).sum
    }
    val linDir = freshStore()
    Ingest.compactTiles(spark, linDir, targetBytes = sized(linDir) / 16, zorder = false)
    val zDir = freshStore()
    Ingest.compactTiles(spark, zDir, targetBytes = sized(zDir) / 16, zorder = true)
    // narrow-lon, full-lat query: the worst case for a lat-leading
    // sort (every lat band intersects), the case Z-order exists for
    val (linTouched, linTotal) = filesTouched(linDir, 10.0, 13.0)
    val (zTouched, zTotal) = filesTouched(zDir, 10.0, 13.0)
    assert(linTotal >= 8 && zTotal >= 8)
    assert(linTouched === linTotal, "lat-sort should touch every file here")
    assert(zTouched * 2 <= zTotal,
      s"z-order should prune at least half the files, touched $zTouched/$zTotal")
    // and the z-ordered store still answers the query identically
    val zRows = spark.read.parquet(zDir)
      .where(col("min_lon").between(10.0, 13.0)).count()
    assert(zRows === 32L * 4)
  }

  test("writeTiles dynamic overwrite: a second dataset's batch does not wipe the first") {
    val out = java.nio.file.Files.createTempDirectory("graft_dynow").toString
    Ingest.writeTiles(Ingest.pointsToTiles(gridPoints, 2.0, 2.0, "ds_a"), out)
    // a LATER batch for a different dataset must replace only its own
    // partitions — static overwrite mode deleted the whole root first
    Ingest.writeTiles(Ingest.pointsToTiles(gridPoints, 2.0, 2.0, "ds_b"), out)
    val back = spark.read.parquet(out)
    assert(back.where(col("dataset") === "ds_a").count() === 4, "ds_a wiped")
    assert(back.where(col("dataset") === "ds_b").count() === 4)
    // re-writing ds_b replaces ds_b's partitions without duplicating
    Ingest.writeTiles(Ingest.pointsToTiles(gridPoints, 2.0, 2.0, "ds_b"), out)
    assert(spark.read.parquet(out).where(col("dataset") === "ds_b").count() === 4)
  }

  test("compactTiles and recoverStore tolerate a trailing slash on the store path") {
    val dir = java.nio.file.Files.createTempDirectory("graft_slash").toString
    Ingest.writeTiles(Ingest.pointsToTiles(gridPoints, 2.0, 2.0, "ds_s"), dir)
    val before = spark.read.parquet(dir).count()
    // raw string concatenation made tmp/bak CHILDREN of the store for a
    // "store/" spelling, failing the swap rename after the full rewrite
    Ingest.compactTiles(spark, dir + "/", targetBytes = 1L << 30, zorder = false)
    assert(spark.read.parquet(dir).count() === before)
    assert(!new java.io.File(dir + "__compact_tmp").exists())
    assert(!new java.io.File(dir + "__compact_old").exists())
  }
}
