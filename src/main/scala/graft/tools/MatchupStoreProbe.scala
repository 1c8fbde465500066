package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: the matchup WRITE path at scale. The bench gate
  * (`j1_tolerance_join`) materializes every admitted pair through a
  * BucketedSort into the driver-facing total order — the right shape
  * for a hash-checked oracle, but at real scale those pairs go to the
  * RESULTS STORE (`/domsmatchup` → S8 partitioned parquet) and are
  * read back path-addressed. This probe times both shapes on the same
  * pair enumeration so SCALING.md can carry the store-backed number:
  *
  *   gate   — the bench shape: BucketedSort total order, every row
  *            materialized in order (toRdd.count, exactly what Bench
  *            times).
  *   store  — the production shape: unordered pairs written straight
  *            into the execution's partition directory (one parquet
  *            job, no sort exchange), then the path-addressed
  *            read-back count (what the /domsmatchup handler runs).
  *   store+sort — the store write fed by the BucketedSort order (what
  *            writing the gate's exact output would cost), to separate
  *            the sort's cost from the write's.
  *
  * Usage: runMain graft.tools.MatchupStoreProbe [sfDir] [storeDir] [reps]
  * (min-of-`reps` after one warmup each, like the 100× sweep).
  */
object MatchupStoreProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val store = if (args.length > 1) args(1) else "/tmp/graft_matchup_store"
    val reps = (if (args.length > 2) args(2).toInt else 2).max(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Clear stale probe leftovers (executions are immutable, so every
    // rep writes a fresh id — stale dirs from a previous probe run
    // would only grow the listing) — but NEVER touch content this
    // probe didn't write: arg 2 pointed at a real results store (the
    // same S8 layout ResultsStore serves) must not cost stored
    // executions. Deletion is therefore ALWAYS restricted to the
    // probe's own execution_id=probe-* entries — never a recursive
    // wipe of the root — and anything else in the directory refuses
    // loudly, marker or no marker: the breadcrumb marker (stamped only
    // when the probe CREATED the directory; a pre-existing empty dir
    // pressed into service never earns one) records provenance, it is
    // not a license to destroy content that landed there later.
    val root = new org.apache.hadoop.fs.Path(store)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(root, "_GRAFT_PROBE_SCRATCH")
    if (fs.exists(root)) {
      val entries = fs.listStatus(root)
        .filterNot(_.getPath.getName == marker.getName)
      val (mine, foreign) = entries.partition(
        _.getPath.getName.startsWith("execution_id=probe-"))
      if (foreign.nonEmpty) {
        System.err.println(
          s"[matchup-store] REFUSING to touch $store — it holds non-probe " +
            s"content (${foreign.take(5).map(_.getPath.getName).mkString(", ")}" +
            (if (foreign.length > 5) ", …" else "") + "). " +
            "Point arg 2 at a scratch path instead.")
        spark.stop()
        sys.exit(2)
      }
      mine.foreach(e => fs.delete(e.getPath, true))
    } else {
      fs.mkdirs(root)
      fs.create(marker, true).close()
    }

    // each store rep writes a fresh execution id (immutability), then
    // DELETES it untimed after the measurement: at 100× one execution
    // is ~10 GB of pair parquet and warmup+reps across two store
    // variants would otherwise hold 6 of them on disk at once
    def dropExec(id: String): Unit = {
      val d = new org.apache.hadoop.fs.Path(s"$store/execution_id=$id")
      if (fs.exists(d)) fs.delete(d, true)
    }
    def time(f: => Option[String]): Double = {
      val t0 = System.nanoTime()
      val id = f
      val dt = (System.nanoTime() - t0) / 1e9
      id.foreach(dropExec)
      dt
    }
    var execSeq = 0
    def minOf(label: String, rep: () => Option[String]): Double = {
      time(rep()) // warmup (codegen/JIT), cleaned up like a timed rep
      val best = (1 to reps).map(_ => time(rep())).min
      println(f"[matchup-store] $label%-12s min-of-$reps $best%8.2f s")
      best
    }

    // frames are built FRESH per rep (like Bench re-invokes the query
    // fn): reusing one toRdd instance lets Spark reuse its shuffle map
    // outputs across jobs, and rep 2 then times only the final stage
    def gateDf = graft.SparkEntry.queries("j1_tolerance_join")(spark, sfDir)
    def pairsDf = graft.queries.JoinQueries.j1Pairs(spark, sfDir)
    val nPairs = pairsDf.count()
    println(s"[matchup-store] sf=$sfDir admitted pairs=$nPairs")

    val gate = minOf("gate", () => {
      gateDf.queryExecution.toRdd.count(); None
    })
    val storeT = minOf("store", () => {
      execSeq += 1
      val id = s"probe-u$execSeq"
      graft.sources.ResultsStore.write(pairsDf, store, id)
      graft.sources.ResultsStore.read(spark, store, id).count()
      Some(id)
    })
    val storeSorted = minOf("store+sort", () => {
      execSeq += 1
      val id = s"probe-s$execSeq"
      graft.sources.ResultsStore.write(gateDf, store, id)
      graft.sources.ResultsStore.read(spark, store, id).count()
      Some(id)
    })
    println(f"[matchup-store] summary: gate=$gate%.2f s store=$storeT%.2f s " +
      f"store+sort=$storeSorted%.2f s pairs=$nPairs " +
      f"(store/gate=${storeT / gate}%.2f)")
    spark.stop()
  }
}
