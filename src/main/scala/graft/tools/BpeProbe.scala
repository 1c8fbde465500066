package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: measure BPE training cost vs merge budget — the evidence
  * behind the incremental trainer's "shuffle is O(symbols fused), one
  * pass commits many merges" scaling claim (SCALING.md). Reports wall
  * time and the number of Spark jobs scheduled (for the incremental
  * trainer, jobs ≈ corpus passes + 2; for the sequential reference,
  * jobs ≈ merges + 2).
  *
  * Usage: runMain graft.tools.BpeProbe <sfDir> <numMerges>
  *          <fast|seq|dist|passes|diff|distdiff>
  *          [maxBatch] [unigram|bigram|trigram|fourgram]
  * (`diff`/`distdiff` train BOTH the driver-table/distributed-table
  * incremental trainer and the sequential reference and require
  * merge-for-merge equality — the scale differential over the real
  * corpus. `dist` times the distributed-pair-table fallback alone:
  * its jobs must track passes, ~3/pass.)
  *
  * `bigram` trains on space-joined adjacent word pairs instead of
  * words: the replica-scaled corpora add rows but no DISTINCT words
  * (the unigram vocabulary exhausts after ~100 merges), while bigrams
  * give the tens-of-thousands-strong, longer-word vocabulary a real
  * 1k-merge budget needs.
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val n = args(1).toInt
    val mode = args(2)
    val maxBatch = if (args.length > 3) args(3).toInt else 64
    val corpus = if (args.length > 4) args(4) else "unigram"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
      })

    val docs = graft.Tables.documentsSpread(spark, sfDir)
    // n-gram corpora scale the DISTINCT-WORD count (replica-scaled
    // corpora add rows but no distinct words): unigram ~5k, bigram
    // ~48k, trigram ~200k+ — the axis the inverted-index trainer's
    // "pass cost sublinear in vocabulary" claim is measured against
    def ngrams(n: Int) = {
      val ws = docs.select(split(col("text"), " ").as("ws"))
      // size guard: sequence(1, 0) generates a descending range and
      // element_at(ws, 0) throws on a too-short document
      val prs = when(size(col("ws")) >= n,
        transform(sequence(lit(1), size(col("ws")) - (n - 1)), i =>
          concat_ws("_", (0 until n).map(k => element_at(col("ws"), i + k)): _*)))
        .otherwise(array().cast("array<string>"))
      ws.select(explode(prs).as("w"))
        .where(length(col("w")) > 1)
        .groupBy("w").agg(count(lit(1)).as("cnt"))
    }
    val wc = corpus match {
      case "bigram" => ngrams(2)
      case "trigram" => ngrams(3)
      case "fourgram" => ngrams(4)
      case _ => graft.text.Bpe.wordCounts(docs, col("text"))
    }
    wc.count() // warm the corpus scan out of the measurement
    if (mode == "distwipe") {
      // forced executor-loss rebuild differential AT SCALE: train the
      // distributed trainer twice — once undisturbed, once with the
      // whole TrainStore wiped after two MID-RUN passes (the executor
      // restart the rebuild protocol exists for; late wipes make the
      // rebuild replay a long committed prefix — the expensive case;
      // a too-short run simply fires fewer wipes, see `wipes=`) — and
      // require both to equal sequential greedy. The wall-clock delta
      // estimates the rebuild cost (base-symbol replay +
      // committed-prefix re-merge on every partition, per wipe).
      val seqRef = graft.text.Bpe.trainSequential(wc, n)
      val t0 = System.nanoTime()
      val clean = graft.text.Bpe.trainDistributed(wc, n, maxBatch = maxBatch)
      val tClean = (System.nanoTime() - t0) / 1e9
      var wipes = 0
      val t1 = System.nanoTime()
      val wiped = graft.text.Bpe.trainDistributed(wc, n, maxBatch = maxBatch,
        passHook = (pass, _, _, _) =>
          if (pass == 20 || pass == 60) {
            graft.text.Bpe.wipeTrainStore(); wipes += 1
          })
      val tWiped = (System.nanoTime() - t1) / 1e9
      println(f"[bpeprobe] mode=distwipe asked=$n clean=${clean.length} " +
        f"wiped=${wiped.length} cleanEq=${clean == seqRef} " +
        f"wipedEq=${wiped == seqRef} wipes=$wipes " +
        f"tClean=$tClean%.1f s tWiped=$tWiped%.1f s " +
        f"rebuildCost=${tWiped - tClean}%.1f s")
      require(clean == seqRef && wiped == seqRef,
        "distributed trainer diverged from sequential greedy")
      spark.stop()
      return
    }
    if (mode == "diff" || mode == "distdiff") {
      // scale differential: the incremental trainers must reproduce the
      // sequential reference merge for merge AND count for count on
      // the real corpus, not just BpeSpec's synthetic ones
      val a =
        if (mode == "distdiff")
          graft.text.Bpe.trainDistributed(wc, n, maxBatch = maxBatch)
        else graft.text.Bpe.train(wc, n, maxBatch = maxBatch)
      val b = graft.text.Bpe.trainSequential(wc, n)
      val diverge = a.zip(b).indexWhere { case (x, y) => x != y }
      println(s"[bpeprobe] mode=$mode asked=$n fast=${a.length} " +
        s"seq=${b.length} equal=${a == b}" +
        (if (diverge >= 0) s" FIRST-DIVERGENCE at rank ${diverge + 1}: " +
          s"${a(diverge)} vs ${b(diverge)}" else ""))
      require(a == b, "incremental trainer diverged from sequential greedy")
      spark.stop()
      return
    }
    jobs.set(0)
    val t0 = System.nanoTime()
    val merges = mode match {
      case "seq" => graft.text.Bpe.trainSequential(wc, n)
      case "dist" => graft.text.Bpe.trainDistributed(wc, n,
        maxBatch = maxBatch)
      case "passes" =>
        // per-pass fuse-site instrumentation: the evidence that pass
        // cost tracks TOUCHED words (fuse sites), not the size of the
        // distinct-word table. The store footprint rides along —
        // TrainStore heap is invisible to Spark's memory manager, so
        // this line is where an operator sees it move pass to pass.
        graft.text.Bpe.train(wc, n, maxBatch = maxBatch,
          passHook = (pass, committed, touched, secs) => {
            val storeMb = graft.text.Bpe.trainStoreLastReport
              .map(_._3 / 1e6).getOrElse(0.0)
            println(f"[bpepass] pass=$pass%4d committed=$committed%3d " +
              f"touched=$touched%8d secs=$secs%7.3f store=$storeMb%.1f MB")
          })
      case _ => graft.text.Bpe.train(wc, n, maxBatch = maxBatch)
    }
    val dt = (System.nanoTime() - t0) / 1e9
    val store = graft.text.Bpe.trainStoreLastReport
      .map { case (_, p, b) => f"store=${b / 1e6}%.1f MB (pass $p)" }
      .getOrElse("store=n/a")
    println(f"[bpeprobe] mode=$mode asked=$n learned=${merges.length} " +
      f"maxBatch=$maxBatch jobs=${jobs.get()} time=$dt%.1f s " +
      f"(${dt / math.max(1, merges.length) * 1000}%.1f ms/merge) $store")
    spark.stop()
  }
}
