package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Differential + unit coverage for the distributed BPE trainer: the
  * engine (word-count table + per-iteration pair aggregation + argmax)
  * must reproduce, merge for merge, an independent single-machine
  * reference implementation written the textbook way (mutable pair
  * map over a word-frequency dictionary).
  */
class BpeSpec extends SparkSpec {

  // ---- independent single-machine reference -------------------------

  /** Textbook BPE on a word-frequency map — intentionally a different
    * shape from the engine (in-memory pair map, no Spark).
    */
  private def refTrain(freq: Map[String, Long], n: Int): Seq[(String, String, Long)] = {
    var words: Map[List[String], Long] =
      freq.map { case (w, c) => (w.map(_.toString).toList :+ Bpe.Eow) -> c }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var k = 0
    var stop = false
    while (k < n && !stop) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        syms.zip(syms.tail).foreach(p => pc(p) = pc.getOrElse(p, 0L) + c)
      }
      if (pc.isEmpty) stop = true
      else {
        val ((l, r), c) = pc.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((l, r, c))
        words = words.toSeq.map { case (syms, cc) =>
          (refMerge(syms, l, r), cc)
        }.groupBy(_._1).map { case (s, g) => s -> g.map(_._2).sum }
        k += 1
      }
    }
    out.toSeq
  }

  /** Reference merge via recursion (different shape from the engine's
    * while-loop).
    */
  private def refMerge(s: List[String], l: String, r: String): List[String] = s match {
    case a :: b :: rest if a == l && b == r => (l + r) :: refMerge(rest, l, r)
    case a :: rest => a :: refMerge(rest, l, r)
    case Nil => Nil
  }

  private val corpus = Seq(
    (0L, "low lower lowest low low"),
    (1L, "new newer newest new"),
    (2L, "wide wider widest new low"),
    (3L, "low low newer wider"))

  private def corpusDf = {
    import spark.implicits._
    corpus.toDF("doc_id", "text")
  }

  private val refFreq: Map[String, Long] = corpus
    .flatMap(_._2.split(" ")).filter(_.nonEmpty)
    .groupBy(identity).map { case (w, g) => w -> g.size.toLong }

  // ---- mergePair unit semantics --------------------------------------

  test("mergePair fuses left-to-right without overlap") {
    assert(Bpe.mergePair(Seq("a", "a", "a"), "a", "a") === Seq("aa", "a"))
    assert(Bpe.mergePair(Seq("a", "a", "a", "a"), "a", "a") === Seq("aa", "aa"))
    assert(Bpe.mergePair(Seq("x", "a", "b", "a", "b"), "a", "b") === Seq("x", "ab", "ab"))
    assert(Bpe.mergePair(Seq("a", "b"), "b", "a") === Seq("a", "b"))
    assert(Bpe.mergePair(Seq.empty, "a", "b") === Seq.empty)
    // the fused symbol does NOT re-match within the same pass
    assert(Bpe.mergePair(Seq("a", "a", "b"), "a", "ab") === Seq("a", "a", "b"))
  }

  // ---- wordCounts / initialPairCounts vs brute force ------------------

  test("wordCounts matches a brute-force frequency map") {
    val got = Bpe.wordCounts(corpusDf, col("text")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === refFreq)
  }

  test("initialPairCounts matches the reference's iteration-0 pair map") {
    val ref = {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      refFreq.foreach { case (w, c) =>
        val syms = w.map(_.toString) :+ Bpe.Eow
        syms.zip(syms.tail).foreach(p => pc(p) = pc.getOrElse(p, 0L) + c)
      }
      pc.toMap
    }
    val got = Bpe.initialPairCounts(Bpe.wordCounts(corpusDf, col("text")))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === ref)
  }

  // ---- train: differential against the reference ----------------------

  test("train reproduces the reference merge sequence exactly") {
    val got = Bpe.train(Bpe.wordCounts(corpusDf, col("text")), 12)
      .map(m => (m.left, m.right, m.cnt))
    val ref = refTrain(refFreq, 12)
    assert(got === ref)
    // ranks are 1..n in order
    val ranks = Bpe.train(Bpe.wordCounts(corpusDf, col("text")), 3).map(_.rank)
    assert(ranks === Seq(1, 2, 3))
  }

  test("every pass reports the TrainStore footprint (observable heap)") {
    // the store lives outside Spark's memory manager — the per-pass
    // report (trainId, pass, approx bytes over partitions) is the only
    // way an operator sees that heap; it must be present and plausible
    // attribute through the KEYED reports map, not the global
    // last-writer-wins slot: suites run in parallel in one JVM, so a
    // concurrent training elsewhere could overwrite lastReport between
    // our last pass and the read — the before/after id diff pins a
    // report from THIS training
    val before = Bpe.trainStoreReportIds
    val merges = Bpe.train(Bpe.wordCounts(corpusDf, col("text")), 5)
    assert(merges.nonEmpty)
    val fresh = Bpe.trainStoreReportIds -- before
    assert(fresh.nonEmpty, "no TrainStore footprint report after training")
    // the keyed reports map is bounded (64 entries, eldest drop): with
    // enough concurrent trainings in parallel suites our fresh id's
    // report could be evicted between training end and this read — the
    // failure must be the footprint-report assertion, not a bare
    // maxBy UnsupportedOperationException
    val reports = fresh.flatMap(Bpe.trainStoreReport)
    assert(reports.nonEmpty,
      "fresh trainId's footprint report missing (evicted from the bounded reports map?)")
    val (pass, bytes) = reports.maxBy(_._2)
    assert(pass >= 1)
    // a handful of tiny words: more than bare object headers, far
    // under a megabyte
    assert(bytes > 1000L && bytes < 10L * 1000 * 1000, s"bytes=$bytes")
  }

  test("train exhausts gracefully when every word fuses to one symbol") {
    import spark.implicits._
    val tiny = Seq((0L, "ab ab b")).toDF("doc_id", "text")
    // "ab</w>" needs 3 merges, "b</w>" 1 — 10 asked, ≤4 learnable
    val merges = Bpe.train(Bpe.wordCounts(tiny, col("text")), 10)
    assert(merges.length <= 4 && merges.nonEmpty)
    val fused = merges.map(m => m.merged)
    assert(fused.contains("ab</w>") || fused.contains("b</w>"))
  }

  // ---- encode ---------------------------------------------------------

  test("encodeWord concatenation is lossless and matches refMerge chain") {
    val merges = Bpe.train(Bpe.wordCounts(corpusDf, col("text")), 8)
    refFreq.keys.foreach { w =>
      val toks = Bpe.encodeWord(w, merges)
      assert(toks.mkString === w + Bpe.Eow, s"lossy encode of '$w'")
      // reference: fold the merge list over the reference merge fn
      val ref = merges.foldLeft(w.map(_.toString).toList :+ Bpe.Eow) {
        (s, m) => refMerge(s, m.left, m.right)
      }
      assert(toks === ref, s"encode of '$w' diverges from reference")
    }
  }

  test("encode adds bpe_tokens/n_bpe_tokens and respects word boundaries") {
    val merges = Bpe.train(Bpe.wordCounts(corpusDf, col("text")), 8)
    val enc = Bpe.encode(corpusDf, "text", merges)
    assert(enc.columns.toSeq === Seq("doc_id", "text", "bpe_tokens", "n_bpe_tokens"))
    enc.collect().foreach { r =>
      val text = r.getString(1)
      val toks = r.getSeq[String](2)
      assert(r.getLong(3) === toks.length.toLong)
      // concatenating tokens and splitting on the markers restores the text
      val rebuilt = toks.mkString.split(java.util.regex.Pattern.quote(Bpe.Eow))
      assert(toks.mkString ===
        text.split(" ").filter(_.nonEmpty).map(_ + Bpe.Eow).mkString,
        s"doc '$text' did not round-trip")
      assert(rebuilt.toSeq === text.split(" ").filter(_.nonEmpty).toSeq)
    }
  }

  test("merge table round-trips through parquet; a hole fails loudly") {
    val merges = Bpe.train(Bpe.wordCounts(corpusDf, col("text")), 8)
    val dir = java.nio.file.Files.createTempDirectory("bpe_merges").toString
    Bpe.saveMerges(spark, merges, s"$dir/m.parquet")
    assert(Bpe.loadMerges(spark, s"$dir/m.parquet") === merges)
    // encode with the reloaded table = encode with the in-memory one
    val enc1 = Bpe.encode(corpusDf, "text", merges)
      .select("doc_id", "n_bpe_tokens").collect().toSeq
    val enc2 = Bpe.encode(corpusDf, "text",
        Bpe.loadMerges(spark, s"$dir/m.parquet"))
      .select("doc_id", "n_bpe_tokens").collect().toSeq
    assert(enc1.map(_.toString) === enc2.map(_.toString))
    // drop rank 3: loading must refuse, not silently re-tokenize
    import org.apache.spark.sql.functions.{col => c}
    spark.read.parquet(s"$dir/m.parquet").where(c("rank") =!= 3)
      .write.mode("overwrite").parquet(s"$dir/holey.parquet")
    val e = intercept[IllegalArgumentException] {
      Bpe.loadMerges(spark, s"$dir/holey.parquet")
    }
    assert(e.getMessage.contains("contiguous"))
    // an empty table refuses too (a half-written save must not load
    // as a valid zero-merge vocabulary)
    spark.read.parquet(s"$dir/m.parquet").where(c("rank") < 0)
      .write.mode("overwrite").parquet(s"$dir/empty.parquet")
    val e2 = intercept[IllegalArgumentException] {
      Bpe.loadMerges(spark, s"$dir/empty.parquet")
    }
    assert(e2.getMessage.contains("empty"))
  }

  test("train is invariant to the input partitioning") {
    val words = Bpe.wordCounts(corpusDf, col("text"))
    val a = Bpe.train(words.repartition(7), 6)
    val b = Bpe.train(words.coalesce(1), 6)
    assert(a === b)
  }

  // ---- incremental/batched trainer vs the sequential reference --------

  /** Tiny alphabets force exactly the adversarial shapes the
    * speculative batch must survive: freshly created pairs overtaking
    * the speculation (replay truncation + un-merge on the next pass),
    * heavy count ties resolved by the lexicographic tie-break, and
    * fused-string aliasing (("a","ab") and ("aa","b") both produce
    * "aab").
    */
  test("incremental batched train ≡ one-merge-per-job sequential train") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (1 to 4).foreach { trial =>
      val alpha = if (trial % 2 == 0) "ab" else "abc"
      val words = (1 to 45).map { _ =>
        val n = rnd.nextInt(7) + 1
        (0 until n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      }
      val docs = words.grouped(9).zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
        .toDF("doc_id", "text")
      val wc = Bpe.wordCounts(docs, col("text"))
      val seqRef = Bpe.trainSequential(wc, 16)
      Seq(1, 3, 32).foreach { mb =>
        val got = Bpe.train(wc, 16, maxBatch = mb)
        assert(got === seqRef,
          s"trial $trial maxBatch=$mb diverged from sequential greedy")
      }
    }
  }

  test("deep merge budget: long un-merge chains stay exactly greedy") {
    // a two-letter alphabet at 40 merges forces MANY passes whose
    // speculation is repeatedly truncated (freshly fused pairs keep
    // overtaking), i.e. repeated un-merge → re-speculate cycles — the
    // adversarial regime for the replay machinery
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    val words = (1 to 60).map { _ =>
      val n = rnd.nextInt(9) + 1
      (0 until n).map(_ => "ab" (rnd.nextInt(2))).mkString
    }
    val docs = words.grouped(10).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    val wc = Bpe.wordCounts(docs, col("text"))
    assert(Bpe.train(wc, 40, maxBatch = 16) === Bpe.trainSequential(wc, 40))
  }

  test("batched train matches the textbook reference on the word corpus") {
    val got = Bpe.train(Bpe.wordCounts(corpusDf, col("text")), 12, maxBatch = 32)
      .map(m => (m.left, m.right, m.cnt))
    assert(got === refTrain(refFreq, 12))
  }

  test("the driver pair bound defaults to a heap measurement, with the " +
    "knob kept as an override") {
    // the auto bound scales with the driver's max heap: 20% of heap at
    // ~300 B per distinct pair (see autoDriverPairBound's accounting)
    assert(Bpe.autoDriverPairBound(8L << 30) === (8L << 30) / 5 / 300)
    assert(Bpe.autoDriverPairBound(128L << 30) === (128L << 30) / 5 / 300)
    assert(Bpe.autoDriverPairBound(16L << 30) ===
      2 * Bpe.autoDriverPairBound(8L << 30))
    // floored: a small test JVM must not push byte-alphabet corpora
    // (alphabet² ≈ 65k initial pairs) onto the distributed path — but
    // the 300 MB floor caps at HALF the heap (a floor above the heap
    // would be an OOM mandate): 64 MB heap ⇒ 32 MB budget ⇒ ~112k
    // pairs, still holding the 65k byte-alphabet table comfortably
    assert(Bpe.autoDriverPairBound(64L << 20) === (64L << 20) / 2 / 300)
    assert(Bpe.autoDriverPairBound(64L << 20) > 65536L)
    // this JVM's auto bound comfortably holds the test corpus, so the
    // DEFAULT (0 = auto) takes the driver path and matches greedy —
    // the measured choice, with no knob supplied
    val wc = Bpe.wordCounts(corpusDf, col("text"))
    assert(Bpe.train(wc, 8) === Bpe.trainSequential(wc, 8))
  }

  test("bytes/pair is MEASURED from the table keys, not assumed") {
    // single-code-point pairs (the pass-0 shape) measure ≈ the old
    // 300-byte constant — the assumption was right exactly there
    val bppShort = Bpe.measuredBytesPerPair(Iterator.fill(100)(("a", "b")))
    assert(bppShort >= 250 && bppShort <= 350, s"short-symbol bpp $bppShort")
    // long merged symbols measure what they actually cost
    val bppLong = Bpe.measuredBytesPerPair(
      Iterator.fill(100)(("x" * 128, "y" * 128)))
    assert(bppLong > 2 * bppShort, s"long-symbol bpp $bppLong vs $bppShort")
    // the bound scales INVERSELY with measured bytes/pair…
    assert(Bpe.autoDriverPairBound(8L << 30, bppLong) <
      Bpe.autoDriverPairBound(8L << 30, bppShort))
    // …including the small-heap floor (a BYTE budget — min(300 MB,
    // heap/2) — so a long-symbol table can never ride the old 1M-pair
    // floor past the heap)
    assert(Bpe.autoDriverPairBound(64L << 20, 3000) === (64L << 20) / 2 / 3000)
    // default bpp keeps the r13-pinned semantics bit-identical
    assert(Bpe.autoDriverPairBound(8L << 30) === (8L << 30) / 5 / 300)
    assert(Bpe.measuredBytesPerPair(Iterator.empty) === 300L)
  }

  test("mid-train migration: a live table that outgrows the driver " +
    "bound flips to the distributed core and still equals sequential greedy") {
    import spark.implicits._
    // alphabet {a,b}: SIX distinct initial pairs (aa ab ba bb a< b<) —
    // under the override bound of 8 so training starts on the driver —
    // but the first merges fuse fresh symbols whose neighbor pairs push
    // the live table past 8, tripping the per-pass watchdog
    val tiny = Seq((0L, "abab aabb abba baba bbaa baab abbb aaab ab ba"))
      .toDF("doc_id", "text")
    val wc = Bpe.wordCounts(tiny, col("text"))
    var migrated = 0
    val got = Bpe.train(wc, 10, maxBatch = 2, driverPairBound = 8,
      onMigrate = () => migrated += 1)
    assert(migrated === 1, "the measured watchdog never migrated")
    assert(got === Bpe.trainSequential(wc, 10),
      "migrated training diverged from sequential greedy")
  }

  test("an adversarial long-symbol corpus flips to trainDistributed at " +
    "the MEASURED (not assumed) threshold") {
    import spark.implicits._
    // heap seam: budget = max(min(300 MB, heap/2), heap/5) = heap/2 =
    // 6000 B at this tiny test heap. Corpus L's merges fuse
    // geometrically longer symbols (words are a repeated two-letter
    // pattern), so its live bytes/pair GROWS while the pair COUNT
    // stays comparable to corpus S's (short distinct words, symbols
    // capped at word length). Under the ASSUMED 300 B/pair both
    // corpora would read alike; the MEASURED estimate pushes only L
    // over the budget. Measured trajectories (warn-line
    // probed): L's table peaks around pass 10 at ~10 pairs whose
    // symbols doubled toward 256 chars — ~711 B/pair, ≈7100 B, over
    // the budget; S's table peaks at 16 single-code-point pairs ≈
    // 4700 B (~300 B/pair) and shrinks as words fuse. Under the old
    // ASSUMED 300 B/pair, L would read ~3000 B and never flip — the
    // flip below is attributable to the MEASURED symbol length alone,
    // since S carries MORE pairs than L and stays.
    val heap = 12000L
    val longWords = (121 to 128).map(k => "xy" * k).mkString(" ")
    val corpusL = Seq((0L, longWords)).toDF("doc_id", "text")
    val shortWords = "cd ef gh ij kl mn op qr"
    val corpusS = Seq((0L, shortWords)).toDF("doc_id", "text")
    var migL = 0
    var migS = 0
    val gotL = Bpe.train(Bpe.wordCounts(corpusL, col("text")), 24,
      maxBatch = 2, maxHeapForTest = heap, onMigrate = () => migL += 1)
    val gotS = Bpe.train(Bpe.wordCounts(corpusS, col("text")), 24,
      maxBatch = 2, maxHeapForTest = heap, onMigrate = () => migS += 1)
    assert(migL === 1,
      "long-symbol corpus never crossed the measured threshold")
    assert(migS === 0,
      "short-symbol corpus of comparable pair count crossed it too — " +
        "the threshold is reading count, not measured bytes")
    // and the flip is SAFE on both sides of it
    assert(gotL === Bpe.trainSequential(
      Bpe.wordCounts(corpusL, col("text")), 24))
    assert(gotS === Bpe.trainSequential(
      Bpe.wordCounts(corpusS, col("text")), 24))
  }

  test("a corpus whose pair table exceeds the driver bound falls back " +
    "to the distributed-pair-table incremental trainer: exact greedy, " +
    "jobs proportional to passes not merges") {
    val wc = Bpe.wordCounts(corpusDf, col("text"))
    // count THIS thread's Spark jobs via the job-group id (suites run
    // in parallel against the shared session — a raw job count would
    // absorb other suites' work)
    val group = "bpe-fallback-" + java.util.UUID.randomUUID()
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (js.properties != null &&
            group == js.properties.getProperty("spark.jobGroup.id"))
          jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    var passes = 0
    val got =
      try {
        spark.sparkContext.setJobGroup(group, "bpe fallback probe")
        // far more than 3 distinct adjacent pairs here, so a bound of 3
        // trips the fallback — which must produce the exact greedy
        // sequence via the DISTRIBUTED incremental trainer, not refuse
        try Bpe.train(wc, 12, driverPairBound = 3,
          passHook = (_, _, _, _) => passes += 1)
        finally spark.sparkContext.clearJobGroup()
      } finally {
        // listener events post asynchronously (no public drain): give
        // the bus a beat. A lagging bus can only UNDERCOUNT, which the
        // upper-bound assertion below tolerates by construction.
        Thread.sleep(1000)
        spark.sparkContext.removeSparkListener(listener)
      }
    assert(got === Bpe.trainSequential(wc, 12))
    assert(got.length === 12)
    // the whole point of the incremental fallback: speculation commits
    // several merges per pass, and per-pass job count is a constant
    // (takeOrdered + block pass + init/cleanup) — NOT one recount job
    // per merge like the old sequential fallback
    assert(passes < 12, s"batching ineffective: $passes passes for 12 merges")
    assert(jobs.get <= 3 * passes + 14,
      s"jobs (${jobs.get}) not proportional to passes ($passes)")
  }

  test("trainDistributed ≡ sequential greedy on adversarial corpora, " +
    "including candidate views far smaller than the pair table") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    (1 to 3).foreach { trial =>
      val alpha = if (trial % 2 == 0) "ab" else "abc"
      val words = (1 to 45).map { _ =>
        val n = rnd.nextInt(7) + 1
        (0 until n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      }
      val docs = words.grouped(9).zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
        .toDF("doc_id", "text")
      val wc = Bpe.wordCounts(docs, col("text"))
      val seqRef = Bpe.trainSequential(wc, 16)
      // candK=3 keeps the driver view a tiny window onto the table —
      // the threshold guard and taint path must reject (not mis-commit)
      // every position it cannot prove, then re-sync via takeOrdered;
      // candK=512 holds the whole table (exact replay). Both must
      // reproduce one-merge-at-a-time greedy bit-exactly.
      // candK=1 is the degenerate view: only the exact global argmax is
      // visible, so every pass can commit exactly one merge (maximum
      // pass count — the replay must never guess past position 0)
      Seq((1, 8), (3, 4), (512, 32)).foreach { case (candK, mb) =>
        val got = Bpe.trainDistributed(wc, 16, maxBatch = mb, candK = candK)
        assert(got === seqRef,
          s"trial $trial candK=$candK maxBatch=$mb diverged from greedy")
      }
    }
  }

  test("trainDistributed survives losing the executor-resident blocks " +
    "mid-run (rebuild protocol) and still equals sequential greedy") {
    val wc = Bpe.wordCounts(corpusDf, col("text"))
    val expected = Bpe.trainSequential(wc, 12)
    // same executor-restart simulation as train's wipe test, but with
    // the pair table DISTRIBUTED: the rebuild replays base symbols +
    // the committed prefix while the table-side delta accounting must
    // stay consistent with the reconstructed blocks
    val got = Bpe.trainDistributed(wc, 12, maxBatch = 3,
      passHook = (pass, _, _, _) =>
        if (pass == 1 || pass == 3) Bpe.TrainStore.blocks.clear())
    assert(got === expected)
  }

  test("a finished training's stranded TrainStore entries are evicted " +
    "by the next training's block build; live foreign entries survive") {
    val blk = Bpe.Block(Vector(Array("a", Bpe.Eow)), Array(1L),
      Map.empty, Map.empty)
    val deadId = "dead-" + java.util.UUID.randomUUID()
    val liveId = "live-" + java.util.UUID.randomUUID()
    // the abort path: the trainer's finally marked the id finished but
    // the best-effort cleanup job never landed on this "executor" —
    // its entry is FRESH (touch time is not the liveness signal here)
    Bpe.TrainStore.blocks.put((deadId, 0), Bpe.TrainStore.Entry(
      -1, blk, Array.empty, System.currentTimeMillis()))
    Bpe.TrainStore.markFinished(deadId)
    // a concurrent LIVE (unfinished) training's entry must survive
    Bpe.TrainStore.blocks.put((liveId, 0), Bpe.TrainStore.Entry(
      -1, blk, Array.empty, System.currentTimeMillis()))
    try {
      Bpe.train(Bpe.wordCounts(corpusDf, col("text")), 4)
      assert(!Bpe.TrainStore.blocks.containsKey((deadId, 0)),
        "stranded entry of a finished training survived the eviction sweep")
      assert(Bpe.TrainStore.blocks.containsKey((liveId, 0)),
        "entry of a live unfinished training was wrongly evicted")
    } finally {
      Bpe.TrainStore.blocks.remove((deadId, 0))
      Bpe.TrainStore.blocks.remove((liveId, 0))
    }
  }

  test("TrainStore TTL backstop evicts only past the age bound " +
    "(crashed-driver path, no finished mark)") {
    val blk = Bpe.Block(Vector(Array("a", Bpe.Eow)), Array(1L),
      Map.empty, Map.empty)
    val oldId = "crashed-" + java.util.UUID.randomUUID()
    val freshId = "fresh-" + java.util.UUID.randomUUID()
    Bpe.TrainStore.blocks.put((oldId, 0), Bpe.TrainStore.Entry(
      -1, blk, Array.empty, System.currentTimeMillis() - 7L * 3600 * 1000))
    Bpe.TrainStore.blocks.put((freshId, 0), Bpe.TrainStore.Entry(
      -1, blk, Array.empty, System.currentTimeMillis()))
    try {
      // 6 h TTL, neither id marked finished: only the 7-h-old entry
      // goes; a fresh-but-unfinished one must NOT be treated as dead
      // (a live 100TB training's pass can take tens of minutes)
      val (n, slots) = Bpe.TrainStore.evictStale(
        "someone-else", Set.empty, 6L * 3600 * 1000)
      assert(n >= 1 && slots >= 1)
      assert(!Bpe.TrainStore.blocks.containsKey((oldId, 0)))
      assert(Bpe.TrainStore.blocks.containsKey((freshId, 0)))
    } finally {
      Bpe.TrainStore.blocks.remove((oldId, 0))
      Bpe.TrainStore.blocks.remove((freshId, 0))
    }
  }

  test("train survives losing the executor-resident blocks mid-run " +
    "(rebuild protocol) and still equals sequential greedy") {
    val wc = Bpe.wordCounts(corpusDf, col("text"))
    val expected = Bpe.trainSequential(wc, 12)
    // simulate an executor restart: after passes 1 and 3, wipe EVERY
    // block from the store — the next pass must detect the missing
    // partitions, request a rebuild, and reconstruct deterministically
    // from the base symbols + the committed merge prefix
    val got = Bpe.train(wc, 12, maxBatch = 3,
      passHook = (pass, _, _, _) =>
        if (pass == 1 || pass == 3) Bpe.TrainStore.blocks.clear())
    assert(got === expected)
    // NOTE: no global-emptiness assert — suites run in parallel and
    // another suite's training may legitimately hold store entries;
    // per-train cleanup is covered by the clear-by-trainId calls in
    // train() (and a wiped concurrent train just rebuilds, by design)
  }

  // ---- code-point segmentation (supplementary-plane text) -------------

  test("supplementary-plane text segments by code point on every path") {
    import spark.implicits._
    val df = Seq((0L, "𝕏a 𝕏a b𝄞 𝕏a b𝄞"))
      .toDF("doc_id", "text")
    val wc = Bpe.wordCounts(df, col("text"))
    // the declarative (SQL-substr, code-point) pair algebra and the
    // trainer's first argmax agree — the two halves of the same algebra
    val decl = Bpe.initialPairCounts(wc).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val best = decl.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
    val m1 = Bpe.train(wc, 1).head
    assert((m1.left, m1.right, m1.cnt) === (best._1._1, best._1._2, best._2))
    // no path ever emits a lone-surrogate token
    val merges = Bpe.train(wc, 8)
    assert(merges === Bpe.trainSequential(wc, 8))
    Seq("𝕏a", "b𝄞").foreach { w =>
      val toks = Bpe.encodeWord(w, merges)
      assert(toks.mkString === w + Bpe.Eow, s"lossy encode of '$w'")
      toks.foreach { t =>
        val cps = t.replace(Bpe.Eow, "").codePoints().toArray
        assert(cps.forall(cp => cp < 0xD800 || cp > 0xDFFF),
          s"token '$t' carries a lone surrogate")
      }
    }
    assert(Bpe.symbolsOf("𝕏a") ===
      Array("𝕏", "a"))
  }
}
