package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding tokenizer training — the vocabulary
  * step of a training-data pipeline, expressed so the CORPUS is
  * scanned exactly once and every merge iteration runs over the
  * distinct-WORD table instead.
  *
  * The standard scalable decomposition (Sennrich et al. 2016 operate
  * on word frequencies, not the raw stream): one `groupBy(word)` pass
  * compresses the corpus to `(word, count)` — at web scale a table
  * orders of magnitude smaller than the text, at 100 TB still far too
  * large to collect, so it stays distributed.
  *
  * Training then runs INCREMENTALLY (see [[train]]): the adjacent-pair
  * frequency table lives on the driver (its size is
  * #distinct-adjacent-pairs — alphabet²-bounded at start, growing by a
  * handful of neighbor pairs per learned merge, orders of magnitude
  * below the word table), and each distributed pass rewrites only the
  * words a merge touches while emitting the exact pair-count DELTAS
  * that rewrite caused. A speculative batch of symbol-disjoint top
  * pairs rides each pass, validated merge-by-merge on the driver
  * against the true sequential argmax, so one corpus pass typically
  * commits many merges yet the learned sequence is bit-identical to
  * one-merge-at-a-time greedy training ([[trainSequential]], kept as
  * the differential reference). Total shuffle volume across an entire
  * training run is proportional to the symbols actually fused, not
  * merges × corpus.
  *
  * Encoding with a learned merge list is row-local: merges broadcast
  * in the task closure, applied per word with a PER-PARTITION memo
  * (real corpora repeat words massively — the memo turns per-token
  * cost into per-distinct-word cost inside each task).
  *
  * Symbols are Unicode CODE POINTS (surrogate pairs stay whole), the
  * same segmentation the declarative [[initialPairCounts]] oracle path
  * gets from SQL `substr`, so the two halves of the algebra agree on
  * supplementary-plane text.
  *
  * Reference scope: the reference engine has no tokenizer-training
  * operator; this is part of the training-data extension set the
  * builder brief asks for (token counting "BPE-ish", vocabulary
  * construction at corpus scale).
  */
object Bpe {

  /** End-of-word marker appended to every word's symbol sequence —
    * merges can therefore learn word-final units ("ing</w>") and
    * encoded tokens re-segment unambiguously.
    */
  val Eow = "</w>"

  /** One learned merge: at `rank`, the adjacent pair (`left`,`right`)
    * had the highest corpus frequency `cnt` and fuses to `left+right`.
    */
  final case class Merge(rank: Int, left: String, right: String, cnt: Long) {
    def merged: String = left + right
  }

  /** The single corpus scan: whitespace words → `(w, cnt)`. */
  def wordCounts(docs: DataFrame, text: Column): DataFrame =
    docs.select(explode(split(text, " ")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))

  /** Iteration-0 adjacent-pair counts (chars + [[Eow]]) as a fully
    * declarative plan — no typed map, codegen end-to-end — so the
    * pair-counting algebra has a direct SQL oracle. `(left, right)`
    * where `right` is the next char or [[Eow]] at word end, weighted
    * by word count.
    */
  def initialPairCounts(words: DataFrame): DataFrame = {
    val L = length(col("w"))
    val prs = transform(sequence(lit(1), L), i =>
      struct(col("w").substr(i, lit(1)).as("left"),
        when(i === L, lit(Eow))
          .otherwise(col("w").substr(i + lit(1), lit(1))).as("right")))
    words.select(explode(prs).as("p"), col("cnt"))
      .select(col("p.left").as("left"), col("p.right").as("right"), col("cnt"))
      .groupBy("left", "right").agg(sum("cnt").as("cnt"))
  }

  /** One word as an array of code-point symbols (a surrogate pair is
    * ONE symbol — matching SQL `substr` segmentation in the oracled
    * [[initialPairCounts]], and never emitting lone-surrogate tokens).
    */
  private[text] def symbolsOf(w: String): Array[String] = {
    val out = new Array[String](w.codePointCount(0, w.length))
    var i = 0
    var k = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out(k) = new String(Character.toChars(cp))
      i += Character.charCount(cp)
      k += 1
    }
    out
  }

  /** Per-partition word store for incremental training: the symbol
    * sequences, their (immutable) counts, and an INVERTED pair→slot
    * index so a merge pass touches only the words that actually
    * contain a batch pair — cost proportional to fuse sites, not
    * vocabulary. The index is stale-INCLUSIVE and monotone (postings
    * are added when a rewrite creates a pair, never removed; a posting
    * whose word no longer holds the pair just fails the cheap
    * containsAdj re-check), which keeps maintenance O(new pairs) with
    * no global bookkeeping. `words` is a Vector and `index` an
    * immutable Map so a pass's new block STRUCTURALLY SHARES the
    * untouched slots/postings of the old one — blocks across passes
    * cost O(changes), not O(block), in both time and cache memory.
    * `applied` records which slots each batch position fused last
    * pass, so a rejected speculation un-merges by direct slot lookup.
    */
  private[text] final case class Block(
      words: Vector[Array[String]],
      counts: Array[Long],
      index: Map[(String, String), List[Int]],
      applied: Map[Int, List[Int]])

  /** Executor-RESIDENT block store: blocks live in the executor JVM
    * between passes, keyed by (trainId, partition), instead of riding
    * the RDD cache. Measured motivation: re-persisting a block RDD
    * costs a SizeEstimator walk + cache write of the whole (largely
    * shared) object graph — ~4 s per persist on a 27k-word table, 10×
    * the genuine pass work — and NOT persisting grows task lineage
    * until closure serialization overflows the stack. With the store,
    * every pass is one flat job over the stable base symbol RDD (depth-
    * 2 lineage forever), and per-pass cost is exactly the fuse-site
    * work plus scheduling.
    *
    * Failure contract (the RDD cache's recompute guarantee, re-built
    * by hand): entries are tagged with the pass number that produced
    * them, the pass result (the delta array) is stored beside the
    * block, and a pass task is IDEMPOTENT — a retry that finds its own
    * pass already applied returns the saved deltas instead of
    * re-fusing (which would see no sites and emit wrong zeros). A
    * task that finds its partition MISSING (executor restart) emits a
    * rebuild-request sentinel; the driver re-runs the same pass
    * carrying the committed merge list, and the task reconstructs the
    * block deterministically from the base symbols (base + committed
    * prefix ≡ current state: rejected speculations were never
    * committed, so a rebuilt block is exactly the un-merged state, and
    * its freshly rebuilt index satisfies the postings invariant).
    * Blocks mutate only by atomic whole-value replacement of immutable
    * structures, so an interrupted task can never expose a half-
    * stepped block. Entries are cleared by trainId when training ends
    * (driver-side for local mode, best-effort foreachPartition for a
    * cluster).
    */
  private[text] object TrainStore {
    /** One stored block: the pass that produced it, its saved pass
      * result (for idempotent retries), and a touch timestamp — the
      * eviction backstop's aging signal. Every pass's put refreshes
      * `touched`, so a LIVE training's entries never age out; entries
      * stranded by an aborted training (executor kept alive, cleanup
      * job never landed) stop refreshing and become evictable.
      */
    final case class Entry(pass: Int, block: Block,
        deltas: Array[((Int, String, String), Long)], touched: Long)
    val blocks =
      new java.util.concurrent.ConcurrentHashMap[(String, Int), Entry]()
    def put(trainId: String, pid: Int, pass: Int, block: Block,
            deltas: Array[((Int, String, String), Long)]): Unit =
      blocks.put((trainId, pid),
        Entry(pass, block, deltas, System.currentTimeMillis()))
    def clear(trainId: String): Unit = {
      val it = blocks.keySet.iterator
      while (it.hasNext) if (it.next()._1 == trainId) it.remove()
    }
    private[text] def size(trainId: String): Int = {
      var n = 0
      val it = blocks.keySet.iterator
      while (it.hasNext) if (it.next()._1 == trainId) n += 1
      n
    }
    /** Approximate resident bytes of one stored entry — a flat
      * walk-and-charge estimate (strings counted per occurrence,
      * structural sharing across passes not discounted), so it reads
      * as an upper bound. The store lives OUTSIDE Spark's memory
      * manager; this figure is what makes that unaccounted executor
      * heap OBSERVABLE (logged per pass by runStorePass, summed
      * across partitions). Walk cost is O(block) but purely local
      * arithmetic — microseconds against a pass's fuse work.
      */
    private[text] def approxBytesOf(key: (String, Int)): Long = {
      val e = blocks.get(key)
      if (e == null) return 0L
      val b = e.block
      var bytes = 64L + 8L * b.counts.length
      b.words.foreach { w =>
        bytes += 24L + 8L * w.length
        var i = 0
        while (i < w.length) { bytes += 40L + 2L * w(i).length; i += 1 }
      }
      b.index.foreach { case (p, posts) =>
        bytes += 48L + 2L * (p._1.length + p._2.length) + 40L * posts.size
      }
      b.applied.valuesIterator.foreach(l => bytes += 48L + 40L * l.size)
      bytes + 64L * e.deltas.length
    }
    /** Driver-side record of the latest per-pass footprint report:
      * (trainId, pass, bytes summed over partitions). Written by
      * runStorePass after each pass; read by BpeProbe / specs.
      * LAST-WRITER-WINS across trainings: with two concurrent
      * trainings in one JVM this slot interleaves — any consumer that
      * must attribute bytes to a SPECIFIC training reads the keyed
      * [[reports]] map instead.
      */
    @volatile private[text] var lastReport: Option[(String, Int, Long)] = None
    /** Per-trainId latest (pass, bytes) — the concurrent-safe form of
      * [[lastReport]]. Bounded like `finished` (trainIds are random
      * UUIDs; a long-lived JVM training thousands of vocabularies must
      * not grow this map without bound — eldest entries drop, which is
      * fine because a report is only meaningful while its training is
      * observed).
      */
    private val ReportsCap = 64
    private[text] val reports: java.util.Map[String, (Int, Long)] =
      java.util.Collections.synchronizedMap(
        // accessOrder=true: a long-running ACTIVE training re-puts its
        // report every pass and must refresh its recency — with
        // insertion order its slot would be the ELDEST after 64 newer
        // (even already-finished) trainings and get evicted mid-run
        new java.util.LinkedHashMap[String, (Int, Long)](16, 0.75f, true) {
          override def removeEldestEntry(
              e: java.util.Map.Entry[String, (Int, Long)]): Boolean =
            this.size() > ReportsCap
        })
    /** trainIds whose training ENDED (normally or by exception) —
      * recorded driver-side in every trainer's finally, snapshotted
      * into each new training's block-build closure, so executors the
      * best-effort cleanup job never landed on still evict those
      * entries promptly and deterministically (no cadence guessing).
      * Size-bounded: ids are random UUIDs, so after `FinishedCap`
      * entries the oldest are dropped — their blocks then age out via
      * the TTL backstop instead.
      */
    private val FinishedCap = 4096
    val finished: java.util.Map[String, java.lang.Boolean] =
      java.util.Collections.synchronizedMap(
        new java.util.LinkedHashMap[String, java.lang.Boolean](64, 0.75f, false) {
          override def removeEldestEntry(
              e: java.util.Map.Entry[String, java.lang.Boolean]): Boolean =
            this.size() > FinishedCap
        })
    def markFinished(trainId: String): Unit = finished.put(trainId, true)
    def finishedSnapshot(): Set[String] = finished.synchronized {
      import scala.jdk.CollectionConverters._
      finished.keySet.asScala.toSet
    }
    /** Backstop for the best-effort end-of-training clear: blocks live
      * OUTSIDE Spark's memory manager, so an aborted training on a
      * long-lived executor would otherwise hold its word tables until
      * JVM exit. Each new training's block-build job evicts entries
      * whose trainId the driver has marked FINISHED (prompt path — the
      * snapshot travels in the job closure), plus entries of other
      * trainIds untouched for `ttlMs` (backstop for a crashed driver;
      * deliberately hours, NOT pass-cadence-scale: `touched` refreshes
      * only once per pass, and a live 100 TB training's pass can
      * legitimately take tens of minutes — a wrongly evicted block
      * forces a full committed-prefix rebuild on that partition).
      * Removal is CONDITIONAL on the observed entry, so a concurrent
      * put (refreshing a live block between the staleness read and the
      * remove) is never clobbered. Returns (entries evicted, word
      * slots freed) for the log line.
      */
    def evictStale(current: String, finishedIds: Set[String],
                   ttlMs: Long): (Int, Long) = {
      val now = System.currentTimeMillis()
      var n = 0
      var slots = 0L
      val it = blocks.entrySet.iterator
      while (it.hasNext) {
        val e = it.next()
        val tid = e.getKey._1
        if (tid != current &&
            (finishedIds(tid) || now - e.getValue.touched > ttlMs) &&
            blocks.remove(e.getKey, e.getValue)) {
          slots += e.getValue.block.counts.length
          n += 1
        }
      }
      (n, slots)
    }
  }

  /** TrainStore TTL backstop (driver-side property, captured in the
    * block-build closure so it reaches executor JVMs): entries of
    * other trainIds untouched this long are evicted when a new
    * training builds its blocks — the safety net for trainings whose
    * driver crashed before marking them finished. Hours by design;
    * prompt cleanup is the finished-id path.
    */
  private def storeTtlMs: Long =
    java.lang.Long.getLong("graft.bpe.trainstore.ttl.ms", 6L * 3600 * 1000)

  /** Build a partition's block from its base symbol sequences: the
    * word/count columns plus the full inverted pair→slot index.
    */
  private def buildBlock(it: Iterator[(Array[String], Long)]): Block = {
    val ws = Vector.newBuilder[Array[String]]
    val cs = scala.collection.mutable.ArrayBuffer.empty[Long]
    val idx = scala.collection.mutable.HashMap
      .empty[(String, String), List[Int]]
    var slot = 0
    val seen = scala.collection.mutable.HashSet.empty[(String, String)]
    it.foreach { case (s, c) =>
      ws += s
      cs += c
      seen.clear()
      var i = 0
      while (i < s.length - 1) {
        val p = (s(i), s(i + 1))
        if (seen.add(p)) idx(p) = slot :: idx.getOrElse(p, Nil)
        i += 1
      }
      slot += 1
    }
    Block(ws.result(), cs.toArray, idx.toMap, Map.empty)
  }

  /** One training pass over one block: un-merge last pass's rejected
    * speculation, apply the batch at the slots the inverted index
    * lists, and return the new block plus the pair-count deltas tagged
    * by batch position (with the fuse-site count under the `-1`
    * sentinel). Pure: never mutates `b0` or anything reachable from it.
    */
  private def stepBlock(b0: Block, batchSeq: Seq[(String, String)],
                        unmergeMap: Map[String, (String, String)],
                        unmergeIdx: Set[Int])
      : (Block, Array[((Int, String, String), Long)]) = {
    val delta = scala.collection.mutable.HashMap.empty[(Int, String, String), Long]
    def pairsInto(s: Array[String], idx: Int, sign: Long, c: Long): Unit = {
      var i = 0
      while (i < s.length - 1) {
        val k = (idx, s(i), s(i + 1))
        val n = delta.getOrElse(k, 0L) + sign * c
        if (n == 0L) delta.remove(k) else delta(k) = n
        i += 1
      }
    }
    def containsAdj(s: Array[String], l: String, r: String): Boolean = {
      var i = 0
      while (i < s.length - 1) {
        if (s(i) == l && s(i + 1) == r) return true
        i += 1
      }
      false
    }
    // 1) un-merge the previous pass's rejected speculation at exactly
    // the slots it fused (fused strings are fresh ⇒ every occurrence
    // came from that fuse; the driver table was never advanced past
    // the accepted prefix, so no deltas are owed, and the restored
    // word's pairs all predate the fuse ⇒ their index postings still
    // stand)
    var words = b0.words
    unmergeIdx.foreach { j =>
      b0.applied.getOrElse(j, Nil).foreach { slot =>
        val s = words(slot)
        if (s.exists(unmergeMap.contains))
          words = words.updated(slot, s.flatMap(sym =>
            unmergeMap.get(sym) match {
              case Some((l, r)) => Array(l, r)
              case None => Array(sym)
            }))
      }
    }
    // 2) gather candidate slots per batch position from the inverted
    // index, then apply per slot in batch-rank order, attributing each
    // merge's exact whole-word pair delta to its position. Batch pairs
    // are symbol-disjoint, so an earlier batch merge can neither
    // create nor destroy a later pair's sites — index candidacy
    // computed up front stays complete. Gathering is array-indexed by
    // slot (no sorted map, no boxing): O(postings consulted) =
    // O(fuse-site candidates), not O(vocabulary).
    var index = b0.index
    var applied = Map.empty[Int, List[Int]]
    val nSlots = b0.counts.length
    val slotPositions = new Array[List[Int]](nSlots)
    val touched = new scala.collection.mutable.ArrayBuffer[Int]
    var idx = 0
    batchSeq.foreach { p =>
      index.getOrElse(p, Nil).foreach { slot =>
        val cur = slotPositions(slot)
        // within one pair's posting walk a duplicate slot shows up
        // with this idx already at head — skip it there
        if (cur == null) {
          slotPositions(slot) = idx :: Nil
          touched += slot
        } else if (cur.head != idx) slotPositions(slot) = idx :: cur
      }
      idx += 1
    }
    touched.foreach { slot =>
      var s = words(slot)
      val c = b0.counts(slot)
      var changed = false
      slotPositions(slot).reverse.foreach { j =>
        val (l, r) = batchSeq(j)
        if (containsAdj(s, l, r)) {
          pairsInto(s, j, -1L, c)
          s = mergePairArr(s, l, r)
          pairsInto(s, j, +1L, c)
          changed = true
          applied += j -> (slot :: applied.getOrElse(j, Nil))
          // index maintenance: the rewrite's NEW pairs are exactly
          // those adjacent to a fused occurrence — post this slot
          // under each (once per distinct pair)
          val fused = l + r
          val seen = scala.collection.mutable.HashSet.empty[(String, String)]
          var i = 0
          while (i < s.length - 1) {
            if (s(i) == fused || s(i + 1) == fused) {
              val np = (s(i), s(i + 1))
              if (seen.add(np))
                index = index.updated(np, slot :: index.getOrElse(np, Nil))
            }
            i += 1
          }
        }
      }
      if (changed) words = words.updated(slot, s)
    }
    // fuse-site instrumentation rides the delta channel (zero extra
    // jobs): fuse applications this pass, under a sentinel position
    // the replay never reads
    val touchedN = applied.valuesIterator.map(_.size.toLong).sum
    if (touchedN > 0) delta((-1, "", "")) = touchedN
    (Block(words, b0.counts, index, applied), delta.toArray)
  }

  /** Pass -1: build every partition's block into the executor store
    * (one job). Doubles as the store's eviction point: before storing,
    * each task sweeps entries of OTHER trainIds untouched past the TTL
    * — the backstop that bounds leakage from an aborted training whose
    * best-effort cleanup job never landed on this executor.
    */
  /** One full adjacent-pair count over a segmented symbol table — the
    * shared pass-0 algebra of the driver-table ([[train]]) and
    * distributed-table ([[trainDistributed]]) trainers. ONE definition
    * on purpose: BpeSpec's differentials assume the trainers share this
    * algebra, and a fix applied to a private copy would silently
    * diverge them. The result is hash-partitioned on the pair key so
    * the distributed trainer's per-pass delta cogroups stay narrow.
    */
  private def adjacentPairCounts(
      baseSyms: org.apache.spark.rdd.RDD[(Array[String], Long)],
      parts: Int): org.apache.spark.rdd.RDD[((String, String), Long)] =
    baseSyms.mapPartitions { it =>
      val local = scala.collection.mutable.HashMap.empty[(String, String), Long]
      it.foreach { case (s, c) =>
        var i = 0
        while (i < s.length - 1) {
          val p = (s(i), s(i + 1))
          local(p) = local.getOrElse(p, 0L) + c
          i += 1
        }
      }
      local.iterator
    }.reduceByKey(new org.apache.spark.HashPartitioner(parts), _ + _)

  private def buildBlocks(
      baseSyms: org.apache.spark.rdd.RDD[(Array[String], Long)],
      trainId: String): Unit = {
    val tid = trainId
    val ttl = storeTtlMs
    // snapshot, not live reference: the driver's finished set must be
    // SERIALIZED into the closure to reach executor JVMs on a cluster
    val finishedIds = TrainStore.finishedSnapshot()
    baseSyms.mapPartitionsWithIndex { (pid, it) =>
      val (evicted, slots) = TrainStore.evictStale(tid, finishedIds, ttl)
      if (evicted > 0)
        org.slf4j.LoggerFactory.getLogger("graft.text.Bpe").warn(
          s"bpe: evicted $evicted stale TrainStore block(s) ($slots word " +
            s"slots) from finished/aborted trainings")
      TrainStore.put(tid, pid, -1, buildBlock(it), Array.empty)
      Iterator.single(0)
    }.count()
  }

  /** One distributed training pass over the executor-resident blocks,
    * returning the driver-aggregated pair-count deltas tagged by batch
    * position (fuse-site count under position -1). Shared by [[train]]
    * and [[trainDistributed]] — the idempotent-retry / rebuild protocol
    * documented on [[TrainStore]] lives here: a retried task returns
    * its saved deltas, a task whose block is missing (executor restart)
    * emits a rebuild-request sentinel and the pass re-runs carrying the
    * committed merge prefix for a deterministic reconstruction.
    */
  private def runStorePass(
      baseSyms: org.apache.spark.rdd.RDD[(Array[String], Long)],
      trainId: String, pass: Int,
      batchSeq: Seq[(String, String)],
      unmergeMap: Map[String, (String, String)],
      unmergeIdx: Set[Int],
      committedSoFar: () => Seq[(String, String)])
      : Array[((Int, String, String), Long)] = {
    val passNo = pass
    val tid = trainId
    def runPass(rebuildInfo: Option[Seq[(String, String)]])
        : Array[Array[((Int, String, String), Long)]] =
      baseSyms.mapPartitionsWithIndex { (pid, it) =>
        val key = (tid, pid)
        val prev = TrainStore.blocks.get(key)
        val out =
          if (prev != null && prev.pass == passNo) prev.deltas // retried task
          else if (prev != null && prev.pass == passNo - 1) {
            val (nb, d) = stepBlock(prev.block, batchSeq, unmergeMap, unmergeIdx)
            TrainStore.put(tid, pid, passNo, nb, d)
            d
          } else rebuildInfo match {
            case Some(committed) =>
              // deterministic rebuild: base symbols + the committed
              // merge prefix ≡ the current block state (rejected
              // speculations were never committed, so the rebuilt
              // block is exactly the un-merged state — unmergeIdx
              // must not run against its empty `applied`)
              var b = buildBlock(it)
              committed.foreach { case (l, r) =>
                b = stepBlock(b, Seq((l, r)), Map.empty, Set.empty)._1
              }
              val (nb, d) = stepBlock(b, batchSeq, unmergeMap, Set.empty)
              TrainStore.put(tid, pid, passNo, nb, d)
              d
            case None =>
              // missing/stale block (executor restart): ask the
              // driver to re-run this pass with rebuild info
              Array[((Int, String, String), Long)](
                ((-2, pid.toString, ""), 0L))
          }
        // footprint sentinel (-3): this partition's approximate store
        // bytes ride back with the deltas, so the driver can log the
        // trainId's total unaccounted executor heap per pass — the
        // store lives outside Spark's memory manager and is otherwise
        // invisible to an operator
        Iterator.single(out :+ (((-3, "", ""), TrainStore.approxBytesOf(key))))
      }.collect()
    var partDeltas = runPass(None)
    if (partDeltas.exists(_.exists(_._1._1 == -2)))
      partDeltas = runPass(Some(committedSoFar()))
    val storeBytes = partDeltas.iterator.flatten
      .filter(_._1._1 == -3).map(_._2).sum
    TrainStore.lastReport = Some((tid, passNo, storeBytes))
    TrainStore.reports.put(tid, (passNo, storeBytes))
    org.slf4j.LoggerFactory.getLogger("graft.text.Bpe").info(
      f"bpe: trainId=$tid pass=$passNo TrainStore ≈ ${storeBytes / 1e6}%.1f MB " +
        s"across ${partDeltas.length} partitions")
    // merge per-partition delta maps on the driver (they are
    // fuse-site-sized; strictly smaller than the init pair collect)
    val agg = scala.collection.mutable.HashMap.empty[(Int, String, String), Long]
    partDeltas.foreach(_.foreach { case (k, v) =>
      if (k._1 >= -1) agg(k) = agg.getOrElse(k, 0L) + v
    })
    agg.toArray
  }

  /** Learn `numMerges` merges from a `(w, cnt)` word table. Stops
    * early when no adjacent pair remains (every word fused to one
    * symbol). Deterministic: argmax ties break on (left, right).
    * Exactly equal, merge for merge and count for count, to
    * [[trainSequential]] — the incremental machinery below is a pure
    * execution strategy, pinned by differential tests.
    *
    * Mechanics (one distributed job per PASS, not per merge):
    *
    *  1. One pass computes the full adjacent-pair frequency table,
    *     collected into a driver map + lazy-deletion max-heap. Its
    *     size is #distinct adjacent pairs — alphabet²-bounded before
    *     any merge and growing by at most the distinct neighbors of
    *     each merged symbol per merge — NOT corpus-sized; a corpus
    *     whose distinct-pair table outgrows the driver bound falls
    *     back to [[trainDistributed]] — the same incremental machinery
    *     with the pair table kept as a distributed RDD (jobs still
    *     ∝ passes) — with a loud log line.
    *  2. Each pass speculatively selects up to `maxBatch` top pairs
    *     that are pairwise SYMBOL-DISJOINT (and whose fused strings
    *     are fresh — see un-merge below). Disjointness makes the
    *     batch order-independent within a word and keeps every
    *     selected pair's own count unchanged by its batch-mates, so
    *     per-merge effects are well defined.
    *  3. One distributed map over the per-partition [[Block]]s
    *     rewrites ONLY the words the inverted index lists for a batch
    *     pair (a block containing no batch pair returns itself by
    *     reference — near-zero work) and emits pair-count deltas
    *     TAGGED by batch position, pre-aggregated per partition (the
    *     shuffle carries only pairs around actual fuse sites — across
    *     a whole training run that totals O(symbols fused), not
    *     O(merges × corpus); with the index the MAP cost is
    *     O(fuse sites) too, where it used to scan every distinct word
    *     every pass).
    *  4. The driver REPLAYS the batch against the exact pair table:
    *     position j commits only if it is the true argmax after
    *     deltas 1..j-1 — i.e. precisely what one-merge-at-a-time
    *     greedy would have picked (a freshly created pair can
    *     overtake the speculation; the replay catches it). Rejected
    *     tail merges are UN-MERGED (their fused strings are fresh by
    *     construction, so splitting them back is unambiguous; the
    *     block's `applied` slots say exactly where) at the start of
    *     the next pass's map — no extra job.
    *
    * Execution shape: blocks live in the EXECUTOR-RESIDENT
    * [[TrainStore]] between passes (see its failure contract), so
    * every pass is one flat two-stage-free job over the stable base
    * symbol RDD — no per-pass caching, no lineage growth, no
    * SizeEstimator walks (each measured to dominate pass cost when
    * blocks rode the RDD cache).
    */
  /** Latest per-pass TrainStore footprint report — (trainId, pass,
    * approximate bytes summed over partitions). Public so probes and
    * operators can read the store's unaccounted executor heap without
    * reaching into [[TrainStore]]; refreshed by every pass of every
    * training in this JVM.
    */
  def trainStoreLastReport: Option[(String, Int, Long)] = TrainStore.lastReport

  /** The keyed form of [[trainStoreLastReport]]: latest (pass, bytes)
    * for ONE training — immune to the last-writer-wins interleaving of
    * the global slot when several trainings share a JVM. trainIds
    * surface through the per-pass log line and [[trainStoreReportIds]].
    */
  def trainStoreReport(trainId: String): Option[(Int, Long)] =
    Option(TrainStore.reports.get(trainId))

  /** trainIds with a footprint report in this JVM (bounded, eldest
    * drop) — lets a probe that didn't capture its trainId from the log
    * diff before/after a training to find the new id.
    */
  def trainStoreReportIds: Set[String] = TrainStore.reports.synchronized {
    import scala.jdk.CollectionConverters._
    TrainStore.reports.keySet.asScala.toSet
  }

  /** Probe/test hook: drop every executor-resident block — simulates
    * an executor restart for rebuild-protocol drills (BpeProbe's
    * `distwipe` mode and the BpeSpec wipe tests). Local-mode only by
    * nature (clears THIS JVM's store).
    */
  def wipeTrainStore(): Unit = TrainStore.blocks.clear()

  /** MEASURED driver-heap bytes per distinct pair, from a bounded
    * sample of actual table keys (≤4096 — the sample cost must stay
    * trivial against a pass). Per pair: ~200 B of fixed structure
    * (HashMap node + key tuple + boxed count + the pair's live
    * max-heap entry and its share of stale lazy-deletion duplicates —
    * the constant part of the old assumed-300 breakdown, same
    * header-arithmetic style as TrainStore.approxBytesOf) plus the
    * measured string payloads (object header + UTF-16 storage,
    * 8-byte aligned). The strings are the part a constant gets wrong:
    * at pass 0 every symbol is one code point and ~300 holds almost
    * exactly (200 + 2×48 = 296), but merged symbols grow with
    * training and a long-symbol table costs whatever factor the
    * symbols grew — which is why [[train]] re-samples the LIVE keys
    * every pass instead of trusting the pass-0 figure.
    */
  private[text] def measuredBytesPerPair(
      sample: Iterator[(String, String)]): Long = {
    def strBytes(s: String): Long = 40L + ((2L * s.length + 7L) & ~7L)
    var n = 0L
    var total = 0L
    while (sample.hasNext && n < 4096) {
      val (l, r) = sample.next()
      total += 200L + strBytes(l) + strBytes(r)
      n += 1
    }
    if (n == 0L) 300L else math.max(1L, total / n)
  }

  /** The driver pair-table BYTE budget for a given max heap: 20% of
    * the heap (the rest stays free for the heap-of-pairs' lazy-
    * deletion duplicates, knownSymbols, task results, and Spark's own
    * driver state), floored at a 300 MB table so a small-but-real JVM
    * doesn't push byte-alphabet corpora (alphabet² ≈ 65k pairs ≈
    * 19 MB) onto the distributed path for nothing — but the floor is
    * itself capped at HALF the heap: a fixed floor above what the
    * heap holds would be an OOM mandate, not a budget. SHARED by
    * pass-0 admission ([[autoDriverPairBound]]) and [[train]]'s
    * per-pass watchdog, so a table admitted via the floor can never
    * read as "outgrown" without actually growing.
    */
  private[text] def driverTableByteBudget(maxHeapBytes: Long): Long =
    math.max(math.min(300L * 1000000L, maxHeapBytes / 2), maxHeapBytes / 5)

  /** Auto-derived driver pair-table bound: what THIS driver's heap can
    * actually hold, instead of a universal constant a caller must
    * out-guess — [[driverTableByteBudget]] at the MEASURED bytes/pair
    * of the table being admitted ([[measuredBytesPerPair]]; 300 ≈ the
    * single-code-point figure is only the no-sample default). The
    * bound scales DOWN with measured bytes/pair, so long-symbol
    * tables never ride the budget past the heap. Default -Xmx8g ⇒
    * ~5.7M single-code-point pairs; the old fixed 50M default would
    * have needed ~15 GB — an OOM, not a bound — on that same driver.
    */
  private[text] def autoDriverPairBound(maxHeapBytes: Long,
                                        bytesPerPair: Long = 300L): Long = {
    val bpp = math.max(1L, bytesPerPair)
    math.max(1L, driverTableByteBudget(maxHeapBytes) / bpp)
  }

  /** Mid-train handover for [[train]]'s measured-footprint fallback:
    * everything [[trainDistributedCore]] needs to CONTINUE a
    * driver-table training from a pass boundary instead of starting
    * over — the executor-resident blocks stay valid (same trainId,
    * same pass counter, so the next runStorePass steps them normally
    * and a lost partition rebuilds from `committed` exactly as
    * before), the committed merge prefix seeds the result, and the
    * exact live pair table becomes the distributed table's initial
    * state. `committed` is handed BY REFERENCE: the core keeps
    * appending to it so block rebuilds replay the full prefix.
    */
  private final case class Handover(
      trainId: String,
      rank0: Int,
      pass0: Int,
      merges0: Seq[Merge],
      committed: scala.collection.mutable.ArrayBuffer[(String, String)],
      knownSymbols0: scala.collection.mutable.HashSet[String],
      pendingUnmerge0: Seq[Merge],
      pendingUnmergePos0: Set[Int])

  /** @param driverPairBound OVERRIDE for the driver-resident pair-table
    *   bound; the default 0 means "measure": the bound derives from
    *   the running driver's max heap ([[autoDriverPairBound]]) and the
    *   MEASURED bytes/pair of a table sample
    *   ([[measuredBytesPerPair]]), and the counted distinct pairs of
    *   the first pass decide the driver-vs-distributed path against
    *   it. The live table is then re-measured EVERY pass (merged
    *   symbols grow, so the footprint can outgrow a bound the pass-0
    *   sample satisfied) and a training that crosses the budget
    *   mid-run MIGRATES to the distributed core at the pass boundary —
    *   same blocks, same committed prefix, pair table re-homed as an
    *   RDD. Pass a positive value only to force the choice (tests
    *   pass 3 to drill the fallback); the override is enforced
    *   mid-train too (it bounds the driver-resident pair COUNT).
    * @param maxHeapForTest test seam: substitute for
    *   Runtime.maxMemory in the budget derivation (0 = real heap), so
    *   specs can drive the measured migration threshold at corpus
    *   sizes a unit test can afford.
    * @param onMigrate test observability hook, called once if the
    *   mid-train migration fires.
    */
  def train(words: DataFrame, numMerges: Int, maxBatch: Int = 32,
            driverPairBound: Long = 0L,
            passHook: (Int, Int, Long, Double) => Unit = null,
            maxHeapForTest: Long = 0L,
            onMigrate: () => Unit = null): Seq[Merge] = {
    require(maxBatch >= 1, s"bpe: maxBatch must be >= 1, got $maxBatch")
    val spark = words.sparkSession
    import spark.implicits._
    val sl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // persist the word-count table BEFORE the sizing count: the count
    // and the symbol table's first materialization would otherwise
    // EACH re-run the corpus-wide word groupBy — the one genuinely
    // data-sized stage of training, paid twice at 100 TB for nothing
    val base = words.select(col("w").cast("string"), col("cnt").cast("long"))
      .as[(String, Long)]
      .persist(sl)
    val nWords = try base.count()
      catch { case e: Throwable => base.unpersist(blocking = false); throw e }
    val sc = spark.sparkContext
    val parts = math.max(1, math.min(sc.defaultParallelism,
      (nWords / 65536L).toInt + 1))
    val trainId = java.util.UUID.randomUUID().toString
    // the stable anchor every pass maps over: symbol sequences, many
    // elements per partition (cache size-tracking samples instead of
    // walking), persisted once for the whole run. Partitioned by a
    // DETERMINISTIC content key (hash of the word), NOT round-robin
    // repartition: the TrainStore rebuild protocol reconstructs a lost
    // partition from its recomputed base iterator, and a round-robin
    // assignment depends on upstream row order — not a Spark contract
    // after a shuffle-file loss (SPARK-23207 class), so a rebuilt
    // partition could otherwise hold a different word subset than the
    // live blocks of its peers, silently double-counting words. With
    // hash(word) placement a recomputed partition is content-identical
    // regardless of upstream order (words are distinct post-groupBy).
    val baseSyms: org.apache.spark.rdd.RDD[(Array[String], Long)] = base.rdd
      .partitionBy(new org.apache.spark.HashPartitioner(parts))
      .map { case (w, c) => (symbolsOf(w) :+ Eow, c) }
      .persist(sl)
    // set once the pass -1 build job has stored blocks on executors:
    // before that, the per-executor clear job below would recompute
    // the whole (possibly already-unpersisted) symbol lineage just to
    // clear nothing — a corpus-scale job on the fallback/early-error
    // exits
    var blocksBuilt = false
    // the whole training loop runs under one finally (below): the
    // executor-resident blocks and both caches are released on EVERY
    // exit — normal, fallback, or any exception (a require trip or
    // failed job must not leak the word table in the static store)
    try {

    // ---- driver pair state: exact counts + lazy-deletion max-heap ----
    type Pair = (String, String)
    val pairCounts = scala.collection.mutable.HashMap.empty[Pair, Long]
    // every symbol string alive in the corpus (or ever fused): a
    // speculative merge whose fused string collides with one of these
    // could not be un-merged unambiguously, so it never joins a batch
    // at position > 1 (position 1 commits unconditionally — argmax of
    // the exact table — and needs no un-merge)
    val knownSymbols = scala.collection.mutable.HashSet.empty[String]
    // max-heap over (cnt, left, right) with the sequential trainer's
    // exact total order: cnt DESC, then (left, right) ASC. Entries go
    // stale when counts change; validity = entry count equals the live
    // map count (lazy deletion)
    val heapOrd: Ordering[(Long, String, String)] =
      new Ordering[(Long, String, String)] {
        def compare(a: (Long, String, String), b: (Long, String, String)): Int = {
          val c = java.lang.Long.compare(a._1, b._1)
          if (c != 0) c
          else {
            val l = b._2.compareTo(a._2) // smaller lex = higher priority
            if (l != 0) l else b._3.compareTo(a._3)
          }
        }
      }
    val heap = scala.collection.mutable.PriorityQueue.empty[(Long, String, String)](heapOrd)
    def bump(p: Pair, d: Long): Unit = {
      val n = pairCounts.getOrElse(p, 0L) + d
      require(n >= 0L, s"bpe: pair count for $p went negative ($n) — delta accounting bug")
      if (n == 0L) pairCounts.remove(p)
      else { pairCounts(p) = n; heap.enqueue((n, p._1, p._2)) }
    }
    /** Exact argmax of the live pair table, or None when no pair remains. */
    def argmax(): Option[(Pair, Long)] = {
      while (heap.nonEmpty &&
        !pairCounts.get((heap.head._2, heap.head._3)).contains(heap.head._1))
        heap.dequeue()
      heap.headOption.map(e => ((e._2, e._3), e._1))
    }

    // pass 0: the one full pair count (same algebra as the oracled
    // initialPairCounts, over the already-segmented symbol table).
    // The distinct-pair table must fit the driver — alphabet²-bounded
    // at start — so its size is CHECKED before the collect instead of
    // letting a pathological corpus (adversarial byte soup at a huge
    // alphabet) OOM the driver mid-collect. The bound is a MEASUREMENT
    // by default — what this driver's heap holds (autoDriverPairBound)
    // vs the counted distinct pairs — not a constant the caller must
    // know in advance; natural-language corpora (distinct pairs track
    // alphabet² then vocab-neighbor growth) stay far under it. A
    // corpus that crosses it FALLS BACK to the fully distributed
    // incremental form instead of refusing — same merges, pair table
    // kept as an RDD.
    val initialPairs = adjacentPairCounts(baseSyms, parts).persist(sl)
    val nPairs = initialPairs.count()
    val heapBytes =
      if (maxHeapForTest > 0L) maxHeapForTest else Runtime.getRuntime.maxMemory
    // bytes/pair is a MEASUREMENT of the admitted table, not a
    // constant: sampled from the persisted pair RDD's first partitions
    // (hash-partitioned by reduce key, so the prefix is an unbiased
    // length sample), one cheap job
    val bpp0 = measuredBytesPerPair(initialPairs.take(4096).iterator.map(_._1))
    val pairBound =
      if (driverPairBound > 0L) driverPairBound
      else autoDriverPairBound(heapBytes, bpp0)
    if (nPairs > pairBound) {
      org.slf4j.LoggerFactory.getLogger(getClass)
        .warn(s"bpe: $nPairs distinct adjacent pairs exceeds the " +
        s"driver-resident pair-table bound ($pairBound" +
        (if (driverPairBound > 0L) ", caller override"
         else s", auto: 20% of driver heap at measured $bpp0 B/pair") +
        ") — falling back to the INCREMENTAL trainer with a " +
        "distributed pair table (jobs scale with passes, not merges; " +
        "pass driverPairBound explicitly if the driver has room)")
      // hand the ALREADY-persisted symbol table and pair table to the
      // distributed core (it takes ownership of unpersisting both) —
      // recomputing them would cost three corpus-scale jobs on exactly
      // the path where the corpus is enormous. train's finally still
      // releases base and re-unpersists baseSyms (idempotent).
      return trainDistributedCore(baseSyms, initialPairs, parts,
        numMerges, maxBatch, candK = 512, passHook = passHook,
        releaseAfterInit = () => base.unpersist(blocking = false))
    }
    initialPairs.collect().foreach { case (p, c) =>
      pairCounts(p) = c
      heap.enqueue((c, p._1, p._2))
      knownSymbols += p._1
      knownSymbols += p._2
    }
    initialPairs.unpersist(blocking = false)
    base.unpersist()
    // pass -1: build the blocks into the executor store (one job; the
    // store tags them as produced by pass -1 so pass 0 steps them)
    buildBlocks(baseSyms, trainId)
    blocksBuilt = true

    val merges = Seq.newBuilder[Merge]
    // committed (left, right) pairs in rank order — the rebuild path's
    // deterministic replay input
    val committedPairs = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var rank = 1
    var pendingUnmerge: Seq[Merge] = Nil
    // their batch POSITIONS in the pass that speculated them — the
    // key space of the blocks' `applied` maps
    var pendingUnmergePos: Set[Int] = Set.empty
    var pass = 0
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      // ---- measured-footprint watchdog (every pass after the first):
      // the pass-0 sample admitted a table of single-code-point
      // symbols, but merges fuse arbitrarily long strings and the live
      // table's bytes/pair GROWS — the exact axis the old assumed-300
      // constant undershot. Re-measure on a bounded sample of live
      // keys (hash-order, uncorrelated with length) and migrate to the
      // distributed core at this pass boundary when the estimated
      // footprint crosses the heap budget (or the live count crosses
      // an explicit override). Migration hands over the same trainId —
      // executor blocks stay valid, the committed prefix seeds the
      // result, and the exact driver table becomes the initial RDD —
      // so the merge sequence is unchanged (pinned by the migration
      // differential in BpeSpec).
      if (pass > 0) {
        val bppLive = measuredBytesPerPair(pairCounts.keysIterator)
        val estBytes = pairCounts.size.toLong * bppLive
        val over =
          if (driverPairBound > 0L) pairCounts.size > driverPairBound
          else estBytes > driverTableByteBudget(heapBytes)
        if (over) {
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"bpe: live pair table outgrew the driver budget mid-train " +
              s"(pass $pass: ${pairCounts.size} pairs at measured " +
              s"$bppLive B/pair ≈ ${estBytes / 1024} KiB" +
              (if (driverPairBound > 0L) s", override $driverPairBound pairs"
               else s", budget ${driverTableByteBudget(heapBytes) / 1024} KiB") +
              ") — migrating to the distributed pair table at this " +
              "pass boundary (same blocks, same committed prefix)")
          if (onMigrate != null) onMigrate()
          val tableRdd = sc.parallelize(pairCounts.toSeq, parts)
            .partitionBy(new org.apache.spark.HashPartitioner(parts))
            .persist(sl)
          // the core takes ownership of the trainId's blocks (its
          // finally clears them); train's finally must not re-run the
          // per-partition clear job over the by-then-unpersisted
          // symbol RDD — that would recompute the corpus to clear
          // nothing
          blocksBuilt = false
          return trainDistributedCore(baseSyms, tableRdd, parts,
            numMerges, maxBatch, candK = 512, passHook = passHook,
            handover = Some(Handover(trainId, rank, pass, merges.result(),
              committedPairs, knownSymbols, pendingUnmerge,
              pendingUnmergePos)))
        }
      }
      // ---- speculative batch selection (exact table, stale-free) ----
      val budget = math.min(maxBatch, numMerges - rank + 1)
      val batch = scala.collection.mutable.ArrayBuffer.empty[Merge]
      val blocked = scala.collection.mutable.HashSet.empty[String]
      argmax() match {
        case None => exhausted = true
        case Some(((l0, r0), c0)) =>
          batch += Merge(rank, l0, r0, c0)
          blocked ++= Seq(l0, r0, l0 + r0)
          if (budget > 1) {
            // scan the heap's valid entries in exact order, skipping
            // conflicts (replay below re-checks every position anyway)
            val popped = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String)]
            var scanned = 0
            while (batch.size < budget && scanned < 4096 && heap.nonEmpty) {
              val e = heap.dequeue()
              popped += e
              scanned += 1
              val p = (e._2, e._3)
              if (pairCounts.get(p).contains(e._1) && p != ((l0, r0)) &&
                  !batch.exists(m => (m.left, m.right) == p)) {
                val fused = e._2 + e._3
                if (!blocked(e._2) && !blocked(e._3) && !blocked(fused) &&
                    !knownSymbols(fused)) {
                  batch += Merge(rank + batch.size, e._2, e._3, e._1)
                  blocked ++= Seq(e._2, e._3, fused)
                }
              }
            }
            heap.enqueue(popped.toSeq: _*) // restore (duplicates are lazy-deleted)
          }
      }
      if (!exhausted) {
        // ---- one distributed pass: un-merge rejects, apply batch, tag deltas ----
        val unmergeMap: Map[String, (String, String)] =
          pendingUnmerge.map(m => m.merged -> ((m.left, m.right))).toMap
        // batch positions rejected last pass, in LAST pass's indexing —
        // the block's `applied` slots are keyed by them
        val unmergeIdx: Set[Int] = pendingUnmergePos
        val batchSeq: Seq[(String, String)] = batch.toSeq.map(m => (m.left, m.right))
        val passT0 = System.nanoTime()
        val deltas = runStorePass(baseSyms, trainId, pass, batchSeq,
          unmergeMap, unmergeIdx, () => committedPairs.toSeq)
        val passSecs = (System.nanoTime() - passT0) / 1e9
        val byIdx: Map[Int, Array[((Int, String, String), Long)]] =
          deltas.groupBy(_._1._1)
        // ---- replay: commit exactly the prefix sequential greedy picks ----
        var j = 0
        var valid = true
        while (j < batch.size && valid) {
          val m = batch(j)
          val am = argmax()
          if (am.map(_._1).contains((m.left, m.right))) {
            val cnt = am.get._2
            merges += Merge(rank, m.left, m.right, cnt)
            committedPairs += ((m.left, m.right))
            knownSymbols += m.merged
            rank += 1
            byIdx.getOrElse(j, Array.empty).foreach { case ((_, l, r), d) =>
              bump((l, r), d)
            }
            j += 1
          } else valid = false
        }
        require(j > 0, "bpe: replay rejected the exact-table argmax — " +
          "delta accounting bug")
        if (passHook != null)
          passHook(pass, j,
            deltas.collectFirst { case ((-1, "", ""), n) => n }
              .getOrElse(0L), passSecs)
        pendingUnmerge = batch.drop(j).toSeq
        pendingUnmergePos = (j until batch.size).toSet
        if (pairCounts.isEmpty) exhausted = true
        pass += 1
      }
    }
    merges.result()
    } finally {
      // release the executor store (best-effort per-executor job for a
      // cluster — guarded, a broken context must not mask the real
      // error, and only run if blocks were ever BUILT; the driver-side
      // clear covers local mode) and both caches; the finished mark
      // makes any executor the clear job missed evict these entries at
      // the NEXT training's block build
      TrainStore.markFinished(trainId)
      if (blocksBuilt)
        try baseSyms.foreachPartition(
          (_: Iterator[(Array[String], Long)]) => TrainStore.clear(trainId))
        catch { case _: Throwable => () }
      TrainStore.clear(trainId)
      baseSyms.unpersist(blocking = false)
      base.unpersist(blocking = false)
    }
  }

  /** The over-driver-bound form of [[train]]: identical incremental
    * block machinery (executor-resident [[TrainStore]], inverted-index
    * passes, speculative batches, un-merge), but the adjacent-pair
    * frequency table stays a DISTRIBUTED RDD — nothing pair-table-sized
    * ever reaches the driver. Jobs scale with PASSES, not merges: each
    * pass is one `takeOrdered(candK)` over the live table (exact
    * distributed argmax + candidate pool), one block-pass job, and one
    * narrow co-partitioned delta update of the table.
    *
    * Exactness (pinned ≡ [[trainSequential]] by BpeSpec differentials):
    * position 1 of each batch is the exact global argmax (takeOrdered's
    * total order is the trainer's). Later positions replay against a
    * driver-local view holding the top-`candK` candidates (exact
    * counts) plus pairs freshly created this pass (exact — a pair
    * containing a just-fused FRESH symbol cannot pre-exist, so its
    * absolute count is the delta itself). Pairs OUTSIDE the view can
    * only lose count within a pass (a positive delta requires a fresh
    * fused symbol), so they stay bounded by the view's K-th original
    * count: a position commits only while it is the view argmax AND
    * strictly above that bound (or the view holds the whole table).
    * The one soundness hole — position 1's fused string colliding with
    * a pre-existing symbol, making a positive delta land on an
    * unknown-count outside pair — TAINTS the pass: the remaining tail
    * is rejected (un-merged next pass, [[train]]'s normal truncation
    * path) and the next takeOrdered re-syncs. Never wrong, at worst a
    * shorter committed prefix per pass.
    */
  private[graft] def trainDistributed(words: DataFrame, numMerges: Int,
      maxBatch: Int = 32, candK: Int = 512,
      passHook: (Int, Int, Long, Double) => Unit = null): Seq[Merge] = {
    val spark = words.sparkSession
    import spark.implicits._
    val sl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val base = words.select(col("w").cast("string"), col("cnt").cast("long"))
      .as[(String, Long)]
      .persist(sl)
    try {
      val nWords = base.count()
      val parts = math.max(1,
        math.min(spark.sparkContext.defaultParallelism,
          (nWords / 65536L).toInt + 1))
      // deterministic content-key placement — same rebuild-correctness
      // argument as train's baseSyms
      val baseSyms: org.apache.spark.rdd.RDD[(Array[String], Long)] = base.rdd
        .partitionBy(new org.apache.spark.HashPartitioner(parts))
        .map { case (w, c) => (symbolsOf(w) :+ Eow, c) }
        .persist(sl)
      val pairTable0 = adjacentPairCounts(baseSyms, parts).persist(sl)
      trainDistributedCore(baseSyms, pairTable0, parts, numMerges,
        maxBatch, candK, passHook,
        releaseAfterInit = () => base.unpersist(blocking = false))
    } finally base.unpersist(blocking = false)
  }

  /** The loop of [[trainDistributed]], factored so [[train]]'s
    * over-bound fallback can hand over its ALREADY-persisted symbol
    * table and initial pair table instead of recomputing both (plus a
    * corpus scan for the alphabet) — three redundant corpus-scale jobs
    * on exactly the path where the corpus is enormous. Takes ownership
    * of unpersisting `baseSyms` and the `initialTable` chain.
    *
    * With a [[Handover]] (train's MID-RUN measured-footprint
    * migration) the core CONTINUES instead of starting: the trainId's
    * executor blocks are already built and stepped to `pass0 - 1`, so
    * the first runStorePass steps them normally (and a lost partition
    * rebuilds from the handed-over committed prefix, which this loop
    * keeps appending to by reference); rank/pass/pending-unmerge state
    * resume where the driver loop stopped, and `initialTable` is the
    * exact live table it held.
    */
  private def trainDistributedCore(
      baseSyms: org.apache.spark.rdd.RDD[(Array[String], Long)],
      initialTable: org.apache.spark.rdd.RDD[((String, String), Long)],
      parts: Int, numMerges: Int, maxBatch: Int, candK: Int,
      passHook: (Int, Int, Long, Double) => Unit,
      releaseAfterInit: () => Unit = () => (),
      handover: Option[Handover] = None): Seq[Merge] = {
    require(maxBatch >= 1, s"bpe: maxBatch must be >= 1, got $maxBatch")
    require(candK >= 1, s"bpe: candK must be >= 1, got $candK")
    val sc = baseSyms.sparkContext
    val sl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val trainId = handover.map(_.trainId)
      .getOrElse(java.util.UUID.randomUUID().toString)
    // the live pair table, co-partitioned across passes so each delta
    // update cogroups NARROWLY (only the fuse-site-sized delta RDD
    // shuffles; the table itself never moves between passes)
    val pairPart = initialTable.partitioner
      .getOrElse(new org.apache.spark.HashPartitioner(parts))
    type Pair = (String, String)
    var pairTable: org.apache.spark.rdd.RDD[(Pair, Long)] = initialTable
    var prevTable: org.apache.spark.rdd.RDD[(Pair, Long)] = null
    var blocksBuilt = false
    try {
      // every symbol alive in the corpus or ever fused — ALPHABET-sized
      // (code points + one entry per merge), not pair-table-sized, so it
      // is driver-safe even when the pair table is not. Guards batch
      // positions > 1 against un-ambiguous un-merge (as in train) and
      // the replay's fresh-pair reasoning. Derived from the pair
      // table's keys (every symbol occurs in some pair — words always
      // carry the Eow terminal), not a separate corpus scan.
      val knownSymbols = handover.map(_.knownSymbols0).getOrElse {
        val ks = scala.collection.mutable.HashSet.empty[String]
        ks ++= pairTable
          .flatMap { case ((l, r), _) => Iterator(l, r) }
          .distinct().collect()
        ks
      }
      if (handover.isEmpty) {
        buildBlocks(baseSyms, trainId)
        blocksBuilt = true
      } else {
        // migration path: the driver loop built (and stepped) the
        // blocks under this same trainId — rebuilding would both waste
        // a corpus job and DESYNC the applied-slot state the pending
        // un-merge below expects
        blocksBuilt = true
      }
      // baseSyms and the pair table are both materialized into their
      // caches now — the caller's upstream corpus-scale inputs (the
      // word-count Dataset) can be released for the (long) merge loop
      releaseAfterInit()

      // takeOrdered's head = the trainer's argmax: cnt DESC, (l, r) ASC
      val topOrd: Ordering[(Pair, Long)] =
        Ordering.by { case ((l, r), c) => (-c, l, r) }
      val merges = Seq.newBuilder[Merge]
      handover.foreach(h => merges ++= h.merges0)
      val committedPairs = handover.map(_.committed)
        .getOrElse(scala.collection.mutable.ArrayBuffer.empty[Pair])
      var rank = handover.map(_.rank0).getOrElse(1)
      var pass = handover.map(_.pass0).getOrElse(0)
      var exhausted = false
      var pendingUnmerge: Seq[Merge] = handover.map(_.pendingUnmerge0).getOrElse(Nil)
      var pendingUnmergePos: Set[Int] =
        handover.map(_.pendingUnmergePos0).getOrElse(Set.empty)
      while (rank <= numMerges && !exhausted) {
        val passT0 = System.nanoTime()
        val cands = pairTable.takeOrdered(candK)(topOrd)
        // the previous table is now materialized past — release it
        if (prevTable != null) {
          prevTable.unpersist(blocking = false)
          prevTable = null
        }
        if (cands.isEmpty) exhausted = true
        else {
          // view completeness: fewer than candK rows means the WHOLE
          // table is on the driver this pass and replay is exact;
          // otherwise outside pairs are bounded by the K-th count
          val fullTable = cands.length < candK
          val threshold = if (fullTable) Long.MinValue else cands.last._2
          // ---- batch selection (same rules as train) ----
          val budget = math.min(maxBatch, numMerges - rank + 1)
          val batch = scala.collection.mutable.ArrayBuffer.empty[Merge]
          val blocked = scala.collection.mutable.HashSet.empty[String]
          val ((l0, r0), c0) = cands(0)
          batch += Merge(rank, l0, r0, c0)
          blocked ++= Seq(l0, r0, l0 + r0)
          var ci = 1
          while (batch.size < budget && ci < cands.length) {
            val ((l, r), c) = cands(ci)
            val fused = l + r
            if (!blocked(l) && !blocked(r) && !blocked(fused) &&
                !knownSymbols(fused)) {
              batch += Merge(rank + batch.size, l, r, c)
              blocked ++= Seq(l, r, fused)
            }
            ci += 1
          }
          val unmergeMap: Map[String, Pair] =
            pendingUnmerge.map(m => m.merged -> ((m.left, m.right))).toMap
          val batchSeq: Seq[Pair] = batch.toSeq.map(m => (m.left, m.right))
          val deltas = runStorePass(baseSyms, trainId, pass, batchSeq,
            unmergeMap, pendingUnmergePos, () => committedPairs.toSeq)
          val byIdx: Map[Int, Array[((Int, String, String), Long)]] =
            deltas.groupBy(_._1._1)
          // ---- replay against the candidate view ----
          val local = scala.collection.mutable.HashMap.empty[Pair, Long]
          cands.foreach { case (p, c) => local(p) = c }
          val freshSyms = scala.collection.mutable.HashSet.empty[String]
          var taint = false
          var j = 0
          var valid = true
          while (j < batch.size && valid) {
            val m = batch(j)
            val pj = (m.left, m.right)
            val ok =
              if (j == 0) true // exact distributed argmax
              else if (taint || !local.contains(pj)) false
              else {
                val best = local.minBy { case ((l, r), c) => (-c, l, r) }
                best._1 == pj && (fullTable || best._2 > threshold)
              }
            if (ok) {
              merges += Merge(rank, m.left, m.right, local(pj))
              committedPairs += pj
              if (!knownSymbols(m.merged)) freshSyms += m.merged
              knownSymbols += m.merged
              rank += 1
              byIdx.getOrElse(j, Array.empty).foreach { case ((_, l, r), d) =>
                val p = (l, r)
                local.get(p) match {
                  case Some(cur) =>
                    val n = cur + d
                    require(n >= 0L, s"bpe: pair count for $p went " +
                      s"negative ($n) — delta accounting bug")
                    if (n == 0L) local.remove(p) else local(p) = n
                  case None =>
                    if (d > 0L) {
                      // a freshly created pair has base count 0 ⇒ d is
                      // its exact count; a positive delta on a pair of
                      // PRE-EXISTING symbols (possible only via a
                      // position-1 fused-string collision) lands on an
                      // unknown base — taint the pass, reject the tail
                      if (freshSyms(l) || freshSyms(r)) local(p) = d
                      else taint = true
                    }
                  // negative delta on an unknown outside pair: it only
                  // sinks further below the threshold bound — ignore
                }
              }
              j += 1
            } else valid = false
          }
          // progress is guaranteed structurally: position 0 commits
          // unconditionally because takeOrdered's head IS the exact
          // global argmax under the trainer's total order (unlike
          // train's driver-table replay, there is no cheaper exact
          // re-check to assert against here — the table is distributed)
          // ---- apply the committed prefix's deltas to the table ----
          val tableDelta = scala.collection.mutable.HashMap.empty[Pair, Long]
          (0 until j).foreach { jj =>
            byIdx.getOrElse(jj, Array.empty).foreach { case ((_, l, r), d) =>
              val p = (l, r)
              val n = tableDelta.getOrElse(p, 0L) + d
              if (n == 0L) tableDelta.remove(p) else tableDelta(p) = n
            }
          }
          if (tableDelta.nonEmpty) {
            val dRdd = sc.parallelize(tableDelta.toSeq,
              math.min(parts, 4)).partitionBy(pairPart)
            val next = pairTable.cogroup(dRdd)
              .mapValues { case (cs, ds) => cs.sum + ds.sum }
              .filter { case (p, n) =>
                // a negative count is a delta-accounting bug — fail the
                // job loudly rather than silently dropping the row
                require(n >= 0L,
                  s"bpe: distributed pair count for $p went negative ($n)")
                n > 0L
              }
              .persist(sl)
            // truncate lineage periodically: a long training would
            // otherwise chain one cogroup per pass into an unbounded
            // recompute graph (reliable when a checkpoint dir exists —
            // this path targets real clusters, where a localCheckpoint
            // would die with the first lost executor)
            if (pass % 8 == 7) graft.core.Lineage.truncate(next)
            prevTable = pairTable
            pairTable = next
          }
          if (passHook != null)
            passHook(pass, j,
              deltas.collectFirst { case ((-1, "", ""), n) => n }
                .getOrElse(0L),
              (System.nanoTime() - passT0) / 1e9)
          pendingUnmerge = batch.drop(j).toSeq
          pendingUnmergePos = (j until batch.size).toSet
          pass += 1
        }
      }
      merges.result()
    } finally {
      TrainStore.markFinished(trainId)
      if (blocksBuilt)
        try baseSyms.foreachPartition(
          (_: Iterator[(Array[String], Long)]) => TrainStore.clear(trainId))
        catch { case _: Throwable => () }
      TrainStore.clear(trainId)
      if (prevTable != null) prevTable.unpersist(blocking = false)
      pairTable.unpersist(blocking = false)
      if (pairTable ne initialTable) initialTable.unpersist(blocking = false)
      baseSyms.unpersist(blocking = false)
    }
  }

  /** The one-merge-per-job reference form of [[train]]: full adjacent
    * pair recount + distributed argmax every iteration. Kept as the
    * differential anchor for the incremental trainers (BpeSpec pins
    * `train ≡ trainSequential` and `trainDistributed ≡ trainSequential`
    * across randomized corpora).
    */
  private[graft] def trainSequential(words: DataFrame, numMerges: Int): Seq[Merge] = {
    val spark = words.sparkSession
    import spark.implicits._
    val sl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // size the symbol table's partitioning to ITS row count, not the
    // corpus's: after the word-count groupBy the table is tiny at gate
    // scale (one partition — iteration jobs stay sub-100ms) and spans
    // partitions again exactly when the distinct-word count does
    // persist the word-count table BEFORE the sizing count: the count
    // and the symbol table's first materialization would otherwise
    // EACH re-run the corpus-wide word groupBy — the one genuinely
    // data-sized stage of training, paid twice at 100 TB for nothing
    val base = words.select(col("w").cast("string"), col("cnt").cast("long"))
      .as[(String, Long)]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nWords = base.count()
    val sc = spark.sparkContext
    val parts = math.max(1, math.min(sc.defaultParallelism,
      (nWords / 65536L).toInt + 1))
    // the LOOP runs on RDDs, deliberately: a DataFrame body re-analyzes
    // and Janino-recompiles a brand-new plan every merge (the merge
    // literals live in the closure), a measured ~0.15 s/iteration
    // CONSTANT at any data size — 24 merges paid 3.8 s of pure plan
    // compilation on a 60-row symbol table. The body is procedural
    // per-element symbol rewriting with zero relational structure to
    // optimize, i.e. the documented imperative-loop niche for RDDs;
    // the RDD form's per-iteration cost is one scheduled job (pair
    // reduceByKey + map-side top-1), ~3× faster end-to-end. Everything
    // around the loop (word counts, the oracled pair algebra, encode)
    // stays DataFrame.
    // deterministic content-key placement (see train's baseSyms note):
    // a recomputed partition after shuffle-file loss must hold the same
    // word subset or the per-iteration pair counts double-count
    var cur = base.rdd
      .partitionBy(new org.apache.spark.HashPartitioner(parts))
      .map { case (w, c) => (symbolsOf(w) :+ Eow, c) }
      .persist(sl)
    var baseLive = true // released after cur's first materialization
    // one job per iteration: the pair-count argmax below also
    // materializes `cur` into its cache, so the previous table is
    // released one step deferred instead of via an extra count()
    var prev: org.apache.spark.rdd.RDD[(Array[String], Long)] = null
    implicit val topOrd: Ordering[((String, String), Long)] =
      Ordering.by { case ((l, r), c) => (-c, l, r) }
    val merges = Seq.newBuilder[Merge]
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val top = cur.flatMap { case (s, c) =>
        if (s.length < 2) Iterator.empty
        else s.iterator.zip(s.iterator.drop(1)).map(p => (p, c))
      }.reduceByKey(_ + _, parts)
        .takeOrdered(1)(topOrd)
      if (baseLive) { base.unpersist(); baseLive = false }
      if (prev != null) { prev.unpersist(blocking = false); prev = null }
      if (top.isEmpty) exhausted = true
      else {
        val ((l, r), c) = top(0)
        merges += Merge(rank, l, r, c)
        prev = cur
        val mapped = prev.map { case (s, cc) => (mergePairArr(s, l, r), cc) }
          .persist(sl)
        // truncate lineage periodically so a large merge budget cannot
        // accumulate an unboundedly deep recompute chain (reliable
        // checkpoint when a dir is configured, localCheckpoint in
        // local mode — see Lineage.truncate; `mapped` is persisted
        // above, per its RDD contract)
        if (rank % 8 == 0) graft.core.Lineage.truncate(mapped)
        cur = mapped
        rank += 1
      }
    }
    if (baseLive) base.unpersist()
    if (prev != null) prev.unpersist(blocking = false)
    cur.unpersist(blocking = false)
    merges.result()
  }

  /** Persist a learned merge table (rank-ordered) as parquet — the
    * train-once / encode-everywhere handoff: training is one corpus
    * job, encoding runs in every downstream job against the saved
    * table. Round-trips through [[loadMerges]].
    */
  def saveMerges(spark: org.apache.spark.sql.SparkSession,
                 merges: Seq[Merge], path: String): Unit =
    spark.createDataFrame(merges)
      .select(col("rank"), col("left"), col("right"), col("cnt"))
      .repartition(1)
      .write.mode("overwrite").parquet(path)

  /** Load a merge table written by [[saveMerges]], rank order
    * restored. Refuses loudly on the malformations it CAN detect —
    * an empty table, null symbols, or an interior rank hole (each
    * silently re-tokenizes downstream). A tail-truncated table
    * (ranks 1..k of a longer save) is indistinguishable from a valid
    * k-merge vocabulary by construction; pipelines that must detect
    * it should compare the table's max rank to their configured
    * merge budget.
    */
  def loadMerges(spark: org.apache.spark.sql.SparkSession,
                 path: String): Seq[Merge] = {
    val raw = spark.read.parquet(path)
      .select(col("rank").cast("int"), col("left"), col("right"),
        col("cnt").cast("long"))
      .collect()
    require(raw.nonEmpty, s"bpe: merge table at $path is empty")
    require(raw.forall(r => !r.isNullAt(0) && !r.isNullAt(1) &&
        !r.isNullAt(2) && !r.isNullAt(3)),
      s"bpe: merge table at $path carries null ranks or symbols")
    val rows = raw
      .map(r => Merge(r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_.rank)
    require(rows.zipWithIndex.forall { case (m, i) => m.rank == i + 1 },
      s"bpe: merge table at $path has ${rows.length} rows but ranks " +
        s"${rows.headOption.map(_.rank)}..${rows.lastOption.map(_.rank)} — " +
        "not the contiguous 1..n sequence encode requires")
    rows.toSeq
  }

  /** Left-to-right non-overlapping fuse of one adjacent pair — the
    * BPE merge step ("aaa" under merge (a,a) → ["aa","a"], never
    * ["a","aa"] or an overlapped double-consume).
    */
  private[text] def mergePair(s: Seq[String], l: String, r: String): Seq[String] =
    mergePairArr(s.toArray, l, r).toSeq

  /** Single implementation of the fuse rule (the RDD training loop
    * calls it directly on arrays; [[mergePair]] delegates) — the
    * training and encode paths can never drift.
    */
  private[text] def mergePairArr(s: Array[String], l: String, r: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == l && s(i + 1) == r) { out += l + r; i += 2 }
      else { out += s(i); i += 1 }
    }
    out.toArray
  }

  /** Encode one word (no [[Eow]]) through the merge list in rank
    * order. Row-local; exposed for the per-partition memo in
    * [[encode]] and for differential tests.
    */
  private[text] def encodeWord(w: String, merges: Seq[Merge]): Seq[String] = {
    var syms: Seq[String] = symbolsOf(w).toSeq :+ Eow
    merges.foreach { m =>
      if (syms.length > 1) syms = mergePair(syms, m.left, m.right)
    }
    syms
  }

  /** Tokenize `text` of every row with a learned merge list: output
    * columns of `docs` plus `bpe_tokens: array<string>` and
    * `n_bpe_tokens: long`. mapPartitions with a per-partition
    * word→tokens memo: the merge loop runs once per DISTINCT word per
    * task, not once per token — at corpus scale that is the difference
    * between O(tokens × merges) and O(task-vocabulary × merges).
    */
  def encode(docs: DataFrame, textCol: String, merges: Seq[Merge]): DataFrame = {
    val spark = docs.sparkSession
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val inSchema = docs.schema
    val outSchema = inSchema
      .add(StructField("bpe_tokens", ArrayType(StringType, containsNull = false)))
      .add(StructField("n_bpe_tokens", LongType))
    val ti = inSchema.fieldIndex(textCol)
    val ms = merges // serialize the small merge table in the closure
    val out = docs.rdd.mapPartitions { it =>
      val memo = scala.collection.mutable.HashMap.empty[String, Seq[String]]
      it.map { row =>
        val text = row.getString(ti)
        val toks =
          if (text == null) Seq.empty[String]
          else text.split(" ").iterator.filter(_.nonEmpty).flatMap { w =>
            memo.getOrElseUpdate(w, encodeWord(w, ms))
          }.toSeq
        Row.fromSeq(row.toSeq :+ toks :+ toks.length.toLong)
      }
    }
    spark.createDataFrame(out, outSchema)
  }
}
