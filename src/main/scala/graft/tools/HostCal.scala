package graft.tools

/** Fixed-work CPU calibration probe for the bench artifact.
  *
  * Round-over-round bench totals on a shared host confound plan cost
  * with host speed (r10's 51.9→64.4 s "regression" was adjudicated as
  * ~1.5× host slowdown only after SCALING.md archaeology). This probe
  * makes that adjudication mechanical: a deterministic integer-mixing
  * loop whose WORK is constant across rounds, timed single-threaded
  * and at full thread subscription, recorded in BENCH_FULL.json both
  * BEFORE and AFTER the timed pass (host drift inside the bench window
  * — the r10 failure mode — shows up as pre≠post). Dividing a round's
  * total by its multi-thread probe seconds yields a host-independent
  * "probe-units" figure that IS comparable across rounds.
  *
  * TWO yardsticks, because shared-host noise has two independent
  * axes (r11 measurement: output-materialization gates ran 2.0× a
  * prior window while compute-bound gates ran 1.2× — a single CPU
  * probe cannot explain both):
  *   - CPU: a register-only integer-mixing loop (no allocation, no
  *     memory traffic) — scales like whole-stage-codegen loops.
  *   - MEMORY BANDWIDTH: a fixed-traffic strided sweep over a block
  *     far larger than LLC (one cache line per step) — scales like
  *     row materialization, shuffle writes, and copy-heavy operators,
  *     which a hypervisor neighbor can degrade independently of CPU.
  */
object HostCal {

  /** Deterministic splitmix-style mixing loop; the return value is
    * consumed by the caller so JIT cannot eliminate the work.
    */
  def work(iters: Long, seed: Long): Long = {
    var h = seed
    var i = 0L
    while (i < iters) {
      h += 0x9e3779b97f4a7c15L
      var z = h
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      h ^= z ^ (z >>> 31)
      i += 1
    }
    h
  }

  /** Fixed per-thread work: ~0.4–0.8 s single-threaded on 2020s-era
    * server cores. Constant across rounds — never tune this, or the
    * probe-units lose comparability.
    */
  val ItersPerThread: Long = 400L * 1000 * 1000

  @volatile private var sink: Long = 0L // defeats dead-code elimination

  private def timeSingle(): Double = {
    val t0 = System.nanoTime()
    sink ^= work(ItersPerThread, 42L)
    (System.nanoTime() - t0) / 1e9
  }

  /** Wall time for `threads` concurrent workers each doing the fixed
    * per-thread work (total work = threads × ItersPerThread). Perfect
    * scaling ⇒ multi ≈ single; oversubscription/noisy neighbors show
    * as multi > single.
    */
  private def timeMulti(threads: Int): Double = {
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { i =>
      val t = new Thread(() => { sink ^= work(ItersPerThread, 42L + i) })
      t.start(); t
    }
    ts.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }

  /** min-of-`reps` single- and multi-thread probe seconds, after a JIT
    * warm pass. ~3–6 s total at reps=2 — negligible against the
    * 60 s+ suite it calibrates.
    */
  def probe(threads: Int, reps: Int = 2): (Double, Double) = {
    sink ^= work(ItersPerThread / 20, 7L) // JIT warm the loop body
    val single = (1 to reps).map(_ => timeSingle()).min
    val multi = (1 to reps).map(_ => timeMulti(threads)).min
    (single, multi)
  }

  // ---- memory-bandwidth probe ----

  /** Shared read-only block, far larger than any LLC so the strided
    * sweep below is DRAM-bound, not cache-bound. 256 MB — allocated
    * once (lazily) and reused by the pre- and post-suite probes.
    * Constant across rounds, like ItersPerThread.
    */
  val MemLongs: Int = 32 * 1024 * 1024
  /** Fixed per-thread sweep count: traffic = passes × 256 MB = 6 GB —
    * sized so the single-thread probe runs ~0.6 s (a 0.2 s probe is
    * itself noise-dominated). Constant across rounds.
    */
  val MemPassesPerThread: Int = 24

  /** Probe block, held only WHILE probing: a lazy val would pin
    * 256 MB of driver heap through the whole timed suite between the
    * pre and post probes, perturbing the GC behavior of the very
    * measurement the probe calibrates. probeMem releases it; refill
    * is deterministic and ~100 ms.
    */
  @volatile private var memBlockRef: Array[Long] = null

  private def memBlock: Array[Long] = {
    var a = memBlockRef
    if (a == null) {
      a = new Array[Long](MemLongs)
      var h = 0x6a09e667f3bcc908L
      var i = 0
      while (i < MemLongs) {
        h += 0x9e3779b97f4a7c15L
        a(i) = h
        i += 1
      }
      memBlockRef = a
    }
    a
  }

  /** Release the probe block between probe windows. */
  def releaseMemBlock(): Unit = { memBlockRef = null }

  /** Deterministic strided sweep: one 64-byte cache line per step
    * (stride 8 longs), the whole block per pass — a pure-bandwidth
    * workload shaped like row materialization / shuffle buffer
    * writes. `startLong` rotates where in the block the sweep begins
    * (wrapping once), so CONCURRENT sweeps with disjoint starts do
    * not convoy behind one DRAM stream and get served from a sibling
    * thread's LLC fills — without disjoint phases a 32-thread "multi"
    * run measured an implied ~240 GB/s, i.e. cache hits, blind to the
    * DRAM degradation the probe exists to detect. The rotating start
    * lane keeps passes from being trivially foldable; the return
    * value is consumed via `sink`.
    */
  def memWork(passes: Int, seed: Long, startLong: Int = 0): Long =
    sweepBlock(memBlock, passes, seed, startLong)

  private def timeMemSingle(): Double = {
    val t0 = System.nanoTime()
    sink ^= memWork(MemPassesPerThread, 3L)
    (System.nanoTime() - t0) / 1e9
  }

  private def timeMemMulti(threads: Int): Double = {
    // disjoint, evenly spaced starting offsets: each thread streams
    // its own region of the block at any instant, so the aggregate is
    // a genuine DRAM-bandwidth measurement rather than LLC reuse
    val step = MemLongs / math.max(1, threads)
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { i =>
      val t = new Thread(() => {
        sink ^= memWork(MemPassesPerThread, 3L + i, startLong = i * step)
      })
      t.start(); t
    }
    ts.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }

  /** min-of-`reps` single- and multi-thread MEMORY probe seconds.
    * Per-thread work is fixed (like the CPU probe), so the multi
    * figure is bandwidth-saturated by construction; round-over-round
    * comparability comes from the work being CONSTANT, and a
    * memory-degraded window shows as this ratio moving while the CPU
    * probe holds.
    */
  def probeMem(threads: Int, reps: Int = 2): (Double, Double) =
    try {
      sink ^= memWork(1, 11L) // touch + JIT warm (also faults the block in)
      val single = (1 to reps).map(_ => timeMemSingle()).min
      val multi = (1 to reps).map(_ => timeMemMulti(threads)).min
      (single, multi)
    } finally releaseMemBlock()

  // ---- ride-along mini-probe ----
  //
  // The r11 adjudication hole: the pre/post probes BRACKET the suite,
  // so a contention burst in the middle of the window (which hit a
  // contiguous block of gates 3-9× while the bracketing probes read
  // nominal) is invisible to them. The mini-probe closes it: a ~0.1 s
  // saturated CPU + memory sample taken immediately before each gate's
  // timed execution, recorded per gate in BENCH_FULL.json — a gate
  // whose time regressed WITH an elevated mini-probe is host noise; a
  // regression on a nominal probe is code.

  /** Pinned mini-probe work constants (comparability contract, like
    * ItersPerThread): per-thread CPU iterations and the dedicated
    * sweep block. The block is 128 MB — still past any LLC, but small
    * enough to keep RESIDENT across the suite (see [[miniBlock]]).
    */
  val MiniItersPerThread: Long = ItersPerThread / 16
  val MiniMemLongs: Int = 16 * 1024 * 1024
  val MiniMemPassesPerThread: Int = 1

  /** Unlike the big probe block (allocated/released around each probe
    * window), the mini block stays ALIVE between gates: re-faulting
    * 128 MB per gate would cost more than the probe itself and add
    * page-fault noise to the very signal it measures. A read-only,
    * once-tenured 128 MB array is a bounded, documented heap cost on
    * the 128 GiB bench JVM; Bench releases it after the timed pass.
    */
  @volatile private var miniBlockRef: Array[Long] = null

  private def miniBlock: Array[Long] = {
    var a = miniBlockRef
    if (a == null) {
      a = new Array[Long](MiniMemLongs)
      var h = 0x243f6a8885a308d3L
      var i = 0
      while (i < MiniMemLongs) {
        h += 0x9e3779b97f4a7c15L
        a(i) = h
        i += 1
      }
      miniBlockRef = a
    }
    a
  }

  def releaseMiniBlock(): Unit = {
    miniBlockRef = null
    // re-warm on next use: without this, a probe after a release finds
    // miniWarm still true and the 128 MB block lazily re-allocates
    // INSIDE the timed mem section — racily from every probe thread —
    // reading as a phantom contention spike
    miniWarm = false
  }

  /** Same strided one-line-per-step sweep as [[memWork]], over the
    * resident mini block.
    */
  def miniMemWork(passes: Int, seed: Long, startLong: Int = 0): Long =
    sweepBlock(miniBlock, passes, seed, startLong)

  private def sweepBlock(a: Array[Long], passes: Int, seed: Long,
                         startLong: Int): Long = {
    val n = a.length
    val start = ((startLong % n) + n) % n & ~7
    var acc = seed
    var p = 0
    while (p < passes) {
      val lane = (p * 7) & 7
      var i = start + lane
      while (i < n) { acc ^= a(i); i += 8 }
      i = lane
      while (i < start) { acc ^= a(i); i += 8 }
      p += 1
    }
    acc
  }

  @volatile private var miniWarm = false

  /** One saturated (threads-wide) CPU + memory sample: the ride-along
    * host context for ONE gate timing. Each axis is a single
    * fixed-work multi-thread burst — saturated, because the gate
    * executions it contextualizes run all `threads` cores, and a noisy
    * neighbor shows first in saturated throughput. ~0.1 s total on a
    * quiet host; elevation tracks contention at the instant the gate
    * is about to run. Returns (cpuSec, memSec).
    */
  def miniProbe(threads: Int): (Double, Double) = {
    if (!miniWarm) {
      sink ^= work(MiniItersPerThread / 20, 9L)
      sink ^= miniMemWork(1, 13L) // fill + fault the block, warm the sweep
      miniWarm = true
    }
    val t0 = System.nanoTime()
    val cts = (0 until threads).map { i =>
      val t = new Thread(() => { sink ^= work(MiniItersPerThread, 17L + i) })
      t.start(); t
    }
    cts.foreach(_.join())
    val cpu = (System.nanoTime() - t0) / 1e9
    val step = MiniMemLongs / math.max(1, threads)
    val t1 = System.nanoTime()
    val mts = (0 until threads).map { i =>
      val t = new Thread(() => {
        sink ^= miniMemWork(MiniMemPassesPerThread, 19L + i, startLong = i * step)
      })
      t.start(); t
    }
    mts.foreach(_.join())
    val mem = (System.nanoTime() - t1) / 1e9
    (cpu, mem)
  }

  /** Standalone probe (dev): `runMain graft.tools.HostCal [threads]` —
    * the same numbers Bench records, without running the suite.
    */
  def main(args: Array[String]): Unit = {
    val threads = args.headOption.map(_.toInt).getOrElse(32)
    val (s, m) = probe(threads)
    val (ms, mm) = probeMem(threads)
    val (mc, mmem) = miniProbe(threads)
    releaseMiniBlock()
    println(f"[hostcal] cpu single $s%.3f s, multi($threads) $m%.3f s; " +
      f"mem single $ms%.3f s, mem multi($threads) $mm%.3f s; " +
      f"mini cpu $mc%.3f s, mini mem $mmem%.3f s")
  }
}
