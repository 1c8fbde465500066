package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.HostCal

/** The calibration probe is only a valid cross-round yardstick if its
  * work is deterministic (same iters+seed ⇒ same mixing result, so a
  * JIT can never strength-reduce differently round to round) and its
  * fixed-work constant never drifts.
  */
class HostCalSpec extends AnyFunSuite {

  test("work() is deterministic and seed/iters-sensitive") {
    val a = HostCal.work(100000L, 42L)
    val b = HostCal.work(100000L, 42L)
    val c = HostCal.work(100000L, 43L)
    val d = HostCal.work(100001L, 42L)
    assert(a === b)
    assert(a !== c)
    assert(a !== d)
  }

  test("the fixed-work constant is pinned (comparability contract)") {
    // Changing this constant silently breaks probe-unit comparability
    // across rounds; a deliberate change must update this pin AND be
    // called out in SCALING.md.
    assert(HostCal.ItersPerThread === 400L * 1000 * 1000)
  }

  test("probe returns positive times with multi bounded by work") {
    val (single, multi) = HostCal.probe(threads = 2, reps = 1)
    assert(single > 0.0)
    assert(multi > 0.0)
    // 2 threads of fixed work can never beat half a perfectly-scaled
    // single thread; catches a probe that forgot to join its workers
    assert(multi > single / 4)
  }

  test("memWork() is deterministic, seed/passes-sensitive, and pinned") {
    try {
      val a = HostCal.memWork(2, 3L)
      val b = HostCal.memWork(2, 3L)
      val c = HostCal.memWork(2, 4L)
      val d = HostCal.memWork(3, 3L)
      assert(a === b)
      assert(a !== c)
      assert(a !== d)
      // a rotated start visits the same lanes once each (wrap-around),
      // so the XOR result — and the WORK — is offset-independent: the
      // multi-thread probe's disjoint per-thread phases change memory
      // access interleaving, never the computation
      assert(HostCal.memWork(2, 3L, startLong = 12345 * 8) === a)
      // the memory probe's comparability contract: block size and
      // per-thread sweep count never drift (traffic = passes × 256 MB)
      assert(HostCal.MemLongs === 32 * 1024 * 1024)
      assert(HostCal.MemPassesPerThread === 24)
    } finally HostCal.releaseMemBlock()
  }

  test("probeMem returns positive times with multi bounded by work") {
    val (single, multi) = HostCal.probeMem(threads = 2, reps = 1)
    assert(single > 0.0)
    assert(multi > 0.0)
    assert(multi > single / 4)
  }

  test("mini-probe constants are pinned and miniMemWork is deterministic") {
    try {
      assert(HostCal.MiniItersPerThread === HostCal.ItersPerThread / 16)
      assert(HostCal.MiniMemLongs === 16 * 1024 * 1024)
      assert(HostCal.MiniMemPassesPerThread === 1)
      val a = HostCal.miniMemWork(2, 3L)
      assert(HostCal.miniMemWork(2, 3L) === a)
      assert(HostCal.miniMemWork(2, 4L) !== a)
      // offset-independence (same wrap-around sweep as the big probe)
      assert(HostCal.miniMemWork(2, 3L, startLong = 999 * 8) === a)
    } finally HostCal.releaseMiniBlock()
  }

  test("SYNTHETIC CONTENTION: the ride-along mini-probe attributes a " +
    "host burst (reads elevated under load, nominal without)") {
    // The r11 failure mode: a mid-window burst hit gate times while
    // the bracketing probes read nominal. This drives the fix
    // end-to-end — a deliberate CPU storm while the mini-probe runs
    // must show up IN the probe value, because that elevation is
    // exactly what separates "host noise" from "code regression" in
    // BENCH_FULL.json's per-gate context.
    val probeThreads = 4
    def minCpu(n: Int): Double =
      (1 to n).map(_ => HostCal.miniProbe(probeThreads)._1).min
    try {
      minCpu(1) // JIT/warm
      val soloBefore = minCpu(3)
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val nBurn = 2 * Runtime.getRuntime.availableProcessors
      val burnChunk = 5L * 1000 * 1000
      // per-burner chunk counters: the storm is only a storm if the
      // burners actually got CPU — on a cgroup-quota'd or heavily
      // shared box the scheduler can starve 2×nproc background
      // threads relative to the probe, and then the 1.3× assertion
      // fails with no defect behind it. Counting chunks makes that
      // under-scheduling measurable (see the assume below).
      val burned = new java.util.concurrent.atomic.AtomicLongArray(nBurn)
      // 2× oversubscription: enough runnable burners that the probe's
      // threads measurably time-share even if other suites add load
      val burners = (0 until nBurn).map { i =>
        val t = new Thread(() => {
          var acc = 0L
          while (!stop.get()) {
            acc ^= HostCal.work(burnChunk, i.toLong)
            burned.incrementAndGet(i)
          }
          if (acc == 42L) println("") // consume
        })
        t.setDaemon(true); t.start(); t
      }
      val stormT0 = System.nanoTime()
      val contended =
        try {
          Thread.sleep(100) // let the storm reach steady state
          minCpu(3)
        } finally {
          stop.set(true)
          burners.foreach(_.join(2000))
        }
      val stormSecs = (System.nanoTime() - stormT0) / 1e9
      val burnedIters =
        (0 until nBurn).map(burned.get).sum * burnChunk
      // solo = min over samples BOTH before and after the storm: if
      // external host load happened to elevate the pre-storm window,
      // the post-storm samples give the quiet baseline a second chance
      // (min over 6 wall-clock samples on an otherwise-quiet host),
      // keeping the 1.3x assertion from flaking on shared hardware
      val solo = math.min(soloBefore, minCpu(3))
      // if the HOST is already saturated through both solo windows
      // (external load this test can't control), the storm can't add
      // its 30% and the assertion would fail with no defect behind it
      // — cancel instead of fail (assume), keeping the test meaningful
      // exactly when its baseline is measurable
      assume(solo < 0.5,
        f"host already saturated (solo baseline $solo%.4f s) — " +
          "contention attribution not measurable in this environment")
      // second measurability gate: the burners must have consumed at
      // least HALF their fair share of the machine over the storm
      // window. Fair share under round-robin = nproc × 2n/(2n+probe)
      // cores (2n burner threads sharing with up to probeThreads probe
      // threads) — demanding a fixed `probeThreads` cores' worth would
      // silently cancel on ≤4-core hosts where fair share is under 3
      // cores yet the storm genuinely contends. Per-core rate is
      // estimated from the solo probe itself (probeThreads threads did
      // probeThreads×MiniIters in `solo` seconds ⇒ one core ≈
      // MiniIters/solo iters/s). Under-scheduled burners — CPU quota —
      // land far below half fair share and cancel rather than fail.
      val perCoreRate = HostCal.MiniItersPerThread / solo
      val nproc = Runtime.getRuntime.availableProcessors
      val fairShareCores =
        nproc.toDouble * (2.0 * nproc) / (2.0 * nproc + probeThreads)
      val wantIters = (perCoreRate * fairShareCores * 0.5 * stormSecs).toLong
      assume(burnedIters >= wantIters,
        f"burners under-scheduled (${burnedIters / 1e9}%.1fG iters over " +
          f"$stormSecs%.2f s, wanted ≥ ${wantIters / 1e9}%.1fG = half of " +
          f"$fairShareCores%.1f fair-share cores) — " +
          "contention storm not achievable in this environment")
      assert(contended > solo * 1.3,
        f"mini-probe blind to contention: solo $solo%.4f s vs " +
          f"contended $contended%.4f s")
    } finally HostCal.releaseMiniBlock()
  }
}
