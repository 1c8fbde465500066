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
  * No allocation, no memory traffic beyond registers — deliberately a
  * pure-CPU yardstick (it does not model GC or memory bandwidth, which
  * is fine: the dominant observed noise source is CPU contention from
  * noisy neighbors, which scales this loop the same way it scales
  * whole-stage-codegen loops).
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
}
