package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** The bench harness's rep-spread self-check: flags exactly the
  * contention signature (large relative spread on a gate big enough
  * to measure), never sub-noise wobble.
  */
class BenchSpec extends AnyFunSuite {

  test("needsRerun flags >3x spread above the noise floor only") {
    // the r11 signature: one rep contention-hit 9x
    assert(graft.Bench.needsRerun(Seq(1.17, 10.59)))
    assert(graft.Bench.needsRerun(Seq(10.59, 1.17))) // order-free
    // steady gates never flag
    assert(!graft.Bench.needsRerun(Seq(1.0, 1.1)))
    assert(!graft.Bench.needsRerun(Seq(2.6, 2.5, 2.7)))
    // sub-noise gates never flag even at big ratios (0.01 vs 0.04 is
    // scheduler wobble, not contention)
    assert(!graft.Bench.needsRerun(Seq(0.01, 0.04)))
    assert(!graft.Bench.needsRerun(Seq(0.05, 0.19)))
    // boundary: the floor is on the SLOWEST rep
    assert(graft.Bench.needsRerun(Seq(0.05, 0.21)))
    // a single rep has no spread to judge
    assert(!graft.Bench.needsRerun(Seq(5.0)))
    assert(!graft.Bench.needsRerun(Nil))
  }

  test("repClean: a rep is clean only when BOTH probe axes are within " +
    "2x the run reference quartile") {
    assert(graft.Bench.repClean(0.10, 0.05, 0.10, 0.05))
    assert(graft.Bench.repClean(0.19, 0.09, 0.10, 0.05)) // under 2x both
    assert(!graft.Bench.repClean(0.21, 0.05, 0.10, 0.05)) // cpu elevated
    assert(!graft.Bench.repClean(0.10, 0.11, 0.10, 0.05)) // mem elevated
    assert(!graft.Bench.repClean(0.30, 0.20, 0.10, 0.05)) // both
  }

  test("needsProbeRerun flags the r12 a12b signature: both reps " +
    "probe-elevated with spread under 3x") {
    val medCpu = 0.10
    val medMem = 0.05
    // the adjudicated gap: reps 4.99/12.5 s (spread 2.5x — no spread
    // rerun), probes 0.19/0.39 s vs ~0.1 s nominal → both reps dirty
    assert(graft.Bench.needsProbeRerun(Seq(4.99, 12.5),
      Seq((0.25, 0.05), (0.39, 0.06)), medCpu, medMem))
    // one clean rep ⇒ the min can be trusted, no rerun
    assert(!graft.Bench.needsProbeRerun(Seq(4.99, 12.5),
      Seq((0.10, 0.05), (0.39, 0.06)), medCpu, medMem))
    // mem-axis-only contention counts too (r11: DRAM degradation with
    // a nominal CPU probe)
    assert(graft.Bench.needsProbeRerun(Seq(1.0, 1.3),
      Seq((0.10, 0.20), (0.11, 0.22)), medCpu, medMem))
    // r14: tight-agreement reps never earn a probe rerun — a third
    // execution cannot improve a min the reps already agree on, and
    // all-probes-elevated with agreeing reps is the self-load
    // signature (heavy gate's own GC tail), not a burst that a rerun
    // would dodge. 45/128 gates flagged this way in the r13 closing
    // window. (The contended marker still lands independently.)
    assert(!graft.Bench.needsProbeRerun(Seq(4.99, 5.20),
      Seq((0.25, 0.05), (0.39, 0.06)), medCpu, medMem))
    assert(!graft.Bench.needsProbeRerun(Seq(1.0, 1.2),
      Seq((0.10, 0.20), (0.11, 0.22)), medCpu, medMem))
    // sub-noise committed min never earns a rerun
    assert(!graft.Bench.needsProbeRerun(Seq(0.05, 0.08),
      Seq((0.39, 0.20), (0.39, 0.22)), medCpu, medMem))
    // devProbe runs (zero probes / zero reference quartiles) never flag
    assert(!graft.Bench.needsProbeRerun(Seq(4.99, 12.5),
      Seq((0.0, 0.0), (0.0, 0.0)), 0.0, 0.0))
    assert(!graft.Bench.needsProbeRerun(Nil, Nil, medCpu, medMem))
    // a REPS=1 run has no spread to consult: a single elevated rep
    // still earns the rerun (the only chance at a clean min), a single
    // clean rep doesn't
    assert(graft.Bench.needsProbeRerun(Seq(4.99),
      Seq((0.25, 0.05)), medCpu, medMem))
    assert(!graft.Bench.needsProbeRerun(Seq(4.99),
      Seq((0.10, 0.05)), medCpu, medMem))
  }
}
