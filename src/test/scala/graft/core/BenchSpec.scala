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
}
