package graft

import graft.tools.FixturePin

/** Value-level regression pins for the gates the driver can only
  * row-count (`no_oracle` in CORRECTNESS: engine-specific HLL/t-digest,
  * Lloyd's k-means, eigen decomposition, t-CDF, the BPE merge loop — no DuckDB-expressible
  * oracle). Fingerprints were computed once at sf0.01 (FixturePin main)
  * and verified bit-identical under local[8]/32 and local[3]/7
  * partitionings — the 6-decimal canon absorbs summation-order jitter.
  * Any algorithm change that shifts VALUES (not just row counts) now
  * fails here.
  */
class PinnedFixturesSpec extends SparkSpec {

  private val sfDir = FixturePin.pinSfDir

  FixturePin.pins.foreach { case (gate, (rows, md5)) =>
    test(s"$gate matches its pinned sf0.01 fixture") {
      assume(new java.io.File(sfDir).isDirectory, s"$sfDir not present")
      val df = SparkEntry.queries(gate)(spark, sfDir)
      assert(df.count() === rows)
      assert(FixturePin.fingerprint(df) === md5,
        s"$gate values drifted from the pinned fixture — if the change " +
          "is intentional, re-pin with: runMain graft.tools.FixturePin " +
          s"$sfDir $gate")
    }
  }
}
