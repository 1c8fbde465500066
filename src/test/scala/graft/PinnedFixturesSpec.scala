package graft

import graft.tools.FixturePin

/** Value-level regression pins for the four gates the driver can only
  * row-count (`no_oracle` in CORRECTNESS: engine-specific HLL/t-digest,
  * Lloyd's k-means, eigen decomposition, t-CDF — no DuckDB-expressible
  * oracle). Fingerprints were computed once at sf0.01 (FixturePin main)
  * and verified bit-identical under local[8]/32 and local[3]/7
  * partitionings — the 6-decimal canon absorbs summation-order jitter.
  * Any algorithm change that shifts VALUES (not just row counts) now
  * fails here.
  */
class PinnedFixturesSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"

  private val pins = Map(
    "a17_approx_sketch" -> (5L, "f22b0bd46c2600fc65bd461d0811ff17"),
    "e_ivf_trained" -> (12L, "c8c7a4da42a5d925fead5477af9eb54e"),
    "e_pca_project" -> (500L, "6ee943dcd7628b499c6f99a91e8e1cdf"),
    "j5b_regression_pvalue" -> (1L, "2773f3f97321ecb73e082a1cc2ca390f"))

  pins.foreach { case (gate, (rows, md5)) =>
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
