package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Canonical fingerprint of a gate result for pinned-fixture
  * regression checks (the 5 rows-only gates have no DuckDB oracle —
  * engine-specific sketch/eigen/t-CDF/BPE-merge-loop algorithms — so the driver can
  * only count their rows; these fingerprints let the spec suite catch
  * VALUE regressions).
  *
  * Canon: columns sorted by name; doubles rounded to 6 decimals with
  * the +1e-9 half-tie nudge the oracles use (absorbs summation-order
  * jitter across partitionings while pinning 6 significant decimal
  * places); rows joined in the query's own ORDER BY; md5 over the
  * whole text.
  */
object FixturePin {

  /** The pinned sf0.01 fixtures for the five rows-only gates.
    * Computed once by this object's main, verified bit-identical under
    * local[8]/32 and local[3]/7 partitionings (the 6-decimal canon
    * absorbs summation-order jitter). PinnedFixturesSpec asserts them
    * in `sbt test`; Verify and Bench ALSO emit the comparison into
    * their per-round JSON artifacts so value drift is visible to the
    * driver, not just locally.
    */
  val pinSfDir = "/root/testdata/sf0.01"
  val pins: Map[String, (Long, String)] = Map(
    "a17_approx_sketch" -> (5L, "f22b0bd46c2600fc65bd461d0811ff17"),
    "e_ivf_trained" -> (12L, "c8c7a4da42a5d925fead5477af9eb54e"),
    "e_pca_project" -> (500L, "6ee943dcd7628b499c6f99a91e8e1cdf"),
    "j5b_regression_pvalue" -> (1L, "2773f3f97321ecb73e082a1cc2ca390f"),
    "t_bpe_vocab" -> (24L, "a55d0fe191e649d3609cf569fa2bc55c"))

  /** Evaluate every pinned gate at the pin scale factor: gate ->
    * (rows, md5, ok). Queries that fail to run report ok=false with
    * the error in place of the fingerprint (the drift must be VISIBLE
    * in the artifact, never a silent skip). One execution per gate:
    * the row count is the canonical collect's length, not a second
    * count() job.
    */
  def verdicts(spark: SparkSession): Seq[(String, Long, String, Boolean)] =
    pins.toSeq.sortBy(_._1).map { case (gate, (expRows, expMd5)) =>
      try {
        val df = graft.SparkEntry.queries(gate)(spark, pinSfDir)
        val lines = canonicalLines(df)
        val md5 = md5Of(lines.mkString("\n"))
        (gate, lines.length.toLong, md5,
          lines.length.toLong == expRows && md5 == expMd5)
      } catch {
        case e: Throwable => (gate, -1L, s"error: ${e.getMessage}", false)
      }
    }

  def canonical(df: DataFrame): String = canonicalLines(df).mkString("\n")

  private def canonicalLines(df: DataFrame): Array[String] = {
    val cols = df.columns.sorted
    val proj = df.select(cols.map(org.apache.spark.sql.functions.col): _*)
    proj.collect().map { r =>
      cols.indices.map { i =>
        r.get(i) match {
          case null => "null"
          case d: java.lang.Double =>
            if (d.isNaN) "NaN"
            else BigDecimal(d + 1e-9)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).bigDecimal.toPlainString
          case f: java.lang.Float =>
            BigDecimal(f.toDouble + 1e-9)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).bigDecimal.toPlainString
          case a: scala.collection.Seq[_] => a.mkString("[", ";", "]")
          case v => String.valueOf(v)
        }
      }.mkString("|")
    }
  }

  private def md5Of(s: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  def fingerprint(df: DataFrame): String = md5Of(canonical(df))

  /** Dev tool: print the fingerprints to pin.
    * Usage: runMain graft.tools.FixturePin <sfDir> <gate> [gate ...]
    */
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    // env overrides let the pin be checked under DIFFERENT parallelism
    // (the 6-decimal canon must absorb partitioning-order jitter)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("FIXPIN_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("FIXPIN_PARTITIONS", "32").toInt)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.tail.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      println(s"PIN $name rows=${df.count()} md5=${fingerprint(df)}")
    }
    spark.stop()
  }
}
