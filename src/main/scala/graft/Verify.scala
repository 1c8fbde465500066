package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional third arg (local iteration only): regex over query names
    val nameFilter = args.lift(2).map(_.r)
    def keep(name: String): Boolean =
      nameFilter.forall(_.findFirstIn(name).isDefined)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // same measured plan-neutral rule exclusions as the bench session
    val spark = SparkTuning.tuned(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.filter(q => keep(q._1)).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // shared JSON string escaper (graft.tools.Jsons): a tab or CR in
    // builder-authored SQL would otherwise make the driver's
    // json.load fail and silently zero the round's correctness.
    def q(s: String): String = graft.tools.Jsons.quote(s)
    val json = SparkEntry.oracleSql.filter(o => keep(o._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // pinned-fixture verdicts for the rows-only gates (no DuckDB
    // oracle): rows + fingerprint + pass/fail against the sf0.01 pins,
    // so value drift is visible in the round's verify artifacts and
    // not only inside `sbt test`
    if (nameFilter.isEmpty &&
        new java.io.File(graft.tools.FixturePin.pinSfDir).isDirectory) {
      val pj = graft.tools.FixturePin.verdicts(spark)
        .map { case (g, rows, md5, ok) =>
          s"${q(g)}: {\"rows\": $rows, \"md5\": ${q(md5)}, \"ok\": $ok}"
        }.mkString("{", ",", "}")
      Files.writeString(Paths.get(s"$outDir/pinned.json"), pj)
    }
    spark.stop()
  }
}
