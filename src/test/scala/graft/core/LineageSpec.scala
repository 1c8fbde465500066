package graft.core

import graft.SparkSpec

/** [[Lineage.truncate]] must pick the checkpoint form by deployment:
  * reliable (survives executor loss) when a checkpoint dir is
  * configured, local otherwise — and preserve the data either way.
  */
class LineageSpec extends SparkSpec {
  import spark.implicits._

  /** The shared test SparkContext has no public "unset checkpoint dir";
    * restore the private var through its generated setter so this spec
    * leaves no global state behind for parallel suites.
    */
  private def setCheckpointDirRaw(v: Option[String]): Unit = {
    val sc = spark.sparkContext
    val m = sc.getClass.getMethods
      .find(_.getName == "checkpointDir_$eq")
      .getOrElse(fail("SparkContext.checkpointDir_$eq not found"))
    m.invoke(sc, v)
    ()
  }

  test("no checkpoint dir: local path, rows preserved, lineage cut") {
    // force the known base state rather than asserting it: suites run
    // sequentially today, but another spec setting a dir must not make
    // this one flaky (the session is shared global state)
    setCheckpointDirRaw(None)
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s")
      .where($"id" > 1)
    val out = Lineage.truncate(df)
    assert(out.collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
    // truncated: the physical plan no longer contains the parent scan
    assert(out.queryExecution.optimizedPlan.collectLeaves()
      .forall(_.getClass.getSimpleName.contains("LogicalRDD")))
  }

  test("checkpoint dir set: reliable path writes checkpoint files") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toFile
    setCheckpointDirRaw(None) // known base state
    spark.sparkContext.setCheckpointDir(dir.getAbsolutePath)
    try {
      val df = Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v")
      val out = Lineage.truncate(df)
      assert(out.as[(Long, Double)].collect().sorted.toSeq ==
        Seq((1L, 10.0), (2L, 20.0)))
      // the reliable form must have materialized files under the dir
      def files(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(files) else Seq(f)
      assert(files(dir).nonEmpty,
        "reliable checkpoint wrote nothing under the checkpoint dir")
      // lazy form: nothing materializes until the first action
      val lazyDf = Lineage.truncate(
        Seq((9L, 1.0)).toDF("id", "v"), eager = false)
      assert(lazyDf.count() == 1L)
    } finally {
      setCheckpointDirRaw(None)
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(dir)
    }
  }
}
