package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sim.Similarity

/** Dev tool: measure the embedding near-dup pair scan with a FIXED
  * plane count (the gates' oracle-pinned 4) vs [[Similarity.autoPlanes]]
  * at the current corpus size — the measured form of SCALING.md's
  * bucket-occupancy argument.
  *
  * Usage: runMain graft.tools.NearDupProbe <sfDir> [targetBucket] [mode]
  * mode: "both" (default), "auto" (skip the fixed-4 run — at 100×
  * corpus scale the pinned-plane quadratic runs for tens of minutes,
  * which is the finding, not a measurement worth repeating).
  */
object NearDupProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val target = if (args.length > 1) args(1).toInt else 256
    val mode = if (args.length > 2) args(2) else "both"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
    val n = emb.count()

    def pairsWith(planes: Int): (Long, Double) = {
      val withSig = emb.select(col("vec_id"),
          col("embedding").cast("array<double>").as("v"),
          Similarity.lshSignature(col("embedding"), planes).as("bucket"))
        .withColumn("nrm", Similarity.norm(col("v")))
      val a = withSig.select(col("bucket"), col("vec_id").as("i"),
        col("v").as("vi"), col("nrm").as("ni"))
      val b = withSig.select(col("bucket"), col("vec_id").as("j"),
        col("v").as("vj"), col("nrm").as("nj"))
      val q = a.join(b, "bucket").where(col("i") < col("j"))
        .where(Similarity.dot(col("vi"), col("vj")) / (col("ni") * col("nj")) >= 0.45)
      val t0 = System.nanoTime()
      val cnt = q.count()
      (cnt, (System.nanoTime() - t0) / 1e9)
    }

    val auto = Similarity.autoPlanes(n, target)
    val (cAuto, tAuto) = pairsWith(auto)
    println(f"[neardup] n=$n autoPlanes=$auto: $tAuto%.2f s ($cAuto pairs)")
    if (mode == "both") {
      val (cFixed, tFixed) = pairsWith(4)
      println(f"[neardup] n=$n fixed4: $tFixed%.2f s ($cFixed pairs)")
    }
    spark.stop()
  }
}
