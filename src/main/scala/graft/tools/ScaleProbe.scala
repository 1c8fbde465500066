package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: synthesize an N× scaled copy of the sf0.1 testdata (into a
  * scratch dir) by unioning shifted replicas, so operator scaling
  * slopes can be measured beyond the provided scale factors. The
  * replicas shift ids/timestamps so join/dedup cardinalities scale
  * realistically (each replica is a disjoint id space; time shifts by
  * k days so time-banded joins don't degenerate).
  *
  * Usage: runMain graft.tools.ScaleProbe <outDir> [factor]
  * Then:  SPARK_GRAFT_SF_DIR=<outDir> runMain graft.Bench
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/graft_scale10")
    val factor = if (args.length > 1) args(1).toInt else 10
    val src = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // one fixed id offset per replica, shared across tables so FK
    // relationships (lineitem.l_orderkey = orders.o_orderkey) survive
    val IdOffset = 100000000L
    def replicate(name: String, idCols: Seq[String], tsCol: Option[String]): Unit = {
      val base = spark.read.parquet(s"$src/$name.parquet")
      val copies = (0 until factor).map { k =>
        var df = base
        idCols.foreach(c => df = df.withColumn(c, col(c) + lit(k * IdOffset)))
        // +k days, whatever the generator's ts encoding of the round:
        // nanos-as-long (legacy) or a real timestamp type
        tsCol.foreach { c =>
          df = df.schema(c).dataType match {
            case org.apache.spark.sql.types.LongType =>
              df.withColumn(c, col(c) + lit(k * 86400000000000L))
            case _ => df.withColumn(c, expr(s"timestampadd(DAY, $k, $c)"))
          }
        }
        df
      }
      copies.reduce(_ unionByName _).write.mode(SaveMode.Overwrite)
        .parquet(s"$out/$name.parquet")
      println(s"[scale] $name x$factor written")
    }

    replicate("events", Seq("event_id", "user_id"), Some("ts"))
    replicate("documents", Seq("doc_id"), None)
    replicate("lineitem", Seq("l_orderkey"), None)
    replicate("orders", Seq("o_orderkey", "o_custkey"), None)
    replicate("customer", Seq("c_custkey"), None) // keeps orders→customer FK
    // same offset as documents.doc_id keeps the doc↔vec 1:1 join intact
    replicate("embeddings", Seq("vec_id"), None)
    // small dims copied as-is
    Seq("supplier", "part", "nation", "region").foreach { n =>
      spark.read.parquet(s"$src/$n.parquet").write.mode(SaveMode.Overwrite)
        .parquet(s"$out/$n.parquet")
      println(s"[scale] $n copied")
    }
    spark.stop()
  }
}
