package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Balanced shard writer: the distributed rank must equal the global
  * window rank exactly, shards must be exhaustive/disjoint, and the
  * serpentine guarantee — per-shard totals within one max-document of
  * each other — must hold on skewed inputs.
  */
class BalancedShardsSpec extends SparkSpec {

  import spark.implicits._

  private def corpus(n: Int) =
    (1 to n).map { i =>
      // heavy-tailed sizes: a few huge docs + a long tail, worst case
      // for count-balanced sharding
      val size = if (i % 97 == 0) 5000L + i else (i * 37 % 211) + 1L
      (i.toLong, size)
    }.toDF("doc_id", "tokens")

  test("globalRankBySize equals the single-partition window rank") {
    val df = corpus(2000).repartition(7)
    val got = BalancedShards.globalRankBySize(df, col("doc_id"), col("tokens"))
      .select(col("doc_id"), col("_rank"))
    val want = corpus(2000).select(col("doc_id"),
      (row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("tokens").desc, col("doc_id"))) - 1).cast("long").as("_rank"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("assign is exhaustive, disjoint, and serpentine-balanced") {
    val n = 8
    val df = corpus(3000)
    val assigned = BalancedShards.assign(df, col("doc_id"), col("tokens"), n)
    assert(assigned.count() === 3000)
    assert(assigned.select("doc_id").distinct().count() === 3000)
    val stats = assigned.groupBy("shard")
      .agg(sum("tokens").as("tot"), count(lit(1)).as("cnt"))
      .collect()
    assert(stats.length === n)
    assert(stats.map(_.getAs[Long]("shard")).sorted.toSeq === (0L until n))
    val tots = stats.map(_.getAs[Long]("tot"))
    val maxDoc = df.agg(max("tokens")).head.getLong(0)
    assert(tots.max - tots.min <= maxDoc,
      s"imbalance ${tots.max - tots.min} exceeds one max-doc bound $maxDoc")
  }

  test("assignment is deterministic across partitionings") {
    val a = BalancedShards.assign(corpus(1500).repartition(3),
      col("doc_id"), col("tokens"), 5).select("doc_id", "shard")
    val b = BalancedShards.assign(corpus(1500).repartition(11),
      col("doc_id"), col("tokens"), 5).select("doc_id", "shard")
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }

  test("write produces one directory per shard and round-trips") {
    val dir = java.nio.file.Files.createTempDirectory("bshards").toString
    BalancedShards.write(corpus(400), col("doc_id"), col("tokens"), 4, dir)
    val back = spark.read.parquet(dir)
    assert(back.count() === 400)
    assert(back.select("shard").distinct().count() === 4)
  }
}
