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
    // oracle: the naive one-partition window (pmod key keeps the
    // deliberately-global oracle out of the WindowExec warning so real
    // regressions stay visible in test logs)
    val want = corpus(2000).select(col("doc_id"),
      (row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(pmod(col("doc_id"), lit(1)))
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

  test("all-equal sizes (total tie) still rank as a permutation") {
    // every percentile boundary collapses to the same value → all rows
    // share ONE bucket; correctness must survive (the within-bucket
    // window carries the whole corpus — the documented skew worst-case,
    // hit when e.g. every doc is truncated to the same token budget)
    val df = (1 to 1000).map(i => (i.toLong, 2048L)).toDF("doc_id", "tokens")
    val ranked = BalancedShards.globalRankBySize(df, col("doc_id"), col("tokens"))
    assert(ranked.select("_rank").distinct().count() === 1000)
    assert(ranked.agg(min("_rank"), max("_rank")).head ===
      org.apache.spark.sql.Row(0L, 999L))
    // ties order by id: rank 0 = lowest id
    assert(ranked.where(col("_rank") === 0).head.getAs[Long]("doc_id") === 1L)
    val assigned = BalancedShards.assign(df, col("doc_id"), col("tokens"), 4)
    val tots = assigned.groupBy("shard").agg(sum("tokens").as("t"))
      .collect().map(_.getAs[Long]("t"))
    assert(tots.max === tots.min) // equal sizes → perfectly equal shards
  }

  test("heavy-tailed and few-distinct-size corpora stay exact (property)") {
    val rnd = new scala.util.Random(42)
    Seq(
      (1 to 800).map(i => (i.toLong, (rnd.nextInt(5) + 1) * 512L)), // 5 distinct sizes
      (1 to 500).map(i => (i.toLong, math.abs(rnd.nextGaussian() * 1e6).toLong + 1))
    ).foreach { rows =>
      val df = rows.toDF("doc_id", "tokens").repartition(6)
      val n = rows.length
      val ranked = BalancedShards.globalRankBySize(df, col("doc_id"), col("tokens"))
      assert(ranked.select("_rank").distinct().count() === n.toLong)
      assert(ranked.agg(max("_rank")).head.getLong(0) === (n - 1).toLong)
      val maxDoc = rows.map(_._2).max
      val tots = BalancedShards.assign(df, col("doc_id"), col("tokens"), 7)
        .groupBy("shard").agg(sum("tokens").as("t"))
        .collect().map(_.getAs[Long]("t"))
      assert(tots.length === 7 && tots.max - tots.min <= maxDoc)
    }
  }

  test("write produces one directory per shard and round-trips") {
    val dir = java.nio.file.Files.createTempDirectory("bshards").toString
    BalancedShards.write(corpus(400), col("doc_id"), col("tokens"), 4, dir)
    val back = spark.read.parquet(dir)
    assert(back.count() === 400)
    assert(back.select("shard").distinct().count() === 4)
  }
}
