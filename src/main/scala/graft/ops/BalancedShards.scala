package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Size-balanced output sharding — the writer stage of a training-data
  * pipeline: split a corpus into `n` shards whose TOKEN totals are
  * near-equal (so every downstream reader/trainer gets the same amount
  * of work), not merely equal row counts.
  *
  * Algorithm: serpentine (boustrophedon) assignment over the docs in
  * (tokens DESC, id ASC) order — block b of n consecutive docs deals
  * shard b%2==0 ? pos : n-1-pos. Each block contributes one doc per
  * shard and alternating direction cancels the within-block slope, so
  * the final imbalance is bounded by a single document's token count —
  * the same guarantee greedy LPT gives, but deterministic and fully
  * expressible as rank arithmetic (no sequential bin state).
  *
  * Scale shape: the only global structure needed is the RANK, and that
  * is computed without a single-partition window (the repo's
  * ntile→percentile-boundary lesson, SCALING.md): bucket every row by
  * comparing its OWN size against a broadcast percentile-boundary
  * array, rank WITHIN each bucket (hash exchange on bucket — parallel),
  * then add per-bucket prefix offsets from a ≤nb-row aggregate. Bucket
  * identity is a pure function of the row's VALUES and a pinned
  * boundary row — NOT of `spark_partition_id()`: a first cut joined
  * local ranks to per-partition counts on the physical partition id,
  * and at the 100× probe the two independent evaluations of that range
  * exchange disagreed (AQE coalescing / boundary re-sampling), so the
  * inner join silently dropped 24% of the corpus. Partition ids are
  * plan artifacts; only value-derived keys are join-safe across
  * subtrees. Boundaries only steer balance, never correctness — the
  * rank is exact for ANY boundary placement because ties on size stay
  * in one bucket and the within-bucket sort is total (id tiebreak).
  *
  * Skew limit: ties on `size` cannot split across buckets, so a corpus
  * dominated by one size value (every doc truncated to the same token
  * budget) degrades that bucket's rank window toward a single
  * partition — still exact (spec-pinned), but serial. If that is the
  * expected shape, rank on a pre-jittered size key
  * (`size * 4096 + pmod(xxhash64(id), 4096)`) and accept hash order
  * among equals — serpentine balance only needs SOME deterministic
  * total order, not id order specifically.
  */
object BalancedShards {

  /** Global 0-based rank by (`size` DESC, `id` ASC) without a
    * single-partition window. Adds column `_rank`; keeps input columns.
    * `size` must be non-null; ranks are exact (a permutation of
    * 0..n-1) regardless of the approximate boundary placement.
    */
  def globalRankBySize(df: DataFrame, id: Column, size: Column): DataFrame = {
    val nb = df.sparkSession.conf.getOption("spark.sql.shuffle.partitions")
      .map(_.toInt).getOrElse(32).max(1)
    val keyed = df.withColumn("_bs_size", size.cast("double"))
      .withColumn("_bs_id", id)
    val bucketed =
      if (nb < 2) keyed.withColumn("_bkt", lit(0))
      else {
        // ONE approx-percentile sketch row (mergeable partials — no
        // global value collection), pinned by Lineage.truncate so every
        // consumer subtree sees byte-identical boundaries
        val qs = array((1 until nb).map(i => lit(i.toDouble / nb)): _*)
        val bounds = graft.core.Lineage.truncate(keyed
          .agg(percentile_approx(col("_bs_size"), qs, lit(10000)).as("_bs_bounds")),
          eager = true)
        keyed.crossJoin(broadcast(bounds))
          .withColumn("_bkt", aggregate(col("_bs_bounds"), lit(0),
            (acc, b) => acc + when(b < col("_bs_size"), 1).otherwise(0)))
          .drop("_bs_bounds")
      }
    // per-bucket counts → prefix offsets in DESC bucket order (higher
    // bucket = larger sizes = earlier rank): a ≤nb-row frame, windowed
    // on one tiny partition by construction, then broadcast
    // (the constant _bkt*0 partition key — non-foldable, so it
    // survives the optimizer — silences the benign unpartitioned-
    // window warning this ≤nb-row frame would otherwise emit)
    val offsets = bucketed.groupBy(col("_bkt")).agg(count(lit(1)).as("_n"))
      .withColumn("_off",
        coalesce(sum(col("_n")).over(
          Window.partitionBy(pmod(col("_bkt"), lit(1))).orderBy(col("_bkt").desc)
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_bkt"), col("_off"))
    val local = Window.partitionBy(col("_bkt"))
      .orderBy(col("_bs_size").desc, col("_bs_id").asc)
    bucketed
      .withColumn("_local", row_number().over(local).cast("long"))
      .join(broadcast(offsets), Seq("_bkt"))
      .withColumn("_rank", col("_off") + col("_local") - 1)
      .drop("_bkt", "_off", "_local", "_bs_size", "_bs_id")
  }

  /** Assign each row a `shard` in [0, n) balancing the total of `size`
    * per shard (serpentine over the global size-descending rank).
    */
  def assign(df: DataFrame, id: Column, size: Column, n: Int): DataFrame = {
    require(n > 0)
    val ranked = globalRankBySize(df, id, size)
    val block = col("_rank").divide(n).cast("long")
    val pos = pmod(col("_rank"), lit(n)).cast("long")
    ranked
      .withColumn("shard",
        when(pmod(block, lit(2)) === 0, pos).otherwise(lit(n - 1) - pos))
      .drop("_rank")
  }

  /** Write the corpus as `n` token-balanced parquet shard directories
    * (shard=K/). One output exchange, hash-clustered on the assigned
    * shard; file count per shard is the caller's partition math.
    */
  def write(df: DataFrame, id: Column, size: Column, n: Int, path: String): Unit =
    assign(df, id, size, n)
      .repartition(n, col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
}
