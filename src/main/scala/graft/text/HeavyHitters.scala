package graft.text

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra-Gries heavy hitters as a typed `Aggregator`: a fixed-size
  * mergeable summary (capacity k) whose estimates satisfy
  * `freq − n/k ≤ est ≤ freq` — so NO item with frequency > n/k is ever
  * missing from the summary. That guarantee turns the sketch into an
  * exact operator via the classic two-pass pattern: sketch → candidate
  * set (tiny, broadcastable) → exact recount of candidates only →
  * threshold filter. Pass 1 shuffles k-sized partials instead of the
  * full vocabulary; pass 2 is a broadcast-semi-join count — the shape
  * that works when the vocabulary itself no longer fits anywhere
  * (URLs, n-grams, user-ids at 100 TB).
  *
  * Merge = add counts, then apply the decrement step to the (k+1)-th
  * largest (Agarwal et al., "Mergeable Summaries"): the n/k error
  * bound survives arbitrary merge trees, which is what makes it safe
  * under Spark's nondeterministic partial-aggregation order.
  */
object HeavyHitters {

  final class MisraGries(k: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k >= 1)

    def zero: Map[String, Long] = Map.empty

    def reduce(b: Map[String, Long], w: String): Map[String, Long] =
      b.get(w) match {
        case Some(c) => b.updated(w, c + 1)
        case None if b.size < k => b.updated(w, 1L)
        case None => // decrement all; drop zeros (MG step)
          b.flatMap { case (kw, c) => if (c > 1) Some(kw -> (c - 1)) else None }
      }

    def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val sum = b.foldLeft(a) { case (acc, (w, c)) =>
        acc.updated(w, acc.getOrElse(w, 0L) + c)
      }
      if (sum.size <= k) sum
      else {
        // subtract the (k+1)-th largest count from everything
        val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)(k)
        sum.flatMap { case (w, c) => if (c > cut) Some(w -> (c - cut)) else None }
      }
    }

    def finish(r: Map[String, Long]): Map[String, Long] = r
    def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** Candidate heavy hitters of `item` (summary keys, frequency order
    * not guaranteed). One global aggregate of k-sized partials.
    */
  def candidates(df: DataFrame, item: Column, k: Int): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val ds = df.select(item.cast("string")).as[String]
    ds.select(new MisraGries(k).toColumn.name("summary"))
      .select(explode(map_keys(col("summary"))).as("item"))
  }

  /** Exact heavy hitters: every `item` whose frequency ≥ `minFreq`,
    * with its exact count. Two passes — MG candidates, then an exact
    * recount restricted to the candidate set.
    *
    * Completeness precondition: the MG guarantee is STRICT — the
    * summary retains every item with freq > n/k, so the candidate set
    * is complete only when k > n/minFreq (strictly). At k = n/minFreq
    * an item with frequency exactly minFreq can be evicted. The `n`
    * checked here is `df.count()` at call time; callers filtering the
    * result further (e.g. the t_heavy_hitters gate's 1% threshold:
    * 0.01 > 1/256 makes k=256 sufficient regardless of minFreq) may
    * rely on their own threshold instead and skip the check by passing
    * `requireComplete = false`.
    */
  def exactHeavyHitters(df: DataFrame, item: Column, k: Int,
                        minFreq: Long,
                        requireComplete: Boolean = false): DataFrame = {
    if (requireComplete) {
      val n = df.count()
      require(k.toLong > n / math.max(minFreq, 1L),
        s"exactHeavyHitters: k=$k must exceed n/minFreq=${n / math.max(minFreq, 1L)} " +
          "(strict MG guarantee) for a complete result")
    }
    val cands = candidates(df, item, k)
    df.select(item.cast("string").as("item"))
      .join(broadcast(cands), Seq("item"), "left_semi")
      .groupBy(col("item"))
      .agg(count(lit(1)).as("freq"))
      .where(col("freq") >= minFreq)
  }
}
