package graft.sim

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Candidate for bounded top-k, ordered by (sim DESC, cid ASC). `aux`
  * carries caller payload through the aggregation (a list id, a
  * quantized-similarity score, a full vector for later re-rank) so the
  * winner rows never need a join-back to recover their columns.
  */
case class TopKCand(sim: Double, cid: Long, aux: Seq[Double])

/** Result wrapper (Product encoder — keeps the output an
  * `array<struct>` that `posexplode` can rank).
  */
case class TopKResult(items: Seq[TopKCand])

/** Bounded per-key top-k as a typed Aggregator — the scale-correct
  * replacement for `row_number().over(Window.partitionBy(key))` on a
  * candidate relation. The window form ships EVERY candidate row to its
  * key's single partition and sorts it there: exchange = all
  * candidates, parallelism = #keys, and a handful of query keys means a
  * handful of busy tasks no matter how many executors exist. This
  * aggregator keeps a ≤2k-element buffer per key in the map-side
  * partial, so the exchange carries at most 2k rows per key per map
  * partition and the reduce side merges k-sized lists — the same
  * fixed-size-partial argument as the HLL/t-digest sketches
  * (SURVEY §2 A17), applied to ranking.
  *
  * Determinism: candidates are totally ordered by (sim DESC, cid ASC)
  * and cid is unique per key, so the result is order-independent —
  * safe for hash-exact oracles.
  */
class TopKAggregator(k: Int)
    extends Aggregator[TopKCand, ArrayBuffer[TopKCand], TopKResult] {
  require(k > 0)

  // TOTAL order (Double.compare, not the IEEE operators): the raw
  // `a.sim > b.sim || (a.sim == b.sim && ...)` form is non-transitive
  // once a NaN enters (NaN compares unequal AND non-greater to
  // everything) — TimSort detects that and throws mid-job on buffers
  // past 32 elements, or silently misplaces rows below that
  private def lt(a: TopKCand, b: TopKCand): Boolean = {
    // + 0.0 canonicalizes -0.0 (Double.compare would order it below
    // +0.0, where SQL ORDER BY — the oracle's ranking — treats them
    // equal and falls to the tie-break)
    val c = java.lang.Double.compare(b.sim + 0.0, a.sim + 0.0) // sim DESC
    c < 0 || (c == 0 && a.cid < b.cid)
  }

  private def truncate(b: ArrayBuffer[TopKCand]): ArrayBuffer[TopKCand] = {
    val s = b.sortWith(lt)
    if (s.length > k) s.takeInPlace(k) else s
  }

  override def zero: ArrayBuffer[TopKCand] = ArrayBuffer.empty

  override def reduce(b: ArrayBuffer[TopKCand], a: TopKCand): ArrayBuffer[TopKCand] = {
    // a NaN similarity is "no similarity" — it must never occupy a
    // top-k slot (under Double.compare NaN orders ABOVE +Inf, so
    // unfiltered NaN candidates would win every ranking)
    if (a.sim.isNaN) return b
    b += a
    // amortized: truncate every k inserts, bounding the buffer at 2k
    if (b.length >= 2 * k) truncate(b) else b
  }

  override def merge(b1: ArrayBuffer[TopKCand], b2: ArrayBuffer[TopKCand]): ArrayBuffer[TopKCand] =
    truncate(b1 ++= b2)

  override def finish(b: ArrayBuffer[TopKCand]): TopKResult =
    TopKResult(truncate(b).toSeq)

  override def bufferEncoder: Encoder[ArrayBuffer[TopKCand]] =
    Encoders.kryo[ArrayBuffer[TopKCand]]

  override def outputEncoder: Encoder[TopKResult] = Encoders.product[TopKResult]
}

object TopK {

  /** Per-key bounded top-k: groups `df` by `key`, ranks candidates by
    * (`sim` DESC, `cid` ASC), returns one row per winner with columns
    * (key, rank, cid, sim, aux) — rank is 1-based and INT, matching the
    * `row_number()` the window form produced. `aux` defaults to an
    * empty array; pass payload columns to carry them through.
    */
  def perKey(df: org.apache.spark.sql.DataFrame, key: Column, k: Int,
             sim: Column, cid: Column,
             aux: Column = array()): org.apache.spark.sql.DataFrame = {
    val agg = udaf(new TopKAggregator(k), Encoders.product[TopKCand])
    df.groupBy(key.as("_tk_key"))
      .agg(agg(sim.cast("double"), cid.cast("long"),
        aux.cast("array<double>")).as("_tk"))
      .select(col("_tk_key"), posexplode(col("_tk.items")).as(Seq("_r0", "_t")))
      .select(col("_tk_key").as("key"),
        (col("_r0") + 1).cast("int").as("rank"),
        col("_t.cid").as("cid"), col("_t.sim").as("sim"),
        col("_t.aux").as("aux"))
  }
}
