package graft.sim

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Input wrapper for [[VecMeanAggregator]] (product encoder ⇒ the udaf
  * takes one `array<double>` column).
  */
case class VecIn(v: Seq[Double])

/** Output wrapper — the mean vector as `struct<mean: array<double>>`. */
case class VecMeanOut(mean: Seq[Double])

/** Element-wise mean of `array<double>` vectors as a typed Aggregator —
  * the centroid-update kernel for distributed Lloyd's (IvfIndex.train).
  *
  * Scale shape: ONE hash aggregation whose partial state is a single
  * d-length double array + count per (group × map partition). The
  * posexplode form it replaces materialized n×d (vector_id, element)
  * rows per iteration and then needed a SECOND groupBy + array_sort to
  * reassemble the mean vector — at 100 TB × d=1024 that is three
  * orders of magnitude more rows through the first aggregate and an
  * extra shuffle per Lloyd's iteration. Here the corpus rows stream
  * through a compiled while-loop accumulate and only nlist×d×partitions
  * partial doubles ever reach the exchange.
  *
  * Determinism: same caveat as any floating-point mean — summation
  * order follows partitioning. Callers that need cross-run stability
  * round their outputs (the IVF gate's 6-decimal canon absorbs the
  * jitter, verified under multiple partitionings in PinnedFixturesSpec).
  */
class VecMeanAggregator
    extends Aggregator[VecIn, (Array[Double], Long), VecMeanOut] {

  override def zero: (Array[Double], Long) = (Array.emptyDoubleArray, 0L)

  override def reduce(b: (Array[Double], Long), in: VecIn): (Array[Double], Long) = {
    val v = in.v
    if (b._2 == 0L) {
      val s = new Array[Double](v.length)
      var i = 0
      while (i < s.length) { s(i) = v(i); i += 1 }
      (s, 1L)
    } else {
      val s = b._1
      require(s.length == v.length, "vector length mismatch in VecMeanAggregator")
      var i = 0
      while (i < s.length) { s(i) += v(i); i += 1 }
      (s, b._2 + 1L)
    }
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) =
    if (a._2 == 0L) b
    else if (b._2 == 0L) a
    else {
      val s = a._1
      // same guard as reduce: partitions can be internally homogeneous
      // yet mutually ragged (one file of d=64 vectors, one of d=128) —
      // without it a shorter `a` would silently ignore b's tail while
      // still summing counts, converging to wrong centroids
      require(s.length == b._1.length,
        "vector length mismatch in VecMeanAggregator merge")
      var i = 0
      while (i < s.length) { s(i) += b._1(i); i += 1 }
      (s, a._2 + b._2)
    }

  override def finish(r: (Array[Double], Long)): VecMeanOut =
    if (r._2 == 0L) VecMeanOut(Seq.empty)
    else VecMeanOut(r._1.map(_ / r._2).toIndexedSeq)

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    Encoders.kryo[(Array[Double], Long)]

  override def outputEncoder: Encoder[VecMeanOut] = Encoders.product[VecMeanOut]
}
