package graft.kernels

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` for the reference's area-weighted mean
  * (SURVEY §2.8: per-group numeric kernels as Aggregator[IN,BUF,OUT]).
  * Same algebra as the expression form `sum(v*w)/sum(w)` — the typed
  * API version for Dataset pipelines; register with
  * `spark.udf.register("weighted_mean", udaf(WeightedMeanAggregator))`.
  */
object WeightedMeanAggregator
    extends Aggregator[(Double, Double), (Double, Double), Double] {

  override def zero: (Double, Double) = (0.0, 0.0)

  override def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) = {
    val (v, w) = in
    if (v.isNaN || w.isNaN) b else (b._1 + v * w, b._2 + w)
  }

  override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
    (a._1 + b._1, a._2 + b._2)

  override def finish(r: (Double, Double)): Double =
    if (r._2 == 0.0) Double.NaN else r._1 / r._2

  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
