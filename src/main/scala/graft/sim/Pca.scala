package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Principal-component analysis over an embedding column — the
  * dimension-reduction step of a large-scale vector pipeline
  * (visualization, whitening, cheap pre-filtering before exact
  * similarity).
  *
  * Scale shape: the only distributed work is (1) a d-sized mean vector
  * and (2) the d(d+1)/2 covariance entries, both computed as row-local
  * algebra hash-aggregated into fixed-size group sets (see
  * `e_embed_covariance` — no self-join, no n·d shuffle). The d×d
  * eigendecomposition happens on the driver (Breeze `eigSym`; d is
  * model-sized, not data-sized) and the resulting projection matrix
  * ships back as a broadcast-sized literal. Projection itself is a
  * per-row dot-product fan-out — embarrassingly parallel, no shuffle.
  */
object Pca {

  /** Fitted model: per-dimension means, principal components as
    * column-major rows (components(c)(i) = loading of input dim i on
    * component c), and the matching eigenvalues (variances), largest
    * first.
    */
  final case class Model(means: Array[Double],
                         components: Array[Array[Double]],
                         variances: Array[Double])

  /** Dimension means + the d×d covariance, computed distributed (the
    * same row-local centered-outer-product + fixed-size hash-aggregate
    * algebra the oracled `e_embed_covariance` gate verifies) and
    * collected driver-side — both are model-sized. Shared by [[fit]]
    * and the `e_pca_eigen_check` property gate so the eigen properties
    * are checked against the exact covariance the fit decomposed.
    */
  private[graft] def meansAndCov(df: DataFrame, vec: Column, d: Int)
      : (Array[Double], breeze.linalg.DenseMatrix[Double]) = {
    val v = vec.cast("array<double>")
    val ex = df.select(posexplode(slice(v, 1, d)).as(Seq("i0", "x")))
    val means = ex.groupBy(col("i0")).agg(avg(col("x")).as("m"))
      .orderBy("i0").collect().map(_.getDouble(1))
    require(means.length == d, s"expected $d dims, saw ${means.length}")
    val meansLit = array(means.map(lit): _*)
    // row-local centered outer product (upper triangle), fixed-size agg
    // (r14: native UpperTriProductsExpr — identical per-pair doubles
    // and the same downstream aggregate; the interpreted nested
    // transform it replaces measured ~11 s of task time at sf0.1)
    val pairs = df.select(v.as("v"))
      .select(explode(graft.functions.VectorExpressions
        .upperTri(col("v"), meansLit, d)).as("p"))
      .groupBy(col("p.i").as("i"), col("p.j").as("j"))
      .agg(avg(col("p.xy")).as("cov"))
      .collect()
    val cov = breeze.linalg.DenseMatrix.zeros[Double](d, d)
    pairs.foreach { r =>
      val (i, j, c) = (r.getInt(0) - 1, r.getInt(1) - 1, r.getDouble(2))
      cov(i, j) = c
      cov(j, i) = c
    }
    (means, cov)
  }

  /** Dimension means + upper-triangle covariance, then a driver-side
    * symmetric eigendecomposition. `vec` must be an array column with
    * at least `d` entries per row.
    */
  def fit(df: DataFrame, vec: Column, d: Int, k: Int): Model = {
    require(k >= 1 && k <= d, s"k must be in [1, $d]")
    val (means, cov) = meansAndCov(df, vec, d)
    fitFromMoments(means, cov, k)
  }

  /** The driver-side eigen step alone, from precomputed moments —
    * split out so the eigen property gate decomposes the SAME
    * covariance it verifies the model against (fit ≡
    * fitFromMoments ∘ meansAndCov).
    */
  private[graft] def fitFromMoments(means: Array[Double],
                                    cov: breeze.linalg.DenseMatrix[Double],
                                    k: Int): Model = {
    val d = means.length
    val eig = breeze.linalg.eigSym(cov)
    // eigSym returns ascending eigenvalues; take the top k, and fix the
    // sign convention (largest-|loading| entry positive) so the model
    // is deterministic up to covariance round-off
    val order = (0 until d).sortBy(i => -eig.eigenvalues(i)).take(k)
    val comps = order.map { c =>
      val raw = (0 until d).map(i => eig.eigenvectors(i, c)).toArray
      val pivot = raw.maxBy(math.abs)
      if (pivot < 0) raw.map(-_) else raw
    }.toArray
    Model(means, comps, order.map(eig.eigenvalues(_)).toArray)
  }

  /** Project `vec` onto the model's components: output column
    * `pc` = array(k) of scores. Pure per-row codegen'd arithmetic —
    * the d·k multiply-adds are unrolled Column expressions, not
    * interpreted lambdas, because projection sits on the hot path of
    * every downstream query.
    */
  def project(df: DataFrame, vec: Column, model: Model): DataFrame = {
    val v = vec.cast("array<double>")
    val scores = model.components.map { w =>
      w.zipWithIndex.map { case (wi, i) =>
        (element_at(v, i + 1) - model.means(i)) * wi
      }.reduce(_ + _)
    }
    df.withColumn("pc", array(scores: _*))
  }
}
