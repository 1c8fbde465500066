package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {

  /** Deterministic 4-D data with variance concentrated on a known
    * direction u = (3,1,0,0)/√10 (t ∈ −20..20), plus a weaker
    * orthogonal component w = (0,0,1,0) and a constant offset in dim 4.
    */
  private def fixture = {
    import spark.implicits._
    (-20 to 20).flatMap { t =>
      Seq(-1, 1).map { s =>
        val u = Array(3.0, 1.0, 0.0, 0.0).map(_ / math.sqrt(10.0))
        Array(u(0) * t, u(1) * t, 0.5 * t * s, 7.0)
      }
    }.map(Tuple1(_)).toDF("v")
  }

  test("fit recovers the dominant direction, descending variances") {
    val m = Pca.fit(fixture, col("v"), d = 4, k = 3)
    // means: dims 1-3 are symmetric around 0, dim 4 constant 7
    assert(math.abs(m.means(0)) < 1e-9 && math.abs(m.means(2)) < 1e-9)
    assert(math.abs(m.means(3) - 7.0) < 1e-9)
    // first component ≈ u (sign-normalized)
    val u = Array(3.0, 1.0, 0.0, 0.0).map(_ / math.sqrt(10.0))
    val cos = m.components(0).zip(u).map { case (a, b) => a * b }.sum
    assert(math.abs(cos) > 0.9999, s"pc1 misaligned, |cos|=$cos")
    // variances strictly descending, constant dim contributes ~0
    assert(m.variances(0) > m.variances(1))
    assert(m.variances(1) > m.variances(2))
    assert(m.variances(2) < 1e-9 + m.variances(1))
    // orthonormal components
    for (a <- m.components; b <- m.components) {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val expected = if (a eq b) 1.0 else 0.0
      assert(math.abs(dot - expected) < 1e-9)
    }
  }

  test("projection variance matches eigenvalues; k=2 captures the data") {
    import spark.implicits._
    val m = Pca.fit(fixture, col("v"), d = 4, k = 2)
    val pcs = Pca.project(fixture, col("v"), m)
      .select(col("pc")).as[Seq[Double]].collect()
    val n = pcs.length.toDouble
    (0 until 2).foreach { c =>
      val xs = pcs.map(_(c))
      val mean = xs.sum / n
      val v = xs.map(x => (x - mean) * (x - mean)).sum / n
      assert(math.abs(v - m.variances(c)) < 1e-6 * math.max(1.0, m.variances(c)),
        s"pc${c + 1} variance $v vs eigenvalue ${m.variances(c)}")
    }
    // reconstruction from 2 components is exact here (data is rank 2
    // after centering)
    val total = m.variances.sum
    assert(m.variances.take(2).sum > 0.999999 * total)
  }

  test("project is a no-shuffle per-row plan") {
    val m = Pca.fit(fixture, col("v"), d = 4, k = 2)
    val plan = Pca.project(fixture, col("v"), m)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection should not shuffle:\n$plan")
  }
}
