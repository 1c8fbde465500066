package graft.queries

import graft.SparkSpec

/** Error-bound tests for the approximate-sketch scale path
  * (a17_approx_sketch): the driver gate for this query is rows-only
  * (sketch algorithms are engine-specific), so the accuracy contract
  * lives here — HLL++ within its standard-error envelope and t-digest
  * median within a tight relative band of the exact value.
  */
class SketchSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("approx_count_distinct tracks exact distinct within 5%") {
    val rows = AggQueries.queries("a17_approx_sketch")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_users").toDouble
      val approx = r.getAs[Long]("approx_users").toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"${r.getAs[String]("event_type")}: exact=$exact approx=$approx")
    }
  }

  test("approx median tracks exact median within 1%") {
    val rows = AggQueries.queries("a17_approx_sketch")(spark, dir).collect()
    rows.foreach { r =>
      val exact = r.getAs[Double]("exact_p50")
      val approx = r.getAs[Double]("approx_p50")
      assert(math.abs(approx - exact) / math.max(math.abs(exact), 1e-9) <= 0.01,
        s"${r.getAs[String]("event_type")}: exact=$exact approx=$approx")
    }
  }
}
