package graft.kernels

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class SeriesFiltersSpec extends SparkSpec {

  test("deseasonalize removes the month-of-year cycle exactly") {
    import spark.implicits._
    // 36 monthly values: value = month-number cycle + constant trend 10
    val rows = for (y <- 2000 to 2002; m <- 1 to 12)
      yield (Timestamp.valueOf(f"$y-$m%02d-15 00:00:00"), m.toDouble * 100 + 10)
    val df = rows.toDF("t", "v")
    val out = SeriesFilters.deseasonalize(df, $"t", $"v")
      .select("deseasoned").as[Double].collect()
    // each month's 3 values are identical ⇒ residual 0 everywhere
    assert(out.forall(v => math.abs(v) < 1e-9))
  }

  test("lowPass is mean-preserving-ish and reduces variance") {
    import spark.implicits._
    val rows = (0 until 100).map(i =>
      ("s", i.toLong, if (i % 2 == 0) 10.0 else -10.0)) // alternating signal
    val df = rows.toDF("key", "t", "v")
    val out = SeriesFilters.lowPass(df, Seq("key"), "t", "v", windowSize = 4)
      .select("lowpass").as[Double].collect()
    val varIn = 100.0
    val varOut = {
      val m = out.sum / out.length
      out.map(x => (x - m) * (x - m)).sum / out.length
    }
    assert(varOut < varIn / 10) // high-frequency component attenuated
  }

  test("lowPass keeps a constant series unchanged") {
    import spark.implicits._
    val df = (0 until 20).map(i => ("s", i.toLong, 7.0)).toDF("key", "t", "v")
    val out = SeriesFilters.lowPass(df, Seq("key"), "t", "v", windowSize = 5)
      .select("lowpass").as[Double].collect()
    assert(out.forall(v => math.abs(v - 7.0) < 1e-9))
  }

  test("single-series lowPass accepts a DateType time column") {
    import spark.implicits._
    // the constant partition key must not numeric-cast the time column
    // (date→bigint is an illegal cast since Spark 3.0 — the natural
    // daily-series shape failed analysis)
    val df = (0 until 20)
      .map(i => (java.sql.Date.valueOf(f"2020-01-${i + 1}%02d"), 7.0))
      .toDF("day", "v")
    val out = SeriesFilters.lowPass(df, Nil, "day", "v", windowSize = 3)
      .select("lowpass").as[Double].collect()
    assert(out.length === 20 && out.forall(v => math.abs(v - 7.0) < 1e-9))
  }
}
