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

  private lazy val approxRows =
    AggQueries.queries("a17_approx_sketch")(spark, dir).collect()

  private lazy val exactRows = {
    import org.apache.spark.sql.functions._
    graft.Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"),
        percentile(col("value"), lit(0.5)).as("exact_p50"))
      .collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("exact_users").toDouble, r.getAs[Double]("exact_p50")))
      .toMap
  }

  test("approx_count_distinct tracks exact distinct within 5%") {
    assert(approxRows.nonEmpty)
    approxRows.foreach { r =>
      val ty = r.getAs[String]("event_type")
      val exact = exactRows(ty)._1
      val approx = r.getAs[Long]("approx_users").toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"$ty: exact=$exact approx=$approx")
    }
  }

  test("approx median tracks exact median within 1%") {
    approxRows.foreach { r =>
      val ty = r.getAs[String]("event_type")
      val exact = exactRows(ty)._2
      val approx = r.getAs[Double]("approx_p50")
      assert(math.abs(approx - exact) / math.max(math.abs(exact), 1e-9) <= 0.01,
        s"$ty: exact=$exact approx=$approx")
    }
  }

  test("split sketch aggregation preserves NULL group keys (the r14 " +
    "inner-join shape silently dropped them; r15's <=> join must not)") {
    import org.apache.spark.sql.functions._
    import scala.jdk.CollectionConverters._
    // corpus with a NULL key group: the fused single-.agg reference
    // emits a row for the null group; the split forms must too
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "event_type STRING, user_id LONG, value DOUBLE")
    val rows = (1 to 50).flatMap { i =>
      Seq(
        org.apache.spark.sql.Row("a", (i % 7).toLong, i.toDouble),
        org.apache.spark.sql.Row(null, (i % 5).toLong, i * 2.0))
    }
    val ev = spark.createDataFrame(rows.asJava, schema)
    // fused reference: one .agg (the pre-r14 shape — correct on null
    // keys, just slow at scale)
    val fused = ev.groupBy(col("event_type")).agg(
        countDistinct(col("user_id")).as("n_users"),
        approx_count_distinct(col("user_id")).as("hll"),
        percentile_approx(col("value"), lit(0.5), lit(10000)).as("p50a"),
        expr("percentile(value, 0.45)").as("p45"),
        expr("percentile(value, 0.55)").as("p55"))
      .select(col("event_type"), col("n_users"),
        (abs(col("hll") - col("n_users"))
          <= col("n_users") * lit(0.25)).as("hll_ok"),
        (col("p50a") >= col("p45") && col("p50a") <= col("p55")).as("p50_ok"))
      .orderBy("event_type").collect()
    // split form: the a17b production shape (three codegen-separated
    // branches, both re-joins null-safe) applied to the same corpus
    val dExact = ev.groupBy(col("event_type")).agg(
      countDistinct(col("user_id")).as("n_users"))
    val dHll = ev.groupBy(col("event_type").as("__et")).agg(
      approx_count_distinct(col("user_id")).as("hll"))
    val dJ = dExact.join(dHll, col("event_type") <=> col("__et")).drop("__et")
    val pAgg = ev.groupBy(col("event_type").as("__et2")).agg(
      percentile_approx(col("value"), lit(0.5), lit(10000)).as("p50a"),
      expr("percentile(value, 0.45)").as("p45"),
      expr("percentile(value, 0.55)").as("p55"))
    val split = dJ.join(pAgg, col("event_type") <=> col("__et2"))
      .drop("__et2")
      .select(col("event_type"), col("n_users"),
        (abs(col("hll") - col("n_users"))
          <= col("n_users") * lit(0.25)).as("hll_ok"),
        (col("p50a") >= col("p45") && col("p50a") <= col("p55")).as("p50_ok"))
      .orderBy("event_type").collect()
    assert(fused.length === 2, "corpus must form a null group + 'a'")
    assert(split.toSeq === fused.toSeq,
      "split+null-safe-join shape must emit exactly the fused rows, " +
        "including the NULL-keyed group")
  }

  test("rollingDauHll (the w13 extreme-scale drop-in) tracks the exact " +
    "7-day rolling distinct within HLL's error envelope on every day") {
    val exact = SeriesQueries.queries("w13_rolling_dau")(spark, dir)
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[String]("day")) ->
        r.getAs[Long]("wau7").toDouble)
      .toMap
    val approx = SeriesQueries
      .rollingDauHll(graft.Tables.events(spark, dir))
      .collect()
    // same frame: one row per (event_type, active day)
    assert(approx.length === exact.size)
    approx.foreach { r =>
      val key = (r.getAs[String]("event_type"), r.getAs[String]("day"))
      val est = r.getAs[Long]("wau7_est").toDouble
      val ex = exact(key)
      // lgK=14 → rse ≈ 0.81%; 4σ ≈ 3.3% leaves slack for small windows
      assert(math.abs(est - ex) / ex <= 0.033,
        s"$key: exact=$ex est=$est")
    }
  }
}
