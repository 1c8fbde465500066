package graft.plans

import graft.SparkSpec
import graft.kernels.WeightedMeanAggregator
import graft.ops.Salting
import org.apache.spark.sql.functions._

class PlansSpec extends SparkSpec {

  test("PolygonContains evaluates exact containment") {
    import spark.implicits._
    val df = Seq((1L, 5.0, 5.0), (2L, 15.0, 5.0), (3L, 9.9, 9.9)).toDF("id", "x", "y")
    val in = df.where(GraftExtensions.polygonContains(
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))", $"x", $"y"))
      .select("id").as[Long].collect().toSet
    assert(in === Set(1L, 3L))
  }

  test("PolygonBBoxPushdown injects bbox ranges that reach the scan") {
    import spark.implicits._
    GraftExtensions.enable(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft_poly").toString
    Seq((1L, 5.0, 5.0), (2L, 150.0, 5.0), (3L, -20.0, 3.0))
      .toDF("id", "x", "y").write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir).where(GraftExtensions.polygonContains(
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))", col("x"), col("y")))
    // optimized plan must contain the injected range predicates
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains(">= 0.0") && optimized.contains("<= 10.0"))
    // and they must reach the parquet scan as pushed filters
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("GreaterThanOrEqual(x,0.0)"),
      s"bbox not pushed to scan:\n$physical")
    assert(df.select("id").collect().map(_.getLong(0)).toSet === Set(1L))
  }

  test("PolygonBBoxPushdown is idempotent across optimizer passes") {
    import spark.implicits._
    GraftExtensions.enable(spark)
    val df = Seq((1L, 5.0, 5.0)).toDF("id", "x", "y")
      .where(GraftExtensions.polygonContains(
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))", col("x"), col("y")))
    val once = PolygonBBoxPushdown(df.queryExecution.optimizedPlan)
    assert(once.toString === df.queryExecution.optimizedPlan.toString)
  }

  test("WeightedMeanAggregator matches the expression form") {
    import spark.implicits._
    val ds = Seq((10.0, 1.0), (20.0, 0.5), (Double.NaN, 2.0)).toDS()
    val typed = ds.select(WeightedMeanAggregator.toColumn).collect()(0)
    assert(math.abs(typed - (10.0 + 10.0) / 1.5) < 1e-9)
    // registered as a UDAF over columns
    spark.udf.register("weighted_mean", udaf(WeightedMeanAggregator))
    val viaSql = ds.toDF("v", "w").selectExpr("weighted_mean(v, w)")
      .collect()(0).getDouble(0)
    assert(math.abs(viaSql - typed) < 1e-12)
  }

  test("saltedStats equals direct aggregation") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i.toLong, i % 3, i.toDouble)).toDF("rid", "k", "v")
    val direct = df.groupBy("k").agg(sum("v"), count("v"), min("v"), max("v"))
      .collect().map(r => (r.getInt(0), (r.getDouble(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    val salted = Salting.saltedStats(df, Seq("k"), "v", col("rid"), buckets = 8)
      .collect().map(r => (r.getInt(0), (r.getDouble(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    assert(salted === direct)
  }

  test("saltedJoin equals plain join") {
    import spark.implicits._
    val big = (1 to 500).map(i => (i.toLong, i % 2, i)).toDF("rid", "k", "v")
    val small = Seq((0, "even"), (1, "odd")).toDF("k", "name")
    val plain = big.join(small, "k").count()
    val salted = Salting.saltedJoin(big, small, "k", col("rid"), buckets = 4).count()
    assert(salted === plain)
  }

  test("SQL function registration exposes every native expression") {
    import spark.implicits._
    GraftExtensions.enable(spark)
    Seq((1L, 40.0, -75.0, 41.0, -74.0,
      Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0),
      "the the the quick fox", Array("a", "b", "a")))
      .toDF("id", "lat1", "lon1", "lat2", "lon2", "va", "vb", "txt", "toks")
      .createOrReplaceTempView("fx")

    // each SQL call must agree with its Column-API twin
    val sql = spark.sql(
      """SELECT geodesic_km(lat1, lon1, lat2, lon2) AS gd,
        |       vec_dot(va, vb) AS dot,
        |       quantize_stats(va).rmse AS qr,
        |       rep_stats(txt).n_distinct_tokens AS rf,
        |       simhash16(toks) AS sh,
        |       minhash_sig(toks, 4) AS mh,
        |       rolling_fingerprint(txt).min_hash AS rh,
        |       rolling_fingerprint(txt, 4, 31, 1000003, 5).n_boundaries AS rhp,
        |       polygon_contains('POLYGON ((0 0, -80 0, -80 45, 0 45, 0 0))',
        |                        lon1, lat1) AS pc
        |FROM fx""".stripMargin).collect()(0)
    val api = spark.table("fx").select(
      graft.functions.GeoDistance.geodesicKm($"lat1", $"lon1", $"lat2", $"lon2"),
      graft.functions.VectorExpressions.vecDot($"va", $"vb"),
      graft.functions.VectorExpressions.quantizeStats($"va").getField("rmse"),
      graft.functions.TextExpressions.repStatsCol($"txt").getField("n_distinct_tokens"),
      graft.functions.TextExpressions.simhash16Col($"toks"),
      graft.functions.TextExpressions.minhashSigCol($"toks", 4),
      graft.functions.TextExpressions.rollingFingerprint($"txt").getField("min_hash"),
      graft.functions.TextExpressions.rollingFingerprint($"txt", 4, 31L, 1000003L, 5L)
        .getField("n_boundaries"),
      GraftExtensions.polygonContains(
        "POLYGON ((0 0, -80 0, -80 45, 0 45, 0 0))", $"lon1", $"lat1")).collect()(0)
    assert(sql.getDouble(0) === api.getDouble(0))
    assert(sql.getDouble(1) === api.getDouble(1) && sql.getDouble(1) === 32.0)
    assert(sql.getDouble(2) === api.getDouble(2))
    assert(sql.getLong(3) === api.getLong(3) && sql.getLong(3) === 3L)
    assert(sql.getString(4) === api.getString(4))
    assert(sql.getSeq[String](5) === api.getSeq[String](5))
    assert(sql.getLong(6) === api.getLong(6))
    assert(sql.getLong(7) === api.getLong(7))
    assert(sql.getBoolean(8) === api.getBoolean(8) && sql.getBoolean(8))
  }
}
