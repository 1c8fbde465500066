package graft.sources

import graft.SparkSpec
import graft.functions.Wkt
import org.apache.spark.sql.functions._

class SourcesSpec extends SparkSpec {

  test("Wkt parses polygons and ray-casts containment") {
    val sq = Wkt.parsePolygon("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    assert(sq.length === 5)
    assert(Wkt.contains(sq, 5, 5))
    assert(!Wkt.contains(sq, 15, 5))
    assert(!Wkt.contains(sq, -1, -1))
    // concave polygon (notch): point inside the notch is outside
    val notch = Wkt.parsePolygon("POLYGON ((0 0, 10 0, 10 10, 5 5, 0 10, 0 0))")
    assert(!Wkt.contains(notch, 5, 8))
    assert(Wkt.contains(notch, 2, 2))
    assert(Wkt.bbox(sq) === ((0.0, 10.0, 0.0, 10.0)))
  }

  test("containsCol filters a DataFrame by polygon") {
    import spark.implicits._
    val df = Seq((1L, 5.0, 5.0), (2L, 15.0, 5.0)).toDF("id", "x", "y")
    val in = df.where(Wkt.containsCol("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))",
      $"x", $"y")).select("id").as[Long].collect()
    assert(in.toSeq === Seq(1L))
  }

  test("ResultsStore writes/reads execution-partitioned results") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_results").toString
    ResultsStore.write(Seq((1, "a"), (2, "b")).toDF("k", "v"), path, "exec1")
    ResultsStore.write(Seq((3, "c")).toDF("k", "v"), path, "exec2")
    assert(ResultsStore.read(spark, path, "exec1").count() === 2)
    assert(ResultsStore.read(spark, path, "exec2").count() === 1)
    assert(ResultsStore.listExecutions(spark, path).count() === 2)
  }

  test("Merge.upsert classifies insert/update/keep and survives NULL values") {
    import spark.implicits._
    val base = Seq((1L, Some(10.0), "a"), (2L, None, "b"), (3L, Some(30.0), "c"))
      .toDF("k", "price", "status")
    val upd = Seq((2L, Some(22.0), "b2"), (4L, None, "d"))
      .toDF("k", "price", "status")
    val out = Merge.upsert(base, upd, "k").orderBy("k")
      .as[(Long, Option[Double], String, String)].collect().toSeq
    assert(out === Seq(
      (1L, Some(10.0), "a", "keep"),
      (2L, Some(22.0), "b2", "update"), // base price NULL, still "update"
      (3L, Some(30.0), "c", "keep"),
      (4L, None, "d", "insert")))      // inserted row with NULL value
    // idempotency: re-applying the same batch changes nothing but op
    val again = Merge.upsert(
      Merge.upsert(base, upd, "k").drop("op"), upd, "k")
      .orderBy("k").drop("op")
      .as[(Long, Option[Double], String)].collect().toSeq
    assert(again === out.map(t => (t._1, t._2, t._3)))
  }

  test("Encoders emit JSON lines and CSV") {
    import spark.implicits._
    val df = Seq((1, "x"), (2, "y")).toDF("k", "v")
    val json = Encoders.toJsonLines(df).as[String].collect().sorted
    assert(json(0) === """{"k":1,"v":"x"}""")
    val path = java.nio.file.Files.createTempDirectory("graft_csv").toString
    Encoders.writeCsv(df, path)
    val back = spark.read.option("header", "true").csv(path)
    assert(back.count() === 2)
    assert(back.columns.toSeq === Seq("k", "v"))
  }

  test("Encoders.toNetcdf round-trips numeric result columns") {
    import spark.implicits._
    val df = Seq((1L, 1.5, "a"), (2L, Double.NaN, "b"), (3L, -0.25, "c"))
      .toDF("id", "score", "label")
    val nc = NetcdfClassic.read(Encoders.toNetcdf(df))
    assert(nc.dim("row").get.length === 3)
    assert(nc.variable("id").get.ncType === NetcdfClassic.NC_INT)
    assert(nc.variable("id").get.data.toSeq === Seq(1.0, 2.0, 3.0))
    val sc = nc.variable("score").get.data
    assert(sc(0) === 1.5 && sc(1).isNaN && sc(2) === -0.25)
    assert(nc.variable("label").isEmpty) // strings go to JSON/CSV
  }

  test("Encoders.toZip bundles readable entries") {
    import spark.implicits._
    val df = Seq((1, "x,with comma")).toDF("k", "v")
    val zip = Encoders.toZip(Seq(
      "data.csv" -> Encoders.toCsvBytes(df),
      "data.nc" -> Encoders.toNetcdf(df)))
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(zip))
    val entries = Iterator.continually(zin.getNextEntry)
      .takeWhile(_ != null)
      .map(e => e.getName -> new String(zin.readAllBytes(), "UTF-8"))
      .toMap
    assert(entries.keySet === Set("data.csv", "data.nc"))
    assert(entries("data.csv") === "k,v\n1,\"x,with comma\"\n")
    assert(entries("data.nc").startsWith("CDF"))
  }
}
