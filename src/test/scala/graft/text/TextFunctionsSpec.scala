package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {

  test("token and shingle machinery") {
    import spark.implicits._
    val df = Seq("a b c d", "x y", "solo").toDF("text")
    val r = df.select(
      TextFunctions.tokenCount($"text").as("n"),
      TextFunctions.wordShingles($"text", 3).as("sh")
    ).as[(Int, Seq[String])].collect()
    assert(r(0) === ((4, Seq("a b c", "b c d"))))
    assert(r(1) === ((2, Seq.empty)))
    assert(r(2) === ((1, Seq.empty)))
  }

  test("avgWordLen for single-space text") {
    import spark.implicits._
    val df = Seq("ab cde f").toDF("text") // lens 2,3,1 → mean 2
    val v = df.select(TextFunctions.avgWordLen($"text")).as[Double].collect()(0)
    assert(v === 2.0)
  }

  test("stopword ratio and type-token ratio") {
    import spark.implicits._
    val df = Seq("the cat the dog").toDF("text")
    val (sr, ttr) = df.select(
      TextFunctions.stopwordRatio($"text", Seq("the", "a")).as("sr"),
      TextFunctions.typeTokenRatio($"text").as("ttr")
    ).as[(Double, Double)].collect()(0)
    assert(sr === 0.5)
    assert(ttr === 0.75)
  }

  test("wordSetFingerprint is order- and multiplicity-invariant") {
    import spark.implicits._
    val df = Seq((1L, "b a c"), (2L, "c c b a"), (3L, "a b d"))
      .toDF("id", "text")
    val fps = df.select($"id", TextFunctions.wordSetFingerprint($"text").as("fp"))
      .as[(Long, String)].collect().toMap
    assert(fps(1L) === fps(2L))
    assert(fps(1L) !== fps(3L))
  }
}
