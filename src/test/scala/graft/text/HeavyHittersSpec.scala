package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {

  /** Zipf-ish stream: item "w<i>" appears 2^(10-i) times for i in
    * 0..9, plus 400 singletons — n = 1023 + 400 = 1423.
    */
  private def skewed = {
    import spark.implicits._
    val rows = (0 to 9).flatMap(i => Seq.fill(1 << (10 - i))(s"w$i")) ++
      (0 until 400).map(i => s"rare$i")
    // shuffle deterministically so partitions mix heavy and rare items
    new scala.util.Random(3).shuffle(rows).toDF("item")
      .repartition(8)
  }

  test("MG guarantee: every item with freq > n/k survives the sketch") {
    val n = 1423.0
    val k = 32
    val cands = HeavyHitters.candidates(skewed, col("item"), k)
      .collect().map(_.getString(0)).toSet
    assert(cands.size <= k)
    // freq > n/k = 44.5 → w0(1024) w1(512) w2(256) w3(128) w4(64) must
    // all be present regardless of partitioning/merge order
    (0 to 4).foreach(i => assert(cands.contains(s"w$i"), s"lost w$i"))
  }

  test("two-pass exact heavy hitters match a plain groupBy count") {
    import spark.implicits._
    val got = HeavyHitters.exactHeavyHitters(skewed, col("item"),
        k = 32, minFreq = 64)
      .orderBy(desc("freq")).as[(String, Long)].collect().toSeq
    val expected = skewed.groupBy("item").agg(count(lit(1)).as("freq"))
      .where(col("freq") >= 64).orderBy(desc("freq"))
      .as[(String, Long)].collect().toSeq
    assert(got === expected)
    assert(got.head === ("w0", 1024L))
  }

  test("tiny capacity degrades to a superset bound, never a miss") {
    // k=4 → n/k ≈ 356: only w0 (1024) and w1 (512) are guaranteed
    val cands = HeavyHitters.candidates(skewed, col("item"), 4)
      .collect().map(_.getString(0)).toSet
    assert(cands.contains("w0") && cands.contains("w1"))
    assert(cands.size <= 4)
  }
}
