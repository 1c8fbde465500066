package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  test("cosine of known vectors") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f), 0.0),   // orthogonal
      (Array(1.0f, 2.0f), Array(2.0f, 4.0f), 1.0),   // parallel
      (Array(1.0f, 0.0f), Array(-1.0f, 0.0f), -1.0)  // opposite
    ).toDF("a", "b", "expected")
    df.select(Similarity.cosine($"a".cast("array<double>"),
        $"b".cast("array<double>")).as("c"), $"expected")
      .as[(Double, Double)].collect()
      .foreach { case (c, e) => assert(math.abs(c - e) < 1e-9) }
  }

  test("bruteForceTopK ranks by cosine, excludes self") {
    import spark.implicits._
    val corpus = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f)),
      (3L, Array(-1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val probes = corpus.where($"vec_id" === 0L)
    val top = Similarity.bruteForceTopK(corpus, probes,
        $"vec_id", $"embedding", $"vec_id", $"embedding", k = 3)
      .orderBy("rank").select("cid").as[Long].collect()
    assert(top.toSeq === Seq(1L, 2L, 3L))
  }

  test("NaN-element vectors (NaN cosine) never occupy top-k slots") {
    import spark.implicits._
    // vec 9 carries NaN elements: dot and norm are NaN, so cosine is
    // NaN with no division-by-zero (ANSI catches 0/0, not this).
    // Unfiltered, NaN breaks the comparator's total order (TimSort can
    // throw) and under Double.compare ranks ABOVE +Inf — either way it
    // must never displace a real neighbor
    val corpus = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f)),
      (9L, Array(Float.NaN, Float.NaN))
    ).toDF("vec_id", "embedding")
    val probes = corpus.where($"vec_id" === 0L)
    val top = Similarity.bruteForceTopK(corpus, probes,
        $"vec_id", $"embedding", $"vec_id", $"embedding", k = 3)
      .orderBy("rank").select("cid").as[Long].collect()
    assert(top.toSeq === Seq(1L, 2L), s"NaN candidate surfaced: ${top.toSeq}")
    // and the aggregator survives NaN-heavy buffers (comparator is a
    // total order even while 40 NaN candidates stream through)
    val many = (10L to 50L).map(i => (i, Array(Float.NaN, 1.0f))) ++
      Seq((1L, Array(0.9f, 0.1f)))
    val top2 = Similarity.bruteForceTopK(
        many.toDF("vec_id", "embedding"), probes,
        $"vec_id", $"embedding", $"vec_id", $"embedding", k = 5)
      .select("cid").as[Long].collect()
    assert(top2.toSeq === Seq(1L))
  }

  test("lshSignature buckets parallel vectors together, opposite apart") {
    import spark.implicits._
    val df = Seq(
      (0L, Array.tabulate(8)(i => (i + 1).toFloat)),
      (1L, Array.tabulate(8)(i => (i + 1) * 2.0f)),  // parallel to 0
      (2L, Array.tabulate(8)(i => -(i + 1).toFloat)) // opposite of 0
    ).toDF("vec_id", "embedding")
    val sigs = df.select($"vec_id",
        Similarity.lshSignature($"embedding", 6).as("sig"))
      .as[(Long, String)].collect().toMap
    assert(sigs(0L) === sigs(1L))
    assert(sigs(2L) === sigs(0L).map(c => if (c == '1') '0' else '1'))
  }

  test("annTopK finds same-bucket neighbors") {
    import spark.implicits._
    val base = Array.tabulate(8)(i => (i + 1).toFloat)
    val corpus = Seq(
      (0L, base),
      (1L, base.map(_ * 1.1f)),
      (2L, base.map(_ * 0.9f)),
      (3L, base.map(-_))
    ).toDF("vec_id", "embedding")
    val probes = corpus.where($"vec_id" === 0L)
    val res = Similarity.annTopK(corpus, probes, $"vec_id", $"embedding",
        $"vec_id", $"embedding", nPlanes = 4, k = 5)
      .select("cid").as[Long].collect().toSet
    assert(res === Set(1L, 2L)) // same bucket; opposite vector excluded
  }

  test("quantizedTopK recovers the brute-force ranking through the int8 shortlist") {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    val corpus = (0L until 200L).map(i =>
      (i, Array.fill(32)((rnd.nextGaussian() * 2).toFloat)))
      .toDF("vec_id", "embedding")
    val probes = corpus.where($"vec_id" < 3)
    val exact = Similarity.bruteForceTopK(corpus, probes, $"vec_id",
        $"embedding", $"vec_id", $"embedding", k = 3)
      .select($"qid", $"rank", $"cid").as[(Long, Int, Long)].collect().toSet
    // a 20-deep shortlist over int8 sims comfortably contains the true
    // top-3 (max quantization error per cosine is ~1%), so the exact
    // re-rank reproduces brute force
    val viaQ = Similarity.quantizedTopK(corpus, probes, $"vec_id",
        $"embedding", $"vec_id", $"embedding", k = 3, shortlist = 20)
      .select($"qid", $"rank", $"cid").as[(Long, Int, Long)].collect().toSet
    assert(viaQ === exact)
  }

  test("autoPlanes keeps expected bucket occupancy flat as corpus grows") {
    // occupancy = n / 2^planes stays within [target/2, target] for n
    // spanning 6 orders of magnitude
    for (n <- Seq(1000L, 100000L, 10000000L, 1000000000L)) {
      val planes = Similarity.autoPlanes(n, targetBucket = 256)
      val occupancy = n.toDouble / math.pow(2, planes)
      assert(occupancy <= 256.0 + 1e-9, s"n=$n planes=$planes occ=$occupancy")
      assert(occupancy > 64.0, s"n=$n planes=$planes occ=$occupancy")
    }
    // degenerate inputs clamp instead of exploding
    assert(Similarity.autoPlanes(1L) === 1)
    assert(Similarity.autoPlanes(Long.MaxValue) === 30)
    // EXACT powers of two: the integer form gives ⌈log₂(n/256)⌉ with
    // no float-ulp drift — the boundary where the count-derived oracle
    // (e_near_dup_auto) could otherwise disagree with production
    assert(Similarity.autoPlanes(256L) === 1)   // log₂(1) = 0, clamps to 1
    assert(Similarity.autoPlanes(512L) === 1)
    assert(Similarity.autoPlanes(513L) === 2)
    assert(Similarity.autoPlanes(131072L) === 9) // n/256 = 2^9 exactly
    assert(Similarity.autoPlanes(131073L) === 10)
  }
}
