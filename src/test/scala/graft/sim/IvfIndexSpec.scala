package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IvfIndexSpec extends SparkSpec {

  /** Three well-separated clusters in 4-d. */
  private def corpus = {
    import spark.implicits._
    val protos = Seq(
      Array(10f, 0f, 0f, 0f), Array(0f, 10f, 0f, 0f), Array(0f, 0f, 10f, 0f))
    (0 until 30).map { i =>
      val p = protos(i % 3)
      (i.toLong, p.map(x => x + (i / 3) * 0.01f))
    }.toDF("vec_id", "embedding")
  }

  test("train produces nlist centroids near the cluster prototypes") {
    val cents = IvfIndex.train(corpus, col("vec_id"), col("embedding"),
      nlist = 3, iters = 5)
    assert(cents.count() === 3)
    val arr = cents.collect().map(r => r.getSeq[Double](r.fieldIndex("centroid")))
    // each centroid should be dominated by exactly one axis near 10
    assert(arr.forall(c => c.count(_ > 5.0) == 1))
  }

  test("trainConverged reaches a genuine fixpoint of the production " +
    "assign→updateStep pair (twin-drift guard)") {
    val (cents, iters, move) = IvfIndex.trainConverged(
      corpus, col("vec_id"), col("embedding"),
      nlist = 3, maxIters = 50, tol = 0.0)
    assert(iters < 50, s"did not converge in 50 iterations (move=$move)")
    assert(move === 0.0)
    // an empty corpus must return an empty centroid frame, not crash
    val empty = corpus.where(col("vec_id") < 0)
    val (c0, i0, m0) = IvfIndex.trainConverged(empty, col("vec_id"),
      col("embedding"), nlist = 3, maxIters = 5, tol = 0.0)
    assert(c0.count() === 0 && i0 === 0 && m0 === 0.0)
    // one more step through the PRODUCTION functions must reproduce
    // every centroid — this is what e_ivf_fixpoint gates; it also
    // pins the RDD iteration twin to assign/updateStep semantics
    val base = corpus.select(col("vec_id").as("vid"),
      col("embedding").cast("array<double>").as("v"))
    val next = IvfIndex.updateStep(IvfIndex.assign(base, cents), cents)
    val moved = cents.select(col("list_id"), col("centroid").as("c0"))
      .join(next.select(col("list_id"), col("centroid").as("c1")), "list_id")
      .select(sqrt(aggregate(zip_with(col("c0"), col("c1"),
        (x, y) => (x - y) * (x - y)), lit(0.0), (a, x) => a + x)).as("mv"))
      .agg(max(col("mv"))).head.getDouble(0)
    assert(moved <= 1e-9, s"production step moved a converged centroid by $moved")
    // and the converged centroids still sit on the cluster prototypes
    val arr = cents.collect().map(r => r.getSeq[Double](r.fieldIndex("centroid")))
    assert(arr.forall(c => c.count(_ > 5.0) == 1))
  }

  test("assignment is a map-only plan: no Window, no corpus Exchange") {
    // the VERDICT-r2 scale fix: argmin-centroid must NOT be a per-key
    // window over the corpus×centroid relation — it is a row-local
    // array_min against ONE broadcast centroid row
    val base = corpus.select(col("vec_id").as("vid"),
      col("embedding").cast("array<double>").as("v"))
    val cents = IvfIndex.train(corpus, col("vec_id"), col("embedding"), 3, 1)
    val plan = IvfIndex.assign(base, cents).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"assignment plans a window:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"),
      s"assignment should broadcast the centroid row:\n$plan")
  }

  test("search finds same-cluster neighbors and respects k") {
    import spark.implicits._
    val base = corpus.select(col("vec_id").as("vid"),
      col("embedding").cast("array<double>").as("v"))
    val cents = IvfIndex.train(corpus, col("vec_id"), col("embedding"), 3, 5)
    val index = IvfIndex.assign(base, cents)
    val probes = corpus.where(col("vec_id") === 0L)
    val res = IvfIndex.search(index, cents, probes,
      col("vec_id"), col("embedding"), nprobe = 1, k = 4)
    val ids = res.orderBy("rank").select("vid").as[Long].collect()
    assert(ids.length === 4)
    // all results come from cluster 0 (ids ≡ 0 mod 3)
    assert(ids.forall(_ % 3 == 0))
  }

  test("persisted index round-trips and lays lists out as partitions") {
    import spark.implicits._
    val base = corpus.select(col("vec_id").as("vid"),
      col("embedding").cast("array<double>").as("v"))
    val cents = IvfIndex.train(corpus, col("vec_id"), col("embedding"), 3, 2)
    val index = IvfIndex.assign(base, cents)
    val path = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    IvfIndex.save(index, cents, path)
    // list_id partition directories exist — a probe of one list reads
    // one directory
    val listDirs = new java.io.File(s"$path/lists").listFiles()
      .filter(_.getName.startsWith("list_id=")).map(_.getName).sorted
    assert(listDirs.length === 3)
    val (loadedIdx, loadedCents) = IvfIndex.load(spark, path)
    val probes = corpus.where(col("vec_id") < 2L)
    def run(idx: org.apache.spark.sql.DataFrame,
            cs: org.apache.spark.sql.DataFrame) =
      IvfIndex.search(idx, cs, probes, col("vec_id"), col("embedding"),
          nprobe = 2, k = 4)
        .select("qid", "rank", "vid").as[(Long, Long, Long)]
        .collect().toSet
    assert(run(loadedIdx, loadedCents) === run(index, cents))
    // partition pruning is the storage-layer inverted file: a probe of
    // one list plans a PartitionFilter on list_id (the scan never
    // touches other lists' directories)
    val prunedPlan = loadedIdx.where(col("list_id") === 1)
      .queryExecution.executedPlan.toString
    assert(prunedPlan.contains("PartitionFilters") &&
      prunedPlan.matches("(?s).*PartitionFilters: \\[[^\\]]*list_id[^\\]]*=\\s*1.*"),
      s"no list_id partition filter in scan:\n$prunedPlan")
  }

  test("IVF with nprobe=nlist matches brute force exactly") {
    import spark.implicits._
    val base = corpus.select(col("vec_id").as("vid"),
      col("embedding").cast("array<double>").as("v"))
    val cents = IvfIndex.train(corpus, col("vec_id"), col("embedding"), 3, 3)
    val index = IvfIndex.assign(base, cents)
    val probes = corpus.where(col("vec_id") < 2L)
    val ivf = IvfIndex.search(index, cents, probes,
        col("vec_id"), col("embedding"), nprobe = 3, k = 5)
      .select("qid", "rank", "vid").as[(Long, Long, Long)]
      .collect().map { case (q, r, v) => (q, r) -> v }.toMap
    val bf = Similarity.bruteForceTopK(corpus, probes,
        col("vec_id"), col("embedding"), col("vec_id"), col("embedding"), k = 5)
      .select("qid", "rank", "cid").as[(Long, Long, Long)]
      .collect().map { case (q, r, v) => (q, r) -> v }.toMap
    assert(ivf === bf)
  }
}
