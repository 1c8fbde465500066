package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the second scale
  * path beside hyperplane LSH: a coarse k-means quantizer assigns every
  * vector to its nearest centroid's list; queries probe only the
  * `nprobe` nearest lists and re-rank exactly inside them.
  *
  * Training is Lloyd's iterations expressed as DataFrame aggregations:
  * assignment = ROW-LOCAL argmin against a broadcast centroid array
  * (no join row explosion, no window — a map-only stage), update =
  * element-wise mean via a typed VecMeanAggregator (fixed nlist×d
  * partials, no element explosion) — both distributed, no driver-side
  * vectors beyond the centroid set itself (nlist × dim doubles,
  * intentionally broadcast-sized). Deterministic: init picks the
  * vectors with the lowest ids; ties in distance break on list_id.
  */
object IvfIndex {

  /** Squared L2 distance between two array<double> columns — native
    * codegen expression (r14; same left-to-right summation as the
    * interpreted aggregate(zip_with) fold it replaces, so the
    * fixed-centroid oracles are unaffected). Inside the per-centroid
    * `transform` lambda it evaluates as one tight JVM loop per
    * centroid instead of ~3 interpreted lambda dispatches per element.
    */
  private def l2(v: Column, c: Column): Column =
    graft.functions.VectorExpressions.vecL2Sq(v, c)

  /** One-row frame: `cents` = array of (list_id, centroid) structs
    * sorted by list_id. Broadcast-joined so every corpus/query row can
    * rank all centroids locally — the whole point of IVF is that nlist
    * is small enough to broadcast (even nlist=65536 × d=1024 doubles is
    * ~0.5 GB; typical is far less).
    */
  private def centroidArray(centroids: DataFrame): DataFrame =
    centroids.agg(array_sort(
      collect_list(struct(col("list_id"), col("centroid")))).as("cents"))

  /** Per-element (d2, list_id) structs for a vector column `v` against
    * the broadcast `cents` array — struct comparison orders by
    * (d2 ASC, list_id ASC), the deterministic tiebreak the oracle uses.
    */
  private def scoredLists(v: Column): Column =
    transform(col("cents"), c =>
      struct(l2(v, c.getField("centroid")).as("d2"),
        c.getField("list_id").as("list_id")))

  /** (listId → centroid) as a DataFrame: `list_id`, `centroid`.
    *
    * r14 shape: the centroid set is MODEL-SIZED (nlist × d doubles —
    * the same boundary [[assign]] broadcasts), so each iteration's
    * updated centroids are collected to the driver and re-enter the
    * next iteration as a local relation. That replaces the previous
    * per-iteration eager localCheckpoint — which cost one
    * materialization job per iteration AND still left the init-window
    * subtree to be re-evaluated under both the assign and search
    * broadcasts — with one nlist-row collect per iteration, perfect
    * lineage truncation, and a constant-folded centroid side
    * everywhere downstream. Values are bit-identical: the aggregation
    * plan over the corpus is unchanged, only where its tiny result
    * lives changed.
    */
  def train(corpus: DataFrame, id: Column, vec: Column,
            nlist: Int, iters: Int): DataFrame = {
    val spark = corpus.sparkSession
    // every Lloyd's iteration re-reads the corpus (assign is map-only
    // over it) — cache once, release on exit; spills to disk rather
    // than recompute when the corpus outgrows executor memory
    val base = corpus.select(id.as("vid"), vec.cast("array<double>").as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // deterministic init: the nlist lowest-id vectors, ranked by vid —
    // nlist rows through the driver, the model-sized boundary
    def local(rows: Seq[(Int, Seq[Double])]): DataFrame =
      spark.createDataFrame(rows).toDF("list_id", "centroid")
    var cents: Seq[(Int, Seq[Double])] = base.orderBy("vid").limit(nlist)
      .select(col("v")).collect().toSeq
      .zipWithIndex.map { case (r, i) => (i, r.getSeq[Double](0)) }
    (1 to iters).foreach { _ =>
      cents = updateStep(assign(base, local(cents)), local(cents))
        .select(col("list_id").cast("int"), col("centroid"))
        .collect().toSeq
        .map(r => (r.getInt(0), r.getSeq[Double](1)))
        .sortBy(_._1)
    }
    base.unpersist(blocking = false)
    local(cents)
  }

  /** Lloyd's run to CONVERGENCE: iterate assign→update until no
    * centroid moves more than `tol` (L2), or `maxIters`. Returns the
    * converged centroids plus the iteration count and the final max
    * movement — the `e_ivf_fixpoint` gate's inputs (Lloyd's is a
    * descent on a finite partition lattice, so with tol > 0 it always
    * terminates; a maxIters exit leaves finalMove > tol, which the
    * gate turns into a loud false). The per-iteration movement check
    * is a join of two nlist-row frames — model-sized, not data-sized.
    */
  def trainConverged(corpus: DataFrame, id: Column, vec: Column,
                     nlist: Int, maxIters: Int, tol: Double)
      : (DataFrame, Int, Double) = {
    val spark = corpus.sparkSession
    val base = corpus.select(id.as("vid"), vec.cast("array<double>").as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // The ITERATION core runs on RDDs, deliberately (the documented
    // imperative-loop niche, same as Bpe.trainSequential): a DataFrame
    // body re-analyzes and codegen-compiles a brand-new plan every
    // iteration because the centroid literals live in the plan —
    // measured ~0.3 s/iteration of pure compilation, 10× the actual
    // work at convergence-scale iteration counts. Each RDD iteration
    // is ONE job: map-side per-list (sum, count) partials with the
    // centroids captured in the closure (model-sized), combined on the
    // driver. Semantics mirror assign/updateStep exactly — argmin with
    // (d2 ASC, list_id ASC) tie-break, empty list keeps its old
    // centroid — and the `e_ivf_fixpoint` gate re-verifies the result
    // through the PRODUCTION assign→updateStep pair, so a drift
    // between the twins flips the gate loudly.
    val vecs = base.select(col("v")).rdd
      .map(_.getSeq[Double](0).toArray)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var cents: Array[Array[Double]] =
      train(base, col("vid"), col("v"), nlist, iters = 0)
        .select(col("list_id").cast("int"), col("centroid"))
        .collect().map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
        .sortBy(_._1).map(_._2)
    val k = cents.length // may be < nlist on a tiny corpus
    var iters = 0
    // an empty corpus yields zero centroids: nothing to iterate (and
    // the movement max below would throw on the empty set)
    var move = if (k == 0) 0.0 else Double.MaxValue
    // tol = 0.0 demands an EXACT fixpoint, and is reachable: the RDD
    // core's per-partition summation order is fixed by the cached
    // partitioning, so once the (deterministically tie-broken)
    // assignment stops changing, the next means are bit-identical and
    // move == 0.0 exactly. A merely sub-tol move with tol > 0 is NOT
    // an assignment fixpoint — a near-equidistant vector can still
    // flip on the next step — so fixpoint callers (the gate) pass 0.0.
    while (iters < maxIters && move > tol) {
      val cbc = cents
      val partials = vecs.mapPartitions { it =>
        val d = if (cbc.isEmpty) 0 else cbc(0).length
        val sums = Array.ofDim[Double](cbc.length, d)
        val counts = new Array[Long](cbc.length)
        it.foreach { v =>
          var best = 0
          var bestD = Double.MaxValue
          var c = 0
          while (c < cbc.length) {
            var s = 0.0
            var i = 0
            while (i < d) { val t = v(i) - cbc(c)(i); s += t * t; i += 1 }
            if (s < bestD) { bestD = s; best = c } // ties keep lower c
            c += 1
          }
          var i = 0
          while (i < d) { sums(best)(i) += v(i); i += 1 }
          counts(best) += 1L
        }
        Iterator.single((sums, counts))
      }.collect()
      val next = Array.tabulate(k) { c =>
        val n = partials.iterator.map(_._2(c)).sum
        if (n == 0L) cents(c)
        else {
          val d = cents(c).length
          val s = new Array[Double](d)
          partials.foreach { case (ps, _) =>
            var i = 0
            while (i < d) { s(i) += ps(c)(i); i += 1 }
          }
          s.map(_ / n)
        }
      }
      move = cents.zip(next).map { case (a, b) =>
        math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
      }.max
      cents = next
      iters += 1
    }
    vecs.unpersist(blocking = false)
    base.unpersist(blocking = false)
    (spark.createDataFrame(cents.toSeq.zipWithIndex.map(_.swap))
      .toDF("list_id", "centroid"), iters, move)
  }

  /** One Lloyd's centroid-update step: element-wise mean of each
    * list's members — the OTHER half of the training algebra beside
    * [[assign]], exposed so the driver gate `e_ivf_update_fixed` can
    * oracle it against a fixed assignment.
    *
    * Centroid update = ONE vector-mean aggregation (VecMeanAggregator:
    * fixed nlist×d partials). The previous posexplode form blew the
    * corpus up to n×d element rows and re-assembled them with a
    * second groupBy + array_sort — an extra shuffle and d× the
    * aggregate input per Lloyd's iteration. At the probe's 200k×64
    * corpus the two forms time identically (~3 s gate, explode cost
    * hidden under job overhead); the aggregate form is kept because
    * its exchange volume is d× smaller and at production d (512—4096)
    * the element explosion is the dominant train cost.
    *
    * A list that received no vectors keeps its old centroid —
    * otherwise it would silently vanish and the index would end up
    * with fewer than nlist lists.
    */
  def updateStep(assigned: DataFrame, centroids: DataFrame): DataFrame = {
    val meanAgg = udaf(new VecMeanAggregator, org.apache.spark.sql.Encoders.product[VecIn])
    val updated = assigned
      .groupBy("list_id")
      .agg(meanAgg(col("v")).as("m"))
      .select(col("list_id"), col("m.mean").as("next"))
    centroids
      .join(updated, Seq("list_id"), "left")
      .select(col("list_id"), coalesce(col("next"), col("centroid")).as("centroid"))
  }

  /** Assign each corpus vector to its nearest centroid (L2).
    *
    * Shape: a broadcast of ONE aggregated centroid-array row + a
    * row-local `array_min` — the assignment stage is map-only, no
    * shuffle of the corpus at all. (The previous form cross-joined to
    * n×nlist rows and ranked them with
    * `row_number().over(Window.partitionBy(vid))`, which shuffles and
    * sorts every candidate row per key — at 100 TB × nlist=1024 that
    * window exchange is the wall; see SCALING.md's match-once lesson.)
    */
  def assign(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    corpus.select(col("vid"), col("v"))
      .crossJoin(broadcast(centroidArray(centroids)))
      .select(col("vid"), col("v"),
        array_min(scoredLists(col("v"))).getField("list_id").as("list_id"))
  }

  /** Probe: exact cosine top-k within the `nprobe` nearest lists of
    * each query. List selection is row-local on the broadcast centroid
    * array (sort the (d2, list_id) structs, slice nprobe); the corpus
    * side is touched only on the probed lists — an equi-join on
    * list_id, never a cross join. The final per-query top-k is a
    * bounded TopKAggregator (fixed-size map-side partials), not a
    * window, so candidate rows never concentrate on #queries tasks.
    */
  def search(index: DataFrame, centroids: DataFrame, queries: DataFrame,
             queryId: Column, queryVec: Column, nprobe: Int, k: Int): DataFrame = {
    val q = queries.select(queryId.as("qid"), queryVec.cast("array<double>").as("qv"))
    val probed = q.crossJoin(broadcast(centroidArray(centroids)))
      .select(col("qid"), col("qv"),
        explode(slice(array_sort(scoredLists(col("qv"))), 1, nprobe)).as("pl"))
      .select(col("qid"), col("qv"), col("pl.list_id").as("list_id"))
    val scored = probed.join(index, "list_id")
      .where(col("vid") =!= col("qid"))
      .withColumn("sim", Similarity.cosine(col("v"), col("qv")))
    TopK.perKey(scored, col("qid"), k, col("sim"), col("vid"),
        array(col("list_id").cast("double")))
      .select(col("key").as("qid"), col("rank"), col("cid").as("vid"),
        col("sim"), element_at(col("aux"), 1).cast("int").as("list_id"))
  }

  /** Persist a trained index as two parquet tables: centroids (tiny)
    * and the assignment lists, partitioned BY list_id — a probe then
    * reads only its `nprobe` partitions (partition pruning does the
    * inverted-file part of IVF at the storage layer). Train once
    * offline, serve many queries: the shape a production ANN service
    * actually runs.
    */
  def save(index: DataFrame, centroids: DataFrame, path: String): Unit = {
    centroids.write.mode("overwrite").parquet(s"$path/centroids")
    index.write.mode("overwrite").partitionBy("list_id")
      .parquet(s"$path/lists")
  }

  /** Load a persisted index: (index, centroids). Searching the loaded
    * frames plans partition filters on `list_id` for the probed lists.
    */
  def load(spark: org.apache.spark.sql.SparkSession,
           path: String): (DataFrame, DataFrame) = {
    val centroids = spark.read.parquet(s"$path/centroids")
    val index = spark.read.parquet(s"$path/lists")
    (index, centroids)
  }
}
