package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the second scale
  * path beside hyperplane LSH: a coarse k-means quantizer assigns every
  * vector to its nearest centroid's list; queries probe only the
  * `nprobe` nearest lists and re-rank exactly inside them.
  *
  * Training is Lloyd's iterations expressed as DataFrame aggregations:
  * assignment = argmin centroid distance (a small broadcast cross join
  * + window top-1), update = element-wise mean via posexplode — both
  * distributed, no driver-side vectors beyond the centroid set itself
  * (nlist × dim doubles, intentionally broadcast-sized). Deterministic:
  * init picks the vectors with the lowest ids.
  */
object IvfIndex {

  /** (listId → centroid) as a DataFrame: `list_id`, `centroid`. */
  def train(corpus: DataFrame, id: Column, vec: Column,
            nlist: Int, iters: Int): DataFrame = {
    val base = corpus.select(id.as("vid"), vec.cast("array<double>").as("v"))
    // deterministic init: the nlist lowest-id vectors
    var centroids = base.orderBy("vid").limit(nlist)
      .withColumn("list_id", row_number().over(Window.orderBy("vid")) - 1)
      .select(col("list_id"), col("v").as("centroid"))
    (1 to iters).foreach { _ =>
      val assigned = assign(base, centroids)
      val updated = assigned
        .select(col("list_id"), posexplode(col("v")).as(Seq("i", "x")))
        .groupBy("list_id", "i")
        .agg(avg(col("x")).as("c"))
        .groupBy("list_id")
        .agg(array_sort(collect_list(struct(col("i"), col("c")))).as("pairs"))
        .select(col("list_id"),
          transform(col("pairs"), p => p.getField("c")).as("next"))
      // a list that received no vectors this iteration keeps its old
      // centroid — otherwise it would silently vanish and the index
      // would end up with fewer than nlist lists
      // localCheckpoint truncates the lineage — without it the plan
      // embeds the previous iteration's subtree twice and grows
      // exponentially in iters
      centroids = centroids
        .join(updated, Seq("list_id"), "left")
        .select(col("list_id"), coalesce(col("next"), col("centroid")).as("centroid"))
        .localCheckpoint(true)
    }
    centroids
  }

  /** Assign each corpus vector to its nearest centroid (L2). */
  def assign(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    val base = corpus.select(col("vid"), col("v"))
    val d2 = aggregate(zip_with(col("v"), col("centroid"), (x, c) => (x - c) * (x - c)),
      lit(0.0), (acc, x) => acc + x)
    val w = Window.partitionBy(col("vid")).orderBy(col("d2").asc, col("list_id").asc)
    base.crossJoin(broadcast(centroids))
      .withColumn("d2", d2)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("vid"), col("v"), col("list_id"))
  }

  /** Probe: exact cosine top-k within the `nprobe` nearest lists of
    * each query. The corpus side is touched only on the probed lists —
    * an equi-join on list_id, never a cross join.
    */
  def search(index: DataFrame, centroids: DataFrame, queries: DataFrame,
             queryId: Column, queryVec: Column, nprobe: Int, k: Int): DataFrame = {
    val q = queries.select(queryId.as("qid"), queryVec.cast("array<double>").as("qv"))
    val qd2 = aggregate(zip_with(col("qv"), col("centroid"), (x, c) => (x - c) * (x - c)),
      lit(0.0), (acc, x) => acc + x)
    val wq = Window.partitionBy(col("qid")).orderBy(col("qd2").asc, col("list_id").asc)
    val probed = q.crossJoin(broadcast(centroids))
      .withColumn("qd2", qd2)
      .withColumn("rn", row_number().over(wq))
      .where(col("rn") <= nprobe)
      .select(col("qid"), col("qv"), col("list_id"))
    val scored = probed.join(index, "list_id")
      .where(col("vid") =!= col("qid"))
      .withColumn("sim", Similarity.cosine(col("v"), col("qv")))
    val wk = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vid").asc)
    scored.withColumn("rank", row_number().over(wk))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vid"), col("sim"), col("list_id"))
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
