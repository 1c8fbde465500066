package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariant tests for the corpus-curation operators (PipelineQueries)
  * over the sf0.001 testdata — the DuckDB gate proves cross-engine
  * equality; these prove the *semantic* properties a pipeline relies
  * on (disjoint exhaustive splits, sample ⊆ population, quantile
  * monotonicity, decontamination soundness).
  */
class PipelineQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("hash split is exhaustive, disjoint, and deterministic") {
    val out = PipelineQueries.queries("d_hash_split")(spark, dir).collect()
    val total = out.map(_.getAs[Long]("n_docs")).sum
    val nDocs = graft.Tables.documents(spark, dir).count()
    assert(total === nDocs) // every doc lands in exactly one split
    assert(out.map(_.getAs[String]("split")).toSet === Set("train", "val", "test"))
    // deterministic: a second evaluation is bit-identical
    val again = PipelineQueries.queries("d_hash_split")(spark, dir).collect()
    assert(out.toSeq === again.toSeq)
    // 12/2/2 nibble lattice: train should dominate
    val bySplit = out.map(r => r.getAs[String]("split") -> r.getAs[Long]("n_docs")).toMap
    assert(bySplit("train") > bySplit("val") + bySplit("test"))
  }

  test("stratified sample keeps a subset at roughly the configured rate") {
    val out = PipelineQueries.queries("d_stratified_sample")(spark, dir).collect()
    out.foreach { r =>
      val (total, kept) = (r.getAs[Long]("n_total"), r.getAs[Long]("n_kept"))
      assert(kept <= total)
      assert(kept >= 0)
    }
    // en is downsampled hardest (25% target): its rate must be the minimum
    val rates = out.map(r => r.getAs[String]("lang") -> r.getAs[Double]("rate")).toMap
    assert(rates("en") <= rates.values.max)
  }

  test("decontamination reports only genuine 5-gram overlaps") {
    import graft.text.TextFunctions._
    val flagged = PipelineQueries.queries("t_decontaminate")(spark, dir).collect()
    // recompute one flagged doc's overlap directly
    flagged.headOption.foreach { r =>
      val docId = r.getAs[Long]("doc_id")
      assert(docId % 2 === 1) // only test-half docs may be flagged
      val docs = graft.Tables.documents(spark, dir)
      val te = docs.where(col("doc_id") === docId)
        .select(explode(array_distinct(wordShingles(col("text"), 5))).as("s"))
      val tr = docs.where(col("doc_id") % 2 === 0)
        .select(explode(array_distinct(wordShingles(col("text"), 5))).as("s"))
      val nShared = te.intersect(tr).count()
      assert(nShared === r.getAs[Long]("n_shared"))
    }
  }

  test("vocab table: df <= tf, and idf decreases with df") {
    val out = PipelineQueries.queries("t_vocab_idf")(spark, dir).collect()
    out.foreach { r => assert(r.getAs[Long]("df") <= r.getAs[Long]("tf")) }
    val sorted = out.sortBy(_.getAs[Long]("df"))
    val idfs = sorted.map(_.getAs[Double]("idf"))
    idfs.sliding(2).foreach { case Array(a, b) => assert(a >= b - 1e-9); case _ => }
  }

  test("length quantiles are monotone and inside the data range") {
    val out = PipelineQueries.queries("t_length_quantiles")(spark, dir).collect()
    val bounds = graft.Tables.documents(spark, dir)
      .agg(min(col("n_chars")), max(col("n_chars")))
      .collect()(0)
    val (lo, hi) = (bounds.getLong(0).toDouble, bounds.getLong(1).toDouble)
    out.foreach { r =>
      val (p25, p50, p90) =
        (r.getAs[Double]("p25"), r.getAs[Double]("p50"), r.getAs[Double]("p90"))
      assert(p25 <= p50 && p50 <= p90)
      assert(p25 >= lo - 1e-6 && p90 <= hi + 1e-6)
    }
  }

  test("decontamination plan: shuffle-hash join on the hashed key, " +
    "no broadcast of the train corpus") {
    val plan = PipelineQueries.queries("t_decontaminate")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"), s"expected shuffle-hash:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"), "train corpus must not broadcast")
    assert(plan.contains("xxhash64"), "join key must be the 64-bit shingle hash")
  }

  test("minhash-pairs bound reaches the parquet scan as a pushed filter") {
    val plan = TextQueries.queries("d_minhash_pairs")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,300)]"),
      s"doc_id bound not pushed:\n$plan")
  }

  test("sketch aggregate plans without Expand or sort-agg value buffers") {
    val plan = AggQueries.queries("a17_approx_sketch")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"),
      s"sketch aggregate must not multiply rows through Expand:\n$plan")
  }

  test("semantic dedup: keeper is idempotent-min and survivors self-map") {
    val out = SimilarityQueries.queries("e_semantic_dedup")(spark, dir).collect()
    out.foreach { r =>
      val (id, keeper, isDup) = (r.getAs[Long]("vec_id"),
        r.getAs[Long]("keeper"), r.getAs[Boolean]("is_dup"))
      assert(keeper <= id)
      assert(isDup === (keeper < id))
    }
    // at least the probe vectors exist; total rows = table rows
    assert(out.length === graft.Tables.embeddings(spark, dir).count())
  }
}
