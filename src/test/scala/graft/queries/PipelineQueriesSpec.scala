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

  test("tfidf max-df prune bounds the posting-list self-join under a hot term") {
    // the quadratic trap the prune exists for: ONE term in all N docs
    // yields N(N-1)/2 candidate pairs on its own. Inject such a term
    // into a 500-doc corpus and measure the join's candidate count
    // with and without the df <= 0.5N prune (the operator's rule in
    // t_tfidf_cosine — same join shape, counted pre-aggregation).
    import spark.implicits._
    val n = 500
    // each doc: the hot term + 3 rare terms shared only within its
    // 5-doc block => legit candidates stay local and bounded
    val docs = (0 until n).map { i =>
      (i.toLong, s"hot block${i / 5}a block${i / 5}b block${i / 5}c")
    }.toDF("doc_id", "text")
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    def candidates(pruned: Boolean): Long = {
      val wts0 = tf.join(df, "w")
      val wts = if (pruned) wts0.where(col("df") <= lit(n) * 0.5) else wts0
      val a = wts.select(col("w"), col("doc_id").as("i"))
      val b = wts.select(col("w"), col("doc_id").as("j"))
      a.join(b, "w").where(col("i") < col("j")).count()
    }
    val unpruned = candidates(pruned = false)
    val pruned = candidates(pruned = true)
    // hot term alone: N(N-1)/2 = 124750 pairs; blocks: 100 blocks x
    // C(5,2) pairs x 3 shared terms = 3000
    assert(unpruned === n.toLong * (n - 1) / 2 + 3000)
    assert(pruned === 3000) // exactly the legit in-block candidates
    // the bound the comment claims: pairs <= maxDf * postings
    val postings = tf.join(df, "w").where(col("df") <= lit(n) * 0.5).count()
    assert(pruned <= (n / 2).toLong * postings)
  }

  test("sliding-window chunker covers every token with bounded windows") {
    val out = PipelineQueries.queries("d_chunk_overlap")(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val tokens = r.getAs[Long]("tokens")
      val n = r.getAs[Long]("n_chunks")
      // FULL coverage: the clamped last window always reaches the tail
      assert(r.getAs[Long]("covered_to") === tokens, s"doc ${r.get(0)}")
      // every window is nonempty and at most the window size
      assert(r.getAs[Long]("min_len") >= 1)
      assert(r.getAs[Long]("chunk_tokens") <= n * 256)
      // window count formula: 1 window iff the doc fits
      assert((n == 1) === (tokens <= 256))
    }
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
    // r14: the hash is computed inside the native shingle_hashes
    // expression (same xxhash64 values — TextExpressionsSpec pins the
    // bit-equality); the join key must still be the 64-bit hash column
    assert(plan.contains("shingle_hashes"),
      "join key must be the 64-bit shingle hash")
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

  test("sequence packing conserves tokens and packs within budget") {
    val out = PipelineQueries.queries("d_pack_sequences")(spark, dir).collect()
    val docs = graft.Tables.documents(spark, dir)
    // token conservation: shard totals sum to the direct per-doc sum
    val direct = docs.select(expr("sum(n_chars DIV 4 + 1)")).first.getLong(0)
    assert(out.map(_.getAs[Long]("total_tokens")).sum === direct)
    assert(out.map(_.getAs[Long]("n_docs")).sum === docs.count())
    out.foreach { r =>
      val (tot, nPacks) = (r.getAs[Long]("total_tokens"), r.getAs[Long]("n_packs"))
      assert(nPacks === (tot + 2047) / 2048) // exact chunk count
      assert(r.getAs[Long]("n_spanning") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("max_span") >= 1)
      // a doc of ≤2048 tokens can span at most 2 packs only by straddling
      // a boundary; max span is bounded by ceil(max_tokens/2048)+1
      assert(r.getAs[Long]("max_span") <= 3)
    }
  }

  test("span dedup: flagged docs share spans symmetrically; fracs in (0,1]") {
    val out = PipelineQueries.queries("d_span_dedup")(spark, dir).collect()
    out.foreach { r =>
      assert(r.getAs[Long]("n_dup_spans") > 0)
      assert(r.getAs[Long]("n_dup_spans") <= r.getAs[Long]("n_spans"))
      val f = r.getAs[Double]("dup_frac")
      assert(f > 0.0 && f <= 1.0)
    }
    // span sharing is symmetric: a flagged doc implies >= 2 flagged docs
    assert(out.isEmpty || out.length >= 2)
    // exact duplicates (same text) must both be flagged with dup_frac 1.0
    val docs = graft.Tables.documents(spark, dir)
    val dupIds = docs.where(size(split(col("text"), " ")) >= 8)
      .groupBy(col("text")).agg(collect_list(col("doc_id")).as("ids"))
      .where(size(col("ids")) >= 2)
      .select(explode(col("ids")).as("doc_id"))
      .collect().map(_.getLong(0)).toSet
    val flagged = out.map(_.getAs[Long]("doc_id")).toSet
    val fullDup = out.filter(r => dupIds.contains(r.getAs[Long]("doc_id")))
    assert(dupIds.subsetOf(flagged))
    fullDup.foreach(r => assert(r.getAs[Double]("dup_frac") === 1.0))
  }

  test("incremental dedup partitions the batch into corpus-dup/batch-dup/kept") {
    val out = PipelineQueries.queries("d_incremental_dedup")(spark, dir).collect()
    val docs = graft.Tables.documents(spark, dir)
    val nBatch = docs.where(
      substring(md5(concat(lit("inc"), col("doc_id").cast("string"))), 1, 1) >= "c")
      .count()
    assert(out.map(_.getAs[Long]("n_batch")).sum === nBatch)
    out.foreach { r =>
      // the three outcomes are exhaustive and disjoint
      assert(r.getAs[Long]("n_dup_corpus") + r.getAs[Long]("n_dup_batch") +
        r.getAs[Long]("n_kept") === r.getAs[Long]("n_batch"))
    }
    // kept docs are genuinely novel: re-running keeps them again
    val again = PipelineQueries.queries("d_incremental_dedup")(spark, dir).collect()
    assert(out.toSeq === again.toSeq)
  }

  test("mixture resample keeps the scarcest group whole, rates in (0,1]") {
    val out = PipelineQueries.queries("d_mixture_resample")(spark, dir).collect()
    assert(out.map(_.getAs[Long]("grp")).toSeq === Seq(0L, 1L, 2L))
    out.foreach { r =>
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_total"))
      val rate = r.getAs[Double]("rate")
      assert(rate > 0.0 && rate <= 1.0)
    }
    // the binding (scarcest-relative-to-target) group is kept at 100%
    assert(out.exists(_.getAs[Double]("rate") === 1.0))
    // achieved token shares approximate the 0.5/0.3/0.2 targets: the
    // hash threshold has 1/65536 granularity, the corpus is small, so
    // allow a loose band — the DuckDB oracle pins exactness anyway
    val keptTok = out.map(r => r.getAs[Long]("grp") -> r.getAs[Long]("kept_tokens")).toMap
    val total = keptTok.values.sum.toDouble
    val targets = Map(0L -> 0.5, 1L -> 0.3, 2L -> 0.2)
    targets.foreach { case (g, w) =>
      assert(math.abs(keptTok(g) / total - w) < 0.1,
        s"group $g share ${keptTok(g) / total} far from target $w")
    }
  }
}
