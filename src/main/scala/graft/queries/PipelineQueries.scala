package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.text.TextFunctions._

/** Corpus-curation operators for large-scale training-data pipelines
  * (builder brief, beyond the reference surface): deterministic
  * train/val/test splitting, stratified sampling, benchmark
  * decontamination via n-gram overlap, vocabulary/document-frequency
  * tables, and per-stratum length quantiles.
  *
  * Everything is expressed as hash/expression algebra over columns —
  * no RNG, no UDFs — so (a) results are reproducible run-to-run and
  * engine-to-engine (the DuckDB oracle replicates each query exactly),
  * and (b) at 100 TB every operator stays embarrassingly parallel:
  * splits and samples are stateless per-row md5 predicates (no global
  * coordination, no sampled pass), decontamination is an inverted-
  * index equi-join on the shingle key, and the quantile scan reduces
  * to one shuffle keyed by the (low-cardinality) stratum.
  */
object PipelineQueries extends QueryModule {

  /** First hex nibble of the salted row hash — a uniform 16-bucket
    * lattice: '0'-'b' ↦ 75%, 'c'-'d' ↦ 12.5%, 'e'-'f' ↦ 12.5%.
    */
  private def hashNibble(id: org.apache.spark.sql.Column, salt: String) =
    substring(md5(concat(lit(salt), id.cast("string"))), 1, 1)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Deterministic train/val/test split: the assignment is a pure
    // function of doc_id, so it is stable under corpus growth,
    // re-shards, and re-runs — the property a 100 TB pipeline needs
    // (rand()-based splits reshuffle docs whenever partitioning
    // changes). No shuffle for the assignment itself; only the audit
    // rollup below aggregates.
    "d_hash_split" -> { (s, dir) =>
      val nib = hashNibble(col("doc_id"), "")
      Tables.documents(s, dir)
        .withColumn("split",
          when(nib.between("0", "b"), "train")
            .when(nib.isin("c", "d"), "val")
            .otherwise("test"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          countDistinct(col("lang")).as("n_langs"),
          round(avg(col("n_chars")) + lit(1e-9), 4).as("avg_chars"))
        .orderBy("split")
    },

    // Stratified sampling with per-stratum rates (quality-weighted
    // corpus mixing): keep a doc iff its salted hash nibble clears the
    // stratum's threshold — en downsampled to 25%, zh to 50%, the rest
    // kept at 75%. Same statelessness argument as d_hash_split; the
    // audit reports achieved rates per stratum.
    "d_stratified_sample" -> { (s, dir) =>
      val nib = hashNibble(col("doc_id"), "smp")
      val kept = when(col("lang") === "en", nib < "4")
        .when(col("lang") === "zh", nib < "8")
        .otherwise(nib < "c")
      Tables.documents(s, dir)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_total"),
          count(when(kept, 1)).as("n_kept"),
          round(count(when(kept, 1)) / count(lit(1)).cast("double")
            + lit(1e-9), 4).as("rate"))
        .orderBy("lang")
    },

    // Fixed-size per-stratum sample (the "n examples per language"
    // eval-set builder; complements d_stratified_sample's per-RATE
    // keep): rank docs inside each stratum by salted hash — a
    // deterministic shuffle — and keep the first 5. Stable under
    // corpus growth ONLY in distribution (a new doc can displace a
    // sampled one: fixed-n is a competition, unlike the stateless
    // rate filter); the window runs per stratum over (id, hash) pairs.
    "d_topn_per_stratum" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("lang")
        .orderBy(md5(concat(lit("topn"), col("doc_id").cast("string"))),
          col("doc_id"))
      Tables.documents(s, dir)
        .withColumn("pick", row_number().over(w).cast("long"))
        .where(col("pick") <= 5)
        .select(col("lang"), col("pick"), col("doc_id"), col("n_chars"))
        .orderBy("lang", "pick")
    },

    // Benchmark decontamination: test docs (odd doc_id) sharing any
    // 5-gram with any train doc (even doc_id). The join key is the
    // shingle itself (an inverted index): at 100 TB the test side is
    // tiny relative to train, so its shingle set broadcasts and the
    // train scan filters map-side — no shuffle of the train corpus.
    "t_decontaminate" -> { (s, dir) =>
      // parity filter BEFORE shingling: each branch tokenizes only its
      // own half of the corpus (the self-join re-evaluates the subtree,
      // so pre-filtering halves the shingle work twice over)
      // the join key is the 64-bit shingle hash, not the shingle
      // string: the train side then shuffles 16 bytes/row instead of
      // ~40, and per-test-doc distinct counts stay exact over the
      // hashed key (a cross-shingle collision is ~n²/2⁶⁵; the 3-SF
      // strict gate would surface one)
      // r14: shingle+hash computed by the native ShingleHashExpr (one
      // compiled pass, identical hash multiset) — the interpreted HOF
      // chain (transform(slice→array_join) → array_distinct → xxhash64)
      // measured 47 s of task time on this branch alone at sf0.1
      def sh(parity: Int) = Tables.documentsSpread(s, dir)
        .where(col("doc_id") % 2 === parity && tokenCount(col("text")) >= 5)
        .select(col("doc_id"),
          explode(graft.functions.TextExpressions
            .shingleHashesCol(col("text"), 5)).as("h"))
      val train = sh(0).select(col("h"), col("doc_id").as("train_id"))
      val test = sh(1)
      // shuffle-hash, not broadcast: both sides are already spread, and
      // a broadcast would serialize the whole train shingle relation
      // through one driver thread. (At real scale the *test* side is
      // the broadcast candidate; here both halves are corpus-sized.)
      // the two distinct-aggregates Expand-multiply the join output ×2,
      // but measured at 100× that is CHEAPER than splitting into two
      // aggregates (19.4 s vs 14.9 s): the split re-evaluates the
      // shingle join itself twice, and the join dominates the Expand
      test.join(train.hint("shuffle_hash"), "h")
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("h")).as("n_shared"),
          countDistinct(col("train_id")).as("n_train_docs"),
          min(col("train_id")).as("first_train"))
        .orderBy("doc_id")
    },

    // Vocabulary / document-frequency table (the IDF side of
    // tokenizer + filter construction): one exploded pass, hash-agg on
    // the word. Map-side partial aggregation folds each partition's
    // token stream before the exchange, so only per-word partials
    // shuffle — the classic scalable word-count shape.
    "t_vocab_idf" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val n = broadcast(docs.agg(count(lit(1)).as("n_docs")))
      docs.select(col("doc_id"), explode(tokens(col("text"))).as("w"))
        .groupBy(col("w"))
        .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
        .crossJoin(n)
        .select(col("w"), col("tf"), col("df"),
          round(log((col("n_docs") + 1).cast("double") / (col("df") + 1))
            + lit(1e-9), 6).as("idf"))
        .orderBy("w")
    },

    // Intra-document repetition ratio (the Gopher-style "repeated
    // n-gram fraction" quality signal): 1 − distinct/total 3-gram
    // shingles, plus the duplicate-token proxy. Entirely row-local —
    // no shuffle, no explode — and computed by the native RepStatsExpr
    // (one string pass + HashSet dedup per doc; the HOF form it
    // replaced materialized two Catalyst string arrays per doc in
    // interpreted lambdas and measured 33 s at the 100× probe).
    "t_repetition" -> { (s, dir) =>
      import graft.functions.TextExpressions
      Tables.documentsSpread(s, dir)
        .where(tokenCount(col("text")) >= 3)
        .select(col("doc_id"), TextExpressions.repStatsCol(col("text")).as("r"))
        .select(col("doc_id"),
          col("r.n_grams").as("n_grams"),
          col("r.n_distinct_grams").as("n_distinct_grams"),
          round(lit(1.0) - col("r.n_distinct_grams")
            / col("r.n_grams").cast("double") + lit(1e-9), 4).as("rep3"),
          round(lit(1.0) - col("r.n_distinct_tokens")
            / col("r.n_tokens").cast("double") + lit(1e-9), 4).as("rep1"))
        .orderBy("doc_id")
    },

    // Cross-source duplicate overlap (provenance audit): word-set
    // fingerprint groups spanning >1 source — which sources feed each
    // other's duplicates. One fingerprint aggregate + one rollup.
    "d_source_overlap" -> { (s, dir) =>
      val fp = Tables.documentsSpread(s, dir)
        .select(col("doc_id"), col("source"), wordSetFingerprint(col("text")).as("fp"))
      fp.groupBy(col("fp"))
        .agg(countDistinct(col("source")).as("n_sources"),
          count(lit(1)).as("n_docs"),
          min(col("source")).as("first_source"),
          max(col("source")).as("last_source"))
        .where(col("n_sources") > 1)
        .orderBy("fp")
    },

    // TF-IDF sparse cosine similarity (similarity search WITHOUT
    // embeddings): tf·idf term weights, per-doc norms, then the pair
    // dot products via a self-join on the term — an inverted-index
    // join, never a cross join. MAX-DF PRUNE (the all-pairs-similarity
    // safety valve): a term in k docs contributes k² candidate pairs,
    // so ONE stop-word-like term at corpus scale is quadratic. Terms
    // with df > maxDfFrac·N are dropped from the index entirely
    // (weights, norms, AND join — both engines, so the gate stays
    // exact). Soundness: every dropped term has
    // idf = ln((N+1)/(df+1)) < ln(1/maxDfFrac)+ε — the near-floor
    // weights of function words — while dominating posting lists; with
    // the prune, candidate pairs are bounded by Σ_w df_w·maxDf ≤
    // maxDf × index size, i.e. LINEAR in the corpus for a fixed
    // absolute cap (at 100 TB set maxDf as an absolute count, not a
    // fraction; TfidfPruneSpec measures the bound with a hot term
    // injected).
    "t_tfidf_cosine" -> { (s, dir) =>
      // (r14: a lazy checkpoint of `tf` was measured and REJECTED,
      // +0.25 s — `wts` below is already truncated, and the extra
      // barrier on this cheap subtree cost more than its recompute)
      val tf = Tables.documentsSpread(s, dir)
        .where(col("doc_id") < 120)
        .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
        .groupBy(col("doc_id"), col("w"))
        .agg(count(lit(1)).as("tf"))
      val df = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
      val n = broadcast(tf.select(col("doc_id")).distinct()
        .agg(count(lit(1)).as("n_docs")))
      // the weight relation feeds FOUR consumers (self-join a/b + two
      // norm joins); without materialization Spark re-derives the
      // tf/df/corpus-scan subtree once per consumer. Lazy local
      // checkpoint = one corpus pass per execution (still timed by the
      // bench — each run builds a fresh plan); at cluster scale this is
      // the "persist the weights table" step of a TF-IDF pipeline.
      val wts = tf.join(df, "w").crossJoin(n)
        .where(col("df") <= col("n_docs") * lit(0.5))
        .select(col("doc_id"), col("w"),
          (col("tf") * log((col("n_docs") + 1).cast("double") / (col("df") + 1)))
            .as("wt"))
        .transform(graft.core.Lineage.truncate(_, eager = false))
      val norms = wts.groupBy(col("doc_id"))
        .agg(sqrt(sum(col("wt") * col("wt"))).as("nrm"))
      val a = wts.select(col("w"), col("doc_id").as("i"), col("wt").as("wi"))
      val b = wts.select(col("w"), col("doc_id").as("j"), col("wt").as("wj"))
      a.join(b, "w").where(col("i") < col("j"))
        .groupBy(col("i"), col("j"))
        .agg(sum(col("wi") * col("wj")).as("dot"), count(lit(1)).as("n_shared"))
        .join(norms.select(col("doc_id").as("i"), col("nrm").as("ni")), "i")
        .join(norms.select(col("doc_id").as("j"), col("nrm").as("nj")), "j")
        .where(col("dot") / (col("ni") * col("nj")) >= 0.5)
        .select(col("i"), col("j"), col("n_shared"),
          round(col("dot") / (col("ni") * col("nj")) + lit(1e-9), 4).as("cos"))
        .orderBy("i", "j")
    },

    // Per-language length quantiles (exact interpolated percentiles) —
    // the length-filter calibration step of corpus curation. Exact
    // percentile needs the stratum sorted, but the stratum key is
    // low-cardinality, so at scale this is one shuffle of (lang,
    // n_chars) pairs; for streaming/huge strata the approx_percentile
    // sketch is the drop-in (t-digest, mergeable partials).
    "t_length_quantiles" -> { (s, dir) =>
      Tables.documents(s, dir)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          percentile(col("n_chars"), lit(0.25)).as("q25_raw"),
          percentile(col("n_chars"), lit(0.5)).as("q50_raw"),
          percentile(col("n_chars"), lit(0.9)).as("q90_raw"))
        .select(col("lang"), col("n_docs"),
          round(col("q25_raw") + lit(1e-9), 4).as("p25"),
          round(col("q50_raw") + lit(1e-9), 4).as("p50"),
          round(col("q90_raw") + lit(1e-9), 4).as("p90"))
        .orderBy("lang")
    },

    // Sequence packing (concat-and-chunk): documents are concatenated
    // in deterministic order and split at exact token boundaries into
    // fixed-budget context windows — the GPT-style pretraining batch
    // builder, where a document may span adjacent packs. Each doc's
    // pack span is pure arithmetic on a running token sum, so the
    // whole operator is ONE window sum per shard: the corpus is
    // hash-sharded (16 shards here; a wider hash prefix at 100 TB)
    // and every shard packs independently in parallel — no global
    // sort, no sequential scan. Token counts use a deterministic
    // chars/4 proxy (no tokenizer in either engine). Integer-only
    // output ⇒ hash-exact across engines.
    "d_pack_sequences" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.documents(s, dir)
        .withColumn("shard",
          substring(md5(concat(lit("pack"), col("doc_id").cast("string"))), 1, 1))
        .withColumn("tokens", expr("n_chars DIV 4 + 1"))
        .withColumn("start_tok",
          coalesce(sum(col("tokens")).over(w), lit(0L)))
        .withColumn("first_pack", expr("start_tok DIV 2048"))
        .withColumn("last_pack", expr("(start_tok + tokens - 1) DIV 2048"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("tokens")).as("total_tokens"),
          count(when(col("last_pack") > col("first_pack"), 1)).as("n_spanning"),
          max(col("last_pack") - col("first_pack") + lit(1L)).as("max_span"))
        .select(col("shard"), col("n_docs"), col("total_tokens"),
          expr("(total_tokens + 2047) DIV 2048").as("n_packs"),
          col("n_spanning"), col("max_span"))
        .orderBy("shard")
    },

    // Sliding-window context chunker (the RAG/eval-harness splitter,
    // complementing d_pack_sequences' concat-and-chunk): each document
    // splits into 256-token windows advancing by a 192-token stride
    // (64 overlap), last window clamped to the tail. Window count and
    // bounds are pure per-doc arithmetic — a generator expression, NO
    // shuffle until the final audit aggregate, so at 100 TB this is a
    // map-side explode whose output is bounded by corpus_tokens/stride.
    // Token counts use the deterministic chars/4 proxy shared with
    // d_pack_sequences; integer-only output => hash-exact.
    "d_chunk_overlap" -> { (s, dir) =>
      val win = 256L
      val stride = 192L
      val chunks = Tables.documents(s, dir)
        .withColumn("tokens", expr("n_chars DIV 4 + 1"))
        .withColumn("n_chunks",
          when(col("tokens") <= win, lit(1L))
            .otherwise(expr(s"(tokens - $win + $stride - 1) DIV $stride + 1")))
        .select(col("doc_id"), col("tokens"), col("n_chunks"),
          explode(expr("sequence(0, n_chunks - 1)")).as("chunk_idx"))
        .withColumn("tok_start",
          least(col("chunk_idx") * stride,
            greatest(col("tokens") - win, lit(0L))))
        .withColumn("tok_len", least(lit(win), col("tokens") - col("tok_start")))
      // tokens is functionally dependent on doc_id and already rides
      // every pre-aggregation row — grouping by both (exactly the
      // oracle's GROUP BY 1,2) keeps the query one-scan, one-exchange
      chunks.groupBy(col("doc_id"), col("tokens"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(col("tok_len")).as("chunk_tokens"),
          max(col("tok_start") + col("tok_len")).as("covered_to"),
          min(col("tok_len")).as("min_len"))
        // invariants the oracle re-derives: full coverage, overlap
        // accounting exact
        .select(col("doc_id"), col("tokens"), col("n_chunks"),
          col("chunk_tokens"), col("covered_to"), col("min_len"))
        .orderBy("doc_id")
    },

    // Span-level dedup audit (boilerplate detection): for every doc,
    // the fraction of its distinct 8-word spans that also occur in
    // some OTHER doc — the sub-document granularity that catches
    // shared boilerplate exact-dedup misses (full-doc fingerprints
    // differ) and pairwise near-dup never enumerates (this is
    // corpus-wide span frequency, not doc×doc similarity). Spans
    // travel as 64-bit hashes: the heavy joins shuffle 8-byte keys,
    // never span text (same inverted-index shape as t_decontaminate).
    "d_span_dedup" -> { (s, dir) =>
      // r14: native one-pass shingle hashing (see t_decontaminate) and
      // a lazy lineage truncate: `sh` feeds BOTH the span-frequency
      // aggregate and the join back, so untruncated the shingle pass
      // ran twice (measured 31 s + 11 s of task time at sf0.1); the
      // checkpointed relation is (long, long) rows — the span TEXT
      // never persists, matching the operator's shuffle contract
      val sh = graft.core.Lineage.truncate(
        Tables.documentsSpread(s, dir)
          .select(col("doc_id"),
            explode(graft.functions.TextExpressions
              .shingleHashesCol(col("text"), 8)).as("h")),
        eager = false)
      val spanDocs = sh.groupBy(col("h"))
        .agg(countDistinct(col("doc_id")).as("ndocs"))
      sh.join(spanDocs, Seq("h"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_spans"),
          count(when(col("ndocs") >= 2, 1)).as("n_dup_spans"))
        .where(col("n_dup_spans") > 0)
        .select(col("doc_id"), col("n_spans"), col("n_dup_spans"),
          round(col("n_dup_spans") / col("n_spans").cast("double")
            + lit(1e-9), 4).as("dup_frac"))
        .orderBy("doc_id")
    },

    // Incremental dedup: a new crawl batch (25% of docs by salted
    // hash, standing in for "today's crawl") deduped against the
    // existing corpus AND within itself — the daily-ingest shape of
    // exact dedup. Everything joins on the text fingerprint, never
    // the text: the corpus side reduces to distinct fps (one shuffle,
    // map-side combinable) and at 100 TB that fingerprint set is the
    // only state the incremental pipeline carries forward.
    "d_incremental_dedup" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
        .withColumn("fp", md5(col("text")))
        .withColumn("is_batch", hashNibble(col("doc_id"), "inc") >= "c")
      val corpusFps = docs.where(!col("is_batch"))
        .select(col("fp")).distinct()
        .withColumn("in_corpus", lit(true))
      val firstInBatch = docs.where(col("is_batch"))
        .groupBy(col("fp")).agg(min(col("doc_id")).as("first_id"))
      docs.where(col("is_batch"))
        .join(corpusFps, Seq("fp"), "left")
        .join(firstInBatch, Seq("fp"))
        .withColumn("dup_corpus", coalesce(col("in_corpus"), lit(false)))
        .withColumn("dup_batch", !col("dup_corpus") && col("doc_id") > col("first_id"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_batch"),
          count(when(col("dup_corpus"), 1)).as("n_dup_corpus"),
          count(when(col("dup_batch"), 1)).as("n_dup_batch"),
          count(when(!col("dup_corpus") && !col("dup_batch"), 1)).as("n_kept"))
        .orderBy("lang")
    },

    // Balanced shard writer (size-aware output sharding): split the
    // corpus into 8 shards whose TOKEN totals are near-equal, so every
    // downstream reader gets the same work — serpentine assignment
    // over the (tokens DESC, doc_id) rank, imbalance bounded by one
    // document. The rank is computed WITHOUT a single-partition window
    // (percentile-boundary buckets + local rank + broadcast prefix
    // offsets — ops.BalancedShards); the oracle's global row_number() is
    // plan-equivalent but only the distributed form survives 100 TB.
    // Integer-only output ⇒ hash-exact across engines.
    "d_balanced_shards" -> { (s, dir) =>
      import graft.ops.BalancedShards
      val docs = Tables.documents(s, dir)
        .withColumn("tokens", expr("n_chars DIV 4 + 1"))
      BalancedShards.assign(docs, col("doc_id"), col("tokens"), 8)
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("tokens")).as("total_tokens"),
          max(col("tokens")).as("max_doc_tokens"))
        .orderBy("shard")
    },

    // Mixture resampling to target source proportions: sources fall
    // into 3 mixture groups; each group's keep-probability is scaled
    // so achieved token shares hit the 0.5/0.3/0.2 target, with the
    // scarcest group kept whole (T = min tokens_g/w_g — the largest
    // total the targets allow). The keep decision is a stateless
    // salted-hash threshold (no RNG: reproducible and re-shard-proof
    // like d_hash_split); the group rates come from a 3-row aggregate
    // BROADCAST back, so at 100 TB this is one tiny dim join plus a
    // map-side filter — the corpus never shuffles.
    "d_mixture_resample" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
        .withColumn("grp", expr("CAST(CAST(substr(source, 4) AS INT) % 3 AS BIGINT)"))
        .withColumn("tokens", expr("n_chars DIV 4 + 1"))
      val target = when(col("grp") === 0, lit(0.5))
        .when(col("grp") === 1, lit(0.3)).otherwise(lit(0.2))
      val grpStats = docs.groupBy(col("grp"))
        .agg(sum(col("tokens")).cast("double").as("grp_tokens"))
        .withColumn("w", target)
      val tMax = grpStats.agg(min(col("grp_tokens") / col("w")).as("t_max"))
      val withP = grpStats.crossJoin(broadcast(tMax))
        .withColumn("p", col("w") * col("t_max") / col("grp_tokens"))
        .select(col("grp"), col("w"), col("p"))
      val thresh = lpad(lower(hex(floor(col("p") * lit(65536.0) + lit(1e-9))
        .cast("long"))), 4, "0")
      val kept = (col("p") >= lit(1.0) - lit(1e-9)) ||
        (substring(md5(concat(lit("mix"), col("doc_id").cast("string"))), 1, 4)
          < thresh)
      docs.join(broadcast(withP), "grp")
        .groupBy(col("grp"), col("w"))
        .agg(count(lit(1)).as("n_total"),
          count(when(kept, 1)).as("n_kept"),
          sum(when(kept, col("tokens")).otherwise(lit(0L))).as("kept_tokens"),
          round(count(when(kept, 1)) / count(lit(1)).cast("double")
            + lit(1e-9), 4).as("rate"))
        .orderBy("grp")
    }
  )

  def oracle: Map[String, String] = Map(
    "d_hash_split" ->
      """WITH t AS (SELECT *,
        |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)),1,1) BETWEEN '0' AND 'b'
        |         THEN 'train'
        |       WHEN substr(md5(CAST(doc_id AS VARCHAR)),1,1) IN ('c','d')
        |         THEN 'val'
        |       ELSE 'test' END AS split
        |  FROM documents)
        |SELECT split, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |       count(DISTINCT lang) AS n_langs,
        |       round(avg(n_chars) + 1e-9, 4) AS avg_chars
        |FROM t GROUP BY 1 ORDER BY split""".stripMargin,

    "d_stratified_sample" ->
      """WITH t AS (SELECT lang,
        |  CASE WHEN lang = 'en' THEN substr(md5('smp' || CAST(doc_id AS VARCHAR)),1,1) < '4'
        |       WHEN lang = 'zh' THEN substr(md5('smp' || CAST(doc_id AS VARCHAR)),1,1) < '8'
        |       ELSE substr(md5('smp' || CAST(doc_id AS VARCHAR)),1,1) < 'c'
        |  END AS kept
        |  FROM documents)
        |SELECT lang, count(*) AS n_total,
        |       count(CASE WHEN kept THEN 1 END) AS n_kept,
        |       round(count(CASE WHEN kept THEN 1 END)
        |             / CAST(count(*) AS DOUBLE) + 1e-9, 4) AS rate
        |FROM t GROUP BY 1 ORDER BY lang""".stripMargin,

    "d_topn_per_stratum" ->
      """WITH r AS (SELECT lang, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5('topn' || CAST(doc_id AS VARCHAR)), doc_id) AS pick
        |  FROM documents)
        |SELECT lang, pick, doc_id, n_chars FROM r
        |WHERE pick <= 5 ORDER BY lang, pick""".stripMargin,

    "t_decontaminate" ->
      """WITH toks AS (SELECT doc_id, string_split(text,' ') t FROM documents),
        |sh AS (SELECT DISTINCT doc_id,
        |         unnest(list_transform(range(1, len(t)-3),
        |                i -> array_to_string(t[i:i+4], ' '))) s
        |       FROM toks WHERE len(t) >= 5)
        |SELECT te.doc_id AS doc_id, count(DISTINCT te.s) AS n_shared,
        |       count(DISTINCT tr.doc_id) AS n_train_docs,
        |       min(tr.doc_id) AS first_train
        |FROM sh te JOIN sh tr ON te.s = tr.s
        |WHERE te.doc_id % 2 = 1 AND tr.doc_id % 2 = 0
        |GROUP BY 1 ORDER BY doc_id""".stripMargin,

    "t_vocab_idf" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS w
        |             FROM documents),
        |n AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT w, count(*) AS tf, count(DISTINCT doc_id) AS df,
        |       round(ln((n.n_docs + 1) / CAST(count(DISTINCT doc_id) + 1 AS DOUBLE))
        |             + 1e-9, 6) AS idf
        |FROM tok, n GROUP BY w, n.n_docs ORDER BY w""".stripMargin,

    "t_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(text,' ') tk FROM documents),
        |g AS (SELECT doc_id, tk,
        |         list_transform(range(1, len(tk)-1),
        |                        i -> array_to_string(tk[i:i+2], ' ')) sh
        |      FROM t WHERE len(tk) >= 3)
        |SELECT doc_id, len(sh) AS n_grams,
        |       len(list_distinct(sh)) AS n_distinct_grams,
        |       round(1.0 - len(list_distinct(sh)) / CAST(len(sh) AS DOUBLE)
        |             + 1e-9, 4) AS rep3,
        |       round(1.0 - len(list_distinct(tk)) / CAST(len(tk) AS DOUBLE)
        |             + 1e-9, 4) AS rep1
        |FROM g ORDER BY doc_id""".stripMargin,

    "d_source_overlap" ->
      """WITH fp AS (SELECT doc_id, source,
        |    md5(array_to_string(list_sort(list_distinct(string_split(text,' '))), ' ')) AS fp
        |  FROM documents)
        |SELECT fp, count(DISTINCT source) AS n_sources, count(*) AS n_docs,
        |       min(source) AS first_source, max(source) AS last_source
        |FROM fp GROUP BY 1 HAVING count(DISTINCT source) > 1
        |ORDER BY fp""".stripMargin,

    "t_tfidf_cosine" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS w
        |             FROM documents WHERE doc_id < 120),
        |tf AS (SELECT doc_id, w, count(*) AS tf FROM tok GROUP BY 1, 2),
        |df AS (SELECT w, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tf),
        |wts AS (SELECT doc_id, tf.w,
        |          tf * ln((n.n_docs + 1) / CAST(df + 1 AS DOUBLE)) AS wt
        |        FROM tf JOIN df ON tf.w = df.w CROSS JOIN n
        |        WHERE df <= n.n_docs * 0.5),
        |norms AS (SELECT doc_id, sqrt(sum(wt*wt)) AS nrm FROM wts GROUP BY 1),
        |dots AS (SELECT a.doc_id i, b.doc_id j, sum(a.wt*b.wt) AS dot,
        |                count(*) AS n_shared
        |         FROM wts a JOIN wts b ON a.w = b.w AND a.doc_id < b.doc_id
        |         GROUP BY 1, 2)
        |SELECT i, j, n_shared,
        |       round(dot / (ni.nrm * nj.nrm) + 1e-9, 4) AS cos
        |FROM dots JOIN norms ni ON ni.doc_id = i JOIN norms nj ON nj.doc_id = j
        |WHERE dot / (ni.nrm * nj.nrm) >= 0.5 ORDER BY i, j""".stripMargin,

    "t_length_quantiles" ->
      """SELECT lang, count(*) AS n_docs,
        |       round(quantile_cont(n_chars, 0.25) + 1e-9, 4) AS p25,
        |       round(quantile_cont(n_chars, 0.5) + 1e-9, 4) AS p50,
        |       round(quantile_cont(n_chars, 0.9) + 1e-9, 4) AS p90
        |FROM documents GROUP BY 1 ORDER BY lang""".stripMargin,

    "d_chunk_overlap" ->
      """WITH d AS (SELECT doc_id, CAST(n_chars // 4 + 1 AS BIGINT) AS tokens
        |           FROM documents),
        |c AS (SELECT doc_id, tokens,
        |        CAST(CASE WHEN tokens <= 256 THEN 1
        |             ELSE (tokens - 256 + 191) // 192 + 1 END AS BIGINT)
        |          AS n_chunks
        |      FROM d),
        |x AS (SELECT doc_id, tokens, n_chunks,
        |        unnest(range(n_chunks)) AS chunk_idx FROM c),
        |y AS (SELECT doc_id, tokens, n_chunks,
        |        least(chunk_idx * 192, greatest(tokens - 256, 0)) AS tok_start
        |      FROM x),
        |z AS (SELECT *, least(256, tokens - tok_start) AS tok_len FROM y)
        |SELECT doc_id, tokens, CAST(count(*) AS BIGINT) AS n_chunks,
        |       CAST(sum(tok_len) AS BIGINT) AS chunk_tokens,
        |       CAST(max(tok_start + tok_len) AS BIGINT) AS covered_to,
        |       CAST(min(tok_len) AS BIGINT) AS min_len
        |FROM z GROUP BY 1, 2 ORDER BY doc_id""".stripMargin,

    "d_pack_sequences" ->
      """WITH d AS (SELECT doc_id,
        |    substr(md5('pack' || CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
        |    n_chars // 4 + 1 AS tokens FROM documents),
        |p AS (SELECT shard, tokens,
        |    CAST(COALESCE(sum(tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS start_tok
        |  FROM d),
        |q AS (SELECT shard, tokens, start_tok // 2048 AS first_pack,
        |    (start_tok + tokens - 1) // 2048 AS last_pack FROM p)
        |SELECT shard, count(*) AS n_docs,
        |       CAST(sum(tokens) AS BIGINT) AS total_tokens,
        |       CAST((sum(tokens) + 2047) // 2048 AS BIGINT) AS n_packs,
        |       count(CASE WHEN last_pack > first_pack THEN 1 END) AS n_spanning,
        |       CAST(max(last_pack - first_pack + 1) AS BIGINT) AS max_span
        |FROM q GROUP BY 1 ORDER BY shard""".stripMargin,

    "d_span_dedup" ->
      """WITH toks AS (SELECT doc_id, string_split(text,' ') t FROM documents),
        |sh AS (SELECT DISTINCT doc_id,
        |         unnest(list_transform(range(1, len(t)-6),
        |                i -> array_to_string(t[i:i+7], ' '))) s
        |       FROM toks WHERE len(t) >= 8),
        |sd AS (SELECT s, count(DISTINCT doc_id) AS ndocs FROM sh GROUP BY 1)
        |SELECT sh.doc_id AS doc_id, count(*) AS n_spans,
        |       count(CASE WHEN sd.ndocs >= 2 THEN 1 END) AS n_dup_spans,
        |       round(count(CASE WHEN sd.ndocs >= 2 THEN 1 END)
        |             / CAST(count(*) AS DOUBLE) + 1e-9, 4) AS dup_frac
        |FROM sh JOIN sd ON sh.s = sd.s
        |GROUP BY 1 HAVING count(CASE WHEN sd.ndocs >= 2 THEN 1 END) > 0
        |ORDER BY doc_id""".stripMargin,

    "d_incremental_dedup" ->
      """WITH d AS (SELECT doc_id, lang, md5(text) AS fp,
        |    substr(md5('inc' || CAST(doc_id AS VARCHAR)), 1, 1) >= 'c' AS is_batch
        |  FROM documents),
        |c AS (SELECT DISTINCT fp FROM d WHERE NOT is_batch),
        |f AS (SELECT fp, min(doc_id) AS first_id FROM d WHERE is_batch GROUP BY 1),
        |b AS (SELECT d.lang, d.doc_id,
        |    (c.fp IS NOT NULL) AS dup_corpus,
        |    (c.fp IS NULL AND d.doc_id > f.first_id) AS dup_batch
        |  FROM d JOIN f ON d.fp = f.fp
        |  LEFT JOIN c ON d.fp = c.fp
        |  WHERE d.is_batch)
        |SELECT lang, count(*) AS n_batch,
        |       count(CASE WHEN dup_corpus THEN 1 END) AS n_dup_corpus,
        |       count(CASE WHEN dup_batch THEN 1 END) AS n_dup_batch,
        |       count(CASE WHEN NOT dup_corpus AND NOT dup_batch THEN 1 END)
        |         AS n_kept
        |FROM b GROUP BY 1 ORDER BY lang""".stripMargin,

    "d_balanced_shards" ->
      """WITH d AS (SELECT doc_id, n_chars // 4 + 1 AS tokens FROM documents),
        |r AS (SELECT doc_id, tokens,
        |    row_number() OVER (ORDER BY tokens DESC, doc_id) - 1 AS rn FROM d),
        |a AS (SELECT tokens,
        |    CAST(CASE WHEN (rn // 8) % 2 = 0 THEN rn % 8
        |              ELSE 7 - rn % 8 END AS BIGINT) AS shard FROM r)
        |SELECT shard, count(*) AS n_docs,
        |       CAST(sum(tokens) AS BIGINT) AS total_tokens,
        |       CAST(max(tokens) AS BIGINT) AS max_doc_tokens
        |FROM a GROUP BY 1 ORDER BY shard""".stripMargin,

    "d_mixture_resample" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(CAST(substr(source, 4) AS INT) % 3 AS BIGINT) AS grp,
        |    n_chars // 4 + 1 AS tokens FROM documents),
        |g AS (SELECT grp,
        |    CASE grp WHEN 0 THEN CAST(0.5 AS DOUBLE)
        |             WHEN 1 THEN CAST(0.3 AS DOUBLE)
        |             ELSE CAST(0.2 AS DOUBLE) END AS w,
        |    CAST(sum(tokens) AS DOUBLE) AS grp_tokens
        |  FROM d GROUP BY 1),
        |t AS (SELECT min(grp_tokens / w) AS t_max FROM g),
        |p AS (SELECT grp, w, w * t_max / grp_tokens AS p FROM g CROSS JOIN t),
        |k AS (SELECT d.grp, p.w, d.tokens,
        |    (p.p >= 1.0 - 1e-9 OR
        |     substr(md5('mix' || CAST(d.doc_id AS VARCHAR)), 1, 4) <
        |       lpad(lower(to_hex(CAST(floor(p.p * 65536.0 + 1e-9) AS BIGINT))),
        |            4, '0')) AS kept
        |  FROM d JOIN p ON d.grp = p.grp)
        |SELECT grp, w, count(*) AS n_total,
        |       count(CASE WHEN kept THEN 1 END) AS n_kept,
        |       CAST(sum(CASE WHEN kept THEN tokens ELSE 0 END) AS BIGINT)
        |         AS kept_tokens,
        |       round(count(CASE WHEN kept THEN 1 END)
        |             / CAST(count(*) AS DOUBLE) + 1e-9, 4) AS rate
        |FROM k GROUP BY 1, 2 ORDER BY grp""".stripMargin
  )
}
