package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.dedup.Dedup
import graft.text.TextFunctions._

/** Text-analysis and deduplication operators over the `documents`
  * table — the training-data-pipeline extension set (builder brief):
  * token/quality/lang-id/fingerprint analysis, exact dedup, MinHash+LSH
  * near-dup, SimHash, and n-gram Jaccard. Every oracle replicates the
  * *same* algorithm (salted-md5 MinHash etc.), so candidate sets match
  * across engines exactly.
  */
object TextQueries extends QueryModule {

  private val Stops = Seq("the", "a")

  /** Distinct (doc_id, word) relation — the shingle unit for word-set
    * MinHash and Jaccard.
    */
  private def docWords(s: SparkSession, dir: String): DataFrame =
    Tables.documentsSpread(s, dir)
      // per-doc dedup inside the row (array_distinct) instead of a
      // relation-wide .distinct(): same (doc_id, w) set — doc_id is
      // unique — with no shuffle
      .select(col("doc_id"), explode(array_distinct(tokens(col("text")))).as("w"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Token counting + vocabulary stats
    "t_token_stats" -> { (s, dir) =>
      Tables.documentsSpread(s, dir)
        .select(col("doc_id"),
          tokenCount(col("text")).cast("long").as("n_tokens"),
          distinctTokenCount(col("text")).cast("long").as("n_distinct"),
          round(avgWordLen(col("text")) + lit(1e-9), 4).as("avg_word_len"))
        .orderBy("doc_id")
    },

    // Regex token classification (the "BPE-ish regex" counting path):
    // per-doc counts of alphabetic / long / short token classes.
    "t_token_classes" -> { (s, dir) =>
      val toks = tokens(col("text"))
      Tables.documentsSpread(s, dir)
        .select(col("doc_id"),
          size(filter(toks, w => w.rlike("^[a-z]+$"))).cast("long").as("alpha"),
          size(filter(toks, w => length(w) >= 6)).cast("long").as("long_w"),
          size(filter(toks, w => length(w) <= 2)).cast("long").as("short_w"))
        .orderBy("doc_id")
    },

    // Quality scoring: stopword ratio, type-token ratio, length score
    "t_quality_score" -> { (s, dir) =>
      val lenScore = least(col("n_chars").cast("double") / 400.0, lit(1.0))
      val eps = lit(1e-9) // off the .00005 round-tie boundary (see w6)
      Tables.documentsSpread(s, dir)
        .select(col("doc_id"),
          round(stopwordRatio(col("text"), Stops) + eps, 4).as("stop_ratio"),
          round(typeTokenRatio(col("text")) + eps, 4).as("ttr"),
          round(lenScore + eps, 4).as("len_score"),
          round((stopwordRatio(col("text"), Stops) + typeTokenRatio(col("text"))
            + lenScore) / 3.0 + eps, 4).as("quality"))
        .orderBy("doc_id")
    },

    // Language-ID heuristic: marker-token counts → rule-based label
    "t_lang_id" -> { (s, dir) =>
      val toks = tokens(col("text"))
      val cntThe = size(filter(toks, w => w === "the"))
      val cntA = size(filter(toks, w => w === "a"))
      Tables.documentsSpread(s, dir)
        .select(col("doc_id"), cntThe.cast("long").as("cnt_the"),
          cntA.cast("long").as("cnt_a"),
          when(cntThe >= 3, "en-high")
            .when(cntThe >= 1, "en")
            .when(cntA >= 1, "en-weak")
            .otherwise("und").as("lang_guess"))
        .orderBy("doc_id")
    },

    // Per-group top-k frequent terms (the vocabulary-audit / corpus-mix
    // dashboard staple): word counts per source, then rank-and-filter
    // with a deterministic tie-break. The window partitions by source —
    // low-cardinality, but its input is the already-aggregated word
    // count relation (vocab × sources), never the token stream, so the
    // single-task-per-source window is bounded by vocabulary size at
    // any corpus scale.
    "t_top_terms" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val counts = Tables.documentsSpread(s, dir)
        .select(col("source"), explode(tokens(col("text"))).as("w"))
        .groupBy(col("source"), col("w"))
        .agg(count(lit(1)).as("tf"))
      val wnd = Window.partitionBy("source")
        .orderBy(col("tf").desc, col("w").asc)
      counts.withColumn("rank", row_number().over(wnd).cast("long"))
        .where(col("rank") <= 5)
        .orderBy("source", "rank")
    },

    // Heavy hitters via a mergeable Misra-Gries sketch (typed
    // Aggregator, fixed k=256 summary) + exact recount of the candidate
    // set — the two-pass pattern for top items when the key space
    // (URLs, n-grams, user-ids) no longer fits in any single hash
    // aggregate. Oracle-able BECAUSE of the sketch guarantee: no item
    // with freq > n/256 can be missing, and the 1% threshold is always
    // above that bound, so the output equals the exact SQL answer at
    // every scale factor.
    "t_heavy_hitters" -> { (s, dir) =>
      val tok = Tables.documentsSpread(s, dir)
        .select(explode(tokens(col("text"))).as("w"))
      val total = broadcast(tok.agg(count(lit(1)).as("n_tokens")))
      // completeness here comes from the LATER 1% filter (0.01 > 1/256,
      // the strict MG bound), NOT from minFreq=1 — see the
      // exactHeavyHitters precondition doc
      graft.text.HeavyHitters.exactHeavyHitters(tok, col("w"),
          k = 256, minFreq = 1L)
        .crossJoin(total)
        .where(col("freq") >= col("n_tokens") * 0.01)
        .select(col("item").as("w"), col("freq"),
          round(col("freq") / col("n_tokens").cast("double") + lit(1e-9), 6)
            .as("frac"))
        .orderBy("w")
    },

    // Unigram language-model scoring (the perplexity-style quality
    // filter of a training-data pipeline): corpus unigram probabilities
    // from one word-count pass, then each doc scored by its mean token
    // log-probability. The vocabulary is corpus-derived but tiny
    // relative to the corpus (Zipf), so it broadcasts and the scoring
    // join never shuffles the token stream.
    "t_unigram_logprob" -> { (s, dir) =>
      // (r14: a lazy checkpoint of `tok` was measured and REJECTED,
      // +0.18 s — the tokenize pass is cheap enough that the
      // materialization barrier costs more than the recompute)
      val tok = Tables.documentsSpread(s, dir)
        .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      val vocab = tok.groupBy(col("w")).agg(count(lit(1)).as("tf"))
      val total = vocab.agg(sum(col("tf")).as("total"))
      val probs = broadcast(vocab.crossJoin(broadcast(total))
        .select(col("w"), log(col("tf") / col("total").cast("double")).as("logp")))
      tok.join(probs, "w")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          round(avg(col("logp")) + lit(1e-9), 4).as("mean_logp"),
          round(min(col("logp")) + lit(1e-9), 4).as("min_logp"))
        .orderBy("doc_id")
    },

    // PII extraction / redaction census (the scrubbing pass of a
    // training-data pipeline): regex extraction of email and IPv4
    // patterns plus global redaction, entirely row-local (codegen'd
    // regex, no shuffle until the rollup sort). The corpus is synthetic
    // word-salad with no organic PII, so the patterns are injected
    // deterministically from doc_id in-query — the extraction and
    // masking operators run on real mixed text either way.
    "t_pii_scrub" -> { (s, dir) =>
      val emailRe = "[a-z0-9]+@[a-z0-9]+\\.[a-z]+"
      val ipRe = "\\d+\\.\\d+\\.\\d+\\.\\d+"
      val aug = concat(col("text"), lit(" contact user"),
        col("doc_id").cast("string"), lit("@example.com from 10.0."),
        (col("doc_id") % 256).cast("string"), lit(".7"))
      Tables.documentsSpread(s, dir)
        .select(col("doc_id"), aug.as("aug"))
        .select(col("doc_id"),
          size(regexp_extract_all(col("aug"), lit(emailRe), lit(0)))
            .cast("long").as("n_emails"),
          size(regexp_extract_all(col("aug"), lit(ipRe), lit(0)))
            .cast("long").as("n_ips"),
          regexp_extract(col("aug"), emailRe, 0).as("first_email"),
          length(regexp_replace(regexp_replace(col("aug"), emailRe, "<EMAIL>"),
            ipRe, "<IP>")).cast("long").as("masked_len"))
        .orderBy("doc_id")
    },

    // Exact dedup on the word-set fingerprint (reordered duplicates
    // collapse); groups with cnt>1 are the duplicate clusters.
    "d_exact_dedup" -> { (s, dir) =>
      Dedup.exactGroups(Tables.documentsSpread(s, dir), col("doc_id"),
          wordSetFingerprint(col("text")))
        .orderBy("fp")
    },

    // MinHash(k=8, salted-md5) + LSH(4 bands of 2) near-dup
    // *clustering*: this corpus contains a mega-cluster (~60% of docs
    // share a near-identical word set), so pair enumeration is
    // inherently O(cluster²); the scalable output is a cluster label
    // per doc (min-id over its LSH buckets), not the pair list.
    "d_minhash_lsh" -> { (s, dir) =>
      // native one-pass signature (MinHashExpr): the 8 salted md5s per
      // token run in one compiled loop per document — no exploded
      // relation, no aggregate; only signatures ever exist. (Duplicates
      // don't move a min, so no array_distinct either.)
      val sig = Dedup.minhashSignatureNative(Tables.documentsSpread(s, dir),
        col("doc_id"), tokens(col("text")), k = 8)
      Dedup.lshClusterAssign(Dedup.lshBands(sig, k = 8))
        .select(col("__id").as("doc_id"), col("cluster"))
        .orderBy("doc_id")
    },

    // MinHash-LSH candidate pairs + exact Jaccard ≥ 0.95 verification,
    // on a bounded slice (doc_id < 300) — the pair-level near-dup
    // pipeline, bounded because the full corpus' mega-cluster makes
    // the pair list itself quadratic (see d_minhash_lsh).
    "d_minhash_pairs" -> { (s, dir) =>
      // filter BEFORE the spread/explode: the bound must reach the
      // parquet scan (predicate pushdown), not sit above a shuffle of
      // the full corpus
      // r14: truncate — `words` feeds the signature aggregate AND the
      // Jaccard verifier; untruncated, the tokenize+explode pass ran
      // once per consumer
      val docs = Tables.documents(s, dir).where(col("doc_id") < 300)
        .repartition(s.sparkContext.defaultParallelism)
      // (with the native signature below, `words` has a single
      // consumer — the Jaccard verifier, which truncates its own
      // distinct projection — so no checkpoint here)
      val words = docs.select(col("doc_id"),
        explode(array_distinct(tokens(col("text")))).as("w"))
      // r14: native one-pass signature (MinHashExpr, the d_minhash_lsh
      // path — value-identical to the exploded hash-aggregate form,
      // VectorExpressionsSpec differential): the exploded form ran 8
      // Catalyst md5() calls per (doc, word) row, each constructing a
      // MessageDigest; the native expression reuses one digest per
      // task. `words` stays (truncated) for the exact-Jaccard verifier.
      val sig = Dedup.minhashSignatureNative(docs,
        col("doc_id"), tokens(col("text")), k = 8)
      val cands = Dedup.lshCandidates(Dedup.lshBands(sig, k = 8))
      Dedup.jaccardOnCandidates(cands, words, col("doc_id"), col("w"))
        .where(col("jaccard") >= 0.95)
        .select(col("i"), col("j"), col("m"), round(col("jaccard") + lit(1e-9), 4).as("jaccard"))
        .orderBy("i", "j")
    },

    // True connected components over the LSH bucket graph (bounded
    // slice, as d_minhash_pairs): star edges (doc → bucket-min) keep
    // the edge list linear, then iterative min-label propagation to
    // the fixpoint — the transitive closure one-hop lshClusterAssign
    // does not compute. Oracle: recursive CTE reaching the same
    // fixpoint.
    "d_connected_components" -> { (s, dir) =>
      // r14: native one-pass signature (see d_minhash_pairs) and a
      // truncate — bands feeds the node list AND the star-edge builder
      // (which itself reads it twice); untruncated, the whole MinHash
      // signature ran once per consumer per execution
      val docs = Tables.documents(s, dir).where(col("doc_id") < 300)
        .repartition(s.sparkContext.defaultParallelism)
      val bands = graft.core.Lineage.truncate(Dedup.lshBands(
        Dedup.minhashSignatureNative(docs, col("doc_id"),
          tokens(col("text")), k = 8), k = 8),
        eager = false)
      val nodes = bands.select(col("__id").as("id"))
      Dedup.connectedComponents(Dedup.bucketStarEdges(bands), nodes)
        .select(col("id").as("doc_id"), col("component"))
        .orderBy("doc_id")
    },

    // Edit-distance near-dup verification (the character-level check
    // the token-level MinHash/Jaccard family can't do — catches
    // reorderings and small in-word edits): LSH-style candidates from
    // the word-set fingerprint's first hex char (16 buckets) on a
    // bounded slice, then exact Levenshtein on candidate pairs.
    // Levenshtein is O(len²) per pair — at scale the candidate
    // generator (LSH buckets, length bands) bounds the pair set, never
    // the verifier.
    "d_edit_distance" -> { (s, dir) =>
      val docs = Tables.documentsSpread(s, dir)
        .where(col("doc_id") < 60)
        .select(col("doc_id"), col("text"),
          substring(wordSetFingerprint(col("text")), 1, 1).as("bkt"))
      val a = docs.select(col("bkt"), col("doc_id").as("i"), col("text").as("ti"))
      val b = docs.select(col("bkt"), col("doc_id").as("j"), col("text").as("tj"))
      a.join(b, "bkt").where(col("i") < col("j"))
        .select(col("i"), col("j"),
          levenshtein(col("ti"), col("tj")).cast("long").as("edit_dist"),
          greatest(length(col("ti")), length(col("tj"))).cast("long").as("max_len"))
        .withColumn("sim_ratio",
          round(lit(1.0) - col("edit_dist") / col("max_len").cast("double")
            + lit(1e-9), 4))
        .where(col("sim_ratio") >= 0.3)
        .orderBy("i", "j")
    },

    // n-gram (3-word shingle) Jaccard via inverted index, doc_id < 80
    "d_ngram_jaccard" -> { (s, dir) =>
      val sh = Tables.documents(s, dir)
        .where(col("doc_id") < 80 && tokenCount(col("text")) >= 3)
        .select(col("doc_id"), explode(wordShingles(col("text"), 3)).as("sh"))
      Dedup.jaccardPairsByIndex(sh, col("doc_id"), col("sh"), minJaccard = 0.02)
        .select(col("i"), col("j"), col("m"), round(col("jaccard") + lit(1e-9), 4).as("jaccard"))
        .orderBy("i", "j")
    },

    // Composite multimodal pipeline: MinHash-LSH text clusters joined
    // to the embedding table (doc_id = vec_id for the first 500 docs),
    // then per-cluster membership counts and embedding-centroid norm —
    // the "text near-dup cluster, embedding sanity-check" shape of a
    // real training-data dedup audit.
    "d_cluster_embeddings" -> { (s, dir) =>
      val sig = Dedup.minhashSignatureNative(Tables.documentsSpread(s, dir),
        col("doc_id"), tokens(col("text")), k = 8)
      val clusters = Dedup.lshClusterAssign(Dedup.lshBands(sig, k = 8))
        .select(col("__id").as("doc_id"), col("cluster"))
      val emb = Tables.embeddingsSpread(s, dir)
        .select(col("vec_id").as("doc_id"),
          col("embedding").cast("array<double>").as("v"))
      val dims = clusters.join(emb, "doc_id")
        .select(col("cluster"), posexplode(col("v")).as(Seq("i0", "x")))
        .groupBy(col("cluster"), col("i0"))
        .agg(avg(col("x")).as("c"), count(lit(1)).as("cnt"))
      dims.groupBy(col("cluster"))
        .agg(max(col("cnt")).as("n_docs"),
          round(sqrt(sum(col("c") * col("c"))) + lit(1e-9), 6).as("centroid_norm"))
        .orderBy("cluster")
    },

    // 16-bit SimHash signatures — native one-pass expression (the
    // relational explode form, kept as Dedup.simhash16 and proven
    // equivalent in VectorExpressionsSpec, pushed 24B intermediate
    // rows at the 100× probe)
    "d_simhash" -> { (s, dir) =>
      import graft.functions.TextExpressions
      Tables.documentsSpread(s, dir)
        .select(col("doc_id"),
          TextExpressions.simhash16Col(tokens(col("text"))).as("simhash"))
        .orderBy("doc_id")
    },

    // Multimodal plumbing: opaque binary payload + typed metadata —
    // byte length and content digest over the binary column (the
    // decode step itself is stubbed; see graft.multimodal).
    "m_binary_meta" -> { (s, dir) =>
      Tables.documentsSpread(s, dir)
        .withColumn("payload", col("text").cast("binary"))
        .select(col("doc_id"),
          octet_length(col("payload")).cast("long").as("n_bytes"),
          sha2(col("payload"), 256).as("digest"),
          col("source"))
        .orderBy("doc_id")
    },

    // REAL image pipeline: synthesize an 8×8 grayscale PNG per
    // document (pixel value = a formula of doc_id), decode it with
    // javax.imageio (true codec work, partition-local), pool 2×4
    // luminance cell means as features, box-resize to 4×4 and read the
    // resized pixels back. PNG is lossless, so the DuckDB oracle
    // recomputes every output from the pixel formula — what the gate
    // actually checks is that the encode→decode→pool→resize chain
    // reproduces the mathematics exactly.
    "m_media_pipeline" -> { (s, dir) =>
      import graft.multimodal.Multimodal
      import s.implicits._
      val media = Tables.documentsSpread(s, dir).select(col("doc_id")).as[Long]
        .mapPartitions { ids =>
          ids.map { id =>
            val png = Multimodal.synthGrayPng(8, 8,
              (x, y) => ((id * 31 + y * 8 + x) % 256).toInt)
            Multimodal.MediaRow(id, png, Multimodal.MediaMeta("image/png", 8, 8, 0L))
          }
        }
      val fcols = (0 until 8).map(k =>
        round(element_at(col("features"), k + 1).cast("double") + lit(1e-9), 4)
          .as(s"f$k"))
      val feats = Multimodal.decodeImageFeatures(media, gridW = 4, gridH = 2)
        .toDF()
        .select(Seq(col("media_id"), col("width").cast("long").as("width"),
          col("height").cast("long").as("height")) ++ fcols: _*)
      val res = Multimodal.pixelStrings(Multimodal.resizeImage(media, 4, 4))
        .select(col("media_id"), col("pixels").as("res_pixels"))
      feats.join(res, "media_id")
        .withColumnRenamed("media_id", "doc_id")
        .orderBy("doc_id")
    },

    // REAL audio pipeline: synthesize a 256-sample PCM-16 WAV per
    // document (sample value = a formula of doc_id), decode the RIFF
    // container (true parser work, partition-local), window 4 RMS
    // energies as features, floor-mean-downsample ×4 and read the
    // resampled samples back. PCM is lossless, so the DuckDB oracle
    // recomputes every output from the sample formula — the gate
    // checks the encode→decode→pool→resample chain reproduces the
    // mathematics exactly.
    "m_audio_pipeline" -> { (s, dir) =>
      import graft.multimodal.Multimodal
      import s.implicits._
      val media = Tables.documentsSpread(s, dir).select(col("doc_id")).as[Long]
        .mapPartitions { ids =>
          ids.map { id =>
            val samples = Array.tabulate(256)(i =>
              (((id * 7 + i * 13) % 2001) - 1000).toShort)
            Multimodal.MediaRow(id, Multimodal.synthWavPcm16(8000, 1, samples),
              Multimodal.MediaMeta("audio/wav", 0, 0, 32L))
          }
        }
      val fcols = (0 until 4).map(k =>
        round(element_at(col("features"), k + 1) + lit(1e-9), 4).as(s"f$k"))
      val feats = Multimodal.decodeAudioFeatures(media, bins = 4)
        .toDF()
        .select(Seq(col("media_id"), col("sample_rate").cast("long"),
          col("n_samples").cast("long")) ++ fcols: _*)
      val res = Multimodal.sampleStrings(Multimodal.resampleAudio(media, 4))
        .select(col("media_id"), col("sample_rate").cast("long").as("res_rate"),
          col("samples").as("res_samples"))
      feats.join(res, "media_id")
        .withColumnRenamed("media_id", "doc_id")
        .orderBy("doc_id")
    },

    // REAL video pipeline: synthesize a 4-frame 8×6 uncompressed AVI
    // per document (pixel value = a formula of doc_id/frame), walk the
    // RIFF/AVI container (true parser work, partition-local), pool
    // per-frame mean luminance + a motion score, sample every 2nd
    // frame into a re-encoded AVI and read its pixels back. DIB frames
    // are lossless, so the DuckDB oracle recomputes every output from
    // the pixel formula — the gate checks the container
    // encode→decode→pool→sample chain reproduces the mathematics.
    "m_video_pipeline" -> { (s, dir) =>
      import graft.multimodal.{Avi, Multimodal}
      import s.implicits._
      val media = Tables.documentsSpread(s, dir).select(col("doc_id")).as[Long]
        .mapPartitions { ids =>
          ids.map { id =>
            val frames = (0 until 4).map(f =>
              Array.tabulate(48)(p => ((id * 13 + f * 37 + p) % 251).toInt))
            Multimodal.MediaRow(id, Avi.synthAviGray(8, 6, frames),
              Multimodal.MediaMeta("video/avi", 8, 6, 160L))
          }
        }
      val fcols = (0 until 4).map(k =>
        round(element_at(col("frame_means"), k + 1) + lit(1e-9), 4).as(s"f$k"))
      val feats = Multimodal.decodeVideoFeatures(media, sampleEvery = 1)
        .toDF()
        .select(Seq(col("media_id"), col("width").cast("long"),
          col("height").cast("long"), col("n_frames").cast("long")) ++ fcols :+
          round(col("motion") + lit(1e-9), 4).as("motion"): _*)
      val res = Multimodal.frameStrings(Multimodal.sampleFrames(media, every = 2))
        .select(col("media_id"), col("n_frames").cast("long").as("res_frames"),
          col("frames").as("res_pixels"))
      feats.join(res, "media_id")
        .withColumnRenamed("media_id", "doc_id")
        .orderBy("doc_id")
    },

    // REAL MP4 pipeline: synthesize a 6-sample ISO BMFF container per
    // document (sample k has 4+k bytes, byte j = (doc_id*11+k*7+j*3)%251,
    // 25 fps), parse the sample tables back (true container work,
    // partition-local), read metadata columns and extract every 2nd
    // access unit's TRUE byte range. Byte extraction is lossless, so
    // the DuckDB oracle recomputes each sampled unit's byte SUM from
    // the formula — equality proves the stts/stsc/stsz/stco resolution
    // to exact file offsets.
    "m_mp4_pipeline" -> { (s, dir) =>
      import graft.multimodal.{Mp4, Multimodal}
      import s.implicits._
      val media = Tables.documentsSpread(s, dir).select(col("doc_id")).as[Long]
        .mapPartitions { ids =>
          ids.map { id =>
            val samples = (0 until 6).map(k =>
              Array.tabulate(4 + k)(j => ((id * 11 + k * 7 + j * 3) % 251).toByte))
            Multimodal.MediaRow(id, Mp4.synth(samples, delta = 40, 64, 48),
              Multimodal.MediaMeta("video/mp4", 64, 48, 240L))
          }
        }
      val meta = Multimodal.mp4Meta(media)
        .select(col("media_id"), col("codec"),
          col("width").cast("long"), col("height").cast("long"),
          col("n_samples").cast("long"),
          round(col("track_sec") + lit(1e-9), 4).as("track_sec"))
      val sums = Multimodal.mp4Samples(media, every = 2)
        .select(col("media_id"), col("sample_idx"), col("bytes"))
        .as[(Long, Int, Array[Byte])]
        .map { case (mid, k, bytes) =>
          (mid, k, bytes.map(b => (b & 0xff).toLong).sum)
        }
        .toDF("media_id", "sample_idx", "byte_sum")
        .groupBy("media_id")
        .pivot("sample_idx", Seq(0, 2, 4))
        .sum("byte_sum")
        .select(col("media_id"), col("0").as("s0_sum"),
          col("2").as("s2_sum"), col("4").as("s4_sum"))
      meta.join(sums, "media_id")
        .withColumnRenamed("media_id", "doc_id")
        .orderBy("doc_id")
    },

    // REAL MP4 FRAME DECODE: per document a 3-frame PNG-in-MP4 track
    // ('png ' codec — an intra-coded shape ImageIO decodes with no
    // native codec), pixel = (doc_id*17 + f*29 + y*8 + x) % 251.
    // mp4DecodeFrames resolves each access unit's byte range from the
    // sample tables, decodes TRUE pixels, and pools a 2x3 grid whose
    // 4x2-pixel cells divide by 8 — exact in float32 — so the DuckDB
    // oracle recomputes every feature from the pixel formula: equality
    // proves container resolution AND pixel decode AND pooling.
    "m_mp4_frames" -> { (s, dir) =>
      import graft.multimodal.{Mp4, Multimodal}
      import s.implicits._
      val media = Tables.documentsSpread(s, dir).select(col("doc_id")).as[Long]
        .mapPartitions { ids =>
          ids.map { id =>
            val frames = (0 until 3).map { f =>
              Multimodal.synthGrayPng(8, 6,
                (x, y) => ((id * 17 + f * 29 + y * 8 + x) % 251).toInt)
            }
            Multimodal.MediaRow(id,
              Mp4.synth(frames, delta = 40, 8, 6, codec = "png "),
              Multimodal.MediaMeta("video/mp4", 8, 6, 120L))
          }
        }
      val fcols = (0 until 6).map(k =>
        round(element_at(col("features"), k + 1).cast("double") + lit(1e-9), 4)
          .as(s"f$k"))
      Multimodal.mp4DecodeFrames(media, gridW = 2, gridH = 3)
        .select(Seq(col("media_id").as("doc_id"),
          col("frame_idx").cast("long").as("frame_idx"),
          round(col("pts_sec") + lit(1e-9), 4).as("pts_sec"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height")) ++ fcols: _*)
        .orderBy("doc_id", "frame_idx")
    },

    // MPEG audio header walk: synthesize a 4-frame MPEG1 Layer III
    // stream per document at doc-dependent bitrates
    // (kbps_k = [128,160,192,256][(doc_id+k) % 4]), walk the frame
    // grid back and emit the curation columns (frame count, duration,
    // mean bitrate, total bytes). Frame sizes follow the header
    // formula floor(144*kbps*1000/44100), so the oracle recomputes
    // every output arithmetically.
    "m_mpeg_meta" -> { (s, dir) =>
      import graft.multimodal.{MpegAudio, Multimodal}
      import s.implicits._
      val rates = Array(128, 160, 192, 256)
      Tables.documentsSpread(s, dir).select(col("doc_id")).as[Long]
        .map { id =>
          val kbps = (0 until 4).map(k => rates(((id + k) % 4).toInt))
          val bytes = MpegAudio.synthFrames(kbps)
          val (sec, mean, rate, ch, n) = MpegAudio.meta(bytes).get
          (id, n.toLong, rate.toLong, ch.toLong, bytes.length.toLong,
            math.round((sec + 1e-9) * 1e6) / 1e6,
            math.round((mean + 1e-9) * 1e4) / 1e4)
        }
        .toDF("doc_id", "n_frames", "sample_rate", "channels",
          "total_bytes", "sec", "mean_kbps")
        .orderBy("doc_id")
    },

    // Byte-level transform pipeline (the modality-agnostic plumbing:
    // payloads with no JVM codec, e.g. proprietary containers): frame-sample
    // (fixed-size segmentation — boundary correctness proven by count +
    // lossless byte total) and stride resize (every-4th-byte
    // downsample, digest-checked byte-for-byte). Documents are pure
    // ASCII, so the oracle models the byte operations as character
    // operations exactly.
    "m_byte_pipeline" -> { (s, dir) =>
      import graft.multimodal.Multimodal
      val media = Multimodal.asMediaTable(
        Tables.documentsSpread(s, dir), "doc_id", "text", "text/plain")
      val segs = Multimodal.segmentPayload(media, segBytes = 64)
        .groupBy(col("media_id"))
        .agg(count(lit(1)).as("n_segs"),
          sum(octet_length(col("seg_bytes"))).cast("long").as("seg_bytes_total"))
      import s.implicits._
      val resized = Multimodal.stubResize(media.as[Multimodal.MediaRow], factor = 4)
        .toDF()
        .select(col("media_id"),
          octet_length(col("payload")).cast("long").as("res_bytes"),
          sha2(col("payload"), 256).as("res_digest"))
      media.select(col("media_id"),
          octet_length(col("payload")).cast("long").as("n_bytes"))
        .join(segs, "media_id").join(resized, "media_id")
        .select(col("media_id").as("doc_id"), col("n_bytes"), col("n_segs"),
          col("seg_bytes_total"), col("res_bytes"), col("res_digest"))
        .orderBy("doc_id")
    },

    // END-TO-END curation pipeline in one oracled gate — the "switch
    // your corpus pipeline to this library" composition: exact
    // first-doc-wins dedup (ONE shuffle: min_by over the content
    // fingerprint, no join-back), language gate, length gate, then the
    // per-source audit aggregate. Every stage is the same algebra its
    // standalone gate verifies; the composition itself is what this
    // gate pins.
    "d_curation_pipeline" -> { (s, dir) =>
      val d = Tables.documentsSpread(s, dir)
      val kept = d
        .select(md5(col("text")).as("fp"),
          struct(col("doc_id"), col("text"), col("source"), col("n_chars")).as("r"))
        .groupBy("fp").agg(min_by(col("r"), col("r.doc_id")).as("r"))
        .select(col("r.*"))
      // tokenize ONCE: toks as an inline expression would re-split the
      // text in the Filter and again in the Aggregate (Catalyst does
      // not share subexpressions across operators)
      kept
        .withColumn("toks", tokens(col("text")))
        .where(size(filter(col("toks"), w => w === "the")) >= 1 &&
          col("n_chars") >= 100)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(col("toks"))).cast("long").as("n_tokens"),
          round(avg(col("n_chars")) + lit(1e-9), 4).as("avg_chars"))
        .orderBy("source")
    },

    // Rolling-hash document fingerprinting (Rabin–Karp under every
    // 8-byte window; one compiled codegen pass per row): window count,
    // content-defined boundary count (hash ≡ 0 mod 64 — the CDC
    // primitive), winnowing min-hash fingerprint, first boundary
    // position. The oracle recomputes every window NON-rolling from
    // power literals, so equality proves the O(1) rolling update.
    "t_rolling_fingerprint" -> { (s, dir) =>
      import graft.functions.TextExpressions
      Tables.documentsSpread(s, dir)
        .select(col("doc_id"),
          TextExpressions.rollingFingerprint(col("text")).as("f"))
        .select(col("doc_id"), col("f.n_windows").as("n_windows"),
          col("f.n_boundaries").as("n_boundaries"),
          col("f.min_hash").as("min_hash"),
          col("f.first_boundary").as("first_boundary"))
        .orderBy("doc_id")
    },

    // BPE tokenizer training, step 0: char-level adjacent-pair counts
    // over the distinct-word table (weighted by word frequency, with
    // the </w> end marker) — the fully declarative half of Bpe.train,
    // oracled directly. Top 50 pairs by (cnt DESC, pair ASC).
    "t_bpe_pairs" -> { (s, dir) =>
      import graft.text.Bpe
      Bpe.initialPairCounts(
          Bpe.wordCounts(Tables.documentsSpread(s, dir), col("text")))
        .orderBy(col("cnt").desc, col("left"), col("right"))
        .limit(50)
    },

    // BPE tokenizer training, full loop: the learned merge table after
    // 24 iterations (rank, pair, fused token, pair count at selection
    // time). The iterative argmax-merge loop is not SQL-expressible —
    // rows-only gate, value-pinned in PinnedFixturesSpec and
    // differentially tested against a single-machine reference
    // implementation in BpeSpec.
    "t_bpe_vocab" -> { (s, dir) =>
      import graft.text.Bpe
      val merges = Bpe.train(
        Bpe.wordCounts(Tables.documentsSpread(s, dir), col("text")),
        numMerges = 24)
      s.createDataFrame(merges)
        .select(col("rank").cast("long").as("rank"), col("left"),
          col("right"), concat(col("left"), col("right")).as("merged"),
          col("cnt"))
        .orderBy("rank")
    },

    // BPE merge APPLICATION with a FIXED two-merge table — the
    // iterative half of t_bpe_vocab that IS SQL-expressible once the
    // merges are pinned: apply (t,h) then (th,e) — rank order matters,
    // the second consumes the first's output — through the REAL encode
    // path (mergePairArr + per-partition memo), then count adjacent
    // token pairs. Within-word pairs only: </w> terminates every word
    // and merged tokens can carry it only as a suffix, so dropping
    // pairs whose left token ends with </w> is exactly the word
    // boundary. Fully DuckDB-oracled (recursive-CTE replace fixpoint);
    // both fixed merges have left ≠ right, which the oracle's
    // delimiter-sharing replace requires for exactness.
    "t_bpe_step_fixed" -> { (s, dir) =>
      import graft.text.Bpe
      val fixed = Seq(Bpe.Merge(1, "t", "h", 0L), Bpe.Merge(2, "th", "e", 0L))
      val enc = Bpe.encode(
        Tables.documentsSpread(s, dir).select("doc_id", "text"), "text", fixed)
      val toks = col("bpe_tokens")
      // size < 2 guard: sequence(1, 0) would generate a DESCENDING
      // range (Spark defaults step to -1) and element_at(toks, 0)
      // throws — an empty/null-text doc must contribute no pairs, not
      // kill the query
      val prs = when(size(toks) >= 2,
        transform(sequence(lit(1), size(toks) - 1), i =>
          struct(element_at(toks, i).as("left"),
            element_at(toks, i + 1).as("right"))))
        .otherwise(array().cast("array<struct<left:string,right:string>>"))
      enc.select(explode(prs).as("p"))
        .where(!col("p.left").endsWith(Bpe.Eow))
        .groupBy(col("p.left").as("left"), col("p.right").as("right"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("left"), col("right"))
        .limit(50)
    }
  )

  def oracle: Map[String, String] = Map(
    "t_token_stats" ->
      """SELECT doc_id,
        |       len(string_split(text, ' ')) AS n_tokens,
        |       len(list_distinct(string_split(text, ' '))) AS n_distinct,
        |       round((length(text) - (len(string_split(text, ' ')) - 1))
        |             / CAST(len(string_split(text, ' ')) AS DOUBLE) + 1e-9, 4) AS avg_word_len
        |FROM documents ORDER BY doc_id""".stripMargin,

    "t_token_classes" ->
      """SELECT doc_id,
        |  len(list_filter(string_split(text,' '),
        |      w -> regexp_matches(w, '^[a-z]+$'))) AS alpha,
        |  len(list_filter(string_split(text,' '), w -> length(w) >= 6)) AS long_w,
        |  len(list_filter(string_split(text,' '), w -> length(w) <= 2)) AS short_w
        |FROM documents ORDER BY doc_id""".stripMargin,

    "t_quality_score" ->
      """WITH t AS (SELECT doc_id, n_chars,
        |  len(list_filter(string_split(text,' '), w -> w IN ('the','a')))
        |    / CAST(len(string_split(text,' ')) AS DOUBLE) AS stop_ratio,
        |  len(list_distinct(string_split(text,' ')))
        |    / CAST(len(string_split(text,' ')) AS DOUBLE) AS ttr,
        |  least(n_chars / 400.0, 1.0) AS len_score
        |  FROM documents)
        |SELECT doc_id, round(stop_ratio + 1e-9, 4) AS stop_ratio,
        |       round(ttr + 1e-9, 4) AS ttr,
        |       round(len_score + 1e-9, 4) AS len_score,
        |       round((stop_ratio + ttr + len_score) / 3.0 + 1e-9, 4) AS quality
        |FROM t ORDER BY doc_id""".stripMargin,

    "t_lang_id" ->
      """WITH t AS (SELECT doc_id,
        |  len(list_filter(string_split(text,' '), w -> w = 'the')) AS cnt_the,
        |  len(list_filter(string_split(text,' '), w -> w = 'a')) AS cnt_a
        |  FROM documents)
        |SELECT doc_id, cnt_the, cnt_a,
        |       CASE WHEN cnt_the >= 3 THEN 'en-high'
        |            WHEN cnt_the >= 1 THEN 'en'
        |            WHEN cnt_a >= 1 THEN 'en-weak'
        |            ELSE 'und' END AS lang_guess
        |FROM t ORDER BY doc_id""".stripMargin,

    "t_top_terms" ->
      """WITH counts AS (
        |  SELECT source, unnest(string_split(text,' ')) AS w FROM documents),
        |tf AS (SELECT source, w, count(*) AS tf FROM counts GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY source
        |        ORDER BY tf DESC, w ASC) AS rank FROM tf)
        |SELECT source, w, tf, rank FROM r WHERE rank <= 5
        |ORDER BY source, rank""".stripMargin,

    "t_heavy_hitters" ->
      """WITH tok AS (SELECT unnest(string_split(text,' ')) AS w FROM documents),
        |n AS (SELECT count(*) AS n_tokens FROM tok)
        |SELECT w, count(*) AS freq,
        |       round(count(*) / CAST(n.n_tokens AS DOUBLE) + 1e-9, 6) AS frac
        |FROM tok CROSS JOIN n
        |GROUP BY w, n.n_tokens
        |HAVING count(*) >= n.n_tokens * 0.01
        |ORDER BY w""".stripMargin,

    "t_unigram_logprob" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS w
        |             FROM documents),
        |vocab AS (SELECT w, count(*) AS tf FROM tok GROUP BY 1),
        |total AS (SELECT sum(tf) AS total FROM vocab),
        |probs AS (SELECT w, ln(tf / CAST(total AS DOUBLE)) AS logp
        |          FROM vocab CROSS JOIN total)
        |SELECT doc_id, count(*) AS n_tokens,
        |       round(avg(logp) + 1e-9, 4) AS mean_logp,
        |       round(min(logp) + 1e-9, 4) AS min_logp
        |FROM tok JOIN probs USING (w)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "t_pii_scrub" ->
      """WITH t AS (SELECT doc_id,
        |  text || ' contact user' || CAST(doc_id AS VARCHAR)
        |       || '@example.com from 10.0.'
        |       || CAST(doc_id % 256 AS VARCHAR) || '.7' AS aug
        |  FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(aug, '[a-z0-9]+@[a-z0-9]+\.[a-z]+')) AS n_emails,
        |  len(regexp_extract_all(aug, '\d+\.\d+\.\d+\.\d+')) AS n_ips,
        |  regexp_extract(aug, '[a-z0-9]+@[a-z0-9]+\.[a-z]+') AS first_email,
        |  length(regexp_replace(regexp_replace(aug,
        |    '[a-z0-9]+@[a-z0-9]+\.[a-z]+', '<EMAIL>', 'g'),
        |    '\d+\.\d+\.\d+\.\d+', '<IP>', 'g')) AS masked_len
        |FROM t ORDER BY doc_id""".stripMargin,

    "d_exact_dedup" ->
      """SELECT md5(array_to_string(list_sort(list_distinct(string_split(text,' '))), ' ')) AS fp,
        |       min(doc_id) AS keeper, count(*) AS cnt
        |FROM documents GROUP BY 1 ORDER BY fp""".stripMargin,

    "d_minhash_lsh" ->
      """WITH dtok AS (SELECT DISTINCT doc_id, unnest(string_split(text,' ')) AS w
        |              FROM documents),
        |sig AS (SELECT doc_id,
        |    min(md5('s0'||w)) h0, min(md5('s1'||w)) h1, min(md5('s2'||w)) h2,
        |    min(md5('s3'||w)) h3, min(md5('s4'||w)) h4, min(md5('s5'||w)) h5,
        |    min(md5('s6'||w)) h6, min(md5('s7'||w)) h7
        |    FROM dtok GROUP BY doc_id),
        |bands AS (
        |    SELECT doc_id, 0 bidx, md5(h0||h1) bhash FROM sig UNION ALL
        |    SELECT doc_id, 1, md5(h2||h3) FROM sig UNION ALL
        |    SELECT doc_id, 2, md5(h4||h5) FROM sig UNION ALL
        |    SELECT doc_id, 3, md5(h6||h7) FROM sig),
        |bmin AS (SELECT bidx, bhash, min(doc_id) bmin FROM bands GROUP BY 1, 2)
        |SELECT doc_id, min(bmin) AS cluster
        |FROM bands JOIN bmin USING (bidx, bhash)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "d_minhash_pairs" ->
      """WITH dtok AS (SELECT DISTINCT doc_id, unnest(string_split(text,' ')) AS w
        |              FROM documents WHERE doc_id < 300),
        |sig AS (SELECT doc_id,
        |    min(md5('s0'||w)) h0, min(md5('s1'||w)) h1, min(md5('s2'||w)) h2,
        |    min(md5('s3'||w)) h3, min(md5('s4'||w)) h4, min(md5('s5'||w)) h5,
        |    min(md5('s6'||w)) h6, min(md5('s7'||w)) h7
        |    FROM dtok GROUP BY doc_id),
        |bands AS (
        |    SELECT doc_id, 0 bidx, md5(h0||h1) bhash FROM sig UNION ALL
        |    SELECT doc_id, 1, md5(h2||h3) FROM sig UNION ALL
        |    SELECT doc_id, 2, md5(h4||h5) FROM sig UNION ALL
        |    SELECT doc_id, 3, md5(h6||h7) FROM sig),
        |cand AS (SELECT DISTINCT a.doc_id i, b.doc_id j FROM bands a
        |         JOIN bands b ON a.bidx=b.bidx AND a.bhash=b.bhash
        |                     AND a.doc_id < b.doc_id),
        |sizes AS (SELECT doc_id, count(*) n FROM dtok GROUP BY 1),
        |inter AS (SELECT c.i, c.j, count(*) m FROM cand c
        |          JOIN dtok x ON x.doc_id = c.i
        |          JOIN dtok y ON y.doc_id = c.j AND x.w = y.w
        |          GROUP BY 1, 2)
        |SELECT i, j, m, round(m / (ni.n + nj.n - m) + 1e-9, 4) AS jaccard
        |FROM inter JOIN sizes ni ON ni.doc_id = i JOIN sizes nj ON nj.doc_id = j
        |WHERE m / (ni.n + nj.n - m) >= 0.95 ORDER BY i, j""".stripMargin,

    "d_connected_components" ->
      """WITH RECURSIVE dtok AS (SELECT DISTINCT doc_id, unnest(string_split(text,' ')) AS w
        |              FROM documents WHERE doc_id < 300),
        |sig AS (SELECT doc_id,
        |    min(md5('s0'||w)) h0, min(md5('s1'||w)) h1, min(md5('s2'||w)) h2,
        |    min(md5('s3'||w)) h3, min(md5('s4'||w)) h4, min(md5('s5'||w)) h5,
        |    min(md5('s6'||w)) h6, min(md5('s7'||w)) h7
        |    FROM dtok GROUP BY doc_id),
        |bands AS (
        |    SELECT doc_id, 0 bidx, md5(h0||h1) bhash FROM sig UNION ALL
        |    SELECT doc_id, 1, md5(h2||h3) FROM sig UNION ALL
        |    SELECT doc_id, 2, md5(h4||h5) FROM sig UNION ALL
        |    SELECT doc_id, 3, md5(h6||h7) FROM sig),
        |bmin AS (SELECT bidx, bhash, min(doc_id) bmin FROM bands GROUP BY 1, 2),
        |star AS (SELECT DISTINCT b.doc_id s, m.bmin d
        |         FROM bands b JOIN bmin m USING (bidx, bhash)
        |         WHERE m.bmin <> b.doc_id),
        |edges AS (SELECT s, d FROM star UNION ALL SELECT d, s FROM star),
        |cc AS (
        |    SELECT doc_id AS id, doc_id AS label FROM sig
        |    UNION
        |    SELECT e.d, c.label FROM cc c JOIN edges e ON e.s = c.id
        |    WHERE c.label < e.d)
        |SELECT id AS doc_id, min(label) AS component
        |FROM cc GROUP BY 1 ORDER BY doc_id""".stripMargin,

    "d_edit_distance" ->
      """WITH d AS (SELECT doc_id, text,
        |    substr(md5(array_to_string(list_sort(list_distinct(
        |      string_split(text,' '))), ' ')), 1, 1) AS bkt
        |  FROM documents WHERE doc_id < 60),
        |p AS (SELECT a.doc_id i, b.doc_id j,
        |        levenshtein(a.text, b.text) AS edit_dist,
        |        greatest(length(a.text), length(b.text)) AS max_len
        |      FROM d a JOIN d b ON a.bkt = b.bkt AND a.doc_id < b.doc_id)
        |SELECT i, j, edit_dist, max_len,
        |       round(1.0 - edit_dist / CAST(max_len AS DOUBLE) + 1e-9, 4)
        |         AS sim_ratio
        |FROM p
        |WHERE 1.0 - edit_dist / CAST(max_len AS DOUBLE) >= 0.3
        |ORDER BY i, j""".stripMargin,

    "d_ngram_jaccard" ->
      """WITH toks AS (SELECT doc_id, string_split(text,' ') t FROM documents
        |              WHERE doc_id < 80),
        |sh AS (SELECT DISTINCT doc_id,
        |         unnest(list_transform(range(1, len(t)-1),
        |                i -> array_to_string(t[i:i+2], ' '))) s
        |       FROM toks WHERE len(t) >= 3),
        |sizes AS (SELECT doc_id, count(*) n FROM sh GROUP BY 1),
        |inter AS (SELECT x.doc_id i, y.doc_id j, count(*) m FROM sh x
        |          JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id GROUP BY 1, 2)
        |SELECT i, j, m, round(m / (ni.n + nj.n - m) + 1e-9, 4) AS jaccard
        |FROM inter JOIN sizes ni ON ni.doc_id = i JOIN sizes nj ON nj.doc_id = j
        |WHERE m / (ni.n + nj.n - m) >= 0.02 ORDER BY i, j""".stripMargin,

    "d_cluster_embeddings" ->
      """WITH dtok AS (SELECT DISTINCT doc_id, unnest(string_split(text,' ')) AS w
        |              FROM documents),
        |sig AS (SELECT doc_id,
        |    min(md5('s0'||w)) h0, min(md5('s1'||w)) h1, min(md5('s2'||w)) h2,
        |    min(md5('s3'||w)) h3, min(md5('s4'||w)) h4, min(md5('s5'||w)) h5,
        |    min(md5('s6'||w)) h6, min(md5('s7'||w)) h7
        |    FROM dtok GROUP BY doc_id),
        |bands AS (
        |    SELECT doc_id, 0 bidx, md5(h0||h1) bhash FROM sig UNION ALL
        |    SELECT doc_id, 1, md5(h2||h3) FROM sig UNION ALL
        |    SELECT doc_id, 2, md5(h4||h5) FROM sig UNION ALL
        |    SELECT doc_id, 3, md5(h6||h7) FROM sig),
        |bmin AS (SELECT bidx, bhash, min(doc_id) bmin FROM bands GROUP BY 1, 2),
        |clusters AS (SELECT doc_id, min(bmin) AS cluster
        |             FROM bands JOIN bmin USING (bidx, bhash) GROUP BY doc_id),
        |dims AS (
        |  SELECT c.cluster, i, avg(CAST(e.embedding[i] AS DOUBLE)) cd, count(*) cnt
        |  FROM clusters c JOIN embeddings e ON e.vec_id = c.doc_id,
        |       range(1, 65) t(i)
        |  GROUP BY 1, 2)
        |SELECT cluster, max(cnt) AS n_docs,
        |       round(sqrt(sum(cd*cd)) + 1e-9, 6) AS centroid_norm
        |FROM dims GROUP BY 1 ORDER BY cluster""".stripMargin,

    "d_simhash" ->
      """WITH tok AS (SELECT doc_id, md5(unnest(string_split(text,' '))) h
        |             FROM documents),
        |bits AS (SELECT doc_id, b,
        |           CASE WHEN strpos('89abcdef', substr(h, b+1, 1)) > 0
        |                THEN 1 ELSE -1 END w
        |         FROM tok, range(16) t(b)),
        |sums AS (SELECT doc_id, b, sum(w) s FROM bits GROUP BY 1, 2)
        |SELECT doc_id,
        |       string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY b)
        |         AS simhash
        |FROM sums GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "m_binary_meta" ->
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
        |       sha256(text) AS digest, source
        |FROM documents ORDER BY doc_id""".stripMargin,

    "m_byte_pipeline" ->
      """SELECT doc_id,
        |  octet_length(encode(text)) AS n_bytes,
        |  CAST(ceil(length(text) / 64.0) AS BIGINT) AS n_segs,
        |  octet_length(encode(text)) AS seg_bytes_total,
        |  CAST(ceil(length(text) / 4.0) AS BIGINT) AS res_bytes,
        |  sha256(array_to_string(
        |    list_transform(range(0, CAST(ceil(length(text) / 4.0) AS BIGINT)),
        |                   i -> substr(text, CAST(1 + i * 4 AS INT), 1)),
        |    '')) AS res_digest
        |FROM documents ORDER BY doc_id""".stripMargin,

    // sample s(i) = (doc_id*7 + i*13) % 2001 − 1000; features = RMS
    // over four 64-sample windows; resample = floor-mean of each
    // 4-sample block at rate 8000/4. The engine derives these from
    // DECODED samples; the oracle from the formula — equality proves
    // the RIFF/PCM codec chain.
    "m_audio_pipeline" -> {
      val fcols = (0 until 4).map { k =>
        s"round(sqrt(list_sum(list_transform(range(${k * 64}, ${(k + 1) * 64}), " +
          s"i -> pow((doc_id*7 + i*13) % 2001 - 1000, 2))) / 64.0) + 1e-9, 4) AS f$k"
      }.mkString(",\n  ")
      s"""SELECT doc_id, CAST(8000 AS BIGINT) AS sample_rate,
         |  CAST(256 AS BIGINT) AS n_samples,
         |  $fcols,
         |  CAST(2000 AS BIGINT) AS res_rate,
         |  array_to_string(list_transform(range(0, 64), p ->
         |    CAST(floor((  ((doc_id*7 + (p*4)*13)   % 2001 - 1000)
         |                + ((doc_id*7 + (p*4+1)*13) % 2001 - 1000)
         |                + ((doc_id*7 + (p*4+2)*13) % 2001 - 1000)
         |                + ((doc_id*7 + (p*4+3)*13) % 2001 - 1000)) / 4.0)
         |      AS BIGINT)), '-') AS res_samples
         |FROM documents ORDER BY doc_id""".stripMargin
    },

    // sample k of a doc's MP4 has 4+k bytes, byte j =
    // (doc_id*11 + k*7 + j*3) % 251; sampling keeps k = 0, 2, 4. The
    // engine reads the sums from EXTRACTED byte ranges; the oracle
    // from the formula — equality proves the sample-table resolution.
    "m_mp4_pipeline" -> {
      val sums = Seq(0, 2, 4).map { k =>
        s"CAST(list_sum(list_transform(range(0, ${4 + k}), j -> " +
          s"(doc_id*11 + ${k * 7} + j*3) % 251)) AS BIGINT) AS s${k}_sum"
      }.mkString(",\n  ")
      s"""SELECT doc_id, 'avc1' AS codec, CAST(64 AS BIGINT) AS width,
         |  CAST(48 AS BIGINT) AS height, CAST(6 AS BIGINT) AS n_samples,
         |  round(6 * 40 / 1000.0 + 1e-9, 4) AS track_sec,
         |  $sums
         |FROM documents ORDER BY doc_id""".stripMargin
    },

    // frame pixel v(f,x,y) = (doc_id*17 + f*29 + y*8 + x) % 251 over 3
    // PNG frames in an MP4 'png ' track; features = 3x2 grid cell
    // means over 4x2-pixel cells (8 px each — exact in float). The
    // engine decodes the frames out of the container; the oracle
    // recomputes from the formula — equality proves sample-table
    // resolution + PNG decode + pooling.
    "m_mp4_frames" -> {
      val fcols = (0 until 6).map { k =>
        val (cy, cx) = (k / 2, k % 2)
        s"round(list_sum(list_transform(range(0,8), j -> " +
          s"(doc_id*17 + frame_idx*29 + (${2 * cy} + j//4)*8 + " +
          s"${4 * cx} + j%4) % 251)) / 8.0 + 1e-9, 4) AS f$k"
      }.mkString(",\n  ")
      s"""WITH fr AS (SELECT doc_id, CAST(t.f AS BIGINT) AS frame_idx
         |            FROM documents CROSS JOIN range(3) t(f))
         |SELECT doc_id, frame_idx,
         |  round(frame_idx * 40 / 1000.0 + 1e-9, 4) AS pts_sec,
         |  CAST(8 AS BIGINT) AS width, CAST(6 AS BIGINT) AS height,
         |  $fcols
         |FROM fr ORDER BY doc_id, frame_idx""".stripMargin
    },

    // frame k of a doc's MPEG stream has bitrate
    // [128,160,192,256][(doc_id+k) % 4] and size
    // floor(144*kbps*1000/44100); 4 frames of 1152 samples at 44100.
    "m_mpeg_meta" -> {
      val kbps = "list_transform(range(0, 4), k -> " +
        "([128,160,192,256])[CAST((doc_id + k) % 4 AS INT) + 1])"
      s"""SELECT doc_id, CAST(4 AS BIGINT) AS n_frames,
         |  CAST(44100 AS BIGINT) AS sample_rate, CAST(1 AS BIGINT) AS channels,
         |  CAST(list_sum(list_transform($kbps, b ->
         |    (144 * b * 1000) // 44100)) AS BIGINT) AS total_bytes,
         |  round(4 * 1152 / 44100.0 + 1e-9, 6) AS sec,
         |  round(list_sum($kbps) / 4.0 + 1e-9, 4) AS mean_kbps
         |FROM documents ORDER BY doc_id""".stripMargin
    },

    // frame pixel v(f,p) = (doc_id*13 + f*37 + p) % 251 over 4 frames
    // of 48 pixels; features = per-frame means + mean |Δ| between
    // consecutive frames; sampling keeps frames 0 and 2. The engine
    // derives these from DECODED AVI frames; the oracle from the
    // formula — equality proves the container codec chain.
    "m_video_pipeline" -> {
      val fcols = (0 until 4).map { k =>
        s"round(list_sum(list_transform(range(0, 48), p -> " +
          s"(doc_id*13 + ${k * 37} + p) % 251)) / 48.0 + 1e-9, 4) AS f$k"
      }.mkString(",\n  ")
      s"""SELECT doc_id, CAST(8 AS BIGINT) AS width, CAST(6 AS BIGINT) AS height,
         |  CAST(4 AS BIGINT) AS n_frames,
         |  $fcols,
         |  round(list_sum(list_transform(range(0, 144), q ->
         |    abs(  (doc_id*13 + (q//48 + 1)*37 + q%48) % 251
         |        - (doc_id*13 + (q//48)*37     + q%48) % 251)))
         |    / 144.0 + 1e-9, 4) AS motion,
         |  CAST(2 AS BIGINT) AS res_frames,
         |  array_to_string(list_transform(range(0, 2), f ->
         |    array_to_string(list_transform(range(0, 48), p ->
         |      (doc_id*13 + f*2*37 + p) % 251), '-')), '|') AS res_pixels
         |FROM documents ORDER BY doc_id""".stripMargin
    },

    // pixel v(x,y) = (doc_id*31 + y*8 + x) % 256; features = 2×4 grid
    // cell means over 4×2-pixel cells; resize = floor-mean of each 2×2
    // block. The engine derives these from DECODED pixels; the oracle
    // derives them from the formula — equality proves the codec chain.
    "m_media_pipeline" -> {
      val cells = (0 until 8).map { k =>
        val (cy, cx) = (k / 4, k % 4)
        s"round(list_sum(list_transform(range(0,8), j -> " +
          s"(doc_id*31 + (${cy * 4} + j//2)*8 + ${cx * 2} + j%2) % 256)) " +
          s"/ 8.0 + 1e-9, 4) AS f$k"
      }.mkString(",\n  ")
      s"""SELECT doc_id, CAST(8 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height,
         |  $cells,
         |  array_to_string(list_transform(range(0,16), p ->
         |    (  ((doc_id*31 + ((p//4)*2)*8   + (p%4)*2)     % 256)
         |     + ((doc_id*31 + ((p//4)*2)*8   + (p%4)*2 + 1) % 256)
         |     + ((doc_id*31 + ((p//4)*2+1)*8 + (p%4)*2)     % 256)
         |     + ((doc_id*31 + ((p//4)*2+1)*8 + (p%4)*2 + 1) % 256)) // 4),
         |    '-') AS res_pixels
         |FROM documents ORDER BY doc_id""".stripMargin
    },

    // stage mirror: arg-min dedup via min(doc_id) per md5(text), then
    // the same lang/length predicates and audit aggregate
    "d_curation_pipeline" ->
      """WITH keep AS (
        |  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
        |k AS (SELECT d.* FROM documents d JOIN keep USING (doc_id)),
        |f AS (SELECT * FROM k
        |      WHERE len(list_filter(string_split(text, ' '), w -> w = 'the')) >= 1
        |        AND n_chars >= 100)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
        |  round(avg(n_chars) + 1e-9, 4) AS avg_chars
        |FROM f GROUP BY source ORDER BY source""".stripMargin,

    // every window recomputed directly (non-rolling) from precomputed
    // B^(w-1-j) mod M literals — equality proves the engine's rolling
    // update; char positions ≡ byte positions on the ASCII corpus
    "t_rolling_fingerprint" -> {
      val M = 1000000007L; val B = 257L; val W = 8
      val P = (0 until W).map { j =>
        var p = 1L; (0 until (W - 1 - j)).foreach(_ => p = p * B % M); p
      }
      val terms = (0 until W).map(j =>
        s"CAST(ord(substr(text, CAST(i+$j AS INT), 1)) AS BIGINT) * ${P(j)}")
        .mkString(" + ")
      s"""WITH h AS (
         |  SELECT doc_id,
         |    list_transform(range(1, greatest(length(text) - ${W - 2}, 1)),
         |      i -> ($terms) % $M) AS hs,
         |    list_filter(range(1, greatest(length(text) - ${W - 2}, 1)),
         |      i -> (($terms) % $M) % 64 = 0) AS bpos
         |  FROM documents)
         |SELECT doc_id, CAST(len(hs) AS BIGINT) AS n_windows,
         |  CAST(len(list_filter(hs, x -> x % 64 = 0)) AS BIGINT) AS n_boundaries,
         |  COALESCE(list_min(hs), -1) AS min_hash,
         |  COALESCE(list_min(bpos), 0) AS first_boundary
         |FROM h ORDER BY doc_id""".stripMargin
    },

    // same decomposition as the engine: words → counts → per-position
    // (char, next-char-or-</w>) pairs weighted by word count
    "t_bpe_pairs" ->
      """WITH wc AS (
        |  SELECT w, count(*) AS cnt
        |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE len(w) > 0 GROUP BY w),
        |p AS (
        |  SELECT substr(w, i, 1) AS "left",
        |         CASE WHEN i = length(w) THEN '</w>'
        |              ELSE substr(w, i + 1, 1) END AS "right",
        |         cnt
        |  FROM (SELECT w, cnt, unnest(range(1, length(w) + 1)) AS i FROM wc))
        |SELECT "left", "right", CAST(sum(cnt) AS BIGINT) AS cnt FROM p GROUP BY 1, 2
        |ORDER BY cnt DESC, "left", "right" LIMIT 50""".stripMargin,

    // BPE non-overlapping leftmost fusion as a replace() fixpoint on
    // the space-joined symbol string: one replace pass skips an
    // occurrence that shares a delimiter with the previous match, so
    // each word iterates (recursive CTE) until its string stops
    // changing. For merges with left ≠ right, (l,r) occurrences can
    // never overlap, so the fused grouping is order-independent and
    // the fixpoint equals the engine's single left-to-right pass.
    // Merge 2 runs on merge 1's OUTPUT (rank order), matching encode.
    "t_bpe_step_fixed" ->
      """WITH RECURSIVE wc AS (
        |  SELECT w, count(*) AS cnt
        |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE len(w) > 0 GROUP BY w),
        |init AS (
        |  SELECT w, cnt,
        |    ' ' || array_to_string(list_transform(range(1, length(w) + 1),
        |                           i -> substr(w, i, 1)), ' ') || ' </w> ' AS s
        |  FROM wc),
        |m1 AS (
        |  SELECT w, cnt, s FROM init
        |  UNION ALL
        |  SELECT w, cnt, replace(s, ' t h ', ' th ') FROM m1
        |  WHERE s <> replace(s, ' t h ', ' th ')),
        |f1 AS (SELECT w, cnt, s FROM m1 WHERE s = replace(s, ' t h ', ' th ')),
        |m2 AS (
        |  SELECT w, cnt, s FROM f1
        |  UNION ALL
        |  SELECT w, cnt, replace(s, ' th e ', ' the ') FROM m2
        |  WHERE s <> replace(s, ' th e ', ' the ')),
        |f2 AS (SELECT w, cnt, s FROM m2 WHERE s = replace(s, ' th e ', ' the ')),
        |p AS (
        |  SELECT syms[i] AS "left", syms[i + 1] AS "right", cnt
        |  FROM (SELECT string_split(trim(s), ' ') AS syms, cnt,
        |               unnest(range(1, len(string_split(trim(s), ' ')))) AS i
        |        FROM f2))
        |SELECT "left", "right", CAST(sum(cnt) AS BIGINT) AS cnt FROM p
        |GROUP BY 1, 2
        |ORDER BY cnt DESC, "left", "right" LIMIT 50""".stripMargin
  )
}
