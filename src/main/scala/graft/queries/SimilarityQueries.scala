package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.sim.{IvfIndex, Similarity}

/** Vector-similarity search over the `embeddings` table: brute-force
  * cosine top-k (exact baseline), hyperplane-LSH bucketed ANN (scale
  * path), and LSH-candidate near-duplicate pairs. The oracle replicates
  * the identical double-precision math, including the deterministic
  * sin-based hyperplanes, so bucket assignments match across engines.
  */
object SimilarityQueries extends QueryModule {

  private val ProbeIds = Seq(0L, 1L, 2L)

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)

  private def probes(s: SparkSession, dir: String): DataFrame =
    emb(s, dir).where(col("vec_id").isin(ProbeIds: _*))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Brute-force cosine top-5 for 3 probe vectors
    "e_cosine_topk" -> { (s, dir) =>
      Similarity.bruteForceTopK(emb(s, dir), probes(s, dir),
          col("vec_id"), col("embedding"), col("vec_id"), col("embedding"), k = 5)
        .select(col("qid"), col("rank").cast("long").as("rank"), col("cid"),
          round(col("sim") + lit(1e-9), 6).as("sim"))
        .orderBy("qid", "rank")
    },

    // LSH-bucketed ANN top-3 (4 hyperplanes → 16 buckets)
    "e_ann_lsh" -> { (s, dir) =>
      Similarity.annTopK(emb(s, dir), probes(s, dir),
          col("vec_id"), col("embedding"), col("vec_id"), col("embedding"),
          nPlanes = 4, k = 3)
        .select(col("qid"), col("rank").cast("long").as("rank"), col("cid"),
          round(col("sim") + lit(1e-9), 6).as("sim"), col("bucket"))
        .orderBy("qid", "rank")
    },

    // Embedding aggregation by key — per-label centroids (the class-
    // centroid / cluster-statistics staple of training pipelines):
    // element-wise mean via posexplode + two-level aggregation.
    "e_label_centroid" -> { (s, dir) =>
      emb(s, dir)
        .select(col("label"), posexplode(col("embedding").cast("array<double>"))
          .as(Seq("i0", "x")))
        .groupBy(col("label"), (col("i0") + 1).as("i"))
        .agg(avg(col("x")).as("c"), count(lit(1)).as("cnt"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_dims"),
          max(col("cnt")).as("n_vecs"),
          round(sqrt(sum(col("c") * col("c"))) + lit(1e-9), 6).as("centroid_norm"),
          round(sum(col("c")) + lit(1e-9), 6).as("dim_sum"))
        .orderBy("label")
    },

    // IVF-Flat ANN: coarse quantizer = the 8 lowest-id vectors
    // (train with iters=0 — externally-supplied centroids, the shape a
    // 100 TB pipeline uses anyway since coarse centroids come from
    // offline sampled k-means; also the only hash-exact-reproducible
    // form, as Lloyd's averaging is summation-order sensitive). Every
    // vector is assigned to its nearest list; probes search the 3
    // nearest lists and re-rank exactly.
    "e_ivf_topk" -> { (s, dir) =>
      val e = emb(s, dir)
      val centroids = IvfIndex.train(e, col("vec_id"), col("embedding"),
        nlist = 8, iters = 0)
      val index = IvfIndex.assign(
        e.select(col("vec_id").as("vid"),
          col("embedding").cast("array<double>").as("v")), centroids)
      IvfIndex.search(index, centroids, probes(s, dir),
          col("vec_id"), col("embedding"), nprobe = 3, k = 4)
        .select(col("qid"), col("rank").cast("long").as("rank"), col("vid"),
          round(col("sim") + lit(1e-9), 6).as("sim"),
          // row_number-derived: INT in Spark, BIGINT in DuckDB — align
          col("list_id").cast("long").as("list_id"))
        .orderBy("qid", "rank")
    },

    // Semantic dedup keeper assignment: every vector maps to the
    // lowest-id bucket-mate within cosine ≥ 0.45 (itself if none) —
    // the doc-level "which row survives" output a dedup pipeline
    // actually writes, as opposed to the pair list. One LSH-bucketed
    // self-join + a min-agg; survivors are `keeper = vec_id` rows.
    "e_semantic_dedup" -> { (s, dir) =>
      val withSig = emb(s, dir).select(col("vec_id"),
          col("embedding").cast("array<double>").as("v"),
          Similarity.lshSignature(col("embedding"), 4).as("bucket"))
        .withColumn("nrm", Similarity.norm(col("v")))
      val later = withSig.select(col("bucket"), col("vec_id").as("i"),
        col("v").as("vi"), col("nrm").as("ni"))
      val earlier = withSig.select(col("bucket"), col("vec_id").as("j"),
        col("v").as("vj"), col("nrm").as("nj"))
      val matches = later.join(earlier, "bucket").where(col("j") < col("i"))
        .where(Similarity.dot(col("vi"), col("vj"))
          / (col("ni") * col("nj")) >= 0.45)
        .groupBy(col("i")).agg(min(col("j")).as("dup_of"))
      withSig.select(col("vec_id")).join(matches,
          col("vec_id") === col("i"), "left")
        .select(col("vec_id"),
          coalesce(col("dup_of"), col("vec_id")).as("keeper"),
          (col("dup_of").isNotNull).as("is_dup"))
        .orderBy("vec_id")
    },

    // IVF with TRAINED centroids (distributed Lloyd's, iters=2) — the
    // production path where coarse centroids come from k-means rather
    // than seed vectors. Rows-only gate: Lloyd's averaging is
    // double-summation-order sensitive, so no engine-independent
    // oracle exists; IvfIndexSpec proves recall and the
    // nprobe=nlist ≡ exact equivalence.
    "e_ivf_trained" -> { (s, dir) =>
      val e = emb(s, dir)
      val centroids = IvfIndex.train(e, col("vec_id"), col("embedding"),
        nlist = 8, iters = 2)
      val index = IvfIndex.assign(
        e.select(col("vec_id").as("vid"),
          col("embedding").cast("array<double>").as("v")), centroids)
      IvfIndex.search(index, centroids, probes(s, dir),
          col("vec_id"), col("embedding"), nprobe = 3, k = 4)
        .select(col("qid"), col("rank").cast("long").as("rank"), col("vid"),
          round(col("sim") + lit(1e-9), 6).as("sim"))
        .orderBy("qid", "rank")
    },

    // IVF ASSIGNMENT with FIXED centroids — the oracled companion to
    // e_ivf_trained (same e_pca_project_fixed pattern): the nearest-
    // centroid argmin algebra gets a true DuckDB gate by pinning the
    // centroids to exact binary fractions (quarters), which makes the
    // per-element (v-c)² accumulation bit-identical across engines —
    // no rounding tolerance needed on the argmin itself, so a flipped
    // assignment CANNOT hide. The trained gate then only leaves
    // Lloyd's summation-order-sensitive averaging un-oracled.
    "e_ivf_assign_fixed" -> { (s, dir) =>
      val d = 64
      val cents = (0 until 4).map { k =>
        (k, Array.tabulate(d)(i => ((i * (k + 2)) % 8) * 0.25 - 1.0))
      }
      val cdf = s.createDataFrame(cents).toDF("list_id", "centroid")
      IvfIndex.assign(
          Tables.embeddingsSpread(s, dir)
            .select(col("vec_id").as("vid"),
              col("embedding").cast("array<double>").as("v")), cdf)
        .select(col("vid").as("vec_id"), col("list_id").cast("long").as("list_id"))
        .orderBy("vec_id")
    },

    // One Lloyd's UPDATE step against the same fixed exact-binary
    // centroids as e_ivf_assign_fixed — the other half of e_ivf_trained
    // joins the oracled set (assignment + update are the whole
    // iteration; only the iterate-to-convergence composition stays
    // pinned-only). Real code path: IvfIndex.assign → IvfIndex
    // .updateStep (the exact functions train loops over). Digest
    // columns (element sum, first/last element) round at 6dp — the
    // per-dimension means sum member doubles in engine-specific order.
    "e_ivf_update_fixed" -> { (s, dir) =>
      val d = 64
      val cents = (0 until 4).map { k =>
        (k, Array.tabulate(d)(i => ((i * (k + 2)) % 8) * 0.25 - 1.0))
      }
      val cdf = s.createDataFrame(cents).toDF("list_id", "centroid")
      val corpus = Tables.embeddingsSpread(s, dir)
        .select(col("vec_id").as("vid"),
          col("embedding").cast("array<double>").as("v"))
      val assigned = IvfIndex.assign(corpus, cdf)
      val counts = assigned.groupBy("list_id").agg(count(lit(1)).as("n_members"))
      IvfIndex.updateStep(assigned, cdf)
        .join(counts, Seq("list_id"), "left")
        .select(col("list_id").cast("long").as("list_id"),
          coalesce(col("n_members"), lit(0L)).as("n_members"),
          round(aggregate(col("centroid"), lit(0.0), (a, x) => a + x)
            + lit(1e-9), 6).as("csum"),
          round(element_at(col("centroid"), 1) + lit(1e-9), 6).as("c_first"),
          round(element_at(col("centroid"), d) + lit(1e-9), 6).as("c_last"))
        .orderBy("list_id")
    },

    // Symmetric per-vector int8 quantization (the storage/shuffle
    // compression step of a 100 TB vector pipeline — 4× fewer bytes
    // than float32 on every scan and exchange): scale = max|x|/127,
    // codes = floor(x/scale + 0.5). Entirely row-local — zero shuffles
    // before the output sort — and computed by the native codegen
    // expression QuantizeStatsExpr (one compiled loop; the interpreted
    // HOF form it replaced measured a 3.4× 10×-slope from lambda
    // dispatch alone — VectorExpressionsSpec keeps the two forms
    // differential). qsum (integer code sum) is exact across engines;
    // the error sums accumulate in list order on both sides.
    "e_quantize_int8" -> { (s, dir) =>
      import graft.functions.VectorExpressions
      Tables.embeddingsSpread(s, dir)
        .select(col("vec_id"),
          VectorExpressions.quantizeStats(col("embedding")).as("q"))
        .select(col("vec_id"),
          round(col("q.scale") + lit(1e-9), 6).as("scale"),
          col("q.qsum").as("qsum"),
          round(col("q.max_err") + lit(1e-9), 6).as("max_err"),
          round(col("q.rmse") + lit(1e-9), 6).as("rmse"))
        .orderBy("vec_id")
    },

    // Distributed covariance matrix over the embedding dimensions (the
    // reduce step of PCA / whitening / drift monitoring): two passes —
    // dimension means (a d-sized broadcast), then each row emits its
    // centered upper-triangle outer product ROW-LOCALLY and the
    // partials hash-aggregate into d(d+1)/2 groups. Centering first
    // keeps the algebra numerically stable (no avg(xy) − avg(x)avg(y)
    // cancellation). No self-join, no n·d shuffle: total exchange =
    // the fixed-size group set, linear in n — the 100 TB shape. (The
    // outer product runs in interpreted HOF lambdas; the trade is
    // deliberate — d² local multiplies against shipping n·d rows
    // through a join.) Gate restricts to the first 16 dims (136 pairs)
    // to keep the oracle cheap; the operator is dimension-generic.
    "e_embed_covariance" -> { (s, dir) =>
      val d = 16
      val ex = Tables.embeddingsSpread(s, dir)
        .select(col("vec_id"),
          slice(col("embedding").cast("array<double>"), 1, d).as("v"))
      val meansArr = ex
        .select(posexplode(col("v")).as(Seq("i0", "x")))
        .groupBy(col("i0")).agg(avg(col("x")).as("m"))
        .agg(transform(array_sort(collect_list(struct(col("i0"), col("m")))),
          s => s.getField("m")).as("marr"))
      // r14: native UpperTriProductsExpr (identical per-pair doubles,
      // same aggregate) — the interpreted transform×transform it
      // replaces dispatched a lambda per pair per row
      val pairs = ex.crossJoin(broadcast(meansArr))
        .select(explode(graft.functions.VectorExpressions
          .upperTri(col("v"), col("marr"), d)).as("p"))
      // sequence() yields INT; the oracle's range() yields BIGINT — align
      pairs.groupBy(col("p.i").cast("long").as("i"),
          col("p.j").cast("long").as("j"))
        .agg(count(lit(1)).as("n"),
          // + 0.0 after the round: IEEE -0.0 + 0.0 = 0.0, so a
          // near-zero covariance that rounds to signed zero hashes
          // identically on both engines
          (round(avg(col("p.xy")) + lit(1e-9), 6) + lit(0.0)).as("cov"))
        .orderBy("i", "j")
    },

    // Per-label embedding spread (the cluster-quality audit beside the
    // centroid gate): intra-class variance per label = mean squared
    // distance of members to their centroid, computed dimension-wise —
    // var(label) = Σ_dims var(x_i | label) — so it's the same two-level
    // posexplode aggregate as the centroid, never a member×member or
    // member×centroid join. High intra-variance labels are mislabeled /
    // noisy classes in a training-data audit.
    "e_label_spread" -> { (s, dir) =>
      Tables.embeddingsSpread(s, dir)
        .select(col("label"), posexplode(col("embedding").cast("array<double>"))
          .as(Seq("i0", "x")))
        .groupBy(col("label"), col("i0"))
        .agg(count(lit(1)).as("n"), avg(col("x")).as("m"),
          var_pop(col("x")).as("v"))
        .groupBy(col("label"))
        .agg(max(col("n")).as("n_vecs"),
          round(sum(col("v")) + lit(1e-9), 6).as("intra_var"),
          round(sqrt(sum(col("m") * col("m"))) + lit(1e-9), 6).as("centroid_norm"))
        .orderBy("label")
    },

    // Quantized ANN: the int8 codes of e_quantize_int8 made
    // operational — the full-corpus scan ranks by QUANTIZED cosine
    // (1 byte/dim of bandwidth at scale), exact float re-rank touches
    // only the 10-deep shortlist. Integer code dots are exact in
    // double, so shortlist order — and therefore the result — is
    // engine-reproducible and fully oracled.
    "e_quantized_ann" -> { (s, dir) =>
      // (r14: a corpus-side spread was measured and REJECTED — it won
      // ~0.3 s at sf0.1's single-row-group scan but lost 0.7 s at the
      // 10× replica probe: the quantize kernel is light enough that
      // the repartition's sort+shuffle+stage boundary outweigh the
      // extra parallelism as soon as the source has a few splits.)
      Similarity.quantizedTopK(emb(s, dir), probes(s, dir),
          col("vec_id"), col("embedding"), col("vec_id"), col("embedding"),
          k = 4, shortlist = 10)
        .select(col("qid"), col("rank").cast("long").as("rank"), col("cid"),
          round(col("sim") + lit(1e-9), 6).as("sim"),
          round(col("qsim") + lit(1e-9), 6).as("qsim"))
        .orderBy("qid", "rank")
    },

    // PCA projection (sim.Pca): fit on the first 16 dims (distributed
    // means + covariance, driver-side d×d eigen — d is model-sized),
    // then project every vector onto the top-2 components with
    // unrolled codegen'd arithmetic (PcaSpec proves the projection
    // plan is shuffle-free). Rows-only gate: no engine-independent
    // oracle exists for an eigendecomposition (sign/order conventions
    // and iterative solvers differ); PcaSpec pins the math instead
    // (known dominant direction, eigenvalue⇔projection variance,
    // orthonormality).
    "e_pca_project" -> { (s, dir) =>
      import graft.sim.Pca
      val e = Tables.embeddingsSpread(s, dir)
      val model = Pca.fit(e, col("embedding"), d = 16, k = 2)
      Pca.project(e, col("embedding"), model)
        .select(col("vec_id"), col("label"),
          round(element_at(col("pc"), 1) + lit(1e-9), 4).as("pc1"),
          round(element_at(col("pc"), 2) + lit(1e-9), 4).as("pc2"))
        .orderBy("vec_id")
    },

    // PCA projection with FIXED checked-in components: the projection
    // algebra (center, dot with each component) is exactly production
    // Pca.project — only the eigen step is bypassed, so this gate
    // hash-verifies the per-row arithmetic against DuckDB while
    // e_pca_project keeps covering the fitted path (fixture-pinned).
    // Components/means are formula-generated (sin/cos ramps) so the
    // oracle can regenerate them without a literal table.
    "e_pca_project_fixed" -> { (s, dir) =>
      import graft.sim.Pca
      val d = 16
      val model = Pca.Model(
        means = Array.tabulate(d)(i => 0.1 * i),
        components = Array(
          Array.tabulate(d)(i => math.sin(0.3 * i)),
          Array.tabulate(d)(i => math.cos(0.3 * i))),
        variances = Array(1.0, 1.0))
      Pca.project(Tables.embeddingsSpread(s, dir), col("embedding"), model)
        .select(col("vec_id"), col("label"),
          round(element_at(col("pc"), 1) + lit(1e-9), 4).as("pc1"),
          round(element_at(col("pc"), 2) + lit(1e-9), 4).as("pc2"))
        .orderBy("vec_id")
    },

    // PRODUCTION near-dup form: autoPlanes — the plane count grows
    // with the corpus (⌈log₂(n/256)⌉) so bucket occupancy stays flat
    // and the same-bucket pair cost stays linear-ish at any scale.
    // The fixed-4 gate keeps the pinned-occupancy correctness role;
    // THIS gate is the form a 100 TB run uses, fully oracled too (the
    // plane count is count-derived on both engines, and the sin-plane
    // signature is deterministic IEEE math).
    "e_near_dup_auto" -> { (s, dir) =>
      val e0 = emb(s, dir)
      val planes = Similarity.autoPlanes(e0.count())
      val withSig = e0.select(col("vec_id"),
          col("embedding").cast("array<double>").as("v"),
          Similarity.lshSignature(col("embedding"), planes).as("bucket"))
        .withColumn("nrm", Similarity.norm(col("v")))
      val a = withSig.select(col("bucket"), col("vec_id").as("i"),
        col("v").as("vi"), col("nrm").as("ni"))
      val b = withSig.select(col("bucket"), col("vec_id").as("j"),
        col("v").as("vj"), col("nrm").as("nj"))
      a.join(b, "bucket").where(col("i") < col("j"))
        .withColumn("sim",
          Similarity.dot(col("vi"), col("vj")) / (col("ni") * col("nj")))
        .where(col("sim") >= 0.45)
        .select(col("i"), col("j"), round(col("sim") + lit(1e-9), 6).as("sim"))
        .orderBy("i", "j")
    },

    // PRODUCTION semantic-dedup form: the autoPlanes twin of
    // e_semantic_dedup (same keeper-assignment algebra, scale-correct
    // bucket count), fully oracled like e_near_dup_auto.
    "e_semantic_dedup_auto" -> { (s, dir) =>
      val e0 = emb(s, dir)
      val planes = Similarity.autoPlanes(e0.count())
      val withSig = e0.select(col("vec_id"),
          col("embedding").cast("array<double>").as("v"),
          Similarity.lshSignature(col("embedding"), planes).as("bucket"))
        .withColumn("nrm", Similarity.norm(col("v")))
      val later = withSig.select(col("bucket"), col("vec_id").as("i"),
        col("v").as("vi"), col("nrm").as("ni"))
      val earlier = withSig.select(col("bucket"), col("vec_id").as("j"),
        col("v").as("vj"), col("nrm").as("nj"))
      val matches = later.join(earlier, "bucket").where(col("j") < col("i"))
        .where(Similarity.dot(col("vi"), col("vj"))
          / (col("ni") * col("nj")) >= 0.45)
        .groupBy(col("i")).agg(min(col("j")).as("dup_of"))
      withSig.select(col("vec_id")).join(matches,
          col("vec_id") === col("i"), "left")
        .select(col("vec_id"),
          coalesce(col("dup_of"), col("vec_id")).as("keeper"),
          (col("dup_of").isNotNull).as("is_dup"))
        .orderBy("vec_id")
    },

    // Eigen PROPERTY gate (closes the e_pca_project pinned-only gap
    // from the r9 verdict): the eigendecomposition itself has no
    // engine-independent value oracle (sign/order conventions,
    // iterative solvers), but its DEFINING PROPERTIES are checkable —
    // against the exact covariance the fit decomposed (same
    // distributed meansAndCov the hash-oracled e_embed_covariance gate
    // verifies): per component, ‖C·v − λv‖ ≈ 0, ‖v‖ = 1, pairwise
    // orthogonality, λ ≥ 0 (C is PSD), eigenvalues descending, AND the
    // distributed projection's population variance equals λ (ties the
    // codegen'd projection path to the model). Each property lands as
    // a boolean the DuckDB oracle pins to true — a broken eigen, a
    // drifted covariance, or a mis-wired projection flips one loudly.
    "e_pca_eigen_check" -> { (s, dir) =>
      import graft.sim.Pca
      val d = 16
      val k = 2
      val e = Tables.embeddingsSpread(s, dir)
      val (means, cov) = Pca.meansAndCov(e, col("embedding"), d)
      val model = Pca.fitFromMoments(means, cov, k)
      val projVarRow = Pca.project(e, col("embedding"), model)
        .select((0 until k).map(c =>
          var_pop(element_at(col("pc"), c + 1)).as(s"v$c")): _*)
        .head()
      import breeze.linalg.{norm, DenseVector}
      val rows = (0 until k).map { c =>
        val vC = DenseVector(model.components(c))
        val lam = model.variances(c)
        val resid = norm(cov * vC - vC * lam)
        val ortho = (0 until k).filter(_ != c)
          .map(o => math.abs(vC dot DenseVector(model.components(o))))
          .foldLeft(0.0)(math.max)
        val projVar = projVarRow.getDouble(c)
        ((c + 1).toLong,
          math.abs(norm(vC) - 1.0) <= 1e-10,
          ortho <= 1e-10,
          resid <= 1e-8,
          math.abs(projVar - lam) <= 1e-6 * math.max(1.0, math.abs(lam)),
          lam >= -1e-12,
          c == 0 || model.variances(c - 1) >= lam)
      }
      import s.implicits._
      rows.toDF("component", "unit_norm_ok", "ortho_ok", "residual_ok",
          "var_matches", "eig_nonneg", "descending_ok")
        .orderBy("component")
    },

    // IVF FIXPOINT gate (closes the e_ivf_trained pinned-only gap from
    // the r9 verdict): Lloyd's averaging is summation-order sensitive,
    // so trained centroid VALUES have no cross-engine oracle — but the
    // convergence property does. Train to convergence
    // (IvfIndex.trainConverged), then run ONE MORE assign→update over
    // the converged centroids through the exact production functions:
    // at a Lloyd's fixpoint the assignment is unchanged, so the update
    // must reproduce every centroid (within float-summation noise).
    // Per list the movement bound lands as a boolean DuckDB pins true.
    // The two failure modes stay distinguishable by column: a twin
    // drift (assign/update disagreeing with the trainer) flips
    // fixpoint_ok; a legitimately slow corpus exhausting maxIters
    // flips only `converged` (with tol=0 the loop exits exactly on
    // fixpoint or cap, so converged IS the iteration-budget verdict).
    "e_ivf_fixpoint" -> { (s, dir) =>
      val e = emb(s, dir)
      val (cents, _, finalMove) = IvfIndex.trainConverged(
        e, col("vec_id"), col("embedding"),
        nlist = 8, maxIters = 100, tol = 0.0)
      val corpus = e.select(col("vec_id").as("vid"),
        col("embedding").cast("array<double>").as("v"))
      val next = IvfIndex.updateStep(IvfIndex.assign(corpus, cents), cents)
      // convergence = the loop's own exit condition (final movement
      // exactly zero), not an iteration-count inference — reaching the
      // fixpoint ON the last allowed iteration is still converged
      val converged = finalMove == 0.0
      cents.select(col("list_id"), col("centroid").as("c0"))
        .join(next.select(col("list_id"), col("centroid").as("c1")), "list_id")
        .select(col("list_id").cast("long").as("list_id"),
          (sqrt(aggregate(zip_with(col("c0"), col("c1"),
            (x, y) => (x - y) * (x - y)), lit(0.0), (a, x) => a + x))
            <= 1e-6).as("fixpoint_ok"),
          lit(converged).as("converged"))
        .orderBy("list_id")
    },

    // Embedding near-dup pairs: LSH candidates (same bucket), exact
    // cosine ≥ 0.45
    "e_near_dup" -> { (s, dir) =>
      val withSig = emb(s, dir).select(col("vec_id"),
          col("embedding").cast("array<double>").as("v"),
          Similarity.lshSignature(col("embedding"), 4).as("bucket"))
        .withColumn("nrm", Similarity.norm(col("v")))
      val a = withSig.select(col("bucket"), col("vec_id").as("i"),
        col("v").as("vi"), col("nrm").as("ni"))
      val b = withSig.select(col("bucket"), col("vec_id").as("j"),
        col("v").as("vj"), col("nrm").as("nj"))
      a.join(b, "bucket").where(col("i") < col("j"))
        .withColumn("sim",
          Similarity.dot(col("vi"), col("vj")) / (col("ni") * col("nj")))
        .where(col("sim") >= 0.45)
        .select(col("i"), col("j"), round(col("sim") + lit(1e-9), 6).as("sim"))
        .orderBy("i", "j")
    }
  )

  /** Shared oracle CTE: embeddings as doubles + the AUTO-PLANES LSH
    * bucket signature — the plane count derives from count(*) exactly
    * like Similarity.autoPlanes (⌈log₂(n/256)⌉ clamped to [1, 30]), so
    * the oracle tracks the production form at any SF.
    */
  private def autoSigCte: String =
    """n AS (SELECT count(*) c FROM embeddings),
      |np AS (SELECT coalesce(min(t.p), 30) p FROM range(1, 31) t(p), n
      |       WHERE power(2, t.p) * 256 >= n.c),
      |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
      |bits AS (SELECT e.vec_id, t.p,
      |  CASE WHEN list_sum(list_transform(range(1,65),
      |    i -> e.v[i]*sin((t.p*97+(i-1))*0.1))) > 0 THEN '1' ELSE '0' END b
      | FROM e, range(0, 30) t(p), np WHERE t.p < np.p),
      |sigb AS (SELECT vec_id, string_agg(b, '' ORDER BY p) bucket
      |         FROM bits GROUP BY vec_id),
      |sig AS (SELECT e.vec_id, e.v, sigb.bucket
      |        FROM e JOIN sigb USING (vec_id))""".stripMargin

  /** Shared oracle CTE: embeddings as doubles + LSH bucket signature
    * (4 sin-hyperplanes, identical math to Similarity.lshSignature).
    */
  private def sigCte: String =
    """e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
      |sig AS (SELECT vec_id, v,
      |  concat(
      |   CASE WHEN list_sum(list_transform(range(1,65), i -> v[i]*sin((0*97+(i-1))*0.1))) > 0 THEN '1' ELSE '0' END,
      |   CASE WHEN list_sum(list_transform(range(1,65), i -> v[i]*sin((1*97+(i-1))*0.1))) > 0 THEN '1' ELSE '0' END,
      |   CASE WHEN list_sum(list_transform(range(1,65), i -> v[i]*sin((2*97+(i-1))*0.1))) > 0 THEN '1' ELSE '0' END,
      |   CASE WHEN list_sum(list_transform(range(1,65), i -> v[i]*sin((3*97+(i-1))*0.1))) > 0 THEN '1' ELSE '0' END
      |  ) bucket FROM e)""".stripMargin

  def oracle: Map[String, String] = Map(
    "e_cosine_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
        |q AS (SELECT vec_id qid, v qv FROM e WHERE vec_id IN (0, 1, 2)),
        |s AS (SELECT q.qid, e.vec_id cid,
        |   list_sum(list_transform(range(1,65), i -> e.v[i]*q.qv[i])) /
        |   (sqrt(list_sum(list_transform(range(1,65), i -> e.v[i]*e.v[i]))) *
        |    sqrt(list_sum(list_transform(range(1,65), i -> q.qv[i]*q.qv[i])))) sim
        | FROM e, q WHERE e.vec_id <> q.qid),
        |r AS (SELECT *, row_number() OVER (PARTITION BY qid
        |        ORDER BY sim DESC, cid ASC) AS rank FROM s)
        |SELECT qid, rank, cid, round(sim + 1e-9, 6) AS sim FROM r
        |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,

    "e_ann_lsh" ->
      s"""WITH $sigCte,
        |q AS (SELECT vec_id qid, v qv, bucket FROM sig WHERE vec_id IN (0, 1, 2)),
        |s AS (SELECT q.qid, c.vec_id cid, c.bucket,
        |   list_sum(list_transform(range(1,65), i -> c.v[i]*q.qv[i])) /
        |   (sqrt(list_sum(list_transform(range(1,65), i -> c.v[i]*c.v[i]))) *
        |    sqrt(list_sum(list_transform(range(1,65), i -> q.qv[i]*q.qv[i])))) sim
        | FROM sig c JOIN q ON c.bucket = q.bucket AND c.vec_id <> q.qid),
        |r AS (SELECT *, row_number() OVER (PARTITION BY qid
        |        ORDER BY sim DESC, cid ASC) AS rank FROM s)
        |SELECT qid, rank, cid, round(sim + 1e-9, 6) AS sim, bucket FROM r
        |WHERE rank <= 3 ORDER BY qid, rank""".stripMargin,

    "e_label_centroid" ->
      """WITH dims AS (
        |  SELECT label, i, avg(CAST(embedding[i] AS DOUBLE)) c, count(*) cnt
        |  FROM embeddings, range(1, 65) t(i) GROUP BY 1, 2)
        |SELECT label, count(*) AS n_dims, max(cnt) AS n_vecs,
        |       round(sqrt(sum(c*c)) + 1e-9, 6) AS centroid_norm,
        |       round(sum(c) + 1e-9, 6) AS dim_sum
        |FROM dims GROUP BY 1 ORDER BY 1""".stripMargin,

    "e_ivf_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
        |cent AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS list_id, v AS cv
        |         FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 8)),
        |asg AS (SELECT vid, v, list_id FROM (
        |  SELECT e.vec_id vid, e.v, c.list_id,
        |         row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |           list_sum(list_transform(range(1,65),
        |             i -> (e.v[i]-c.cv[i])*(e.v[i]-c.cv[i]))) ASC, c.list_id ASC) rn
        |  FROM e, cent c) WHERE rn = 1),
        |probed AS (SELECT qid, qv, list_id FROM (
        |  SELECT q.vec_id qid, q.v qv, c.list_id,
        |         row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |           list_sum(list_transform(range(1,65),
        |             i -> (q.v[i]-c.cv[i])*(q.v[i]-c.cv[i]))) ASC, c.list_id ASC) rn
        |  FROM e q, cent c WHERE q.vec_id IN (0, 1, 2)) WHERE rn <= 3),
        |scored AS (SELECT p.qid, a.vid, a.list_id,
        |   list_sum(list_transform(range(1,65), i -> a.v[i]*p.qv[i])) /
        |   (sqrt(list_sum(list_transform(range(1,65), i -> a.v[i]*a.v[i]))) *
        |    sqrt(list_sum(list_transform(range(1,65), i -> p.qv[i]*p.qv[i])))) sim
        | FROM probed p JOIN asg a ON a.list_id = p.list_id AND a.vid <> p.qid),
        |r AS (SELECT *, row_number() OVER (PARTITION BY qid
        |        ORDER BY sim DESC, vid ASC) AS rank FROM scored)
        |SELECT qid, rank, vid, round(sim + 1e-9, 6) AS sim, list_id FROM r
        |WHERE rank <= 4 ORDER BY qid, rank""".stripMargin,

    "e_semantic_dedup" ->
      s"""WITH $sigCte,
        |m AS (SELECT a.vec_id i, min(b.vec_id) dup_of
        |      FROM sig a JOIN sig b ON a.bucket = b.bucket AND b.vec_id < a.vec_id
        |      WHERE list_sum(list_transform(range(1,65), i2 -> a.v[i2]*b.v[i2])) /
        |        (sqrt(list_sum(list_transform(range(1,65), i2 -> a.v[i2]*a.v[i2]))) *
        |         sqrt(list_sum(list_transform(range(1,65), i2 -> b.v[i2]*b.v[i2])))) >= 0.45
        |      GROUP BY 1)
        |SELECT e.vec_id, coalesce(m.dup_of, e.vec_id) AS keeper,
        |       m.dup_of IS NOT NULL AS is_dup
        |FROM e LEFT JOIN m ON m.i = e.vec_id ORDER BY e.vec_id""".stripMargin,

    "e_label_spread" ->
      """WITH dims AS (
        |  SELECT label, i, count(*) n, avg(CAST(embedding[i] AS DOUBLE)) m,
        |         var_pop(CAST(embedding[i] AS DOUBLE)) v
        |  FROM embeddings, range(1, 65) t(i) GROUP BY 1, 2)
        |SELECT label, max(n) AS n_vecs,
        |       round(sum(v) + 1e-9, 6) AS intra_var,
        |       round(sqrt(sum(m*m)) + 1e-9, 6) AS centroid_norm
        |FROM dims GROUP BY 1 ORDER BY 1""".stripMargin,

    "e_quantized_ann" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
        |qz AS (SELECT vec_id, v,
        |         greatest(list_max(list_transform(v, x -> abs(x))), 1e-30) / 127
        |           AS s
        |       FROM e),
        |qc AS (SELECT vec_id, v, s,
        |         list_transform(v, x -> floor(x / s + 0.5)) AS q
        |       FROM qz),
        |qn AS (SELECT vec_id, v, s, q,
        |         sqrt(list_sum(list_transform(q, x -> x*x))) * s AS qnrm,
        |         sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm
        |       FROM qc),
        |p AS (SELECT vec_id qid, v qv, s qs, q qq, qnrm q_qn, nrm q_n
        |      FROM qn WHERE vec_id IN (0, 1, 2)),
        |scored AS (SELECT p.qid, c.vec_id cid, c.v cv, p.qv, c.nrm c_n, p.q_n,
        |    list_sum(list_transform(range(1,65), i -> c.q[i]*p.qq[i]))
        |      * c.s * p.qs / (c.qnrm * p.q_qn) AS qsim
        |  FROM qn c CROSS JOIN p WHERE c.vec_id <> p.qid),
        |short AS (SELECT *, row_number() OVER (PARTITION BY qid
        |            ORDER BY qsim DESC, cid ASC) AS srank FROM scored),
        |exact AS (SELECT qid, cid, qsim,
        |    list_sum(list_transform(range(1,65), i -> cv[i]*qv[i]))
        |      / (c_n * q_n) AS sim
        |  FROM short WHERE srank <= 10),
        |r AS (SELECT *, row_number() OVER (PARTITION BY qid
        |        ORDER BY sim DESC, cid ASC) AS rank FROM exact)
        |SELECT qid, rank, cid, round(sim + 1e-9, 6) AS sim,
        |       round(qsim + 1e-9, 6) AS qsim
        |FROM r WHERE rank <= 4 ORDER BY qid, rank""".stripMargin,

    "e_embed_covariance" ->
      """WITH e AS (SELECT CAST(embedding AS DOUBLE[]) v FROM embeddings),
        |idx AS (SELECT t.i, u.j FROM range(1, 17) t(i), range(1, 17) u(j)
        |        WHERE u.j >= t.i),
        |means AS (SELECT i, avg(v[i]) m FROM e, range(1, 17) t(i) GROUP BY 1)
        |SELECT idx.i, idx.j, count(*) AS n,
        |       round(avg((e.v[idx.i] - mi.m) * (e.v[idx.j] - mj.m)) + 1e-9, 6)
        |         + 0.0 AS cov
        |FROM e CROSS JOIN idx
        |JOIN means mi ON mi.i = idx.i
        |JOIN means mj ON mj.i = idx.j
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "e_quantize_int8" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
        |s AS (SELECT vec_id, v,
        |        greatest(list_max(list_transform(v, x -> abs(x))), 1e-30) / 127
        |          AS scale
        |      FROM e)
        |SELECT vec_id, round(scale + 1e-9, 6) AS scale,
        |  CAST(list_sum(list_transform(v, x -> floor(x / scale + 0.5)))
        |       AS BIGINT) AS qsum,
        |  round(list_max(list_transform(v,
        |    x -> abs(x - floor(x / scale + 0.5) * scale))) + 1e-9, 6) AS max_err,
        |  round(sqrt(list_sum(list_transform(v,
        |    x -> pow(abs(x - floor(x / scale + 0.5) * scale), 2))) / len(v))
        |    + 1e-9, 6) AS rmse
        |FROM s ORDER BY vec_id""".stripMargin,

    // centroid c_k[i] = ((i*(k+2)) % 8)/4 - 1 — exact binary quarters,
    // so d² sums (sequential in list order in both engines) are
    // bit-identical and the argmin needs no tolerance
    "e_ivf_assign_fixed" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
        |c AS (SELECT k, list_transform(range(1, 65),
        |        i -> CAST(((i - 1) * (k + 2)) % 8 AS DOUBLE) * 0.25 - 1.0) AS cent
        |      FROM (SELECT unnest(range(0, 4)) AS k)),
        |d AS (SELECT vec_id, k,
        |        list_sum(list_transform(range(1, 65),
        |          i -> (v[i] - cent[i]) * (v[i] - cent[i]))) AS d2
        |      FROM e CROSS JOIN c),
        |a AS (SELECT vec_id, k,
        |        row_number() OVER (PARTITION BY vec_id ORDER BY d2, k) AS rn
        |      FROM d)
        |SELECT vec_id, k AS list_id FROM a WHERE rn = 1 ORDER BY vec_id""".stripMargin,

    // same fixed assignment, then the Lloyd's update: per-list
    // per-dimension member means; digests rounded at 6dp like the
    // Spark side (member summation order is engine-specific)
    "e_ivf_update_fixed" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
        |c AS (SELECT k, list_transform(range(1, 65),
        |        i -> CAST(((i - 1) * (k + 2)) % 8 AS DOUBLE) * 0.25 - 1.0) AS cent
        |      FROM (SELECT unnest(range(0, 4)) AS k)),
        |d AS (SELECT vec_id, k,
        |        list_sum(list_transform(range(1, 65),
        |          i -> (v[i] - cent[i]) * (v[i] - cent[i]))) AS d2
        |      FROM e CROSS JOIN c),
        |a AS (SELECT vec_id, k FROM (
        |        SELECT vec_id, k,
        |          row_number() OVER (PARTITION BY vec_id ORDER BY d2, k) AS rn
        |        FROM d) WHERE rn = 1),
        |m AS (SELECT a.k, t.i, avg(e.v[t.i]) AS mi, count(*) AS cnt
        |      FROM a JOIN e USING (vec_id), range(1, 65) t(i)
        |      GROUP BY a.k, t.i),
        |u AS (SELECT c.k,
        |        coalesce(min(m.cnt), 0) AS cnt,
        |        coalesce(sum(m.mi), list_sum(any_value(c.cent))) AS csum_raw,
        |        coalesce(min(CASE WHEN m.i = 1 THEN m.mi END),
        |                 any_value(c.cent)[1]) AS c1,
        |        coalesce(min(CASE WHEN m.i = 64 THEN m.mi END),
        |                 any_value(c.cent)[64]) AS c64
        |      FROM c LEFT JOIN m ON m.k = c.k
        |      GROUP BY c.k)
        |SELECT k AS list_id, CAST(cnt AS BIGINT) AS n_members,
        |       round(csum_raw + 1e-9, 6) AS csum,
        |       round(c1 + 1e-9, 6) AS c_first,
        |       round(c64 + 1e-9, 6) AS c_last
        |FROM u ORDER BY k""".stripMargin,

    // ::DOUBLE keeps the ramp literals binary-float on both engines
    // (DuckDB's bare 0.1 is DECIMAL, whose 0.1*(i-1) differs from the
    // double product by an ulp — enough to flip a 4-decimal boundary)
    "e_pca_project_fixed" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v
        |           FROM embeddings)
        |SELECT vec_id, label,
        |  round(list_sum(list_transform(range(1,17),
        |    i -> (v[i] - 0.1::DOUBLE*(i-1)) * sin(0.3::DOUBLE*(i-1)))) + 1e-9, 4)
        |    AS pc1,
        |  round(list_sum(list_transform(range(1,17),
        |    i -> (v[i] - 0.1::DOUBLE*(i-1)) * cos(0.3::DOUBLE*(i-1)))) + 1e-9, 4)
        |    AS pc2
        |FROM e ORDER BY vec_id""".stripMargin,

    "e_near_dup" ->
      s"""WITH $sigCte,
        |p AS (SELECT a.vec_id i, b.vec_id j,
        |   list_sum(list_transform(range(1,65), i2 -> a.v[i2]*b.v[i2])) /
        |   (sqrt(list_sum(list_transform(range(1,65), i2 -> a.v[i2]*a.v[i2]))) *
        |    sqrt(list_sum(list_transform(range(1,65), i2 -> b.v[i2]*b.v[i2])))) sim
        | FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
        |SELECT i, j, round(sim + 1e-9, 6) AS sim FROM p
        |WHERE sim >= 0.45 ORDER BY i, j""".stripMargin,

    "e_near_dup_auto" ->
      s"""WITH $autoSigCte,
        |p AS (SELECT a.vec_id i, b.vec_id j,
        |   list_sum(list_transform(range(1,65), i2 -> a.v[i2]*b.v[i2])) /
        |   (sqrt(list_sum(list_transform(range(1,65), i2 -> a.v[i2]*a.v[i2]))) *
        |    sqrt(list_sum(list_transform(range(1,65), i2 -> b.v[i2]*b.v[i2])))) sim
        | FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
        |SELECT i, j, round(sim + 1e-9, 6) AS sim FROM p
        |WHERE sim >= 0.45 ORDER BY i, j""".stripMargin,

    "e_semantic_dedup_auto" ->
      s"""WITH $autoSigCte,
        |m AS (SELECT a.vec_id i, min(b.vec_id) dup_of
        |      FROM sig a JOIN sig b ON a.bucket = b.bucket AND b.vec_id < a.vec_id
        |      WHERE list_sum(list_transform(range(1,65), i2 -> a.v[i2]*b.v[i2])) /
        |        (sqrt(list_sum(list_transform(range(1,65), i2 -> a.v[i2]*a.v[i2]))) *
        |         sqrt(list_sum(list_transform(range(1,65), i2 -> b.v[i2]*b.v[i2])))) >= 0.45
        |      GROUP BY 1)
        |SELECT e.vec_id, coalesce(m.dup_of, e.vec_id) AS keeper,
        |       m.dup_of IS NOT NULL AS is_dup
        |FROM e LEFT JOIN m ON m.i = e.vec_id ORDER BY e.vec_id""".stripMargin,

    // property gates: the Spark side computes real residuals/bounds
    // and thresholds them; the oracle pins every property TRUE — a
    // broken eigen / non-converging trainer flips a boolean and the
    // hash mismatches loudly
    "e_pca_eigen_check" ->
      """SELECT range AS component, true AS unit_norm_ok, true AS ortho_ok,
        |       true AS residual_ok, true AS var_matches,
        |       true AS eig_nonneg, true AS descending_ok
        |FROM range(1, 3) ORDER BY component""".stripMargin,

    // list count derived from the CORPUS (min(8, count) — the trainer
    // seeds one centroid per vector when the corpus is smaller than
    // nlist), not pinned to a literal 8: a tiny SF must fail on real
    // assign/update drift only, never on data-scale variance
    "e_ivf_fixpoint" ->
      """SELECT row_number() OVER (ORDER BY vec_id) - 1 AS list_id,
        |       true AS fixpoint_ok, true AS converged
        |FROM embeddings ORDER BY list_id LIMIT 8""".stripMargin
  )
}
