package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vector-similarity search over an embedding column
  * (`ARRAY<FLOAT>`): brute-force cosine top-k as the exactness
  * baseline, and hyperplane-LSH bucketing as the scale path (candidates
  * come from an equi-join on bucket signature instead of a cross join).
  *
  * All math is done in double after an explicit cast (float ops differ
  * across engines; double ops don't), with higher-order functions only
  * — codegen-friendly, no UDFs.
  */
object Similarity {

  /** Σ aᵢ·bᵢ — native codegen expression (deterministic left-to-right
    * order, same result as an interpreted fold).
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.vecDot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: broadcast the (small) query set, rank
    * candidates per query. One pass over the corpus, map-only scoring;
    * the per-query ranking is a bounded TopKAggregator (≤2k-row
    * partials per map partition), NOT a window — the window form would
    * concentrate every scored candidate on #queries tasks, which is
    * the brute-force path's scale wall.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     corpusId: Column, corpusVec: Column,
                     queryId: Column, queryVec: Column, k: Int): DataFrame = {
    // Norms are computed once per row BEFORE the join (64-element fold
    // per vector, not per pair); each pair then costs one dot product.
    val q = queries.select(queryId.as("qid"), queryVec.cast("array<double>").as("qv"))
      .withColumn("qn", norm(col("qv")))
    val c = corpus.select(corpusId.as("cid"), corpusVec.cast("array<double>").as("cv"))
      .withColumn("cn", norm(col("cv")))
    val scored = c.crossJoin(broadcast(q))
      .where(col("cid") =!= col("qid"))
      .withColumn("sim", dot(col("cv"), col("qv")) / (col("cn") * col("qn")))
    TopK.perKey(scored, col("qid"), k, col("sim"), col("cid"))
      .select(col("key").as("qid"), col("rank"), col("cid"), col("sim"))
  }

  /** Quantized top-k: the int8-code scan powering the shortlist, exact
    * re-rank after. Both sides quantize symmetrically (scale =
    * max|x|/127, codes = floor(x/scale + 0.5)); the shortlist is
    * ranked by the QUANTIZED cosine — integer code dot products are
    * exact in double, so the ordering is engine-reproducible — and
    * only the `shortlist` winners per query get the exact float dot.
    * At scale this is the memory story of `e_quantize_int8` made
    * operational: the scan that touches every corpus row reads 1 byte
    * per dimension instead of 4, and full-precision vectors are only
    * fetched for shortlist×queries rows.
    */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame,
                    corpusId: Column, corpusVec: Column,
                    queryId: Column, queryVec: Column,
                    k: Int, shortlist: Int): DataFrame = {
    require(shortlist >= k)
    def quantize(df: DataFrame, id: Column, vec: Column, idAs: String,
                 pfx: String): DataFrame = {
      val v = vec.cast("array<double>")
      val scale = greatest(array_max(transform(v, x => abs(x))), lit(1e-30)) / 127.0
      df.select(id.as(idAs), v.as(s"${pfx}v"),
          transform(v, x => floor(x / scale + 0.5)).as(s"${pfx}q"),
          scale.as(s"${pfx}s"))
        .withColumn(s"${pfx}qn", sqrt(dot(col(s"${pfx}q"), col(s"${pfx}q")))
          * col(s"${pfx}s"))
        .withColumn(s"${pfx}n", norm(col(s"${pfx}v")))
    }
    val q = quantize(queries, queryId, queryVec, "qid", "q_")
    val c = quantize(corpus, corpusId, corpusVec, "cid", "c_")
    val qsim = dot(col("c_q"), col("q_q")) * col("c_s") * col("q_s") /
      (col("c_qn") * col("q_qn"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("cid") =!= col("qid"))
      .withColumn("qsim", qsim)
    // Shortlist by quantized score with a bounded aggregator (not a
    // window: the quantized scan touches every corpus row, and those
    // rows must not funnel through #queries tasks). The full-precision
    // vector rides along in `aux` so the exact re-rank needs no
    // join-back to the corpus — only to the tiny broadcast query side.
    val short = TopK.perKey(scored, col("qid"), shortlist, col("qsim"),
        col("cid"), concat(array(col("c_n")), col("c_v")))
      .select(col("key").as("qid"), col("cid"), col("sim").as("qsim"),
        element_at(col("aux"), 1).as("c_n"),
        slice(col("aux"), lit(2), size(col("aux")) - 1).as("c_v"))
    val exact = short
      .join(broadcast(q.select(col("qid"), col("q_v"), col("q_n"))), "qid")
      .withColumn("sim", dot(col("c_v"), col("q_v")) / (col("c_n") * col("q_n")))
    TopK.perKey(exact, col("qid"), k, col("sim"), col("cid"),
        array(col("qsim")))
      .select(col("key").as("qid"), col("rank"), col("cid"), col("sim"),
        element_at(col("aux"), 1).as("qsim"))
  }

  /** Deterministic pseudo-random hyperplane component: plane `p`,
    * dimension `i` (0-based) → sin((p·97 + i)·0.1). Reproducible in any
    * engine (pure double IEEE ops), uncorrelated enough for LSH.
    */
  private def planeComponent(p: Int, i: Column): Column =
    sin((lit(p * 97).cast("double") + i.cast("double")) * lit(0.1))

  /** Plane count for a target mean bucket occupancy: buckets must GROW
    * with the corpus (⌈log₂(n / targetBucket)⌉) or same-bucket
    * candidate pairs grow quadratically — measured on the 10× probe:
    * 10× vectors into a FIXED 16 buckets cost ~100× pairs (SCALING.md).
    * With nPlanes from this function, expected per-bucket occupancy —
    * and so per-bucket pair cost — stays flat as the corpus scales;
    * recall is then tuned by multi-probe or band count, not occupancy.
    * (The driver gates pin nPlanes=4 so the DuckDB oracle can replicate
    * the signature literally; production callers should pass this.)
    */
  def autoPlanes(corpusSize: Long, targetBucket: Int = 256): Int = {
    require(corpusSize > 0 && targetBucket > 0)
    // EXACT integer form of ⌈log₂(n / target)⌉ — smallest p with
    // 2^p · target ≥ n. The floating log quotient it replaces can land
    // an ulp above an integer at exact powers of two and ceil one
    // plane too high on ONE engine only, silently desyncing the
    // count-derived oracle (`e_near_dup_auto`) from production.
    (1 to 30).find(p => (1L << p) * targetBucket >= corpusSize).getOrElse(30)
  }

  /** Sign-of-dot-product bucket signature over `nPlanes` hyperplanes,
    * as a '0'/'1' string. Vectors in the same bucket are ANN
    * candidates; expected bucket count is 2^nPlanes.
    *
    * r14: native codegen expression (LshSignatureExpr) — one compiled
    * pass over the vector for all planes. The HOF form it replaces
    * (one interpreted zip_with+aggregate fold per plane) is kept below
    * as [[lshSignatureHof]] for the differential spec; both produce
    * bit-identical signatures (same left-to-right sum, same Math.sin).
    */
  def lshSignature(vec: Column, nPlanes: Int): Column =
    // coalesce: a NULL vector gets the all-'0' signature, exactly what
    // the HOF form produces (null projections → otherwise('0') per
    // bit) — without it the native expression's NULL would silently
    // drop null-embedding rows from bucket joins the HOF form keeps
    // (r14 review pass 2)
    coalesce(graft.functions.VectorExpressions.lshSig(vec, nPlanes),
      lit("0" * nPlanes))

  /** The interpreted HOF form of [[lshSignature]] — differential-spec
    * twin, not the production path.
    */
  def lshSignatureHof(vec: Column, nPlanes: Int): Column = {
    val v = vec.cast("array<double>")
    val bits = (0 until nPlanes).map { p =>
      val proj = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1), (x, i) => x * planeComponent(p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit("1")).otherwise(lit("0"))
    }
    concat(bits: _*)
  }

  /** LSH-bucketed ANN: equi-join queries to same-bucket candidates,
    * then exact cosine re-rank, top-k per query. The join key is the
    * bucket signature — a uniform shuffle key, no cross join anywhere.
    */
  def annTopK(corpus: DataFrame, queries: DataFrame,
              corpusId: Column, corpusVec: Column,
              queryId: Column, queryVec: Column,
              nPlanes: Int, k: Int): DataFrame = {
    val c = corpus.select(corpusId.as("cid"), corpusVec.cast("array<double>").as("cv"),
        lshSignature(corpusVec, nPlanes).as("bucket"))
      .withColumn("cn", norm(col("cv")))
    val q = queries.select(queryId.as("qid"), queryVec.cast("array<double>").as("qv"),
        lshSignature(queryVec, nPlanes).as("bucket"))
      .withColumn("qn", norm(col("qv")))
    val scored = c.join(q, "bucket")
      .where(col("cid") =!= col("qid"))
      .withColumn("sim", dot(col("cv"), col("qv")) / (col("cn") * col("qn")))
    // bounded top-k (no per-query window); every candidate of a query
    // shares the query's own bucket (it was the equi-join key), so the
    // bucket column re-attaches from the tiny query side, not the scan
    TopK.perKey(scored, col("qid"), k, col("sim"), col("cid"))
      .select(col("key").as("qid"), col("rank"), col("cid"), col("sim"))
      .join(broadcast(q.select(col("qid"), col("bucket"))), "qid")
      .select(col("qid"), col("rank"), col("cid"), col("sim"), col("bucket"))
  }
}
