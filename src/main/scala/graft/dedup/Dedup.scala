package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact
  * (fingerprint group-by), MinHash+LSH near-dup, SimHash, and n-gram
  * Jaccard verification.
  *
  * Everything is hash-partitioned group-bys and equi-joins — no
  * all-pairs comparison ever materializes, so the pipeline scales to
  * 100 TB: candidate generation is an equi-join on (band index, band
  * hash), and exact Jaccard runs only on the candidate pairs.
  *
  * The MinHash here uses salted-md5 minima: h_i(doc) =
  * min over shingles s of md5(salt_i ‖ s). Lexicographic min of a
  * cryptographic hex digest is a uniform permutation min, so the
  * classic MinHash estimator applies unchanged — and, unlike
  * seeded-integer hashes, any engine reproduces it exactly.
  */
object Dedup {

  /** Exact dedup: one row per fingerprint with the surviving (minimum)
    * id and the duplicate count. Single hash aggregation.
    */
  def exactGroups(df: DataFrame, id: Column, fingerprint: Column): DataFrame =
    df.groupBy(fingerprint.as("fp"))
      .agg(min(id).as("keeper"), count(lit(1)).as("cnt"))

  /** MinHash signature columns h0..h{k-1} over an exploded
    * (id, shingle) relation (one row per *distinct* shingle).
    */
  def minhashSignature(shingled: DataFrame, id: Column, shingle: Column,
                       k: Int): DataFrame = {
    val hs = (0 until k).map(i => min(md5(concat(lit(s"s$i"), shingle))).as(s"h$i"))
    shingled.groupBy(id.as("__id")).agg(hs.head, hs.tail: _*)
  }

  /** Native-expression MinHash: same (__id, h0..h(k-1)) shape as
    * [[minhashSignature]] but computed in one compiled pass per row
    * (MinHashExpr) — no exploded relation, no aggregate. Duplicates in
    * `tokens` don't affect the min, so callers can skip
    * array_distinct (the expression dedups internally before hashing).
    * At the 100× probe the signature itself times on par with the
    * exploded form (both are md5-bound on distinct tokens), but this
    * form carries no aggregate machinery, so composite pipelines win
    * (cluster+centroid gate: 10.3 s → 6.1 s). The interpreted
    * [[minhashSignatureLocal]] below remains the slow path — native
    * and HOF row-local forms are NOT the same thing.
    */
  def minhashSignatureNative(docs: DataFrame, id: Column, tokens: Column,
                             k: Int): DataFrame = {
    val sig = graft.functions.TextExpressions.minhashSigCol(tokens, k)
    docs.select(id.as("__id"), sig.as("__sig"))
      .where(size(col("__sig")) > 0)
      .select(col("__id") +:
        (0 until k).map(i => element_at(col("__sig"), i + 1).as(s"h$i")): _*)
  }

  /** Row-local MinHash signature over a token array: element i is
    * min over distinct tokens of md5("s<i>" ‖ token) — value-identical
    * to [[minhashSignature]] on the exploded relation.
    *
    * NOT the performance path: higher-order functions evaluate
    * interpreted (outside whole-stage codegen), and measured 3-4×
    * slower than the exploded hash-aggregate form, whose map-side
    * partial aggregation already folds each doc to one signature row
    * before the exchange — the (doc, token) relation never shuffles
    * either way. Use this form only when the input is already an
    * array column and exploding is awkward.
    */
  def minhashSignatureLocal(tokens: Column, k: Int): Column =
    // no array_distinct: min over duplicates equals min over the set
    array((0 until k).map(i =>
      array_min(transform(tokens, w => md5(concat(lit(s"s$i"), w))))): _*)

  /** Band rows (id, bidx, bhash) straight from (id, token-array) rows
    * using the row-local signature — same band keys as
    * [[minhashSignature]]→[[lshBands]] (same caveat as
    * [[minhashSignatureLocal]]: interpreted, not the fast path).
    * Docs with no (or all-null) tokens are dropped here via the null
    * band key; the exploded pipeline emits such rows from lshBands,
    * but every downstream consumer (candidate join, cluster assign)
    * discards null keys, so end-to-end results agree.
    */
  def lshBandRowsLocal(docs: DataFrame, id: Column, tokens: Column,
                       k: Int): DataFrame = {
    require(k % 2 == 0, s"band keys pair signature entries; k=$k must be even")
    val sig = minhashSignatureLocal(tokens, k)
    val bands = (0 until k / 2).map(b =>
      struct(lit(b).as("bidx"),
        md5(concat(element_at(sig, 2 * b + 1), element_at(sig, 2 * b + 2)))
          .as("bhash")))
    docs.select(id.as("__id"), explode(array(bands: _*)).as("band"))
      .select(col("__id"), col("band.bidx").as("bidx"), col("band.bhash").as("bhash"))
      .where(col("bhash").isNotNull)
  }

  /** LSH banding: pair consecutive signature hashes into band keys,
    * explode to (id, band index, band hash).
    */
  def lshBands(sig: DataFrame, k: Int): DataFrame = {
    require(k % 2 == 0, s"lshBands pairs signature columns; k=$k must be even")
    val bands = (0 until k / 2).map(b =>
      struct(lit(b).as("bidx"), md5(concat(col(s"h${2 * b}"), col(s"h${2 * b + 1}"))).as("bhash")))
    sig.select(col("__id"), explode(array(bands: _*)).as("band"))
      .select(col("__id"), col("band.bidx").as("bidx"), col("band.bhash").as("bhash"))
  }

  /** Candidate pairs (i < j) sharing at least one LSH band — a plain
    * self-equi-join on (bidx, bhash), deduplicated.
    */
  def lshCandidates(bands: DataFrame): DataFrame = {
    val a = bands.select(col("bidx"), col("bhash"), col("__id").as("i"))
    val b = bands.select(col("bidx"), col("bhash"), col("__id").as("j"))
    a.join(b, Seq("bidx", "bhash")).where(col("i") < col("j"))
      .select("i", "j").distinct()
  }

  /** Exact Jaccard over (id, shingle) relations for given candidate
    * pairs: |A∩B| via equi-join on shingle, |A∪B| = |A|+|B|−|A∩B|.
    * Distinctness is APPLIED, not assumed: duplicate shingle rows
    * would inflate the intersection past the union bound (jaccard
    * silently exceeding 1) — same guarantee as [[jaccardPairsByIndex]].
    */
  def jaccardOnCandidates(cands: DataFrame, shingled: DataFrame,
                          id: Column, shingle: Column): DataFrame = {
    // tok feeds three consumers (sizes + both intersection sides):
    // truncate so the distinct (id, shingle) relation — and everything
    // upstream of it — is computed once per execution, not three times
    val tok = graft.core.Lineage.truncate(
      shingled.select(id.as("__id"), shingle.as("__sh")).distinct(),
      eager = false)
    val inter = cands
      .join(tok.select(col("__id").as("i"), col("__sh")), "i")
      .join(tok.select(col("__id").as("j"), col("__sh").as("__sh2")), "j")
      .where(col("__sh") === col("__sh2"))
      .groupBy("i", "j").agg(count(lit(1)).as("m"))
    jaccardOf(tok, inter)
  }

  /** Shared Jaccard tail: set sizes from the DISTINCT (id, shingle)
    * relation joined onto (i, j, m) intersection counts — one copy of
    * the |A|+|B|−|A∩B| algebra for both pair generators.
    */
  private def jaccardOf(tok: DataFrame, inter: DataFrame): DataFrame = {
    val sizes = tok.groupBy("__id").agg(count(lit(1)).as("n"))
    inter
      .join(sizes.select(col("__id").as("i"), col("n").as("ni")), "i")
      .join(sizes.select(col("__id").as("j"), col("n").as("nj")), "j")
      .withColumn("jaccard",
        col("m").cast("double") / (col("ni") + col("nj") - col("m")).cast("double"))
      .select("i", "j", "m", "jaccard")
  }

  /** LSH cluster assignment — the scale path for mega-clusters, where
    * pair enumeration is inherently O(cluster²): each id is labeled
    * with the minimum id found in any of its LSH buckets (one step of
    * min-label propagation). No pair blowup. Docs sharing a band land
    * in the same cluster; `keeper == id` marks the cluster
    * representative to keep.
    *
    * Physical shape: bucket-aggregate + join back, NOT a window min
    * over (bidx, bhash). A window looks one exchange cheaper but
    * requires every row of a bucket co-located and sorted in a single
    * task — and near-dup corpora have mega-buckets by construction
    * (this corpus puts ~60% of docs in one), which AQE cannot split
    * inside a window. The aggregate partial-combines map-side to one
    * row per bucket, and the join back is AQE-skew-splittable. Null
    * band keys never match in the join, so token-less docs drop out,
    * matching the exploded pipeline.
    */
  def lshClusterAssign(bands: DataFrame): DataFrame =
    bandsWithBucketMin(bands)
      .groupBy(col("__id"))
      .agg(min(col("bmin")).as("cluster"))

  /** Band rows joined with their bucket's minimum id (`bmin`) — the
    * shared head of [[lshClusterAssign]] and [[bucketStarEdges]], so
    * the mega-bucket rationale above (aggregate + join back, never a
    * window) is implemented exactly once.
    */
  private def bandsWithBucketMin(bands: DataFrame): DataFrame = {
    // `bands` feeds BOTH the bucket-min aggregate and the join back —
    // untruncated, the whole signature subtree (k md5s per document)
    // is evaluated twice per execution (r14 profile: 2× ~300 ms
    // single-task signature stages on the sf0.1 cluster gates). The
    // truncated relation is (id, bidx, bhash) — bands/doc rows of ~50
    // bytes, linear in the corpus and far cheaper to hold than to
    // recompute.
    val b = graft.core.Lineage.truncate(bands, eager = false)
    val bucketMin = b.groupBy("bidx", "bhash").agg(min(col("__id")).as("bmin"))
    b.join(bucketMin, Seq("bidx", "bhash"))
  }

  /** True connected components over an undirected edge list —
    * iterative min-label propagation to a fixpoint. One-hop
    * [[lshClusterAssign]] labels by the min id in a doc's OWN buckets;
    * transitive near-dup chains (A~B~C where A,C share no bucket) need
    * the full component, which is this operator.
    *
    * Each round is one message shuffle + one min-aggregate, converging
    * in O(component diameter) rounds — with star edges (doc →
    * bucket-min) diameters are tiny. `Lineage.truncate` cuts the
    * growing plan lineage each round (an iterative-algorithm
    * necessity: without it round N replans rounds 1..N−1; reliable
    * checkpoint on clusters, localCheckpoint in local mode). The
    * convergence check is one count per round; at 100 TB that action
    * is the cheap part of the loop, and maxIter bounds the worst case.
    *
    * `nodes` must list every id (isolated nodes have no edge rows but
    * still form singleton components).
    */
  def connectedComponents(edges: DataFrame, nodes: DataFrame,
                          maxIter: Int = 20): DataFrame =
    connectedComponentsWithRounds(edges, nodes, maxIter)._1

  /** [[connectedComponents]] plus the number of rounds it ran — the
    * observable that pins the pointer-jumping speedup in DedupSpec
    * (a diameter-7 chain must close in far fewer than 7 rounds).
    *
    * Round structure is adaptive: the first `jumpAfter` rounds are
    * plain neighbor-min propagation (one shuffle + one aggregate);
    * star-shaped dedup graphs (doc → bucket-min edges) converge inside
    * them, paying nothing new. A graph still unconverged after that
    * has long chains, and every later round appends pointer jumping
    * (path halving: label ← label(label), the Shiloach-Vishkin
    * shortcut) so propagation distance doubles per round — O(log
    * diameter) total instead of O(diameter) — at the cost of one extra
    * label-keyed join per round. Measured on the sf0.1 gate: plain
    * rounds only, ~3.2 s (adding the jump to every round was ~4.5 s);
    * on a diameter-7 chain, 6 rounds instead of 8.
    */
  def connectedComponentsWithRounds(edges: DataFrame, nodes: DataFrame,
                                    maxIter: Int = 20,
                                    jumpAfter: Int = 3): (DataFrame, Int) = {
    // truncate the (doubled) edge relation ONCE before iterating: every
    // round's message join re-reads it, and untruncated each round
    // re-derived the whole upstream pipeline (for the LSH gate: the
    // full MinHash of the corpus — r14 profile showed one ~2.6 s-CPU
    // signature stage PER ROUND). Edges are the loop invariant; at any
    // scale an iterative algorithm persists its invariant input.
    val und = graft.core.Lineage.truncate(
      edges.select(col("src"), col("dst"))
        .union(edges.select(col("dst").as("src"), col("src").as("dst"))),
      eager = false)
    var labels = graft.core.Lineage.truncate(nodes.select(col("id")).distinct()
      .withColumn("label", col("id")))
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val msgs = und.join(labels, und("src") === labels("id"))
        .select(col("dst").as("id"), col("label"))
      // fold the convergence signal into the round's aggregate: carry
      // the previous label alongside and count improvements in the
      // same pass, instead of a separate join+count job per round
      val next = msgs.withColumn("old", lit(null).cast("long"))
        .unionByName(labels.select(col("id"), col("label"),
          col("label").as("old")))
        .groupBy("id")
        .agg(min("label").as("label"), min("old").as("old"))
      // every label IS a node id present in `next` (labels only ever
      // carry node ids), so the jump lookup always matches; the
      // aggregate subtree feeds both join sides and its shuffle is
      // reused, leaving ~one extra label-keyed exchange per jump round
      val stepped =
        if (iter < jumpAfter) next
        else {
          val jump = next.select(col("id").as("__jid"), col("label").as("__jlab"))
          next.join(jump, next("label") === jump("__jid"), "left")
            .select(col("id"),
              least(col("label"), coalesce(col("__jlab"), col("label")))
                .as("label"),
              col("old"))
        }
      val done = graft.core.Lineage.truncate(stepped)
      val improved = done.where(col("label") < col("old")).count()
      labels = done.select("id", "label")
      converged = improved == 0
      iter += 1
    }
    (labels.select(col("id"), col("label").as("component")), iter)
  }

  /** Star edges for [[connectedComponents]] from LSH band rows: each
    * id links to its bucket's minimum id. Linear in band rows — the
    * co-bucket clique never materializes — and component-equivalent to
    * the full doc~doc co-bucket graph (all bucket members connect
    * through the min).
    */
  def bucketStarEdges(bands: DataFrame): DataFrame =
    bandsWithBucketMin(bands)
      .where(col("bmin") =!= col("__id"))
      .select(col("__id").as("src"), col("bmin").as("dst"))
      .distinct()

  /** All-pairs n-gram Jaccard via inverted index: self-equi-join the
    * (id, shingle) relation on shingle — pairs sharing no shingle never
    * materialize. The scalable alternative to a cross join when
    * shingles are selective; with heavy-hitter shingles, use
    * lshCandidates instead.
    */
  def jaccardPairsByIndex(shingled: DataFrame, id: Column, shingle: Column,
                          minJaccard: Double): DataFrame = {
    // same three-consumer truncate as jaccardOnCandidates
    val tok = graft.core.Lineage.truncate(
      shingled.select(id.as("__id"), shingle.as("__sh")).distinct(),
      eager = false)
    val inter = tok.select(col("__id").as("i"), col("__sh"))
      .join(tok.select(col("__id").as("j"), col("__sh")), Seq("__sh"))
      .where(col("i") < col("j"))
      .groupBy("i", "j").agg(count(lit(1)).as("m"))
    jaccardOf(tok, inter).where(col("jaccard") >= minJaccard)
  }

  /** 16-bit SimHash over a (id, token) relation. Bit b of a token's
    * hash is the high bit of hex digit b of md5(token); the SimHash bit
    * is the sign of the (count-weighted) sum. Returned as a 16-char
    * '0'/'1' string, assembled in bit order.
    */
  def simhash16(tokenRows: DataFrame, id: Column, token: Column): DataFrame = {
    val bitRows = tokenRows
      // a NULL token must contribute NOTHING: unfiltered, md5(null) is
      // null and the when() below would weight every bit -1 for it,
      // biasing the whole signature by the null count
      .where(token.isNotNull)
      .select(id.as("__id"), md5(token).as("__h"))
      .select(col("__id"), explode(sequence(lit(0), lit(15))).as("b"), col("__h"))
      .withColumn("w",
        when(expr("instr('89abcdef', substr(__h, b + 1, 1))") > 0, 1).otherwise(-1))
    bitRows.groupBy("__id", "b")
      .agg(sum(col("w")).as("s"))
      .withColumn("bit", when(col("s") > 0, lit("1")).otherwise(lit("0")))
      .groupBy("__id")
      .agg(array_join(transform(array_sort(collect_list(struct(col("b"), col("bit")))),
        x => x.getField("bit")), "").as("simhash"))
  }
}
