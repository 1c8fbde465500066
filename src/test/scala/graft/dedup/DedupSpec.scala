package graft.dedup

import graft.SparkSpec
import graft.text.TextFunctions
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),  // exact dup of 1
      (3L, "quick brown fox jumps over the lazy dog the"),  // reordered dup of 1
      (4L, "an entirely different document about spark engines"),
      (5L, "the quick brown fox jumps over the lazy cat")   // near dup of 1
    ).toDF("doc_id", "text")
  }

  test("exactGroups collapses identical and reordered word sets") {
    val groups = Dedup.exactGroups(docs, col("doc_id"),
      TextFunctions.wordSetFingerprint(col("text")))
    val byKeeper = groups.collect().map(r =>
      r.getAs[Long]("keeper") -> r.getAs[Long]("cnt")).toMap
    assert(byKeeper(1L) === 3L) // docs 1, 2, 3 share the word set
    assert(byKeeper(4L) === 1L)
    assert(byKeeper(5L) === 1L)
  }

  test("minhash LSH candidates find near-dups, jaccard verifies") {
    import spark.implicits._
    val words = docs.select(col("doc_id"),
      explode(TextFunctions.tokens(col("text"))).as("w")).distinct()
    val sig = Dedup.minhashSignature(words, col("doc_id"), col("w"), k = 8)
    val cands = Dedup.lshCandidates(Dedup.lshBands(sig, k = 8))
    val verified = Dedup.jaccardOnCandidates(cands, words, col("doc_id"), col("w"))
      .where(col("jaccard") >= 0.8)
      .select("i", "j").as[(Long, Long)].collect().toSet
    // identical word sets (j=1) MUST collide in every band
    assert(verified.contains((1L, 2L)))
    assert(verified.contains((1L, 3L)))
    assert(verified.contains((2L, 3L)))
    assert(!verified.exists { case (i, j) => i == 4L || j == 4L })
    // exact jaccard on an explicitly supplied pair: docs 1 vs 5 share
    // 7 of 9 distinct words
    val explicit = Seq((1L, 5L)).toDF("i", "j")
    val j15 = Dedup.jaccardOnCandidates(explicit, words, col("doc_id"), col("w"))
      .select("jaccard").as[Double].collect()(0)
    assert(math.abs(j15 - 7.0 / 9.0) < 1e-9)
  }

  test("lshClusterAssign groups near-dups without pair enumeration") {
    val words = docs.select(col("doc_id"),
      explode(TextFunctions.tokens(col("text"))).as("w")).distinct()
    val sig = Dedup.minhashSignature(words, col("doc_id"), col("w"), k = 8)
    val clusters = Dedup.lshClusterAssign(Dedup.lshBands(sig, k = 8))
      .collect().map(r => r.getAs[Long]("__id") -> r.getAs[Long]("cluster")).toMap
    assert(clusters(1L) === clusters(2L))
    assert(clusters(2L) === clusters(3L))
    assert(clusters(4L) !== clusters(1L))
  }

  test("lshBandRowsLocal emits the exact band keys of the exploded pipeline") {
    import spark.implicits._
    val words = docs.select(col("doc_id"),
      explode(TextFunctions.tokens(col("text"))).as("w")).distinct()
    val exploded = Dedup.lshBands(
        Dedup.minhashSignature(words, col("doc_id"), col("w"), k = 8), k = 8)
      .as[(Long, Int, String)].collect().toSet
    val local = Dedup.lshBandRowsLocal(docs, col("doc_id"),
        TextFunctions.tokens(col("text")), k = 8)
      .as[(Long, Int, String)].collect().toSet
    assert(local === exploded)
    // and a token-less doc produces no band rows, as in the exploded path
    val empty = Dedup.lshBandRowsLocal(
      Seq((9L, Array.empty[String])).toDF("doc_id", "toks"),
      col("doc_id"), col("toks"), k = 8)
    assert(empty.count() === 0)
  }

  test("simhash: identical docs share signature; different docs differ") {
    import spark.implicits._
    val tok = docs.select(col("doc_id"),
      explode(TextFunctions.tokens(col("text"))).as("w"))
    val sigs = Dedup.simhash16(tok, col("doc_id"), col("w"))
      .collect().map(r => r.getAs[Long]("__id") -> r.getAs[String]("simhash")).toMap
    assert(sigs(1L) === sigs(2L))
    assert(sigs(1L).length === 16)
    assert(sigs(1L).forall(c => c == '0' || c == '1'))
    assert(sigs(1L) !== sigs(4L))
  }

  test("null tokens contribute nothing: simhash unbiased, minhash no NPE") {
    import spark.implicits._
    // simhash: the same token multiset with 5 interleaved nulls must
    // produce the SAME signature (each null used to weight every bit
    // -1); native expression agrees
    val base = Seq((1L, "alpha"), (1L, "beta"), (1L, "gamma"))
    val noisy = base ++ (1 to 5).map(_ => (1L, null: String))
    def sig(rows: Seq[(Long, String)]): String =
      Dedup.simhash16(rows.toDF("doc_id", "w"), col("doc_id"), col("w"))
        .collect().head.getAs[String]("simhash")
    assert(sig(noisy) === sig(base))
    val nativeSig = Seq((1L, Seq("alpha", null, "beta", null, "gamma")))
      .toDF("doc_id", "toks")
      .select(graft.functions.TextExpressions.simhash16Col(col("toks")))
      .collect().head.getString(0)
    assert(nativeSig === sig(base))
    // minhash native: null elements skipped like the relational min();
    // an all-null array yields the empty signature (filtered out)
    val mh = Dedup.minhashSignatureNative(
      Seq((1L, Seq("alpha", null, "beta")),
        (2L, Seq("alpha", "beta")),
        (3L, Seq(null: String, null: String))).toDF("doc_id", "toks"),
      col("doc_id"), col("toks"), k = 4)
    val rows = mh.collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(rows.keySet === Set(1L, 2L), "all-null doc must drop out")
    assert(rows(1L) === rows(2L), "null elements must not move any min")
  }

  test("jaccardOnCandidates applies distinctness (duplicate shingles can't inflate jaccard past 1)") {
    import spark.implicits._
    val cands = Seq((1L, 2L)).toDF("i", "j")
    // doc 1 repeats its shingle 3x; doc 2 has it once — raw counting
    // would give m=3, n1=3, n2=1 → jaccard = 3/(3+1-3) = 3 (> 1!)
    val sh = Seq((1L, "a b c"), (1L, "a b c"), (1L, "a b c"), (2L, "a b c"))
      .toDF("doc_id", "sh")
    val out = Dedup.jaccardOnCandidates(cands, sh, col("doc_id"), col("sh"))
      .select("m", "jaccard").as[(Long, Double)].collect()
    assert(out.toSeq === Seq((1L, 1.0)))
  }

  test("jaccardPairsByIndex computes exact jaccard on shared-shingle pairs") {
    import spark.implicits._
    val sh = docs.select(col("doc_id"),
      explode(TextFunctions.wordShingles(col("text"), 3)).as("sh"))
    val pairs = Dedup.jaccardPairsByIndex(sh, col("doc_id"), col("sh"), 0.9)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L))) // only the exact dup shares all 3-grams
  }

  test("connectedComponents finds transitive components star edges miss " +
    "one-hop") {
    import spark.implicits._
    // component {1,3,4,5}: 5-3, 4-3, 4-2? no — edges: 5→3, 4→3, 4→2? use
    // the downward-propagation counterexample: A(5)~3, B(4)~3, B(4)~2.
    // One-hop min for 5 is 3; the true component min is 2, reachable
    // only through 4. Node 9 is isolated.
    val edges = Seq((5L, 3L), (4L, 3L), (4L, 2L)).toDF("src", "dst")
    val nodes = Seq(2L, 3L, 4L, 5L, 9L).toDF("id")
    val cc = Dedup.connectedComponents(edges, nodes)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc === Map(2L -> 2L, 3L -> 2L, 4L -> 2L, 5L -> 2L, 9L -> 9L))
  }

  test("connectedComponents on a chain converges in O(log diameter) rounds") {
    import spark.implicits._
    // path 0-1-2-...-7: worst-case diameter for plain min propagation
    // (7 rounds); pointer jumping must close it in ~log₂ rounds (the
    // +1 is the final no-change round that proves the fixpoint)
    val edges = (0L until 7L).map(i => (i, i + 1)).toDF("src", "dst")
    val nodes = (0L to 7L).toDF("id")
    val (ccDf, rounds) =
      Dedup.connectedComponentsWithRounds(edges, nodes, maxIter = 10)
    val cc = ccDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.values.toSet === Set(0L))
    // plain propagation needs diameter+1 = 8 rounds; 3 plain rounds +
    // distance-doubling jump rounds close it in 6
    assert(rounds <= 6, s"pointer jumping should close diameter 7 in ≤6 " +
      s"rounds, took $rounds")
  }

  test("connectedComponents on the RELIABLE-checkpoint path (cluster " +
    "deployment) equals the local-mode run; checkpoint files are " +
    "job-scoped-cleanable") {
    import spark.implicits._
    // Lineage.truncate switches to rdd.checkpoint() the moment a
    // checkpoint dir is configured — the path a real cluster run takes
    // so loop state survives executor loss. LineageSpec proves the
    // switch mechanics on toy frames; this drives a REAL iterative
    // gate (pointer-jumping CC, multiple truncations per round)
    // through it end to end.
    val edges = ((0L until 7L).map(i => (i, i + 1)) ++ Seq((20L, 21L)))
      .toDF("src", "dst")
    val nodes = ((0L to 7L) ++ Seq(20L, 21L, 30L)).toDF("id")
    def run() = Dedup.connectedComponents(edges, nodes)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sc = spark.sparkContext
    assert(sc.getCheckpointDir.isEmpty,
      "precondition: suite default must be the localCheckpoint path")
    val local = run()
    assert(local.map(_._2) === Set(0L, 20L, 30L))
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt")
    sc.setCheckpointDir(dir.toString)
    try {
      assert(run() === local)
      // the reliable path really ran: checkpoint part-files landed
      val files = java.nio.file.Files.walk(dir)
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(files > 0, "no checkpoint files written — reliable path not taken")
    } finally {
      // restore the suite's local-mode default (SparkContext has no
      // public unset; the private var is the documented-by-absence API)
      classOf[org.apache.spark.SparkContext]
        .getDeclaredMethod("checkpointDir_$eq", classOf[Option[_]])
        .invoke(sc, None)
      // the Lineage scaladoc's "job-scoped storage cleaned on exit"
      // option, demonstrated: the dir deletes cleanly after the run
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
    assert(sc.getCheckpointDir.isEmpty)
  }

  test("bucketStarEdges links every band member to the band minimum") {
    import spark.implicits._
    val bands = Seq((10L, 0, "x"), (11L, 0, "x"), (12L, 0, "x"),
      (12L, 1, "y"), (13L, 1, "y")).toDF("__id", "bidx", "bhash")
    val e = Dedup.bucketStarEdges(bands)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(e === Set((11L, 10L), (12L, 10L), (13L, 12L)))
    // components across the shared doc 12: all one component
    val cc = Dedup.connectedComponents(
      Dedup.bucketStarEdges(bands),
      bands.select(col("__id").as("id")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.values.toSet === Set(10L))
  }
}
