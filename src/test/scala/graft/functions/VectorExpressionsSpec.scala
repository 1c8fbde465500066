package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSpec {

  test("vecDot matches the interpreted fold") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(0.0, 0.0), Array(1.0, 1.0)),
      (Array(-1.5, 2.5), Array(2.0, -4.0))
    ).toDF("a", "b")
    val out = df.select(
        VectorExpressions.vecDot($"a", $"b").as("fast"),
        aggregate(zip_with($"a", $"b", (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x).as("ref"))
      .as[(Double, Double)].collect()
    out.foreach { case (f, r) => assert(math.abs(f - r) < 1e-12) }
  }

  test("quantizeStats matches the HOF reference form, including edge cases") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vecs = Seq.fill(50)(Array.fill(64)(rnd.nextGaussian() * 3)) ++ Seq(
      Array.fill(8)(0.0),              // all-zero vector (scale guard)
      Array(127.0),                    // exact code boundary
      Array(-1e-25, 1e-25),            // denormal-adjacent values
      Array(5.0)                       // single element
    )
    val df = vecs.map(Tuple1(_)).toDF("v")
    // reference: the interpreted HOF algebra the expression replaced
    val vv = $"v".cast("array<double>")
    val amax = array_max(transform(vv, x => abs(x)))
    val scale = greatest(amax, lit(1e-30)) / 127.0
    val codes = transform(vv, x => floor(x / scale + 0.5))
    val errs = transform(vv, x => abs(x - floor(x / scale + 0.5) * scale))
    val out = df.select(
        VectorExpressions.quantizeStats($"v").as("q"),
        scale.as("r_scale"),
        aggregate(codes, lit(0.0), (acc, x) => acc + x).cast("long").as("r_qsum"),
        array_max(errs).as("r_maxe"),
        sqrt(aggregate(errs, lit(0.0), (acc, x) => acc + x * x) / size(vv))
          .as("r_rmse"))
      .select($"q.scale", $"q.qsum", $"q.max_err", $"q.rmse",
        $"r_scale", $"r_qsum", $"r_maxe", $"r_rmse")
      .as[(Double, Long, Double, Double, Double, Long, Double, Double)]
      .collect()
    out.foreach { case (s1, q1, m1, r1, s2, q2, m2, r2) =>
      assert(s1 === s2)
      assert(q1 === q2)
      assert(m1 === m2)
      assert(math.abs(r1 - r2) < 1e-15)
    }
  }

  test("repStats matches the HOF shingle algebra") {
    import spark.implicits._
    val docs = Seq(
      "a b c a b c a b",          // repeated shingles
      "x y z",                    // exactly one shingle
      "one two three four five",  // all distinct
      "w w w w w w",              // single repeated token
      "a  b c"                    // double space → empty token, like split(' ')
    ).map(Tuple1(_)).toDF("text")
    val sh3 = graft.text.TextFunctions.wordShingles($"text", 3)
    val toks = graft.text.TextFunctions.tokens($"text")
    val out = docs.select(
        TextExpressions.repStatsCol($"text").as("r"),
        size(toks).cast("long").as("e_tokens"),
        size(array_distinct(toks)).cast("long").as("e_dtokens"),
        size(sh3).cast("long").as("e_grams"),
        size(array_distinct(sh3)).cast("long").as("e_dgrams"))
      .select($"r.n_tokens", $"r.n_distinct_tokens", $"r.n_grams",
        $"r.n_distinct_grams", $"e_tokens", $"e_dtokens", $"e_grams", $"e_dgrams")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    out.foreach { case (t, dt, g, dg, et, edt, eg, edg) =>
      assert((t, dt, g, dg) === ((et, edt, eg, edg)))
    }
  }

  test("simhash16 expression matches the relational explode form") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha alpha alpha"),  // repeated tokens weight multiply
      (3L, "x"),
      (4L, "the quick brown fox jumps over the lazy dog")
    ).toDF("doc_id", "text")
    val viaExpr = docs.select($"doc_id",
        TextExpressions.simhash16Col(split($"text", " ")).as("simhash"))
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    val tok = docs.select($"doc_id", explode(split($"text", " ")).as("w"))
    val viaRel = graft.dedup.Dedup.simhash16(tok, $"doc_id", $"w")
      .select($"__id".as("doc_id"), $"simhash")
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(viaExpr === viaRel)
    assert(viaExpr.forall(_._2.length == 16))
  }

  test("minhash expression matches the exploded relational signature") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha alpha beta"),      // duplicates don't move the min
      (3L, "z"),
      (4L, "the quick brown fox the quick")
    ).toDF("doc_id", "text")
    val viaExpr = graft.dedup.Dedup.minhashSignatureNative(
        docs, $"doc_id", split($"text", " "), k = 8)
      .orderBy("__id").collect().map(_.toSeq).toSeq
    val tok = docs.select($"doc_id",
      explode(array_distinct(split($"text", " "))).as("w"))
    val viaRel = graft.dedup.Dedup.minhashSignature(tok, $"doc_id", $"w", k = 8)
      .orderBy("__id").collect().map(_.toSeq).toSeq
    assert(viaExpr === viaRel)
  }

  test("strict codegen: non-nullable two-instance projections compile") {
    // fallback disabled: a Janino error (fixed-name local collision in
    // the unscoped non-nullable shape) fails here instead of silently
    // running interpreted — the RollingHashExpr lesson, applied to the
    // other loop-emitting expressions
    import spark.implicits._
    withStrictCodegen {
      // arrays depend on a COLUMN: all-literal children would
      // constant-fold at optimize time and never reach codegen
      val va = array(col("one").cast("double"), lit(2.0), lit(3.0))
      val vb = array(lit(4.0), col("one").cast("double") * 0.5, lit(-1.0))
      val r = Seq(1).toDF("one").select(
        VectorExpressions.vecDot(va, vb).as("d1"),
        VectorExpressions.vecDot(vb, vb).as("d2"),
        VectorExpressions.quantizeStats(va).getField("qsum").as("q1"),
        VectorExpressions.quantizeStats(vb).getField("qsum").as("q2"))
        .collect()(0)
      assert(r.getDouble(0) === 1.0 * 4 + 2 * 0.5 + 3 * -1)
      assert(r.getDouble(1) === 16.0 + 0.25 + 1.0)
      // qsum of [1,2,3] at scale 3/127: codes 42+85+127
      assert(r.getLong(2) === 42L + 85L + 127L)
    }
  }

  test("vecL2Sq matches the interpreted fold bit-exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val df = (Seq.fill(60)((Array.fill(64)(rnd.nextGaussian() * 2),
        Array.fill(64)(rnd.nextGaussian() * 2))) ++ Seq(
      (Array(1.0, 2.0), Array(1.0, 2.0)),          // identical → 0
      (Array(0.0), Array(3.5))                     // single element
    )).toDF("a", "b")
    val out = df.select(
        VectorExpressions.vecL2Sq($"a", $"b").as("fast"),
        aggregate(zip_with($"a", $"b", (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, x) => acc + x).as("ref"))
      .as[(Double, Double)].collect()
    // BIT equality, not tolerance: the expression claims the same
    // left-to-right summation order as the fold it replaced (the
    // fixed-centroid IVF oracles depend on that)
    out.foreach { case (f, r) =>
      assert(java.lang.Double.doubleToLongBits(f)
        === java.lang.Double.doubleToLongBits(r))
    }
  }

  test("lshSig matches the HOF signature bit-for-bit at several plane counts") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val df = (Seq.fill(80)(Array.fill(64)(rnd.nextGaussian())) ++ Seq(
      Array.fill(64)(0.0),      // all-zero → every projection 0 → all '0'
      Array(1e-300, -1e-300)    // short vector, denormal-adjacent
    )).map(Tuple1(_)).toDF("v")
    for (planes <- Seq(1, 3, 4, 7)) {
      val out = df.select(
          VectorExpressions.lshSig($"v", planes).as("fast"),
          graft.sim.Similarity.lshSignatureHof($"v", planes).as("ref"))
        .as[(String, String)].collect()
      out.foreach { case (f, r) => assert(f === r, s"planes=$planes") }
    }
  }

  test("upperTri matches the interpreted transform×transform bit-exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    val d = 16
    val df = Seq.fill(40)((Array.fill(64)(rnd.nextGaussian()),
        Array.fill(d)(rnd.nextGaussian() * 0.1))).toDF("v", "m")
    val ref = explode(flatten(transform(sequence(lit(1), lit(d)), i =>
      transform(sequence(i, lit(d)), j =>
        struct(i.as("i"), j.as("j"),
          ((element_at($"v", i) - element_at($"m", i))
            * (element_at($"v", j) - element_at($"m", j))).as("xy"))))))
    val fast = df.select($"v", $"m",
        posexplode(VectorExpressions.upperTri($"v", $"m", d)).as(Seq("k", "p")))
      .select($"v", $"m", $"k", $"p.i", $"p.j", $"p.xy")
    val refd = df.select($"v", $"m", ref.as("p"))
      .select($"v", $"m", $"p.i", $"p.j", $"p.xy")
    // same (i, j) pairs, same xy bits, same order per row
    val a = fast.orderBy(hash($"v"), $"k").select($"i", $"j", $"xy")
      .as[(Int, Int, Double)].collect()
    val b = refd.orderBy(hash($"v"), $"i", $"j").select($"i", $"j", $"xy")
      .as[(Int, Int, Double)].collect()
    assert(a.length === b.length && a.length === 40 * d * (d + 1) / 2)
    a.zip(b).foreach { case ((i1, j1, x1), (i2, j2, x2)) =>
      assert(i1 === i2 && j1 === j2)
      assert(java.lang.Double.doubleToLongBits(x1)
        === java.lang.Double.doubleToLongBits(x2))
    }
  }

  test("upperTri fails loudly on short arrays, like ANSI element_at") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0), Array(0.5, 0.5, 0.5))).toDF("v", "m")
    val e = intercept[Exception] {
      df.select(explode(VectorExpressions.upperTri($"v", $"m", 3)).as("p"))
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("upper_tri_products")), e.toString)
  }

  test("strict codegen: lshSig, vecL2Sq and upperTri compile (no silent fallback)") {
    import spark.implicits._
    withStrictCodegen {
      val va = array(col("one").cast("double"), lit(2.0), lit(3.0))
      val vb = array(lit(4.0), col("one").cast("double") * 0.5, lit(-1.0))
      val r = Seq(1).toDF("one").select(
        VectorExpressions.vecL2Sq(va, vb).as("l2"),
        VectorExpressions.vecL2Sq(vb, va).as("l2b"),
        VectorExpressions.lshSig(va, 4).as("sig"),
        VectorExpressions.lshSig(vb, 4).as("sigb"),
        size(VectorExpressions.upperTri(va, vb, 3)).as("nt"),
        size(VectorExpressions.upperTri(vb, va, 2)).as("nt2"))
        .collect()(0)
      assert(r.getDouble(0) === 9.0 + 2.25 + 16.0)
      assert(r.getDouble(1) === r.getDouble(0))
      assert(r.getString(2).length === 4 && r.getString(3).length === 4)
      assert(r.getInt(4) === 6 && r.getInt(5) === 3)
    }
  }

  test("null elements and length mismatches null through like the HOF forms") {
    import spark.implicits._
    // vectors with a null element, plus an unequal-length pair — the
    // native kernels must reproduce the zip_with/element_at null
    // semantics exactly (r14 review finding)
    val df = Seq(
      (Seq[java.lang.Double](1.0, null, 3.0), Seq[java.lang.Double](1.0, 2.0, 3.0)),
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](1.0, 2.0, 3.0)),
      (Seq[java.lang.Double](1.0, 2.0, 3.0), Seq[java.lang.Double](4.0, 5.0, 6.0))
    ).toDF("a", "b")
    val out = df.select(
        VectorExpressions.vecL2Sq($"a", $"b").as("fast"),
        aggregate(zip_with($"a", $"b", (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, x) => acc + x).as("ref"),
        VectorExpressions.lshSig($"a", 3).as("sig_fast"),
        graft.sim.Similarity.lshSignatureHof($"a", 3).as("sig_ref"),
        VectorExpressions.vecDot($"a", $"b").as("dot_fast"),
        aggregate(zip_with($"a", $"b", (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x).as("dot_ref"))
      .as[(Option[Double], Option[Double], String, String,
           Option[Double], Option[Double])].collect()
    out.foreach { case (f, r, sf, sr, df_, dr) =>
      assert(f === r)
      assert(sf === sr)
      assert(df_ === dr)
    }
    // a NULL vector: the production entry (Similarity.lshSignature)
    // must produce the HOF's all-'0' signature, never a null bucket
    val nullRow = Seq((Option.empty[Seq[Double]], 1)).toDF("a", "one")
    val ns = nullRow.select(
        graft.sim.Similarity.lshSignature($"a", 3).as("fast"),
        graft.sim.Similarity.lshSignatureHof($"a", 3).as("ref"))
      .as[(String, String)].collect()(0)
    assert(ns._1 === ns._2 && ns._1 === "000")
    // upperTri: a null element nulls exactly the products touching it
    // (equal-length rows only — short arrays THROW like ANSI
    // element_at, covered by the dedicated test below)
    val utDf = Seq(
      (Seq[java.lang.Double](1.0, null, 3.0), Seq[java.lang.Double](1.0, 2.0, 3.0)),
      (Seq[java.lang.Double](1.0, 2.0, 3.0), Seq[java.lang.Double](4.0, null, 6.0))
    ).toDF("a", "b")
    val ut = utDf.select(explode(VectorExpressions.upperTri($"a", $"b", 3)).as("p"),
        $"a", $"b")
      .select($"p.i", $"p.j", $"p.xy",
        ((element_at($"a", $"p.i") - element_at($"b", $"p.i"))
          * (element_at($"a", $"p.j") - element_at($"b", $"p.j"))).as("ref"))
      .as[(Int, Int, Option[Double], Option[Double])].collect()
    ut.foreach { case (i, j, xy, ref) => assert(xy === ref, s"($i,$j)") }
  }

  test("quantization bounds: every code fits int8, max_err ≤ scale/2") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val df = Seq.fill(100)(Array.fill(32)(rnd.nextGaussian() * 10))
      .map(Tuple1(_)).toDF("v")
    val bad = df.select(VectorExpressions.quantizeStats($"v").as("q"), $"v")
      .select($"q.scale", $"q.max_err",
        array_max(transform($"v".cast("array<double>"),
          x => abs(floor(x / $"q.scale" + 0.5)))).as("max_code"))
      .where($"max_code" > 127 || $"q.max_err" > $"q.scale" / 2 + lit(1e-15))
      .count()
    assert(bad === 0L)
  }
}
