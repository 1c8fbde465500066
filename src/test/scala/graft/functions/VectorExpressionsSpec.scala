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
