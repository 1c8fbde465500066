package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** RollingHashExpr differential coverage: the O(1) rolling update must
  * equal a brute-force non-rolling reference (every window summed from
  * scratch in BigInt — immune to any overflow mistake in the engine)
  * on BOTH execution paths (interpreted eval and whole-stage codegen),
  * across lengths that straddle the window and adversarial byte
  * values.
  */
class TextExpressionsSpec extends SparkSpec {

  private val W = 8; private val B = 257L; private val M = 1000000007L
  private val D = 64L

  /** Non-rolling reference: each window summed from scratch. */
  private def ref(s: String): (Long, Long, Long, Long) = {
    val bs = s.getBytes("UTF-8")
    if (bs.length < W) return (0L, 0L, -1L, 0L)
    val hs = (0 to bs.length - W).map { i =>
      (0 until W).map { j =>
        BigInt(bs(i + j) & 0xff) * BigInt(B).modPow(W - 1 - j, M)
      }.sum.mod(M).toLong
    }
    val bpos = hs.zipWithIndex.collect { case (h, i) if h % D == 0 => i + 1L }
    (hs.length.toLong, bpos.length.toLong, hs.min,
      bpos.headOption.getOrElse(0L))
  }

  private def evalInterpreted(s: String): (Long, Long, Long, Long) = {
    val r = RollingHashExpr(Literal(UTF8String.fromString(s)), W, B, M, D)
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  /** STRICT codegen: fallback disabled for the call, so a Janino
    * compile error fails the test instead of silently executing the
    * interpreted path (which is how a shadowed-literal bug once hid
    * behind green runs).
    */
  private def evalCodegen(ss: Seq[String]): Seq[(Long, Long, Long, Long)] = {
    import spark.implicits._
    withStrictCodegen {
      ss.toDF("text")
        .select(TextExpressions.rollingFingerprint(col("text")).as("f"))
        .select("f.n_windows", "f.n_boundaries", "f.min_hash", "f.first_boundary")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    }
  }

  private val cases: Seq[String] = Seq(
    "", "a", "abcdefg",              // below the window
    "abcdefgh",                      // exactly one window
    "abcdefghi",                     // one roll
    "aaaaaaaaaaaaaaaa",              // constant bytes (every window equal)
    "the quick brown fox jumps over the lazy dog",
    "\u0000\u0001\u00ff high bytes & controls \u007f\u0080",
    (0 until 500).map(i => ('a' + i % 26).toChar).mkString,
    "key agg row scan slow fast table value part hash value")

  test("rolling update ≡ non-rolling BigInt reference (interpreted path)") {
    cases.foreach { s =>
      assert(evalInterpreted(s) === ref(s), s"interpreted diverged on '$s'")
    }
  }

  test("rolling update ≡ non-rolling BigInt reference (codegen path)") {
    assert(evalCodegen(cases) === cases.map(ref))
  }

  test("randomized byte strings agree on both paths") {
    val rnd = new scala.util.Random(42)
    val rand = (1 to 60).map { _ =>
      val n = rnd.nextInt(40)
      (0 until n).map(_ => (rnd.nextInt(94) + 33).toChar).mkString
    }
    assert(evalCodegen(rand) === rand.map(ref))
    rand.foreach(s => assert(evalInterpreted(s) === ref(s)))
  }

  test("parameter sweep: window/base/divisor variants match the reference") {
    val rnd = new scala.util.Random(7)
    val texts = (1 to 8).map { _ =>
      val n = rnd.nextInt(60)
      (0 until n).map(_ => (rnd.nextInt(94) + 33).toChar).mkString
    }
    for (w <- Seq(2, 3, 5, 12); b <- Seq(31L, 257L); d <- Seq(3L, 97L)) {
      texts.foreach { s =>
        val bs = s.getBytes("UTF-8")
        val exp =
          if (bs.length < w) (0L, 0L, -1L, 0L)
          else {
            val hs = (0 to bs.length - w).map { i =>
              (0 until w).map { j =>
                BigInt(bs(i + j) & 0xff) * BigInt(b).modPow(w - 1 - j, M)
              }.sum.mod(M).toLong
            }
            val bp = hs.zipWithIndex.collect { case (h, i) if h % d == 0 => i + 1L }
            (hs.length.toLong, bp.length.toLong, hs.min, bp.headOption.getOrElse(0L))
          }
        val r = RollingHashExpr(Literal(UTF8String.fromString(s)), w, b, M, d)
          .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
        assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) === exp,
          s"diverged at w=$w b=$b d=$d on '$s'")
      }
    }
  }

  test("two instances in one projection do not collide in codegen") {
    import spark.implicits._
    val s = "the quick brown fox jumps"
    val out = withStrictCodegen {
      // coalesce(col, lit): NON-NULLABLE but column-dependent children
      // — not foldable (a lit child would constant-fold away and never
      // reach codegen) and not null-check-block-wrapped, the exact
      // unscoped shape where fixed local names collide across
      // instances or with the enclosing produce loop
      val t = coalesce(col("text"), lit(""))
      Seq(s).toDF("text")
        .select(
          TextExpressions.rollingFingerprint(t).as("a"),
          TextExpressions.rollingFingerprint(t, divisor = 7L).as("b"))
        .select(col("a.min_hash"), col("b.n_boundaries")).collect()(0)
    }
    val bs = s.getBytes("UTF-8")
    val hs = (0 to bs.length - W).map { i =>
      (0 until W).map { j =>
        BigInt(bs(i + j) & 0xff) * BigInt(B).modPow(W - 1 - j, M)
      }.sum.mod(M).toLong
    }
    assert(out.getLong(0) === hs.min)
    assert(out.getLong(1) === hs.count(_ % 7 == 0).toLong)
  }

  test("null text is null out; parameter misuse fails loudly") {
    import spark.implicits._
    val out = Seq[(java.lang.Long, String)]((1L, null), (2L, "abcdefgh"))
      .toDF("id", "text")
      .select(col("id"), TextExpressions.rollingFingerprint(col("text")).as("f"))
      .orderBy("id").collect()
    assert(out(0).isNullAt(1))
    assert(!out(1).isNullAt(1))
    intercept[IllegalArgumentException] {
      RollingHashExpr(Literal(UTF8String.fromString("x")), 1, B, M, D)
    }
    intercept[IllegalArgumentException] {
      // base*mod product that would overflow the rolling arithmetic
      RollingHashExpr(Literal(UTF8String.fromString("x")), 8,
        1L << 32, Long.MaxValue / 2, D)
    }
  }

  test("shingleHashes ≡ xxhash64 over array_distinct(wordShingles) — both paths") {
    import spark.implicits._
    import graft.text.TextFunctions.wordShingles
    val rnd = new scala.util.Random(23)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "x", "")
    val docs = Seq(
      "",                        // split("") = [""] → below any n ≥ 2
      "one two",                 // exactly below n=3
      "a b c d e f g h i",       // clean window set
      "w w w w w w w w",         // all shingles identical → ONE hash
      "a  b c d",                // double space → empty token inside shingles
      " lead trail "             // leading/trailing space tokens
    ) ++ Seq.fill(40)(Seq.fill(rnd.nextInt(30))(
      vocab(rnd.nextInt(vocab.size))).mkString(" "))
    val df = docs.map(Tuple1(_)).toDF("text")
    for (n <- Seq(3, 5, 8)) {
      def check(): Unit = {
        val out = df.select(
            TextExpressions.shingleHashesCol($"text", n).as("fast"),
            transform(array_distinct(wordShingles($"text", n)),
              s => xxhash64(s)).as("ref"))
          .as[(Seq[Long], Seq[Long])].collect()
        out.foreach { case (f, r) => assert(f === r, s"n=$n") }
      }
      check()                      // default path
      withStrictCodegen(check())   // codegen must compile, not fall back
    }
  }

  test("minhashSig digest memo: cache hits reproduce the uncached digests") {
    import spark.implicits._
    // same vocabulary across many rows (cache-hit path) and a k
    // downgrade after a k=8 run (prefix reuse) must both equal the
    // exploded relational reference
    val docs = Seq.fill(30)("tok1 tok2 tok3 tok1").map(Tuple1(_)).toDF("text")
    val toks = graft.text.TextFunctions.tokens($"text")
    for (k <- Seq(8, 4)) {
      val fast = docs.select(TextExpressions.minhashSigCol(toks, k).as("sig"))
        .as[Seq[String]].collect()
      val ref = (0 until k).map(i =>
        array_min(transform(array_distinct(toks),
          w => md5(concat(lit(s"s$i"), w)))))
      val refRows = docs.select(array(ref: _*).as("sig")).as[Seq[String]].collect()
      fast.zip(refRows).foreach { case (f, r) => assert(f === r, s"k=$k") }
    }
  }
}
