package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the repetition quality signal: one
  * pass over the raw text computing token and 3-gram shingle counts
  * plus their distinct counts — the inputs of the Gopher-style rep1 /
  * rep3 ratios. Replaces the HOF pipeline (split → transform(slice →
  * array_join) → two array_distincts) that allocates ~2 Catalyst
  * string arrays per document and runs its lambdas interpreted; here
  * the shingle windows are dedup'd through one HashSet without ever
  * materializing shingle strings beyond the set keys. Exact string
  * semantics (same whitespace split, same distinct) — the DuckDB
  * oracle is unchanged.
  */
case class RepStatsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct_tokens", LongType, nullable = false),
    StructField("n_grams", LongType, nullable = false),
    StructField("n_distinct_grams", LongType, nullable = false)))
  override def prettyName: String = "rep_stats"

  override def nullSafeEval(a: Any): Any =
    TextExpressions.repStats(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextExpressions.repStats($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native Catalyst expression for the 16-bit SimHash signature over a
  * token ARRAY: one md5 per token and 16 counters per row. The
  * relational form ([[graft.dedup.Dedup.simhash16]]) explodes every
  * token row ×16 bit positions through two hash aggregates — 24B
  * intermediate rows at the 100× probe; this computes the identical
  * signature (same md5-hex nibble test, same >0 sign rule) with zero
  * shuffles.
  */
case class SimHash16Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def prettyName: String = "simhash16"

  override def nullSafeEval(a: Any): Any =
    TextExpressions.simhash16(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextExpressions.simhash16($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native k-wide MinHash signature over a token ARRAY: element i is
  * the minimum over tokens of md5("s<i>" ‖ token), hex-encoded —
  * value-identical to the exploded relational form
  * ([[graft.dedup.Dedup.minhashSignature]]) and the interpreted HOF
  * form, but one compiled pass per row: k digests per token, min kept
  * by unsigned byte comparison (hex encoding is order-preserving, so
  * byte order ≡ the relational form's string order).
  */
case class MinHashExpr(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(a: Any): Any =
    TextExpressions.minhashSig(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextExpressions.minhashSig($a, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Rolling-hash document fingerprinting (the Rabin–Karp polynomial
  * hash under every fixed-size byte window), the primitive behind
  * content-defined chunking and winnowing-style fingerprints: window
  * `w` at position i hashes to Σ b[i+j]·B^(w-1-j) mod M, a BOUNDARY is
  * a window whose hash ≡ 0 mod `divisor` (expected chunk length =
  * divisor bytes — boundaries survive insertions/deletions elsewhere
  * in the document, which fixed-stride chunking does not), and the
  * minimum hash over all windows is a 1-word winnowing fingerprint.
  *
  * One compiled pass per row (whole-stage codegen): the hash ROLLS —
  * each window is O(1) off the previous (subtract the outgoing byte's
  * B^(w-1) term, multiply by B, add the incoming byte) — where the
  * naive per-window form is O(w) per position; at w=8 that is the
  * difference between len and 8·len multiplies per document on the
  * 100 TB scan path. Canonical residues in [0, M): the DuckDB oracle
  * recomputes every window non-rolling with precomputed power
  * literals, so cross-engine equality proves the rolling update
  * algebra, not just the shape.
  *
  * Byte-level (UTF8String bytes); the oracle models code points,
  * identical on the ASCII corpus. Output:
  * struct(n_windows, n_boundaries, min_hash, first_boundary) — all
  * LONG; min_hash = -1 and first_boundary = 0 when the text is
  * shorter than one window.
  */
case class RollingHashExpr(child: Expression, window: Int, base: Long,
                           mod: Long, divisor: Long)
    extends UnaryExpression {

  require(window >= 2, s"rolling hash window $window < 2")
  require(base > 0 && mod > 1 && divisor > 1, "rolling hash params must be positive")
  // every intermediate stays in a Long: h < M, h*B + 255 must not wrap
  require(mod - 1 <= (Long.MaxValue - 255L) / math.max(base, 255L),
    s"rolling hash base $base x mod $mod overflows Long")

  override def dataType: DataType = StructType(Seq(
    StructField("n_windows", LongType, nullable = false),
    StructField("n_boundaries", LongType, nullable = false),
    StructField("min_hash", LongType, nullable = false),
    StructField("first_boundary", LongType, nullable = false)))
  override def prettyName: String = "rolling_fingerprint"

  private lazy val pw: Long = {
    var p = 1L
    var j = 0
    while (j < window - 1) { p = p * base % mod; j += 1 }
    p
  }

  override def nullSafeEval(a: Any): Any = {
    val bs = a.asInstanceOf[UTF8String].getBytes
    val len = bs.length
    var nW = 0L; var nB = 0L; var mh = -1L; var fb = 0L
    if (len >= window) {
      nW = len - window + 1L
      var h = 0L
      var j = 0
      while (j < window) { h = (h * base + (bs(j) & 0xffL)) % mod; j += 1 }
      var i = 0
      var more = true
      while (more) {
        if (mh < 0 || h < mh) mh = h
        if (h % divisor == 0L) { nB += 1; if (fb == 0L) fb = i + 1L }
        if (i + window >= len) more = false // that was the last window
        else {
          h = ((h - (bs(i) & 0xffL) * pw % mod + mod) % mod * base +
            (bs(i + window) & 0xffL)) % mod
          i += 1
        }
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nW, nB, mh, fb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      // EVERY local (including loop counters) is a freshName: when the
      // child is non-nullable the emitted code is NOT wrapped in its
      // own block, so fixed names would collide with the enclosing
      // whole-stage-codegen method's locals or a second instance in
      // the same projection. `pwv` splices the DRIVER-precomputed
      // B^(w-1) mod M (the lazy val) — an earlier version shadowed it
      // with the freshName and emitted a variable name as a "literal";
      // the strict-codegen spec case (fallback disabled) pins both.
      val bs = ctx.freshName("bs"); val len = ctx.freshName("len")
      val nW = ctx.freshName("nW"); val nB = ctx.freshName("nB")
      val mh = ctx.freshName("mh"); val fb = ctx.freshName("fb")
      val h = ctx.freshName("h"); val pwv = ctx.freshName("pw")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      s"""
         |byte[] $bs = $a.getBytes();
         |int $len = $bs.length;
         |long $nW = 0L; long $nB = 0L; long $mh = -1L; long $fb = 0L;
         |if ($len >= $window) {
         |  $nW = $len - $window + 1L;
         |  long $h = 0L;
         |  for (int $j = 0; $j < $window; $j++) $h = ($h * ${base}L + ($bs[$j] & 0xffL)) % ${mod}L;
         |  long $pwv = ${pw}L; // B^(w-1) mod M, driver-precomputed
         |  for (int $i = 0; ; $i++) {
         |    if ($mh < 0 || $h < $mh) $mh = $h;
         |    if ($h % ${divisor}L == 0L) { $nB++; if ($fb == 0L) $fb = $i + 1L; }
         |    if ($i + $window >= $len) break;
         |    $h = (($h - ($bs[$i] & 0xffL) * $pwv % ${mod}L + ${mod}L) % ${mod}L * ${base}L
         |      + ($bs[$i + $window] & 0xffL)) % ${mod}L;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{$nW, $nB, $mh, $fb});
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native distinct word-shingle xxhash64 set over a text column: one
  * pass per document producing ARRAY<LONG> of xxhash64(seed 42) values
  * of the DISTINCT n-word shingles, in first-occurrence order — the
  * exact multiset `explode(array_distinct(wordShingles(text, n)))` →
  * `xxhash64(s)` produces. The HOF pipeline it replaces (split →
  * sequence → transform(slice → array_join) → array_distinct) runs its
  * lambdas interpreted and materializes a Catalyst string array per
  * window per document — measured 47 s of task time on one
  * t_decontaminate branch at sf0.1; this is one compiled pass, one
  * HashSet, one hash per distinct shingle. Dedup is on the shingle
  * STRING (like array_distinct), never the hash, so a hash collision
  * between distinct shingles still yields two array entries exactly as
  * the relational form would.
  */
case class ShingleHashExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle width $n < 1")
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(a: Any): Any =
    TextExpressions.shingleHashes(a.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextExpressions.shingleHashes($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExpressions {

  private val md5Local =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** 16-bit SimHash over a token array (called from codegen). Bit b
    * weights +1 when hex digit b of the token's md5 has its high bit
    * set (nibble ≥ 8) — exactly the relational form's
    * `instr('89abcdef', substr(md5, b+1, 1))` test.
    */
  def simhash16(tokens: org.apache.spark.sql.catalyst.util.ArrayData): UTF8String = {
    val counts = new Array[Int](16)
    val md = md5Local.get()
    var i = 0
    val n = tokens.numElements()
    while (i < n) {
      // null elements contribute nothing — the relational form filters
      // them (md5(null) would otherwise bias every bit's weight)
      if (tokens.isNullAt(i)) { i += 1 }
      else {
      md.reset()
      val d = md.digest(tokens.getUTF8String(i).getBytes)
      var b = 0
      while (b < 16) {
        val nib = if ((b & 1) == 0) (d(b >> 1) >> 4) & 0xf else d(b >> 1) & 0xf
        counts(b) += (if (nib >= 8) 1 else -1)
        b += 1
      }
      i += 1
      }
    }
    val sb = new java.lang.StringBuilder(16)
    var b = 0
    while (b < 16) { sb.append(if (counts(b) > 0) '1' else '0'); b += 1 }
    UTF8String.fromString(sb.toString)
  }

  /** Codegen'd 16-bit SimHash signature over an ARRAY<STRING> column. */
  def simhash16Col(tokens: Column): Column =
    GraftSqlBridge.column(SimHash16Expr(GraftSqlBridge.expression(tokens)))

  private val HexChars = "0123456789abcdef".toCharArray

  /** Per-thread memo of token → its k salted md5 digests. A corpus's
    * VOCABULARY is orders of magnitude smaller than its token stream
    * (Zipf), so the same (salt ‖ token) digest recomputes millions of
    * times across documents; md5 is a pure function of its input, so
    * the memo is exact. Bounded (cleared past 2^16 entries ≈ ~11 MB a
    * thread at 8 digests/token) so an adversarial unbounded vocabulary
    * degrades to the uncached cost instead of an OOM.
    */
  private val tokenDigestCache =
    ThreadLocal.withInitial[java.util.HashMap[UTF8String, Array[Array[Byte]]]](() =>
      new java.util.HashMap[UTF8String, Array[Array[Byte]]]())

  /** Dev measurement toggle (r15, VERDICT #7): SPARK_GRAFT_MEMO=0
    * disables the digest memo entirely, so per-gate A/B attribution in
    * probes is warm-order-independent (within one bench JVM the memo
    * otherwise survives across gates and flatters whichever MinHash
    * gate runs later). Production/driver runs never set it.
    */
  private val memoEnabled = !sys.env.get("SPARK_GRAFT_MEMO").contains("0")

  /** Salt bytes per signature width k — pure function of k, previously
    * re-allocated per ROW (k small byte arrays each row). */
  private val saltCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Byte]]]()
  private def saltsFor(k: Int): Array[Array[Byte]] =
    saltCache.computeIfAbsent(k, kk => Array.tabulate(kk)(s =>
      ("s" + s).getBytes(java.nio.charset.StandardCharsets.UTF_8)))

  /** k-wide MinHash signature over a token array (called from codegen).
    * Duplicate tokens are skipped through a per-row hash set BEFORE
    * hashing — a duplicate can't move any min, and k digests per
    * duplicate is where the time goes (word-salad corpora repeat most
    * tokens); cross-document repeats hit [[tokenDigestCache]]. Empty
    * arrays yield an empty signature array (the relational form emits
    * no row at all; callers filter either way).
    */
  def minhashSig(tokens: org.apache.spark.sql.catalyst.util.ArrayData,
                 k: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val n = tokens.numElements()
    if (n == 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val salts = saltsFor(k)
    val md = md5Local.get()
    val cache = tokenDigestCache.get()
    val mins = Array.fill(k)(null: Array[Byte])
    val seen = new java.util.HashSet[UTF8String](n * 2)
    var i = 0
    while (i < n) {
      // null elements contribute nothing (the relational min() skips
      // nulls; hashing one here would NPE)
      val u = if (tokens.isNullAt(i)) null else tokens.getUTF8String(i)
      if (u != null && seen.add(u)) {
        // lookup by the transient UTF8String (no per-token String
        // alloc on the hit path); the STORED key is a defensive copy —
        // `u` may point into a buffer the scan reuses for later rows
        var digs = if (memoEnabled) cache.get(u) else null
        if (digs == null || digs.length < k) {
          val tok = u.getBytes
          digs = Array.tabulate(k) { s =>
            md.reset()
            md.update(salts(s))
            md.update(tok)
            md.digest()
          }
          if (memoEnabled) {
            // evict HALF on reaching the bound, not clear() (r15,
            // ADVICE): a vocabulary slightly above 2^16 otherwise
            // wipes the whole memo every few thousand puts and the
            // hot Zipf head never survives — removing every other
            // entry keeps the hit rate ≥ ~50% in steady state while
            // still bounding memory
            if (cache.size() >= (1 << 16)) {
              val it = cache.entrySet().iterator()
              var drop = false
              while (it.hasNext) {
                it.next()
                if (drop) it.remove()
                drop = !drop
              }
            }
            cache.put(UTF8String.fromBytes(tok), digs)
          }
        }
        var s = 0
        while (s < k) {
          val d = digs(s)
          if (mins(s) == null || unsignedLess(d, mins(s))) mins(s) = d
          s += 1
        }
      }
      i += 1
    }
    // an all-null array is an empty token set: empty signature, same
    // as n == 0 (callers filter on size > 0)
    if (mins(0) == null)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      mins.map(d => UTF8String.fromString(hex(d)): Any))
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val ai = a(i) & 0xff
      val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }

  private def hex(d: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < d.length) {
      sb.append(HexChars((d(i) >> 4) & 0xf)).append(HexChars(d(i) & 0xf))
      i += 1
    }
    sb.toString
  }

  /** Codegen'd k-wide MinHash signature over an ARRAY<STRING> column. */
  def minhashSigCol(tokens: Column, k: Int): Column =
    GraftSqlBridge.column(MinHashExpr(GraftSqlBridge.expression(tokens), k))

  /** Single-pass token/shingle census (called from codegen). */
  def repStats(text: UTF8String): GenericInternalRow = {
    val toks = text.toString.split(" ", -1)
    val n = toks.length
    val distinctToks = new java.util.HashSet[String]()
    var i = 0
    while (i < n) { distinctToks.add(toks(i)); i += 1 }
    val nGrams = math.max(n - 2, 0)
    val distinctGrams = new java.util.HashSet[String]()
    i = 0
    while (i < nGrams) {
      // the same "w1 w2 w3" join the HOF form produced
      distinctGrams.add(toks(i) + " " + toks(i + 1) + " " + toks(i + 2))
      i += 1
    }
    new GenericInternalRow(Array[Any](n.toLong, distinctToks.size.toLong,
      nGrams.toLong, distinctGrams.size.toLong))
  }

  /** Codegen'd struct(n_tokens, n_distinct_tokens, n_grams,
    * n_distinct_grams) over a text column.
    */
  def repStatsCol(text: Column): Column =
    GraftSqlBridge.column(RepStatsExpr(GraftSqlBridge.expression(text)))

  /** Distinct n-word-shingle xxhash64 values (called from codegen).
    * Same whitespace-regex split as `split(text, " ")`, same
    * first-occurrence dedup as array_distinct, same hash as
    * `xxhash64(shingle_string)` (XxHash64Function over the UTF-8
    * bytes, seed 42).
    */
  def shingleHashes(text: UTF8String, n: Int)
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val toks = text.toString.split(" ", -1)
    val m = toks.length - n + 1
    if (m <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    // LinkedHashSet: array_distinct keeps first occurrences in order
    val seen = new java.util.LinkedHashSet[String](m * 2)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) {
      out(k) = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        UTF8String.fromString(it.next()),
        org.apache.spark.sql.types.StringType, 42L)
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Codegen'd ARRAY<LONG> of xxhash64 values of the distinct n-word
    * shingles of a text column — `xxhash64` of each element of
    * `array_distinct(wordShingles(text, n))`, in one compiled pass.
    */
  def shingleHashesCol(text: Column, n: Int): Column =
    GraftSqlBridge.column(ShingleHashExpr(
      GraftSqlBridge.expression(text.cast("string")), n))

  /** Codegen'd rolling-hash fingerprint summary over a STRING column:
    * struct(n_windows, n_boundaries, min_hash, first_boundary).
    */
  def rollingFingerprint(text: Column, window: Int = 8, base: Long = 257L,
                         mod: Long = 1000000007L, divisor: Long = 64L): Column =
    GraftSqlBridge.column(RollingHashExpr(
      GraftSqlBridge.expression(text.cast("string")), window, base, mod, divisor))
}
