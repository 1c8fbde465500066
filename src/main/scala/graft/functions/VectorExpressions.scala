package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the similarity hot path: a
  * whole-stage-codegen dot product over two ARRAY<DOUBLE> columns.
  * Replaces the interpreted `aggregate(zip_with(...))` fold — same
  * left-to-right summation order (so DuckDB-oracle equality is
  * unaffected), but compiled to a tight primitive loop with no
  * per-element lambda dispatch or intermediate array.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs must already be ARRAY<DOUBLE>; callers cast (vecDot does)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"
  // same null contract as the zip_with fold (r14 review, the vec_l2sq
  // finding applied to this sibling): unequal lengths or a null
  // element null the whole sum — a finite prefix-dot over a corrupt
  // vector must not silently rank it
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName locals: with non-nullable children the emitted code
      // is not block-scoped, and fixed names would collide with a
      // second instance or the enclosing codegen method (the silent-
      // fallback class RollingHashExpr hit — see SCALING.md r8).
      // Null handling stays INLINE (flag + primitive accumulator) so
      // the per-centroid/per-pair hot loop allocates nothing.
      val n = ctx.freshName("n"); val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |${ev.isNull} = ($b.numElements() != $n);
         |if (!${ev.isNull}) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native Catalyst expression for symmetric int8 quantization stats:
  * one compiled pass over an ARRAY<DOUBLE> column producing
  * struct(scale, qsum, max_err, rmse). Replaces four interpreted HOF
  * lambda folds (amax + codes-sum + err-max + err-sumsq) with a single
  * primitive loop — same accumulation order (left-to-right), so the
  * DuckDB-oracle equality is unaffected, but ~d× fewer lambda
  * dispatches per row on the 100 TB hot path.
  */
case class QuantizeStatsExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("scale", DoubleType, nullable = false),
      org.apache.spark.sql.types.StructField("qsum", org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("max_err", DoubleType, nullable = false),
      org.apache.spark.sql.types.StructField("rmse", DoubleType, nullable = false)))
  override def prettyName: String = "quantize_stats"

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    var amax = 0.0
    var i = 0
    while (i < n) { val x = math.abs(v.getDouble(i)); if (x > amax) amax = x; i += 1 }
    val scale = math.max(amax, 1e-30) / 127.0
    var qsum = 0.0
    var maxe = 0.0
    var sse = 0.0
    i = 0
    while (i < n) {
      val x = v.getDouble(i)
      val q = math.floor(x / scale + 0.5)
      qsum += q
      val e = math.abs(x - q * scale)
      if (e > maxe) maxe = e
      sse += e * e
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](scale, qsum.toLong, maxe, math.sqrt(sse / n)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      // freshName locals — same unscoped-collision hazard as vec_dot
      val n = ctx.freshName("n"); val amax = ctx.freshName("amax")
      val scale = ctx.freshName("scale"); val qsum = ctx.freshName("qsum")
      val maxe = ctx.freshName("maxe"); val sse = ctx.freshName("sse")
      val i = ctx.freshName("i"); val x = ctx.freshName("x")
      val q = ctx.freshName("q"); val e = ctx.freshName("e")
      s"""
         |int $n = $a.numElements();
         |double $amax = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = java.lang.Math.abs($a.getDouble($i));
         |  if ($x > $amax) $amax = $x;
         |}
         |double $scale = java.lang.Math.max($amax, 1e-30) / 127.0;
         |double $qsum = 0.0; double $maxe = 0.0; double $sse = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $a.getDouble($i);
         |  double $q = java.lang.Math.floor($x / $scale + 0.5);
         |  $qsum += $q;
         |  double $e = java.lang.Math.abs($x - $q * $scale);
         |  if ($e > $maxe) $maxe = $e;
         |  $sse += $e * $e;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{$scale, (long) $qsum, $maxe, java.lang.Math.sqrt($sse / $n)});
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native squared-L2 distance over two ARRAY<DOUBLE> columns: the
  * assignment kernel of IVF/k-means. Replaces the interpreted
  * `aggregate(zip_with(v, c, (x,y) => (x-y)*(x-y)), 0, acc+x)` fold —
  * identical left-to-right summation over min(len) elements, so the
  * fixed-centroid DuckDB oracles (e_ivf_assign_fixed/update_fixed) see
  * bit-identical distances — compiled to one primitive loop instead of
  * ~3 lambda dispatches and an intermediate array per element.
  */
case class L2DistanceExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_l2sq"
  // the fold this replaces null-pads unequal lengths (zip_with) and
  // nulls the whole sum on any null element — so the result is
  // nullable even over non-null array children (review r14)
  override def nullable: Boolean = true

  // null iff the HOF fold would be null: unequal lengths (zip_with
  // pads with null) or any null element
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorExpressions.l2OrNull(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // inline null flag + primitive accumulator — no boxing on the
      // per-centroid assignment hot loop (r14 review pass 2)
      val n = ctx.freshName("n"); val acc = ctx.freshName("acc")
      val i = ctx.freshName("i"); val t = ctx.freshName("t")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |${ev.isNull} = ($b.numElements() != $n);
         |if (!${ev.isNull}) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $t = $a.getDouble($i) - $b.getDouble($i);
         |    $acc += $t * $t;
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native hyperplane-LSH bucket signature over an ARRAY<DOUBLE>
  * column: nPlanes sign bits as a '0'/'1' string. Bit p is the sign of
  * Σᵢ v[i]·sin((p·97 + i)·0.1) accumulated left-to-right — the exact
  * algebra of the HOF form it replaces (zip_with + aggregate per
  * plane, interpreted), and of the DuckDB oracle's list_transform.
  * java.lang.Math.sin is what Spark's own Sin expression calls, so the
  * projections are bit-identical; one compiled pass computes all
  * planes (the HOF form re-walked the vector once per plane through
  * per-element lambda dispatch).
  */
case class LshSignatureExpr(child: Expression, nPlanes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(nPlanes >= 1 && nPlanes <= 62, s"nPlanes $nPlanes out of range")

  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def prettyName: String = "lsh_signature"

  override def nullSafeEval(a: Any): Any =
    VectorExpressions.lshSigEval(a.asInstanceOf[ArrayData], nPlanes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VectorExpressions.lshSigEval($a, $nPlanes);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native centered upper-triangle outer product over the first `d`
  * dims of a vector against a means array: array of d(d+1)/2
  * struct(i, j, xy) with xy = (v[i-1]−m[i-1])·(v[j-1]−m[j-1]), 1-based
  * i ≤ j — the row-local covariance kernel of PCA / drift monitoring.
  * Replaces the interpreted nested transform(sequence × sequence)
  * pipeline (one lambda dispatch and struct allocation per pair per
  * row through three HOF layers) with one compiled double loop; the
  * per-pair doubles are bit-identical, and the downstream
  * hash-aggregate is untouched, so the oracled e_embed_covariance
  * values cannot move. Semantics under this engine's ANSI sessions:
  * an array SHORTER than d throws (like ANSI element_at — a corrupt
  * short vector must fail loudly, not null a covariance slot), and a
  * NULL ELEMENT nulls exactly the products that touch it.
  */
case class UpperTriProductsExpr(left: Expression, right: Expression, d: Int)
    extends BinaryExpression {
  require(d >= 1, s"dimension count $d < 1")

  private val structType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("i",
      org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("j",
      org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("xy", DoubleType, nullable = true)))
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(structType, containsNull = false)
  override def prettyName: String = "upper_tri_products"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorExpressions.upperTriProducts(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], d)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorExpressions.upperTriProducts($a, $b, $d);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {

  /** Centered upper-triangle products (called from codegen): see
    * [[UpperTriProductsExpr]]. Semantics match the element_at-based
    * HOF form it replaced under this engine's ANSI sessions
    * (review r14): an array SHORTER than d fails loudly (ANSI
    * element_at throws on out-of-range — a silently nulled covariance
    * slot would hide a corrupt short vector), while a NULL ELEMENT
    * nulls exactly the products that touch it.
    */
  def upperTriProducts(v: ArrayData, m: ArrayData, d: Int)
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val vn = v.numElements()
    val mn = m.numElements()
    if (vn < d || mn < d)
      throw new ArrayIndexOutOfBoundsException(
        s"upper_tri_products needs $d dims; vector has $vn, means has $mn " +
          "(ANSI element_at fails the same way)")
    def ok(a: ArrayData, idx: Int): Boolean = !a.isNullAt(idx - 1)
    val out = new Array[Any](d * (d + 1) / 2)
    var k = 0
    var i = 1
    while (i <= d) {
      // (v[i-1] − m[i-1]) hoisted per i like the HOF form's outer lambda
      val okI = ok(v, i) && ok(m, i)
      val ci = if (okI) v.getDouble(i - 1) - m.getDouble(i - 1) else 0.0
      var j = i
      while (j <= d) {
        val okJ = okI && ok(v, j) && ok(m, j)
        val xy: Any =
          if (okJ) ci * (v.getDouble(j - 1) - m.getDouble(j - 1)) else null
        out(k) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](i, j, xy))
        k += 1
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** LSH signature eval (called from codegen): any null element makes
    * EVERY plane's projection null in the HOF form — which
    * `when(proj > 0)` turns into an all-'0' signature — so the null
    * scan happens once and short-circuits to the same string
    * (review r14).
    */
  def lshSigEval(v: ArrayData, nPlanes: Int): UTF8String = {
    val n = v.numElements()
    val bits = new Array[Byte](nPlanes)
    var anyNull = false
    var i = 0
    while (i < n && !anyNull) { anyNull = v.isNullAt(i); i += 1 }
    var p = 0
    while (p < nPlanes) {
      var b: Byte = '0'
      if (!anyNull) {
        val p97 = (p * 97).toDouble
        var s = 0.0
        var j = 0
        while (j < n) {
          s += v.getDouble(j) * java.lang.Math.sin((p97 + j.toDouble) * 0.1)
          j += 1
        }
        if (s > 0) b = '1'
      }
      bits(p) = b
      p += 1
    }
    UTF8String.fromBytes(bits)
  }

  /** Boxed L2 for codegen splice: null under the exact conditions the
    * zip_with fold nulls (unequal lengths, any null element).
    */
  def l2OrNull(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val t = a.getDouble(i) - b.getDouble(i)
      s += t * t
      i += 1
    }
    java.lang.Double.valueOf(s)
  }
  /** Codegen'd Σ aᵢ·bᵢ over ARRAY<DOUBLE> columns. */
  def vecDot(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProductExpr(
      GraftSqlBridge.expression(a.cast("array<double>")),
      GraftSqlBridge.expression(b.cast("array<double>"))))

  /** Codegen'd int8 quantization stats over an ARRAY<DOUBLE> column:
    * struct(scale, qsum, max_err, rmse).
    */
  def quantizeStats(v: Column): Column =
    GraftSqlBridge.column(QuantizeStatsExpr(
      GraftSqlBridge.expression(v.cast("array<double>"))))

  /** Codegen'd Σ (aᵢ−bᵢ)² over ARRAY<DOUBLE> columns. */
  def vecL2Sq(a: Column, b: Column): Column =
    GraftSqlBridge.column(L2DistanceExpr(
      GraftSqlBridge.expression(a.cast("array<double>")),
      GraftSqlBridge.expression(b.cast("array<double>"))))

  /** Codegen'd nPlanes-bit hyperplane-LSH signature string over an
    * ARRAY<DOUBLE> column.
    */
  def lshSig(v: Column, nPlanes: Int): Column =
    GraftSqlBridge.column(LshSignatureExpr(
      GraftSqlBridge.expression(v.cast("array<double>")), nPlanes))

  /** Codegen'd ARRAY<STRUCT<i, j, xy>> of centered upper-triangle
    * products over the first d dims of `v` against the means array.
    */
  def upperTri(v: Column, means: Column, d: Int): Column =
    GraftSqlBridge.column(UpperTriProductsExpr(
      GraftSqlBridge.expression(v.cast("array<double>")),
      GraftSqlBridge.expression(means.cast("array<double>")), d))
}
