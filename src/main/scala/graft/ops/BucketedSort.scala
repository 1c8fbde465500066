package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** Total global order WITHOUT sampling the (huge) input.
  *
  * Spark's `orderBy` plans a range-partitioning exchange whose bounds
  * are SAMPLED from its child — and sampling a child that sits on top
  * of a shuffle re-executes that child's final stage, so a join's
  * probe runs ~twice just to learn where to cut the range (measured:
  * +77% over the join itself on j1 at 10×, SCALING.md r8). When the
  * sort key's span is known cheaply up front (an id column whose
  * min/max comes from a small input relation or a metadata pass),
  * none of that is necessary: bucket rows arithmetically by key, and
  * route bucket i to partition i through the NATIVE hash exchange by
  * shuffling on a per-bucket sentinel value v_i chosen so
  * `pmod(murmur3_seed42(v_i), n) == i` — the exact function
  * `HashPartitioning` applies. One codegen'd exchange, local sorts,
  * no sampling pass, no double execution; output partitions are in
  * key order and sorted within, so concatenation in partition order
  * (what `coalesce(1).write` and ordered collects do) is the total
  * order.
  *
  * At 1000 executors this is strictly better than `orderBy`: the
  * sampling collect (a driver round-trip proportional to cluster
  * size) disappears, and bucket balance is the same uniform-key
  * assumption a sampled range partitioner converges to anyway. The
  * trade: keys must be integers of cheaply-known span, roughly
  * uniform across it — ids by construction; NOT general doubles.
  * Callers whose key distribution is unknown should stay on orderBy.
  */
object BucketedSort {

  /** Route sentinels: for each target partition i, the smallest
    * non-negative int whose Murmur3 (seed 42 — the seed the native
    * exchange uses) lands in partition i of n.
    */
  private[ops] def routeValues(n: Int): Array[Int] = {
    val route = new Array[Int](n)
    val found = new Array[Boolean](n)
    var v = 0
    var filled = 0
    while (filled < n) {
      val h = Murmur3_x86_32.hashInt(v, 42)
      val p = ((h % n) + n) % n
      if (!found(p)) { found(p) = true; route(p) = v; filled += 1 }
      v += 1
    }
    route
  }

  /** Globally order `df` by (key, tieBreaks...) using uniform
    * arithmetic buckets over the long key's [lo, hi] span instead of a
    * sampled range exchange. Keys outside [lo, hi] clamp to the edge
    * buckets (order still total — clamping is monotone, applied to
    * the KEY before any arithmetic so far-out keys cannot overflow);
    * null keys take bucket 0 and sort first, matching orderBy's
    * ascending nulls-first default. The combined (key, tieBreaks)
    * must be a total order for a deterministic result, exactly as
    * with orderBy.
    */
  def byUniformBuckets(df: DataFrame, key: Column, lo: Long, hi: Long,
                       numParts: Int, tieBreaks: Column*): DataFrame = {
    require(numParts > 0, s"bucketed sort needs numParts > 0, got $numParts")
    require(hi >= lo, s"bucketed sort span [$lo, $hi] is empty")
    val span = hi - lo + 1
    require(span > 0 && span <= Long.MaxValue / numParts,
      s"bucketed sort span $span x $numParts buckets overflows")
    val n = numParts
    val route = routeValues(n)
    // clamp the KEY into [lo, hi] FIRST — clamping is monotone, and it
    // bounds (clamped - lo) in [0, span) so the bucket arithmetic
    // below can never overflow (span * numParts is require-bounded);
    // bucketing before clamping would wrap (key - lo) * n for keys far
    // outside the span and silently misroute them. Null keys take
    // bucket 0: with the ascending nulls-first within-partition sort
    // below they come out first globally, exactly like orderBy.
    val clamped = least(lit(hi), greatest(lit(lo), key.cast("long")))
    // (clamped - lo) * n / span is monotone non-decreasing in the key
    // (Spark divides longs in DOUBLE; long->double conversion,
    // division by a positive constant, and truncation are each
    // monotone, so bucket order = key order even with precision loss
    // at >2^53 numerators). The least(n-1) guard stays REQUIRED: for
    // huge spans the double quotient of the top key can round up to
    // exactly n, and an element_at past the array end would misroute
    // the largest keys to bucket 0 via the null-coalesce.
    val bucket = least(lit(n - 1), greatest(lit(0), coalesce(
      (((clamped - lit(lo)) * lit(n.toLong)) / lit(span)).cast("int"),
      lit(0))))
    val routeCol = element_at(array(route.map(lit).toIndexedSeq: _*), bucket + lit(1))
    df.withColumn("__graft_route", routeCol)
      .repartition(n, col("__graft_route"))
      .sortWithinPartitions(key +: tieBreaks: _*)
      .drop("__graft_route")
  }

  /** Convenience: span from a one-pass (min, max) aggregate over a
    * SMALL relation that bounds the key (e.g. the primary side of a
    * join whose output is being ordered by the primary's id). The
    * aggregate is a driver action — call it on inputs, never on the
    * huge intermediate this operator exists to avoid re-executing.
    * When the bounding relation is empty or its key all-NULL, falls
    * back to a sampled-range `orderBy` so the total-order contract
    * holds regardless.
    */
  def byKeySpanOf(df: DataFrame, key: Column, spanOf: DataFrame,
                  spanKey: Column, numParts: Int,
                  tieBreaks: Column*): DataFrame = {
    val r = spanOf.agg(min(spanKey).cast("long"), max(spanKey).cast("long")).head()
    if (r.isNullAt(0))
      // no usable span (empty or all-NULL bounding relation): the
      // TOTAL-ORDER contract must hold regardless — fall back to the
      // sampled range sort rather than passing rows through unsorted
      // (df is usually empty too when spanOf is, and orderBy on an
      // empty frame is free; when it is not, correct-but-sampled
      // beats silently unordered)
      df.orderBy(key +: tieBreaks: _*)
    else byUniformBuckets(df, key, r.getLong(0), r.getLong(1), numParts, tieBreaks: _*)
  }

  /** (min, max) of an integer id column straight from parquet FOOTER
    * statistics — no row is decoded, no Spark job runs. Bucket bounds
    * don't have to be exact for CORRECTNESS (out-of-span keys clamp
    * to the edge buckets and the order stays total), so row-group
    * stats from the unfiltered table are exactly enough, and a
    * superset span only widens the clamp range. Driver-side loop over
    * the footers: right for the one-to-hundreds-of-files inputs this
    * backs; a 100k-file lake would lift the same stats through a
    * small executor job over file names instead. None when no
    * row group carries usable stats (caller falls back to an
    * aggregate scan).
    */
  def parquetSpan(s: org.apache.spark.sql.SparkSession, path: String,
                  keyCol: String): Option[(Long, Long)] =
    try {
      import org.apache.parquet.hadoop.ParquetFileReader
      import org.apache.parquet.hadoop.util.HadoopInputFile
      val conf = s.sparkContext.hadoopConfiguration
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(conf)
      val files =
        if (fs.getFileStatus(p).isDirectory)
          fs.listStatus(p).map(_.getPath)
            .filter(f => f.getName.endsWith(".parquet"))
        else Array(p)
      var lo = Long.MaxValue; var hi = Long.MinValue; var seen = false
      files.foreach { f =>
        val r = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
        try r.getFooter.getBlocks.forEach { b =>
          b.getColumns.forEach { c =>
            if (c.getPath.toDotString == keyCol && c.getStatistics != null &&
                c.getStatistics.hasNonNullValue) {
              (c.getStatistics.genericGetMin, c.getStatistics.genericGetMax) match {
                case (mn: java.lang.Long, mx: java.lang.Long) =>
                  lo = math.min(lo, mn); hi = math.max(hi, mx); seen = true
                case (mn: java.lang.Integer, mx: java.lang.Integer) =>
                  lo = math.min(lo, mn.toLong); hi = math.max(hi, mx.toLong)
                  seen = true
                case _ => ()
              }
            }
          }
        } finally r.close()
      }
      if (seen) Some((lo, hi)) else None
    } catch { case _: Exception => None }
}
