package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BucketedSort must reproduce orderBy's total order EXACTLY — it
  * backs oracle-hashed gates (j1, j7) where any row out of place is a
  * driver hash mismatch — while planning a hash exchange instead of a
  * sampled range exchange.
  */
class BucketedSortSpec extends SparkSpec {

  test("route values land bucket i in partition i for every n") {
    // end-to-end against Spark's own exchange, not our arithmetic: a
    // one-column frame of the n route sentinels, hash-repartitioned by
    // Spark, must place sentinel i in partition i
    for (n <- Seq(1, 2, 3, 4, 7, 16, 32, 61)) {
      val route = BucketedSort.routeValues(n)
      import spark.implicits._
      val placed = route.toSeq.toDF("v").repartition(n, col("v"))
        .select(spark_partition_id().as("p"), col("v"))
        .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
      assert(placed.size === n, s"n=$n lost sentinels")
      route.zipWithIndex.foreach { case (v, i) =>
        assert(placed(i) === v, s"n=$n: partition $i holds ${placed(i)}, not $v")
      }
    }
  }

  test("byKeySpanOf keeps the total order when the span relation is unusable") {
    import spark.implicits._
    val df = Seq((3L, 1), (1L, 2), (2L, 3), (1L, 1)).toDF("k", "t")
    // empty bounding relation
    val emptySpan = Seq.empty[Long].toDF("sk")
    val a = BucketedSort.byKeySpanOf(df, col("k"), emptySpan, col("sk"), 4, col("t"))
      .select("k", "t").collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    // all-NULL bounding key
    val nullSpan = Seq[java.lang.Long](null, null).toDF("sk")
    val b = BucketedSort.byKeySpanOf(df, col("k"), nullSpan, col("sk"), 4, col("t"))
      .select("k", "t").collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    val expect = Seq((1L, 1), (1L, 2), (2L, 3), (3L, 1))
    assert(a === expect, "empty span relation must still yield the total order")
    assert(b === expect, "all-NULL span key must still yield the total order")
  }

  test("total order matches orderBy exactly, including ties and clamps") {
    import spark.implicits._
    val rnd = new scala.util.Random(8L)
    // keys deliberately wider than the declared span (clamping), with
    // heavy ties so the tie-break column carries the order, plus
    // FAR-out-of-span extremes: (key - lo) * n on Long.MaxValue would
    // wrap negative and silently misroute if clamping ran after the
    // arithmetic instead of before
    val rows = Seq.tabulate(5000)(i =>
      (rnd.nextInt(400).toLong - 50, rnd.nextInt(20), i)) ++
      Seq((Long.MaxValue, 0, 5000), (Long.MinValue, 0, 5001),
        (Long.MaxValue - 1, 3, 5002))
    val df = rows.toDF("k", "tie", "payload")
    val expected = df.orderBy("k", "tie", "payload").collect().toSeq
    for (n <- Seq(1, 3, 8, 32)) {
      val got = BucketedSort.byUniformBuckets(df, col("k"), 0L, 299L, n,
        col("tie"), col("payload")).collect().toSeq
      assert(got === expected, s"numParts=$n diverged from orderBy")
    }
  }

  test("null keys sort first globally, matching orderBy") {
    import spark.implicits._
    val rows: Seq[(Option[Long], Int)] =
      Seq((Some(7L), 1), (None, 2), (Some(1L), 3), (None, 1), (Some(99L), 0))
    val df = rows.toDF("k", "tie")
    val got = BucketedSort.byUniformBuckets(df, col("k"), 0L, 99L, 4, col("tie"))
      .collect().toSeq
    assert(got === df.orderBy("k", "tie").collect().toSeq)
  }

  test("byKeySpanOf takes its bounds from the span relation; empty span passes through") {
    import spark.implicits._
    val df = Seq((5L, "a"), (1L, "b"), (9L, "c"), (1L, "a")).toDF("k", "t")
    val span = Seq(1L, 9L).toDF("sk")
    val got = BucketedSort.byKeySpanOf(df, col("k"), span, col("sk"), 4, col("t"))
      .collect().toSeq
    assert(got === df.orderBy("k", "t").collect().toSeq)
    val empty = span.where(lit(false))
    // nothing to bound: the frame passes through un-reordered
    assert(BucketedSort.byKeySpanOf(df, col("k"), empty, col("sk"), 4)
      .count() === 4)
  }

  test("plans one hash exchange and no range exchange") {
    import spark.implicits._
    val df = Seq.tabulate(100)(i => (i.toLong, i)).toDF("k", "v")
    val plan = BucketedSort.byUniformBuckets(df, col("k"), 0L, 99L, 4, col("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("rangepartitioning"), plan)
    assert(plan.contains("hashpartitioning"), plan)
  }
}
