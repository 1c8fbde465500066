package graft.plans

import graft.SparkSpec
import graft.ops.AsofJoin
import org.apache.spark.sql.functions._

class AsofJoinPhysicalSpec extends SparkSpec {

  test("custom strategy plans AsofJoinExec and matches expected semantics") {
    import spark.implicits._
    val left = Seq((1L, 100L, "p1"), (1L, 50L, "p2"), (2L, 10L, "p3"))
      .toDF("k", "t", "pid")
    val right = Seq((1L, 90L, "r1"), (1L, 100L, "r2"), (1L, 110L, "r3"),
      (2L, 20L, "r4")).toDF("k", "t", "rid")
    val out = AsofJoinPhysical.lastEarlierMerge(left, right, Seq("k"), "t", "t", rightTie = "rid")
    assert(out.queryExecution.executedPlan.toString.contains("AsofJoin"),
      out.queryExecution.executedPlan.toString)
    val m = out.select("pid", "r_rid").as[(String, String)].collect().toMap
    assert(m("p1") === "r2") // at-or-before includes equal time
    assert(m("p2") === null)
    assert(m("p3") === null)
  }

  test("merge exec agrees with the window implementation on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val left = Seq.tabulate(500)(i =>
      (rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong, i.toLong))
      .toDF("k", "t", "lid")
    val right = Seq.tabulate(500)(i =>
      (rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong, (i + 10000).toLong))
      .toDF("k", "t", "rid")

    val merge = AsofJoinPhysical.lastEarlierMerge(left, right, Seq("k"), "t", "t", rightTie = "rid")
      .select($"lid", $"r_t".as("matched_t"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

    val window = AsofJoin.lastEarlier(left,
        right.select($"k", $"t".as("rt2"), $"rid"),
        Seq("k"), col("t"), col("rt2"), Seq("rt2"), rightTie = "rid")
      .select($"lid", $"matched_rt2")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

    assert(merge.size === 500 && window.size === 500)
    assert(merge === window)
  }

  test("exec handles empty right side and left-only keys") {
    import spark.implicits._
    val left = Seq((1L, 10L, "a"), (9L, 20L, "b")).toDF("k", "t", "pid")
    val right = Seq.empty[(Long, Long, String)].toDF("k", "t", "rid")
    val out = AsofJoinPhysical.lastEarlierMerge(left, right, Seq("k"), "t", "t", rightTie = "rid")
    assert(out.count() === 2)
    assert(out.where(col("r_rid").isNotNull).count() === 0)
  }

  test("NULL times never match (exec agrees with the window form)") {
    import spark.implicits._
    // right (k=1, t=NULL) sorts first in the run and used to read as
    // t=0 via getLong, matching left rows that should get NULLs; a
    // NULL left time likewise has nothing at-or-before it
    val left = Seq((1L, Some(5L), "a"), (1L, None, "b"), (2L, Some(9L), "c"))
      .toDF("k", "t", "pid")
    val right = Seq((1L, None, "rNull"), (1L, Some(7L), "rLate"),
        (2L, Some(3L), "rOk"))
      .toDF("k", "t", "rid")
    val out = AsofJoinPhysical
      .lastEarlierMerge(left, right, Seq("k"), "t", "t", rightTie = "rid")
      .select("pid", "r_rid")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(out === Map("a" -> null, "b" -> null, "c" -> "rOk"))
    // differential vs the union+window form on the same data
    val win = AsofJoin.lastEarlier(left,
        right.select($"k", $"t".as("rt2"), $"rid"),
        Seq("k"), col("t"), col("rt2"), Seq("rid"), rightTie = "rid")
      .select("pid", "matched_rid")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(win === out)
  }

  test("NULL tie rows tied on (key, time): exec agrees with the window form") {
    import spark.implicits._
    // lastEarlier orders __tie asc_nulls_last and carries the LAST row,
    // so a null-tie row tied on (key, time) wins; the exec's required
    // ordering must be NullsLast too (Ascending's default NullsFirst
    // made the two implementations disagree here)
    val left = Seq((1L, 6L, "p")).toDF("k", "t", "pid")
    val right = Seq((1L, 5L, Option.empty[Long], "A"),
      (1L, 5L, Some(3L), "B")).toDF("k", "t", "tie", "rid")

    val merge = AsofJoinPhysical.lastEarlierMerge(
      left, right, Seq("k"), "t", "t", rightTie = "tie")
      .select($"pid", $"r_rid").as[(String, String)].collect().toMap
    val window = graft.ops.AsofJoin.lastEarlier(left,
        right.select($"k", $"t".as("rt2"), $"tie", $"rid"),
        Seq("k"), col("t"), col("rt2"), Seq("rt2", "rid"), rightTie = "tie")
      .select($"pid", $"matched_rid").as[(String, String)].collect().toMap
    assert(window("p") === "A", "window form should carry the null-tie row")
    assert(merge === window)
  }

  test("int/date-backed time columns are rejected loudly") {
    import spark.implicits._
    val left = Seq((1L, 10, "a")).toDF("k", "t", "pid") // t is INT
    val right = Seq((1L, 5, "r")).toDF("k", "t", "rid")
    val e = intercept[IllegalArgumentException] {
      AsofJoinPhysical.lastEarlierMerge(left, right, Seq("k"), "t", "t",
        rightTie = "rid")
    }
    assert(e.getMessage.contains("long-backed"))
  }
}
