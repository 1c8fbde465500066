package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col

/** Whole-operator Catalyst integration for the as-of join (SURVEY §4
  * custom work #2 — "a dedicated SparkStrategy if perf demands"):
  * a logical node, a planner strategy, and a sort-merge physical
  * operator. Versus the union+window rewrite (ops.AsofJoin), this
  * needs no union of mismatched schemas, no window state, and exactly
  * one pass per partition: EnsureRequirements hash-partitions both
  * sides on the keys and sorts by (keys, time); the exec then walks
  * each co-partition with a two-pointer merge carrying the last
  * right-side row per key.
  */
case class AsofJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    rightTie: Expression)
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinNode(l, r, lk, rk, lt, rt, tie) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tie) :: Nil
    case _ => Nil
  }
}

/** Sort-merge as-of: children arrive hash-clustered on the join keys
  * and sorted by (keys, time asc). Each left row is matched to the
  * most recent right row with the same key and time ≤ left time, or
  * nulls when none exists. Time expressions must be long-backed
  * (LongType / TimestampType).
  */
case class AsofJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    rightTie: Expression)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(leftKeys), ClusteredDistribution(rightKeys))

  // right side additionally ordered by the tie-break column, so rows
  // tied on (key, time) are consumed in a deterministic order and the
  // carried match is always the one with the LARGEST tie value —
  // matching ops.AsofJoin.lastEarlier's rightTie semantics. The tie
  // sort must be NULLS LAST explicitly: lastEarlier orders __tie
  // asc_nulls_last and carries the final row, so a null-tie row tied
  // on (key, time) must ALSO be consumed last here — Ascending's
  // default NullsFirst would make the two "identical semantics"
  // implementations return different matches on null ties
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)) :+
      SortOrder(rightTie, Ascending, NullsLast, Seq.empty))

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    val allOut = output
    val keyTypes = lKeys.map(_.dataType)

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rOut)
      val ordering = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val resultProj = UnsafeProjection.create(allOut, allOut)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)
      val rBuf = rIter.buffered

      var lastMatch: InternalRow = null
      var lastMatchKey: InternalRow = null

      lIter.map { l =>
        val lk = lKeyProj(l)
        val ltRow = lTimeProj(l)
        // a NULL left time has no position on the timeline: nothing is
        // at-or-before it, so it matches nothing (getLong on a null
        // slot would read 0 and silently join at epoch 0)
        val ltNull = ltRow.isNullAt(0)
        val lt = if (ltNull) Long.MinValue else ltRow.getLong(0)
        var advancing = true
        while (advancing && rBuf.hasNext) {
          val rk = rKeyProj(rBuf.head)
          val c = ordering.compare(rk, lk)
          if (c < 0) {
            rBuf.next()
            lastMatch = null
            lastMatchKey = null
          } else if (c == 0) {
            val rtRow = rTimeProj(rBuf.head)
            if (rtRow.isNullAt(0)) {
              // timeless right rows sort first in the run; consume and
              // discard — they can never be an at-or-before match
              // (ops.AsofJoin.lastEarlier filters them identically)
              rBuf.next()
              ()
            } else if (!ltNull && rtRow.getLong(0) <= lt) {
              val r = rBuf.next()
              lastMatch = r.copy()
              lastMatchKey = rKeyProj(r).copy()
            } else advancing = false
          } else advancing = false
        }
        val matched =
          if (!ltNull && lastMatchKey != null &&
              ordering.compare(lastMatchKey, lk) == 0) lastMatch
          else nullRight
        resultProj(joined(l, matched))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}

/** Public API: `lastEarlierMerge(left, right, keys, lt, rt)` — same
  * semantics as ops.AsofJoin.lastEarlier (right columns prefixed
  * `r_`), planned through the custom strategy.
  */
object AsofJoinPhysical {

  def enable(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy

  def lastEarlierMerge(left: DataFrame, right: DataFrame, keys: Seq[String],
                       leftTime: String, rightTime: String,
                       rightTie: String): DataFrame = {
    val spark = left.sparkSession
    enable(spark)
    // fresh attribute ids on the right side (self-join safety) + r_ prefix
    val r2 = right.select(right.columns.map(c => col(c).as(s"r_$c")).toIndexedSeq: _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = r2.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        sys.error(s"column $name not found in ${plan.output.map(_.name)}"))
    // the exec reads time slots with getLong: only 8-byte-backed types
    // are sound (an int/date-backed column would zero-extend negatives
    // into garbage longs and match silently wrong rows)
    def timeAttr(plan: LogicalPlan, name: String): Attribute = {
      val a = attr(plan, name)
      require(a.dataType == org.apache.spark.sql.types.LongType ||
        a.dataType == org.apache.spark.sql.types.TimestampType ||
        a.dataType == org.apache.spark.sql.types.TimestampNTZType,
        s"as-of merge time column $name must be long-backed " +
          s"(LONG/TIMESTAMP), got ${a.dataType} — cast it explicitly")
      a
    }
    val node = AsofJoinNode(
      lPlan, rPlan,
      keys.map(attr(lPlan, _)), keys.map(k => attr(rPlan, s"r_$k")),
      timeAttr(lPlan, leftTime), timeAttr(rPlan, s"r_$rightTime"),
      attr(rPlan, s"r_$rightTie"))
    GraftSqlBridge.ofRows(spark, node)
  }
}
