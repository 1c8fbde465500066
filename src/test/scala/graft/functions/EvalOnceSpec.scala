package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EvalOnceSpec extends SparkSpec {

  test("eval_once is value-transparent (same rows as the bare expression)") {
    import spark.implicits._
    val df = (0 until 500).map(i => (i.toLong, s"""{"k": ${i % 80}}"""))
      .toDF("id", "props")
    def rows(wrap: Boolean) = {
      val k0 = get_json_object(col("props"), "$.k").cast("long")
      val k = if (wrap) EvalOnce.once(k0) else k0
      df.select(col("id"), k.as("k"))
        .where(col("k").between(10, 50))
        .orderBy("id")
        .collect().toSeq
    }
    val bare = rows(wrap = false)
    val wrapped = rows(wrap = true)
    assert(wrapped === bare)
    assert(bare.nonEmpty)
  }

  test("eval_once blocks pushdown-duplication: one occurrence in the " +
    "physical plan, filter stays above the defining projection") {
    import spark.implicits._
    val df = (0 until 100).map(i => (i.toLong, s"""{"k": ${i % 80}}"""))
      .toDF("id", "props").repartition(4)
    val plan = df.select(col("id"),
        EvalOnce.once(get_json_object(col("props"), "$.k").cast("long")).as("k"))
      .where(col("k").between(10, 50))
      .queryExecution.executedPlan.toString
    // bare form: pushdown substitutes the parse into the filter →
    // 3 occurrences (two in the between-filter, one in the project);
    // barriered: exactly one
    assert("get_json_object".r.findAllIn(plan).size === 1, plan)
  }

  test("eval_once null/codegen semantics match the child") {
    import spark.implicits._
    val df = Seq((1L, """{"k": 5}"""), (2L, null), (3L, """{"x": 1}"""))
      .toDF("id", "props")
    val k0 = get_json_object(col("props"), "$.k").cast("long")
    val bare = df.select(col("id"), k0.as("k")).orderBy("id").collect().toSeq
    val wrapped = df.select(col("id"), EvalOnce.once(k0).as("k"))
      .orderBy("id").collect().toSeq
    assert(wrapped === bare)
  }
}
