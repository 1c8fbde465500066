package graft.queries

import graft.SparkSpec

/** j1c_matchup_store — the production matchup shape as a gate: pairs
  * written UNORDERED into a results-store execution partition and read
  * back path-addressed (the /domsmatchup contract), folded into an
  * order-insensitive bucket summary the DuckDB oracle reproduces.
  */
class MatchupStoreGateSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def gate() =
    graft.SparkEntry.queries("j1c_matchup_store")(spark, dir)

  test("bucket counts fold back to the exact admitted-pair total") {
    import org.apache.spark.sql.functions._
    val summed = gate().agg(sum(col("n_pairs"))).head.getLong(0)
    val direct = JoinQueries.j1Pairs(spark, dir).count()
    assert(direct > 0, "no admitted pairs at sf0.001 — fixture drift")
    assert(summed === direct,
      s"store round-trip lost/duplicated pairs: $summed vs $direct")
  }

  test("re-invocation rewipes the scratch store and reproduces the summary") {
    val a = gate().collect().map(_.toSeq).toSeq
    val b = gate().collect().map(_.toSeq).toSeq
    assert(a === b, "store-backed summary not reproducible across invocations")
    // cleanup actually held: the scratch root converges to exactly ONE
    // execution after a run (a 100× sweep's reps must not stack
    // multi-GB pair executions). The previous execution is deleted on
    // a background daemon thread — off the gate's timed path — so poll
    // briefly instead of asserting an instant.
    val root = new java.io.File(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_j1c_store")
    def execs() = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("execution_id="))
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    while (execs().length != 1 && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(execs().length === 1,
      s"scratch root holds ${execs().length} executions — " +
        "background rewipe broken")
  }

  test("the summary never leaks the per-run execution id") {
    // the id is a fresh UUID per invocation; if it reached the output
    // schema the oracle hash would flap run-to-run
    assert(!gate().columns.contains("execution_id"))
  }
}
