package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every registered query at
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. A full untimed pass
  * over every query runs first, so the timed pass measures
  * steady-state execution rather than each plan's one-time
  * codegen/JIT compilation (this warmup roughly doubles wall time).
  */
object Bench {

  /** Rep-spread self-check predicate: two reps of the same plan on the
    * same data differing by >3× means at least one was contention-hit,
    * so the gate earns one extra timed execution. The 0.2 s floor
    * keeps sub-noise gates (where a 0.01 s vs 0.04 s scheduler wobble
    * is a 4× "spread") from triggering re-runs that measure nothing.
    */
  private[graft] def needsRerun(secs: Seq[Double]): Boolean =
    secs.size > 1 && secs.max > 0.2 &&
      secs.max / math.max(secs.min, 1e-9) > 3.0

  /** A rep is probe-CLEAN when its ride-along mini-probe read at most
    * 2× the run's LOWER-QUARTILE probe on BOTH axes — i.e. the host
    * was near its quietest-observed state when the rep ran. The
    * reference comes from the run's own probes (not a nominal
    * constant), so a uniformly slow host doesn't flag everything —
    * uniform slowdown is what the bracketing probes + normalization
    * already account for. Lower quartile, not median: a storm covering
    * over half the window would drag the MEDIAN up to the storm level
    * and classify storm reps as clean (the exact gap this check
    * exists to close); p25 keeps the reference anchored to the quiet
    * minority as long as a quarter of the probes saw quiet, while
    * still tolerating a single anomalously fast sample the way a raw
    * min would not.
    */
  private[graft] def repClean(cpu: Double, mem: Double,
                              refCpu: Double, refMem: Double): Boolean =
    cpu <= 2.0 * refCpu && mem <= 2.0 * refMem

  /** The r12 adjudication gap: the spread rule (>3×) misses a gate
    * whose reps were BOTH contended about equally (a12b in r12: reps
    * 4.99/12.5 s, both probes elevated, spread 2.5× — committed an
    * inflated min with no marker). A gate with NO probe-clean rep
    * earns one extra timed execution even when spread is small; the
    * 0.2 s floor matches needsRerun (a sub-noise committed min isn't
    * worth another run). Requires real probe data (rides-off runs
    * carry zeros) and a positive reference quartile on both axes.
    *
    * r14 calibration: the rerun additionally requires the reps to
    * actually DISAGREE (spread > 1.25×). The rerun's sole purpose is
    * a better committed min; when every rep already lands within a
    * quarter of the fastest, a third execution cannot improve the number
    * and the extra run only measures the same (possibly self-loaded)
    * state again — the r13 closing window burned 45 such executions,
    * most of them heavy gates whose own GC/background tail elevated
    * their ride-along probes relative to the quiet quartile set by
    * light gates. (The elevated-probe CONTENDED marker is independent
    * of this predicate and still lands on tight-agreement gates.)
    * The disagreement requirement only applies when there ARE two
    * reps to disagree: a SPARK_GRAFT_REPS=1 run has nothing to agree
    * with, and a single probe-elevated rep is exactly the case where
    * one extra execution can recover a clean min.
    */
  private[graft] def needsProbeRerun(secs: Seq[Double],
                                     probes: Seq[(Double, Double)],
                                     refCpu: Double, refMem: Double): Boolean =
    secs.nonEmpty && secs.min > 0.2 && refCpu > 0 && refMem > 0 &&
      (secs.size == 1 ||
        secs.max / math.max(secs.min, 1e-9) > 1.25) &&
      probes.nonEmpty &&
      probes.forall(p => !repClean(p._1, p._2, refCpu, refMem))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // SparkTuning: measured, plan-neutral optimizer-rule exclusions
    // (r15) — see graft.SparkTuning for the selection rules + proof
    val spark = SparkTuning.tuned(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Materialize the query's OWN physical plan (every output row, in
    // output order) rather than df.count(): under a count-aggregate
    // Catalyst legitimately deletes final sorts, prunes every column,
    // and eliminates cardinality-preserving outer joins — so count()
    // would time a *different, emptier* plan than the one the
    // correctness gate runs.
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.queryExecution.toRdd.count()

    // dev-only probe filters (both unset in driver runs → all queries):
    // SKIP excludes gates, ONLY restricts to a comma-separated subset
    // (the 100x sweep times just the slowest gates)
    val skip = sys.env.get("SPARK_GRAFT_SKIP")
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty[String])
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.filter { case (k, _) =>
      !skip(k) && only.forall(_.contains(k))
    }

    // Host calibration (fixed-work CPU + memory-bandwidth probes, see
    // tools.HostCal):
    // measured BEFORE the warmup and again AFTER the timed pass so
    // host drift inside the bench window (r10's adjudicated failure
    // mode) is visible as pre≠post; the normalized total divides by
    // the mean multi-thread probe time, making round-over-round
    // totals mechanically comparable on a shared host. Skipped (zeros)
    // under the dev-only SKIP/ONLY probe filters unless SPARK_GRAFT_CAL=1
    // opts in (a single-gate probe must not pay ~6 s of fixed-work burn
    // per invocation by default, but a round-over-round 100x sweep
    // WANTS the normalized total).
    val devProbe = skip.nonEmpty || only.nonEmpty
    // Ride-along mini-probes now run in SKIP/ONLY dev mode too
    // (SPARK_GRAFT_RIDE=0 disables): the r13 100x sweep ran in ONLY
    // mode with probes off by design, and the e_semantic_dedup_auto
    // 42→62→94 s three-round trend could not be adjudicated as host
    // vs code — exactly the gap the per-rep probe context closes. The
    // ~0.1 s/exec cost is noise against 100x gate times. The HEAVY
    // bracketing probes (~6 s of fixed-work burn per invocation) stay
    // off in dev mode unless SPARK_GRAFT_CAL=1 asks for normalized
    // round-over-round sweep totals.
    val rideOn = sys.env.getOrElse("SPARK_GRAFT_RIDE", "1") != "0"
    val calOn = !devProbe || sys.env.get("SPARK_GRAFT_CAL").contains("1")
    val calThreads = cpus.toInt
    val (calSinglePre, calMultiPre) =
      if (!calOn) (0.0, 0.0) else graft.tools.HostCal.probe(calThreads)
    // memory-bandwidth twin: output-materialization-bound gates scale
    // with THIS axis, not the CPU one (r11: 2.0× on j1/j7 while the
    // CPU probe read 1.2× — a hypervisor neighbor can degrade DRAM
    // bandwidth independently of CPU)
    val (calMemSinglePre, calMemMultiPre) =
      if (!calOn) (0.0, 0.0) else graft.tools.HostCal.probeMem(calThreads)

    // Warmup: one untimed pass over EVERY query. Each query's
    // WholeStageCodegen unit Janino-compiles on first execution (1-3 s
    // for the larger plans) — a one-time JVM cost, not execution. The
    // timed pass below measures steady-state throughput, matching how
    // the baseline stack was measured (long-running webapp, caches
    // pre-warmed before the workshop; BASELINE.md).
    selected.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try run(fn(spark, sfDir))
      catch { case _: Throwable => () }
      // progress on stderr: a 100x sweep can run hours on a contended
      // host, and a silent harness makes a slow gate indistinguishable
      // from a hung one (learned from a 3 h opaque replica-dir run)
      System.err.println(
        f"[bench] warmup $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    // Per-query time = MIN over SPARK_GRAFT_REPS (default 2) timed
    // executions of the query's full physical plan. A single pass on a
    // shared host confounds the plan's cost with whichever GC pause or
    // noisy neighbor it collides with (observed 3-10× spikes on single
    // queries, SCALING.md); the min over two steady-state runs is the
    // standard noise-robust estimator and every rep still materializes
    // every output row in output order.
    //
    // Structure (r12): the reps run as FULL PASSES over the suite with
    // alternating direction (pass 0 A→Z, pass 1 Z→A), not as
    // back-to-back reps of each gate — one gate's reps then sit far
    // apart in wall time, so a transient contention burst cannot hit
    // both reps of a gate, and (because the burst meets each pass at a
    // DIFFERENT alphabetical position) cannot masquerade as a
    // contiguous gate-family regression, the r11 adjudication problem.
    // A ~0.1 s saturated CPU+mem mini-probe (HostCal.miniProbe) runs
    // immediately before each timed execution and rides into
    // BENCH_FULL.json as that measurement's host context: a slow gate
    // time next to an elevated probe is host noise, next to a nominal
    // probe it is code.
    val reps = sys.env.get("SPARK_GRAFT_REPS").map(_.toInt).getOrElse(2).max(1)
    final case class Rep(sec: Double, cpuProbe: Double, memProbe: Double)
    def timedRep(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Rep = {
      // settle pause before the probe: the mini-probe otherwise runs
      // back-to-back with the PREVIOUS gate's execution, whose decaying
      // tail (async cleanup, scheduler backlog, GC catch-up) reads as
      // an elevated probe and gets misattributed to host contention —
      // the r13 closing window flagged 45/128 gates that way. 120 ms is
      // untimed wall (outside the gate's t0) and lets a self-inflicted
      // transient decay while a genuine host storm persists through it.
      val (cp, mp) =
        if (!rideOn) (0.0, 0.0)
        else {
          Thread.sleep(120)
          graft.tools.HostCal.miniProbe(calThreads)
        }
      val t0 = System.nanoTime()
      // a failed query must be VISIBLE (stderr — stdout carries only
      // the JSON line), or its near-zero time reads as a fast success
      try { run(fn(spark, sfDir)) }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      Rep((System.nanoTime() - t0) / 1e9, cp, mp)
    }
    val ordered = selected.toSeq.sortBy(_._1)
    val byGate = scala.collection.mutable.Map.empty[String, Vector[Rep]]
      .withDefaultValue(Vector.empty)
    for (p <- 0 until reps) {
      val passOrder = if (p % 2 == 0) ordered else ordered.reverse
      passOrder.foreach { case (name, fn) =>
        val r = timedRep(name, fn)
        byGate(name) = byGate(name) :+ r
        // per-execution progress (stderr): gate second + its ride-along
        // probe context, live — the artifact's per-gate attribution,
        // readable while the suite still runs
        System.err.println(f"[bench] pass=$p $name ${r.sec}%.2f s " +
          f"(probe cpu ${r.cpuProbe}%.3f mem ${r.memProbe}%.3f)")
      }
    }
    // Lower quartile of the ride-along probes across the whole run:
    // the reference point for "this rep ran on a quiet host" (see
    // repClean for why p25 and not the median). Computed over the MAIN
    // passes only (reruns below would bias it toward whatever state
    // triggered them).
    def p25Of(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.isEmpty) 0.0 else s(s.size / 4)
    }
    val refCpu = p25Of(byGate.values.flatten.map(_.cpuProbe).filter(_ > 0).toSeq)
    val refMem = p25Of(byGate.values.flatten.map(_.memProbe).filter(_ > 0).toSeq)
    // Rep-spread self-check (see needsRerun) PLUS probe-elevation
    // check (see needsProbeRerun): a flagged gate runs ONE more timed
    // execution (with its own probe context) so the committed min is a
    // real steady-state, not the less-bad of two noisy samples. A gate
    // that STILL has no probe-clean rep after the rerun commits with
    // `contended: true` — the artifact itself then says its min is an
    // upper bound taken under load, not a clean measurement.
    case class GateDetail(name: String, sec: Double, reps: Vector[Rep],
                          rerun: Boolean, contended: Boolean)
    val detail = ordered.map { case (name, fn) =>
      val rs0 = byGate(name)
      val secs0 = rs0.map(_.sec)
      val spread = secs0.max / math.max(secs0.min, 1e-9)
      val spreadRerun = needsRerun(secs0)
      val probeRerun = !spreadRerun && needsProbeRerun(secs0,
        rs0.map(r => (r.cpuProbe, r.memProbe)), refCpu, refMem)
      val rerun = spreadRerun || probeRerun
      val rs = if (rerun) rs0 :+ timedRep(name, fn) else rs0
      if (spreadRerun)
        System.err.println(f"[bench] $name rep spread ${spread}%.1fx " +
          f"(${secs0.min}%.2f..${secs0.max}%.2f s) — re-ran once, " +
          f"committed ${rs.map(_.sec).min}%.2f s")
      if (probeRerun)
        System.err.println(f"[bench] $name all reps probe-elevated " +
          f"(cpu ${rs0.map(_.cpuProbe).min}%.3f.. mem ${rs0.map(_.memProbe).min}%.3f.. " +
          f"vs p25 ${refCpu}%.3f/${refMem}%.3f) — re-ran once, " +
          f"committed ${rs.map(_.sec).min}%.2f s")
      val contended = refCpu > 0 && refMem > 0 &&
        rs.map(_.sec).min > 0.2 &&
        rs.forall(r => !repClean(r.cpuProbe, r.memProbe, refCpu, refMem))
      if (contended)
        System.err.println(s"[bench] $name committed CONTENDED " +
          "(no probe-clean rep even after rerun — min is an under-load " +
          "upper bound)")
      GateDetail(name, rs.map(_.sec).min, rs, rerun, contended)
    }
    val results = detail.map(d => d.name -> d.sec)
    if (rideOn) graft.tools.HostCal.releaseMiniBlock()
    val (calSinglePost, calMultiPost) =
      if (!calOn) (0.0, 0.0) else graft.tools.HostCal.probe(calThreads)
    val (calMemSinglePost, calMemMultiPost) =
      if (!calOn) (0.0, 0.0) else graft.tools.HostCal.probeMem(calThreads)
    // 4-decimal values (0.1 ms resolution — far below run-to-run noise)
    // keep the one-line JSON well inside the driver's capture window;
    // full-precision doubles overflowed it in earlier rounds and the
    // round's numbers parsed as null.
    def fmt(v: Double): String = "%.4f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    // host-independent total: suite seconds per multi-thread probe
    // second ("probe-units"); comparable across rounds because the
    // probe's WORK is a fixed constant (HostCal.ItersPerThread)
    val calMulti = (calMultiPre + calMultiPost) / 2
    val totalNorm = if (calMulti > 0) total / calMulti else 0.0
    val calJson =
      s"""{"single_pre":${fmt(calSinglePre)},"multi_pre":${fmt(calMultiPre)},""" +
        s""""single_post":${fmt(calSinglePost)},"multi_post":${fmt(calMultiPost)},""" +
        s""""mem_single_pre":${fmt(calMemSinglePre)},"mem_multi_pre":${fmt(calMemMultiPre)},""" +
        s""""mem_single_post":${fmt(calMemSinglePost)},"mem_multi_post":${fmt(calMemMultiPost)},""" +
        s""""threads":$calThreads,"iters_per_thread":${graft.tools.HostCal.ItersPerThread},""" +
        s""""mem_longs":${graft.tools.HostCal.MemLongs},"mem_passes":${graft.tools.HostCal.MemPassesPerThread}}"""
    // per-gate detail: every rep's seconds plus the CPU/mem mini-probe
    // seconds sampled immediately before it — the ride-along context
    // the bracketing probes cannot provide (full map in
    // BENCH_FULL.json only; the stdout lines stay bounded)
    val gatesJson = detail.map { d =>
      "\"" + d.name + "\":{\"sec\":" + fmt(d.sec) +
        ",\"reps\":[" + d.reps.map(r => fmt(r.sec)).mkString(",") + "]" +
        ",\"cpu_probe\":[" + d.reps.map(r => fmt(r.cpuProbe)).mkString(",") + "]" +
        ",\"mem_probe\":[" + d.reps.map(r => fmt(r.memProbe)).mkString(",") + "]" +
        ",\"rerun\":" + d.rerun + ",\"contended\":" + d.contended + "}"
    }.mkString("{", ",", "}")
    // compact ride summary (stdout-safe): a clean window reads
    // cpu_max ≈ cpu_mean ≈ the nominal mini-probe time; a burst shows
    // as cpu_max/mem_max spiking, and WHICH gates it hit is in the
    // full map's per-gate arrays
    val rideCpu = detail.flatMap(_.reps.map(_.cpuProbe)).filter(_ > 0)
    val rideMem = detail.flatMap(_.reps.map(_.memProbe)).filter(_ > 0)
    def meanOf(xs: Seq[Double]): Double = if (xs.isEmpty) 0.0 else xs.sum / xs.size
    // flag-rate self-diagnosis: re-runs exist to catch the EXCEPTION
    // (a contention burst hitting one gate), so a window where over a
    // third of gates flag is more plausibly a miscalibrated criterion
    // (or a storm covering most of the window — either way the
    // committed numbers deserve suspicion) than 40 independent bursts.
    // The artifact says so itself instead of leaving the rate to be
    // re-derived from per-gate arrays each round.
    val rerunRate =
      if (detail.isEmpty) 0.0 else detail.count(_.rerun).toDouble / detail.size
    val rideJson =
      s"""{"cpu_mean":${fmt(meanOf(rideCpu))},"cpu_max":${fmt(if (rideCpu.isEmpty) 0.0 else rideCpu.max)},""" +
        s""""mem_mean":${fmt(meanOf(rideMem))},"mem_max":${fmt(if (rideMem.isEmpty) 0.0 else rideMem.max)},""" +
        s""""cpu_p25":${fmt(refCpu)},"mem_p25":${fmt(refMem)},""" +
        s""""n":${rideCpu.size},"flagged":${detail.count(_.rerun)},""" +
        s""""rerun_rate":${fmt(rerunRate)},""" +
        s""""calibration_suspect":${rerunRate > 1.0 / 3},""" +
        s""""contended_gates":${detail.count(_.contended)},""" +
        s""""mini_iters":${graft.tools.HostCal.MiniItersPerThread},""" +
        s""""mini_mem_longs":${graft.tools.HostCal.MiniMemLongs}}"""
    // pinned-fixture verdicts (the 5 rows-only gates the driver can
    // only row-count): computed at the pin SF, UNTIMED, so value drift
    // in sketch/eigen/t-CDF algebra shows up in the per-round bench
    // artifact instead of only inside `sbt test`. Skipped under the
    // dev-only SKIP/ONLY probe filters — a single-gate 100x probe
    // must not pay 4 sf0.01 evaluations per invocation.
    val pinned =
      if (skip.isEmpty && only.isEmpty &&
          new java.io.File(graft.tools.FixturePin.pinSfDir).isDirectory)
        graft.tools.FixturePin.verdicts(spark)
      else Nil
    // a failed pinned gate carries its ERROR MESSAGE in the md5 slot,
    // and Spark error text routinely contains quotes/newlines —
    // spliced raw it would corrupt the one artifact line the driver
    // tail-parses, hence the shared escaper
    import graft.tools.Jsons.{quote => jq}
    def pinnedJson(full: Boolean) = pinned.map { case (g, rows, md5, ok) =>
      val m = if (full) md5 else md5.take(40)
      jq(g) + ":{\"rows\":" + rows + ",\"md5\":" + jq(m) +
        ",\"ok\":" + ok + "}"
    }.mkString("{", ",", "}")
    val json =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,""" +
        s""""calibration":$calJson,"ride":$rideJson,""" +
        s""""value_normalized":${fmt(totalNorm)},"sf":"$sfDir"}"""
    // durable full copy for round-over-round comparison, independent
    // of any stdout capture limit: the driver keeps only a bounded
    // stdout tail (2000 chars as of r7) which the ~2.8 KB 114-gate
    // map can never fit, so the full map + pinned verdicts live in a
    // TRACKED repo-root file the driver's round commit sweeps in
    val fullJson =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n":${results.size},""" +
        s""""queries":$qs,"gates":$gatesJson,"ride":$rideJson,""" +
        s""""pinned":${pinnedJson(full = true)},""" +
        s""""calibration":$calJson,"value_normalized":${fmt(totalNorm)},"sf":"$sfDir"}"""
    val out = java.nio.file.Paths.get("target", "bench.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out, fullJson.getBytes("UTF-8"))
    // the TRACKED artifact records the full-suite run at the driver's
    // exact SF ONLY: a dev probe (SKIP/ONLY filters), a replica-dir
    // sweep, or a full run at another /root/testdata SF must never
    // clobber the committed sf0.1 record — an ONLY=1-gate probe once
    // rewrote it to a 1-query map, and a prefix-only guard would have
    // let an sf0.001 run sweep wrong-SF timings in silently. The
    // compare is on the CANONICAL path (symlinks/trailing slashes
    // resolved) so a spelled-differently sf0.1 dir still updates the
    // record, and a skipped write says so on stderr instead of
    // silently leaving a stale artifact.
    val canonicalSf =
      try java.nio.file.Paths.get(sfDir).toRealPath().toString
      catch { case _: Exception => sfDir }
    if (skip.isEmpty && only.isEmpty && canonicalSf == "/root/testdata/sf0.1")
      java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_FULL.json"),
        fullJson.getBytes("UTF-8"))
    else
      System.err.println(s"[bench] BENCH_FULL.json not refreshed " +
        s"(sf=$canonicalSf, skip=${skip.size}, only=${only.map(_.size)})")
    // human summary on stderr (stdout carries ONLY the JSON lines)
    System.err.println(f"[bench] calibration single ${calSinglePre}%.2f/${calSinglePost}%.2f s, " +
      f"multi($calThreads) ${calMultiPre}%.2f/${calMultiPost}%.2f s, " +
      f"mem ${calMemSinglePre}%.2f/${calMemSinglePost}%.2f s, " +
      f"mem-multi ${calMemMultiPre}%.2f/${calMemMultiPost}%.2f s (pre/post), " +
      f"normalized total ${totalNorm}%.2f probe-units")
    System.err.println(f"[bench] ride-along probes: cpu mean ${meanOf(rideCpu)}%.3f / " +
      f"max ${if (rideCpu.isEmpty) 0.0 else rideCpu.max}%.3f s, " +
      f"mem mean ${meanOf(rideMem)}%.3f / max ${if (rideMem.isEmpty) 0.0 else rideMem.max}%.3f s " +
      s"(${rideCpu.size} samples), re-run gates: ${detail.count(_.rerun)}, " +
      s"contended commits: ${detail.count(_.contended)}")
    System.err.println(f"[bench] ${results.size} queries, total ${total}%.1f s, " +
      s"slowest: ${results.sortBy(-_._2).take(5).map { case (k, v) => f"$k=${v}%.2f" }.mkString(", ")}")
    println(json)
    // compact FINAL line: the driver parses the last JSON line inside
    // its bounded stdout tail, and the full per-query line above can
    // overflow it (BENCH_r04 parsed as null that way) — the tail must
    // always end with a record small enough to survive any truncation.
    // Pinned verdicts ride here with values capped at 40 chars (a
    // full md5 fits; error text truncates — the rest is in
    // BENCH_FULL.json).
    val slowest = results.sortBy(-_._2).take(5)
      .map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n":${results.size},""" +
      s""""slowest":$slowest,"pinned":${pinnedJson(full = false)},""" +
      s""""calibration":$calJson,"ride":$rideJson,"value_normalized":${fmt(totalNorm)},""" +
      s""""full_map":"BENCH_FULL.json","sf":"$sfDir"}""")
    spark.stop()
  }
}
