package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Inputs to the run tracker: one point of the per-type value signal.
  * `us` is the event time in epoch-µs (the engine's canonical time
  * representation); `ts` carries the same instant as a native timestamp
  * only because streaming watermarks must reference a TimestampType
  * column.
  */
case class SignalEvent(event_type: String, us: Long, event_id: Long,
                       value: Double, ts: java.sql.Timestamp)

/** The open run carried between micro-batches: which side of the
  * threshold the signal is on, when the run started, the last event
  * seen, and the running (count, sum) for the final average.
  */
case class RunState(bucket: Long, startUs: Long, lastUs: Long,
                    n: Long, sum: Double)

/** Full streaming state: the open run, the NOT-YET-ORDERABLE events
  * (event time still ahead of the watermark — a later batch may
  * deliver something earlier, so folding them now would lock in a
  * wrong order), and the watermark through which events have already
  * been folded (arrivals at or before it are beyond-watermark late
  * and dropped, the standard contract).
  */
case class TrackState(open: Option[RunState], pending: Seq[SignalEvent],
                      foldedWmUs: Long)

/** One completed run: a maximal stretch of consecutive events (per
  * event_type, event-time order) on the same side of the threshold.
  */
case class RunOut(event_type: String, bucket: Long, start_us: Long,
                  end_us: Long, n_events: Long, avg_v: Double)

/** Custom-state stream processing via `flatMapGroupsWithState`
  * (SURVEY §2.7): run-length encoding of a thresholded signal — the
  * state-machine shape (reference `processorchain.py`'s per-granule
  * chained handlers hold exactly this kind of running state between
  * callbacks) that neither tumbling nor session windows can express,
  * because a run's boundary depends on the VALUES of neighboring
  * events, not their spacing.
  *
  * The same state function serves both execution modes:
  *  - batch: one invocation per key with the full group; every run is
  *    final, so all are emitted and no state survives (`runsBatch` —
  *    this is the driver-gated form, oracle = gaps-and-islands SQL);
  *  - streaming: invoked per key per micro-batch; events fold only
  *    once the watermark has passed them (not-yet-orderable arrivals
  *    buffer in state, so out-of-order delivery within the allowed
  *    lateness cannot corrupt run boundaries), and the trailing run
  *    stays open in `GroupState` until the event-time timeout —
  *    watermark passing `lastUs + gap` — proves it final, then it is
  *    emitted and the state evicted (`runsStream`). State per key =
  *    one open run + the events inside the watermark-delay horizon —
  *    bounded by lateness × event rate, never by stream length.
  */
object StateTracker {

  /** Fold a (sorted) slice of events into the state machine, emitting
    * every run CLOSED by a threshold crossing inside the slice.
    * Returns the completed runs plus the still-open trailing run (None
    * only when `events` is empty and there was no prior state).
    *
    * `gapUs` applies the streaming gap contract INSIDE the fold: a
    * same-bucket event arriving more than `gapUs` of event time after
    * the run's last event closes the run and starts a new one. Without
    * this, segmentation would depend on HOW the watermark advanced — a
    * catch-up batch whose watermark jumps past both sides of a long
    * silence would merge what gradual advance emits as two runs. Batch
    * callers pass `Long.MaxValue` (batch merges across any silence by
    * contract — it sees the whole history).
    */
  private def advance(key: String, events: Array[SignalEvent],
                      prior: Option[RunState], threshold: Double,
                      gapUs: Long = Long.MaxValue
                     ): (Vector[RunOut], Option[RunState]) = {
    var out = Vector.empty[RunOut]
    var cur = prior.orNull
    for (e <- events) {
      // NaN buckets HIGH to match Spark SQL comparison semantics (SQL
      // orders NaN above every number, so `value >= threshold` is true
      // there) — the JVM fold and the sharded SQL form must segment
      // identically or batch/streaming parity silently breaks on NaN
      val b = if (e.value >= threshold || e.value.isNaN) 1L else 0L
      if (cur == null) cur = RunState(b, e.us, e.us, 1L, e.value)
      else if (cur.bucket == b && e.us - cur.lastUs <= gapUs)
        cur = RunState(b, cur.startUs, e.us, cur.n + 1, cur.sum + e.value)
      else {
        out = out :+ closed(key, cur)
        cur = RunState(b, e.us, e.us, 1L, e.value)
      }
    }
    (out, Option(cur))
  }

  /** Deterministic double: events fold in (us, event_id) order, so the
    * sum — and therefore the rounded average — is reproducible; the
    * +1e-9 keeps round-half ties off the boundary vs the oracle.
    */
  private def closed(key: String, r: RunState): RunOut = {
    val avg = r.sum / r.n + 1e-9
    RunOut(key, r.bucket, r.startUs, r.lastUs, r.n,
      // a NaN-bearing run averages to NaN in the SQL form too
      // (round(NaN) = NaN); BigDecimal would throw on it
      if (avg.isNaN || avg.isInfinite) avg
      else BigDecimal(avg)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  /** Project any relation with (event_type, ts, event_id, value) to the
    * tracker's typed input. Event-time order is (us, event_id): µs
    * ties broken by the unique id, so the fold order is total.
    */
  def signals(df: DataFrame): Dataset[SignalEvent] = {
    val s = df.sparkSession
    import s.implicits._
    df.select(col("event_type"), unix_micros(col("ts")).as("us"),
        col("event_id").cast("long").as("event_id"),
        col("value").cast("double").as("value"), col("ts"))
      .as[SignalEvent]
  }

  /** Batch form (driver-gated): group iterators carry the whole key in
    * arbitrary order, so each group sorts once in memory before the
    * fold. Scale note: a GROUP here is one event_type — if a single
    * key's history outgrows an executor, the caller splits the key by
    * coarse time range first (runs only merge across adjacent splits,
    * a driver-side O(#splits) stitch), same as any holistic
    * per-key operator.
    */
  def runsBatch(events: Dataset[SignalEvent], threshold: Double): Dataset[RunOut] = {
    val s = events.sparkSession
    import s.implicits._
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState[RunState, RunOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, it, state) =>
          val evs = it.toArray.sortBy(e => (e.us, e.event_id))
          val (closedRuns, open) = advance(key, evs, state.getOption, threshold)
          // batch = complete history: the trailing run cannot be
          // extended, so it is final too
          (closedRuns ++ open.map(closed(key, _))).iterator
      }
  }

  /** SATURATING gap deadline: gapUs may legitimately be huge
    * (advance() documents Long.MaxValue as the batch "no gap"
    * sentinel) and lastUs + gapUs would wrap negative, making EVERY
    * open run read as final — one continuous run would then emit as
    * one fragment per micro-batch. The guard only applies when
    * lastUs > 0: with a NEGATIVE lastUs, `Long.MaxValue - lastUs`
    * itself overflows and the comparison would saturate spuriously —
    * the deadline would then never fire for that run; negative +
    * positive cannot overflow, so the plain sum is exact there.
    * (Negative lastUs cannot reach this through [[runsStream]] today —
    * Spark's watermark initializes at 0 ms and drops pre-epoch rows as
    * late before the stateful operator sees them — but the arithmetic
    * must not be the thing that breaks if that ever changes.)
    */
  private[streaming] def gapDeadline(lastUs: Long, gapUs: Long): Long =
    if (lastUs > 0 && gapUs > Long.MaxValue - lastUs) Long.MaxValue
    else lastUs + gapUs

  /** Streaming form: the same fold, made ORDER-CORRECT under
    * out-of-order arrival by buffering. Events fold only once the
    * watermark has passed their event time — anything still ahead of
    * the watermark waits in state (a later micro-batch may deliver an
    * earlier event; folding eagerly would lock in arrival order, which
    * is exactly how a within-lateness event would corrupt run
    * boundaries). Arrivals at or before the already-folded watermark
    * are beyond-lateness and dropped — the standard watermark
    * contract. Pending state is bounded by the watermark delay × event
    * rate, not stream length.
    *
    * Run COMPLETION is the gap contract: the open run is emitted as
    * final once the watermark passes `lastUs + gapUs` — event-time
    * silence longer than the gap closes a run, so a later same-bucket
    * event starts a NEW run. This is the deliberate streaming
    * divergence from [[runsBatch]] (which merges same-bucket runs
    * across any silence — it can see the whole history); the two agree
    * exactly on streams whose intra-run spacing stays within `gapUs`.
    * Without an eviction rule, open-run state would wait forever on
    * keys that simply stopped emitting. Requires a watermark on `ts`.
    */
  def runsStream(events: Dataset[SignalEvent], threshold: Double,
                 gapUs: Long): Dataset[RunOut] = {
    val s = events.sparkSession
    import s.implicits._
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState[TrackState, RunOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key, it, state) =>
          // one code path for data and timeout invocations: fold
          // whatever the watermark has made orderable, emit what the
          // gap has made final, schedule the next wake-up
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val st = state.getOption
            .getOrElse(TrackState(None, Vector.empty, Long.MinValue))
          val incoming = it.filter(_.us > st.foldedWmUs).toVector
          val all = (st.pending ++ incoming)
            .sortBy(e => (e.us, e.event_id))
          val (ready, rest) = all.partition(_.us <= wmUs)
          // gapUs applied inside the fold: segmentation is a function
          // of the EVENT STREAM alone, not of watermark pacing — a
          // catch-up batch jumping the watermark past a long silence
          // yields the same runs gradual advance would
          val (closedRuns, open) =
            advance(key, ready.toArray, st.open, threshold, gapUs)
          val (emitted, openKeep) = open match {
            case Some(o) if wmUs >= gapDeadline(o.lastUs, gapUs) =>
              (closedRuns :+ closed(key, o), None)
            case o => (closedRuns, o)
          }
          if (openKeep.isEmpty && rest.isEmpty) state.remove()
          else {
            state.update(TrackState(openKeep, rest, math.max(wmUs, st.foldedWmUs)))
            // wake when the gap closes the open run or the watermark
            // reaches the earliest pending event, whichever is sooner;
            // Spark requires the timeout to sit beyond the watermark
            val wantUs = math.min(
              openKeep.map(o => gapDeadline(o.lastUs, gapUs)).getOrElse(Long.MaxValue),
              rest.headOption.map(_.us).getOrElse(Long.MaxValue))
            state.setTimeoutTimestamp(
              math.max(wantUs / 1000L, wmUs / 1000L + 1L))
          }
          emitted.iterator
      }
  }

  /** Batch entrypoint: delegates to [[highLowRunsSharded]] — the
    * sharded two-pass form whose parallelism scales with (key × day)
    * chunks rather than being capped at the key count. The stateful
    * [[runsBatch]]/[[highLowRunsStateful]] form stays for streaming
    * parity (it IS `runsStream`'s fold, minus the open tail), but on a
    * 100 TB batch history a ≤#keys-way `flatMapGroupsWithState` scan is
    * the wall the sharded plan removes (measured 16.4 s → 9.8 s at
    * 100×, SCALING.md).
    */
  def highLowRuns(events: DataFrame, threshold: Double): DataFrame =
    highLowRunsSharded(events, threshold)

  /** Stateful batch form (one task per key — parallelism bounded by
    * key count; prefer [[highLowRuns]] for batch work). Kept as the
    * batch twin of [[runsStream]] so the state-machine fold itself is
    * testable without a streaming harness.
    */
  def highLowRunsStateful(events: DataFrame, threshold: Double): DataFrame =
    runsBatch(signals(events), threshold)
      .toDF()
      .select(col("event_type"), col("bucket"), col("start_us"),
        col("end_us"), col("n_events"), col("avg_v"))
      .orderBy("event_type", "start_us")

  /** Sharded batch RLE — the scale path for long per-key histories.
    * [[runsBatch]] (and any gaps-and-islands window) scans each key in
    * ONE task; here the scan shards by a coarse time chunk (day):
    * pass 1 runs gaps-and-islands inside each (key, chunk) partition in
    * parallel, pass 2 re-runs it over the RUN relation (compressed by
    * the average run length — worst case, an oscillating signal, it
    * degenerates to the one-task form) merging runs that touch across
    * chunk boundaries. Splitting an ordered sequence and re-merging
    * adjacent same-bucket runs reproduces the global RLE exactly, so
    * the same gaps-and-islands oracle gates both forms.
    */
  def highLowRunsSharded(events: DataFrame, threshold: Double,
                         chunkUs: Long = 86400000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = events.select(col("event_type"),
        unix_micros(col("ts")).as("us"),
        col("event_id").cast("long").as("event_id"),
        col("value").cast("double").as("value"))
      .withColumn("bucket", when(col("value") >= threshold, 1L).otherwise(0L))
      .withColumn("chunk", (col("us") / chunkUs).cast("long"))
    // multi-column window order (not one struct column): same total
    // order, but the sorter compares primitive columns instead of
    // allocating and comparing a struct per row (r14)
    def runs(df: DataFrame, part: Seq[String], order: Seq[Column],
             start: Column, end: Column, n: Column, sum_ : Column,
             okey: Column): DataFrame = {
      val w = Window.partitionBy(part.map(col): _*).orderBy(order: _*)
      val cum = w.rowsBetween(Window.unboundedPreceding, 0)
      df.withColumn("__new", when(lag(col("bucket"), 1).over(w).isNull
          || lag(col("bucket"), 1).over(w) =!= col("bucket"), 1).otherwise(0))
        .withColumn("__rid", sum(col("__new")).over(cum))
        .groupBy((part :+ "__rid").map(col) :+ col("bucket"): _*)
        .agg(min(start).as("start_us"), max(end).as("end_us"),
          sum(n).as("n_events"), sum(sum_).as("sum_v"),
          min(okey).as("okey"))
    }
    val local = runs(base, Seq("event_type", "chunk"),
      Seq(col("us"), col("event_id")),
      col("us"), col("us"), lit(1L), col("value"),
      struct(col("us"), col("event_id")))
      // pass-2 input projected to exactly what pass 2 reads (r15): the
      // merge window order uses the okey struct's FIELDS as primitive
      // columns (lexicographic struct order == (us, event_id) column
      // order — the same primitive-ordering change r14 made to pass 1)
      // and chunk/__rid/the struct itself are dropped, so the pass-2
      // exchange+sort moves three fewer fields per run row. (A first
      // r15 cut that ADDED the two fields while keeping the struct
      // measured 1.16-1.17× on both st gates — width, not compare
      // cost, was the regression.)
      .select(col("event_type"), col("bucket"),
        col("start_us"), col("end_us"), col("n_events"), col("sum_v"),
        col("okey.us").as("okey_us"), col("okey.event_id").as("okey_id"))
    runs(local, Seq("event_type"), Seq(col("okey_us"), col("okey_id")),
        col("start_us"), col("end_us"), col("n_events"), col("sum_v"),
        struct(col("okey_us"), col("okey_id")))
      .select(col("event_type"), col("bucket"), col("start_us"),
        col("end_us"), col("n_events"),
        round(col("sum_v") / col("n_events") + lit(1e-9), 4).as("avg_v"))
      .orderBy("event_type", "start_us")
  }
}
