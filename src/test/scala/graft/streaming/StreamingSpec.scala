package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamingSpec extends SparkSpec {

  case class Ev(ts: Timestamp, event_type: String, value: Double, id: Long)

  private def t(s: Long) = new Timestamp(s * 1000)

  test("windowedStats aggregates a stream into tumbling windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(
      Ev(t(10), "click", 1.0, 1), Ev(t(20), "click", 3.0, 2),
      Ev(t(3700), "click", 5.0, 3), Ev(t(30), "view", 7.0, 4))
    val q = StreamingIngest.windowedStats(mem.toDF(), "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("win_out")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("win_out")
        .select(unix_timestamp($"w_start").as("w"), $"event_type", $"cnt", $"avg_v")
        .as[(Long, String, Long, Double)].collect().toSet
      assert(rows === Set(
        (0L, "click", 2L, 2.0),
        (3600L, "click", 1L, 5.0),
        (0L, "view", 1L, 7.0)))
    } finally q.stop()
  }

  test("session windows group activity bursts with a gap timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    // two bursts for 'click' separated by > 5 min, one 'view' event
    mem.addData(
      Ev(t(0), "click", 1.0, 1), Ev(t(60), "click", 2.0, 2),
      Ev(t(1000), "click", 3.0, 3), Ev(t(30), "view", 4.0, 4))
    val q = StreamingIngest.sessionStats(mem.toDF(), "5 minutes", "10 minutes")
      .select(unix_timestamp($"w_start").as("start"), $"event_type", $"cnt")
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("sess_out")
        .as[(Long, String, Long)].collect().toSet
      assert(rows === Set((0L, "click", 2L), (1000L, "click", 1L),
        (30L, "view", 1L)))
    } finally q.stop()
  }

  test("dedupedStream drops duplicate ids") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(
      Ev(t(10), "click", 1.0, 1), Ev(t(11), "click", 1.0, 1),
      Ev(t(12), "click", 2.0, 2))
    val q = StreamingIngest.dedupedStream(mem.toDF(), "id", "10 minutes")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() === 2)
    } finally q.stop()
  }

  test("dedupedStream: cross-batch duplicates drop; state expires past the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamingIngest.dedupedStream(mem.toDF(), "id", "10 minutes")
      .writeStream.format("memory").queryName("dedup_xb_out")
      .outputMode("append").start()
    try {
      // batch 1: ids 1 and 2 emit
      mem.addData(Ev(t(10), "click", 1.0, 1), Ev(t(12), "click", 2.0, 2))
      q.processAllAvailable()
      // batch 2: id 1 re-arrives WITHIN the watermark -> dropped;
      // id 3 is new -> emitted
      mem.addData(Ev(t(11), "click", 1.5, 1), Ev(t(13), "click", 3.0, 3))
      q.processAllAvailable()
      assert(spark.table("dedup_xb_out").count() === 3,
        "a duplicate arriving in a LATER micro-batch must still drop")
      // batch 3: an event 30 minutes on pushes the watermark past
      // id 1's state (10-minute delay), evicting it
      mem.addData(Ev(t(10 + 30 * 60), "click", 4.0, 4))
      q.processAllAvailable()
      // batch 4: id 1 again, after eviction -> re-emitted (the bounded-
      // state trade dropDuplicatesWithinWatermark makes explicit)
      mem.addData(Ev(t(10 + 31 * 60), "click", 5.0, 1))
      q.processAllAvailable()
      // Row-level read: .as[Ev] would need an encoder for the
      // spec-inner case class (the round-2 inner-class-encoder lesson)
      val ids = spark.table("dedup_xb_out").collect()
        .map(_.getAs[Long]("id")).toSeq
      assert(ids.count(_ == 1L) === 2,
        s"expired id must re-admit exactly once, got $ids")
      assert(spark.table("dedup_xb_out").count() === 5)
    } finally q.stop()
  }

  private def sig(tyvIds: (Long, String, Double, Long)*): Seq[SignalEvent] =
    tyvIds.map { case (us, ty, v, id) =>
      SignalEvent(ty, us, id, v, new Timestamp(us / 1000))
    }

  test("StateTracker.runsBatch RLE-encodes threshold runs per key") {
    import spark.implicits._
    // x: high high low low high  |  y: low
    val evs = sig(
      (1000000L, "x", 150.0, 1), (2000000L, "x", 120.0, 2),
      (3000000L, "x", 10.0, 3), (4000000L, "x", 20.0, 4),
      (5000000L, "x", 200.0, 5),
      (1000000L, "y", 5.0, 6)).toDS()
    val runs = StateTracker.runsBatch(evs, 100.0).collect()
      .sortBy(r => (r.event_type, r.start_us))
    assert(runs.map(r => (r.event_type, r.bucket, r.start_us, r.end_us, r.n_events)).toSeq ===
      Seq(("x", 1L, 1000000L, 2000000L, 2L), ("x", 0L, 3000000L, 4000000L, 2L),
        ("x", 1L, 5000000L, 5000000L, 1L), ("y", 0L, 1000000L, 1000000L, 1L)))
    assert(runs.head.avg_v === 135.0)
  }

  test("highLowRuns (sharded batch default) matches the stateful fold exactly") {
    import spark.implicits._
    // runs crossing the chunk (day) boundary, plus a key with one run
    val evs = sig(
      (86399000000L, "x", 150.0, 1), (86400500000L, "x", 120.0, 2),
      (86401000000L, "x", 10.0, 3), (172800000000L, "x", 20.0, 4),
      (172900000000L, "x", 200.0, 5),
      (1000000L, "y", 5.0, 6), (86400000001L, "y", 6.0, 7)).toDS()
    val df = evs.toDF().select(col("event_type"), col("event_id"),
      col("value"), col("ts"))
    val sharded = StateTracker.highLowRuns(df, 100.0).collect()
    val stateful = StateTracker.highLowRunsStateful(df, 100.0).collect()
    assert(sharded.map(_.toSeq).toSeq === stateful.map(_.toSeq).toSeq)
    // x: high×2 / low×2 / high×1, y: one low run merged across the
    // day boundary = 4 runs total
    assert(sharded.length === 4)
  }

  test("StateTracker.runsBatch sorts unordered group input by event time") {
    import spark.implicits._
    // same runs as above, rows arrive scrambled
    val evs = sig(
      (5000000L, "x", 200.0, 5), (1000000L, "x", 150.0, 1),
      (4000000L, "x", 20.0, 4), (2000000L, "x", 120.0, 2),
      (3000000L, "x", 10.0, 3)).toDS().repartition(3)
    val runs = StateTracker.runsBatch(evs, 100.0).collect().sortBy(_.start_us)
    assert(runs.map(r => (r.bucket, r.n_events)).toSeq ===
      Seq((1L, 2L), (0L, 2L), (1L, 1L)))
  }

  test("StateTracker.runsStream carries open runs across batches and " +
    "emits them on event-time timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SignalEvent]
    val src = StateTracker.runsStream(
      mem.toDS().withWatermark("ts", "0 seconds"), 100.0, gapUs = 1000000L)
    val q = src.writeStream.format("memory").queryName("rle_out")
      .outputMode("append").start()
    try {
      // batch 1: high,high,low for x — the high run closes at the
      // crossing; the low run stays open in state
      mem.addData(sig(
        (1000000L, "x", 150.0, 1), (2000000L, "x", 130.0, 2),
        (3000000L, "x", 10.0, 3)): _*)
      q.processAllAvailable()
      val afterB1 = spark.table("rle_out").as[RunOut].collect()
      assert(afterB1.map(r => (r.event_type, r.bucket, r.n_events)).toSeq ===
        Seq(("x", 1L, 2L)))
      // batch 2: far-future event on another key advances the
      // watermark past x's (lastUs + gap) → the no-data timeout batch
      // emits x's open low run and evicts its state
      mem.addData(sig((3600000000L, "y", 50.0, 9)): _*)
      q.processAllAvailable()
      val afterB2 = spark.table("rle_out").as[RunOut].collect()
        .sortBy(_.start_us)
      assert(afterB2.map(r => (r.event_type, r.bucket, r.start_us, r.n_events)).toSeq ===
        Seq(("x", 1L, 1000000L, 2L), ("x", 0L, 3000000L, 1L)))
    } finally q.stop()
  }

  test("runsStream with gapUs=Long.MaxValue (the no-gap sentinel) keeps " +
    "open runs open instead of emitting a fragment per batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SignalEvent]
    // lastUs + Long.MaxValue wraps negative without the saturating
    // deadline, making every open run read as final on every batch
    val src = StateTracker.runsStream(
      mem.toDS().withWatermark("ts", "0 seconds"), 100.0,
      gapUs = Long.MaxValue)
    val q = src.writeStream.format("memory").queryName("rle_nogap")
      .outputMode("append").start()
    try {
      mem.addData(sig((1000000L, "x", 150.0, 1), (2000000L, "x", 130.0, 2)): _*)
      q.processAllAvailable()
      // a far-future same-bucket event: the continuous high run must
      // NOT have been split by the earlier batch boundary
      mem.addData(sig((3600000000L, "x", 140.0, 3)): _*)
      q.processAllAvailable()
      // nothing is final while the run stays open under an infinite gap
      assert(spark.table("rle_nogap").as[RunOut].collect().isEmpty)
      // a crossing closes the run: ONE run spanning all three events
      mem.addData(sig((3600001000L, "x", 10.0, 4)): _*)
      mem.addData(sig((7200000000L, "y", 50.0, 9)): _*)
      q.processAllAvailable()
      val runs = spark.table("rle_nogap").as[RunOut].collect()
        .filter(r => r.event_type == "x" && r.bucket == 1L)
      assert(runs.map(r => (r.start_us, r.n_events)).toSeq ===
        Seq((1000000L, 3L)))
    } finally q.stop()
  }

  test("gapDeadline saturates for huge gaps but stays exact for " +
    "negative (pre-epoch) lastUs") {
    // the saturation guard's own subtraction (Long.MaxValue - lastUs)
    // overflows when lastUs is negative — the deadline would read
    // Long.MaxValue and never fire. (Spark's watermark-0 init keeps
    // pre-epoch rows out of runsStream today, so this pins the
    // arithmetic contract directly.)
    assert(StateTracker.gapDeadline(-5000000L, 1000000L) === -4000000L)
    assert(StateTracker.gapDeadline(Long.MinValue + 1, Long.MaxValue) === 0L)
    // positive-side saturation (the no-gap sentinel) still holds
    assert(StateTracker.gapDeadline(1000000L, Long.MaxValue) === Long.MaxValue)
    assert(StateTracker.gapDeadline(Long.MaxValue - 1, 2L) === Long.MaxValue)
    // plain sums stay exact
    assert(StateTracker.gapDeadline(3000000L, 1000000L) === 4000000L)
  }

  test("runsStream orders within-lateness late arrivals before folding") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SignalEvent]
    // gap (10s) exceeds the 5s event spacing, so the gap rule stays
    // out of the way — this test is about ORDERING of late arrivals
    val src = StateTracker.runsStream(
      mem.toDS().withWatermark("ts", "10 seconds"), 100.0, gapUs = 10000000L)
    val q = src.writeStream.format("memory").queryName("rle_ooo")
      .outputMode("append").start()
    try {
      // batch 1: t=100s high. batch 2: a LATE same-bucket event at
      // t=95s (within the 10s lateness). An arrival-order fold would
      // extend the open run BACKWARD (end_us 95s < start_us 100s); the
      // watermark-buffered fold must produce ONE run [95s, 100s].
      mem.addData(sig((100000000L, "x", 150.0, 1)): _*)
      q.processAllAvailable()
      mem.addData(sig((95000000L, "x", 130.0, 2)): _*)
      q.processAllAvailable()
      // watermark advance (via another key) past lastUs + gap
      mem.addData(sig((300000000L, "y", 50.0, 9)): _*)
      q.processAllAvailable()
      val x = spark.table("rle_ooo").as[RunOut].collect()
        .filter(_.event_type == "x")
      assert(x.map(r => (r.bucket, r.start_us, r.end_us, r.n_events, r.avg_v))
        .toSeq === Seq((1L, 95000000L, 100000000L, 2L, 140.0)))
    } finally q.stop()
  }

  test("runsStream applies the gap rule inside the fold — a watermark " +
    "jump over a long same-bucket silence still yields two runs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SignalEvent]
    val src = StateTracker.runsStream(
      mem.toDS().withWatermark("ts", "0 seconds"), 100.0, gapUs = 1000000L)
    val q = src.writeStream.format("memory").queryName("rle_jump")
      .outputMode("append").start()
    try {
      // one catch-up batch carries BOTH sides of a 10s silence (gap =
      // 1s) in the same bucket, and the watermark jumps past both at
      // once. A timeout-only gap rule would fold them into ONE run;
      // the gap applied inside the fold must emit two — the same
      // segmentation gradual watermark advance produces.
      mem.addData(sig(
        (1000000L, "x", 150.0, 1), (2000000L, "x", 130.0, 2),
        (12000000L, "x", 110.0, 3), (12500000L, "x", 120.0, 4)): _*)
      q.processAllAvailable()
      // advance the watermark past lastUs + gap to flush the tail
      mem.addData(sig((60000000L, "y", 50.0, 9)): _*)
      q.processAllAvailable()
      val x = spark.table("rle_jump").as[RunOut].collect()
        .filter(_.event_type == "x").sortBy(_.start_us)
      assert(x.map(r => (r.bucket, r.start_us, r.end_us, r.n_events))
        .toSeq === Seq((1L, 1000000L, 2000000L, 2L),
          (1L, 12000000L, 12500000L, 2L)))
    } finally q.stop()
  }

  test("NaN values bucket identically in the JVM fold and the SQL form") {
    import spark.implicits._
    // Spark SQL orders NaN above every number, so value >= threshold is
    // TRUE there; the JVM fold must agree or the two batch forms (and
    // batch vs streaming) segment differently around NaN events
    val evs = sig(
      (1000000L, "x", 150.0, 1), (2000000L, "x", Double.NaN, 2),
      (3000000L, "x", 120.0, 3), (4000000L, "x", 10.0, 4))
    val df = evs.toDF().select(col("event_type"), col("event_id"),
      col("value"), col("ts"))
    val sharded = StateTracker.highLowRunsSharded(df, 100.0).collect()
    val stateful = StateTracker.highLowRunsStateful(df, 100.0).collect()
    // string compare: a NaN-bearing run's avg_v is NaN on both sides,
    // and NaN never equals itself under value comparison
    assert(sharded.map(_.toString).toSeq === stateful.map(_.toString).toSeq)
    // one continuous high run over the NaN, then the low run
    assert(sharded.map(r => (r.getLong(1), r.getLong(4))).toSeq ===
      Seq((1L, 3L), (0L, 1L)))
  }

  case class Px(pts: Timestamp, p_user: Long, pid: Long)
  case class Cx(cts: Timestamp, c_user: Long, cid: Long)

  test("intervalJoin pairs two streams within the lookback window " +
    "across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val pm = MemoryStream[Px]
    val cm = MemoryStream[Cx]
    val joined = StreamingIngest.intervalJoin(
      pm.toDF(), "pts", cm.toDF(), "cts",
      col("p_user") === col("c_user"), lookbackSeconds = 100,
      watermark = "10 seconds")
      .select($"pid", $"cid")
    val q = joined.writeStream.format("memory").queryName("sj_out")
      .outputMode("append").start()
    try {
      // batch 1: click at t=50 buffers; purchase at t=100 matches it
      // (within 100s lookback); click at t=300 for another user buffers
      cm.addData(Cx(t(50), 1L, 10L), Cx(t(300), 2L, 11L))
      pm.addData(Px(t(100), 1L, 1L))
      q.processAllAvailable()
      assert(spark.table("sj_out").as[(Long, Long)].collect().toSet ===
        Set((1L, 10L)))
      // batch 2: purchase at t=320 for user 2 reaches BACK to the
      // buffered click from batch 1 — cross-batch state join; a click
      // AFTER the purchase (t=400 > 350) must not match
      pm.addData(Px(t(320), 2L, 2L))
      cm.addData(Cx(t(400), 3L, 12L))
      pm.addData(Px(t(350), 3L, 3L))
      q.processAllAvailable()
      assert(spark.table("sj_out").as[(Long, Long)].collect().toSet ===
        Set((1L, 10L), (2L, 11L)))
    } finally q.stop()
  }

  test("intervalJoin batch shape equals the naive range join") {
    import spark.implicits._
    val p = Seq((t(100), 1L, 1L), (t(320), 2L, 2L))
      .toDF("pts", "p_user", "pid")
    val c = Seq((t(50), 1L, 10L), (t(300), 2L, 11L), (t(150), 1L, 12L))
      .toDF("cts", "c_user", "cid")
    val out = StreamingIngest.intervalJoin(p, "pts", c, "cts",
      col("p_user") === col("c_user"), 100, "10 seconds")
      .select($"pid", $"cid").as[(Long, Long)].collect().toSet
    // pid 1 @100: only cid 10 @50 (cid 12 @150 is after the purchase)
    assert(out === Set((1L, 10L), (2L, 11L)))
  }

  test("filePipeline ingests a directory incrementally") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_in").toString
    val out = java.nio.file.Files.createTempDirectory("graft_stream_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.mode("append").parquet(dir)
    val src = spark.readStream.schema("id LONG, v STRING").parquet(dir)
    val q = StreamingIngest.filePipeline(src, out, ckpt).start()
    try q.awaitTermination(30000) finally if (q.isActive) q.stop()
    assert(spark.read.parquet(out).count() === 2)
  }
}
