package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{AsofJoin, BucketedSort, GeoMatchup, ToleranceJoin}

/** Join operators re-expressed over the driver testdata (SURVEY §2.3).
  * J1–J3: the matchup family (tolerance join → match-once / match-all);
  * J4: as-of join; J5/J6: two-dataset time alignment.
  */
object JoinQueries extends QueryModule {

  private val TtMicros = 7200000000L // 2h time tolerance
  private val Vtol = 5.0             // value tolerance

  /** Primary side of the matchup: purchase events. */
  private def primary(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).where(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id").as("p_user"),
        unix_micros(col("ts")).as("pts"), col("value").as("pv"))

  /** Secondary side: error events. */
  private def secondary(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).where(col("event_type") === "error")
      .select(col("event_id").as("eid"), unix_micros(col("ts")).as("ets"),
        col("value").as("ev"))

  /** J1 pairs: |Δt| ≤ 2h AND |Δvalue| ≤ 5, banded on time × value —
    * the 2-D cells cut candidates ~12× vs time-only banding.
    */
  private def matchPairs(s: SparkSession, dir: String): DataFrame =
    ToleranceJoin.bandJoin2(
      primary(s, dir), secondary(s, dir),
      col("pts"), col("ets"), TtMicros,
      col("pv"), col("ev"), Vtol,
      abs(col("pts") - col("ets")) <= TtMicros && abs(col("pv") - col("ev")) <= Vtol,
      // shuffle-hash build on the secondary, NOT broadcast: the
      // "small in-situ side" assumption died at the 100× probe (a
      // 1M-row broadcast serializes through the driver — 143 s);
      // the shuffle-hash form is within noise at 1× and scales
      broadcastRight = false)

  /** Shared total-order tail for the big matchup outputs (j1, j7):
    * BucketedSort keyed on the primary event id, span from
    * events.parquet footer stats (metadata-only; the all-events id
    * range bounds the purchase ids), falling back to a min/max scan
    * of the purchase side when stats are unavailable.
    */
  private def orderedByEventSpan(s: SparkSession, dir: String,
                                 pairs: DataFrame, key: Column,
                                 tie: Column): DataFrame = {
    val n = s.conf.get("spark.sql.shuffle.partitions").toInt
    BucketedSort.parquetSpan(s, s"$dir/events.parquet", "event_id") match {
      case Some((lo, hi)) =>
        BucketedSort.byUniformBuckets(pairs, key, lo, hi, n, tie)
      case None =>
        BucketedSort.byKeySpanOf(pairs, key,
          Tables.events(s, dir).where(col("event_type") === "purchase")
            .select(col("event_id")),
          col("event_id"), n, tie)
    }
  }

  /** j1c's scratch results-store root: a fixed path under the JVM's
    * tmpdir. Each invocation writes a fresh execution id and hands the
    * PREVIOUS one to a background daemon deleter (see [[j1cPrevExec]])
    * so a 100× sweep's reps can't accumulate multi-GB pair executions
    * — without the recursive FS delete landing in the timed window the
    * gate exists to measure.
    */
  private val j1cScratchRoot = new java.io.File(
    sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_j1c_store").getPath
  private val j1cLock = new Object
  /** Handover slot for j1c's off-the-timed-path cleanup: every
    * execution id lands here exactly once and is deleted by exactly
    * one later invocation's background thread; the first invocation of
    * a JVM (null previous) instead sweeps whatever a crashed
    * predecessor left in the root.
    */
  private val j1cPrevExec =
    new java.util.concurrent.atomic.AtomicReference[String](null)

  /** j1's unordered pair projection — the gate adds the total order;
    * SortProbe times the order's cost in isolation.
    */
  private[graft] def j1Pairs(s: SparkSession, dir: String): DataFrame =
    matchPairs(s, dir)
      .select(col("pid"), col("eid"),
        round(abs(col("pv") - col("ev")) + lit(1e-9), 4).as("dv"),
        abs(col("pts") - col("ets")).as("dt_us"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // J1: spatio-temporal tolerance matchup join (Matchup.py:429-592).
    // The output's total (pid, eid) order comes from BucketedSort, not
    // orderBy: a sampled range exchange re-executes the pair
    // enumeration to learn its bounds (the join probe runs ~twice —
    // the dominant cost of this gate at 100×, SCALING.md r8), while
    // the pid span is available from the SMALL primary side for the
    // cost of one min/max scan.
    "j1_tolerance_join" -> { (s, dir) =>
      orderedByEventSpan(s, dir, j1Pairs(s, dir), col("pid"), col("eid"))
    },

    // J1c: the PRODUCTION matchup shape as a permanent, oracled gate.
    // j1 keeps its BucketedSort total order because the driver's hash
    // needs one — but at real scale matchup pairs go UNORDERED into
    // the results store (S8) and are read back path-addressed, exactly
    // the reference's contract (ResultsStorage.py:58-204: plain
    // per-row inserts, id-keyed retrieval, never a global sort).
    // SCALING.md r13 measured that shape at 0.27× the gate shape at
    // 100× in a dev probe; this gate re-measures it every round and
    // pins the read-back CONTENT order-insensitively: pairs fold into
    // pid-residue buckets with exact counts, id extrema, and integral
    // sums (dv is 4-dec-rounded, so ×10⁴ is exact in long arithmetic —
    // no float-sum order sensitivity can touch the hash).
    "j1c_matchup_store" -> { (s, dir) =>
      val execId = "gate-" + java.util.UUID.randomUUID().toString.take(8)
      val (schema, rows) = j1cLock.synchronized {
        val root = new org.apache.hadoop.fs.Path(j1cScratchRoot)
        val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
        // the previous invocation's multi-GB execution is deleted OFF
        // the timed path (background daemon thread): the gate exists
        // to re-measure the store round-trip, not the local FS's
        // recursive delete of the last rep's ~10 GB of pair parquet.
        // The stale snapshot is taken BEFORE this invocation's write
        // starts, so the deleter can never see (let alone touch) the
        // fresh execution dir; a failed delete leaves a dir the next
        // JVM's first-call sweep reclaims.
        val prev = Option(j1cPrevExec.getAndSet(execId))
        val stale = prev match {
          case Some(p) =>
            Seq(new org.apache.hadoop.fs.Path(root, s"execution_id=$p"))
          case None if fs.exists(root) =>
            fs.listStatus(root).map(_.getPath).toSeq
          case None => Nil
        }
        if (stale.nonEmpty) {
          val gc = new Thread(() => stale.foreach { p =>
            try fs.delete(p, true)
            catch { case _: java.io.IOException => () }
          }, "j1c-scratch-gc")
          gc.setDaemon(true)
          gc.start()
        }
        graft.sources.ResultsStore.write(j1Pairs(s, dir), j1cScratchRoot, execId)
        // materialize the whole round-trip INSIDE the lock (the bucket
        // summary is ≤997 rows): the returned frame is a local
        // relation with no lingering dependence on scratch files, so a
        // later invocation's cleanup cannot tear a lazy read — the
        // lock genuinely covers the full write+read-back critical
        // section, including for parallel callers
        val agg = graft.sources.ResultsStore.read(s, j1cScratchRoot, execId)
          .groupBy((col("pid") % 997).as("bucket"))
          .agg(count(lit(1)).as("n_pairs"),
            min(col("pid")).as("min_pid"), max(col("pid")).as("max_pid"),
            min(col("eid")).as("min_eid"), max(col("eid")).as("max_eid"),
            sum(col("dt_us")).as("sum_dt_us"),
            sum(round(col("dv") * 10000).cast("long")).as("sum_dv_e4"))
          .orderBy("bucket")
        (agg.schema, agg.collect())
      }
      s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    },

    // J2: match-once — nearest match per primary (Matchup.py:456-473)
    "j2_match_once" -> { (s, dir) =>
      ToleranceJoin.matchOnce(matchPairs(s, dir), col("pid"),
          abs(col("pv") - col("ev")), col("eid"))
        .select(col("pid"), col("eid"), round(abs(col("pv") - col("ev")) + lit(1e-9), 4).as("dv"))
        .orderBy("pid")
    },

    // J3: match-all — grouped matches per primary (Matchup.py:474-478);
    // scalar summaries instead of collect_list so the oracle hash is
    // order-insensitive.
    "j3_match_all" -> { (s, dir) =>
      matchPairs(s, dir)
        .groupBy(col("pid"))
        .agg(count(lit(1)).as("n_matches"), min(col("eid")).as("min_eid"),
          max(col("eid")).as("max_eid"), round(avg(col("ev")) + lit(1e-9), 4).as("avg_ev"))
        .orderBy("pid")
    },

    // J7/J1 full geo form: lat/lon/time matchup via the 3×3×3 grid
    // neighborhood join (GeoMatchup), lat/lon synthesized from event
    // columns; oracle is the naive haversine theta-join.
    "j7_geo_matchup" -> { (s, dir) =>
      // primary spreads (it explodes into the 3×3×3 cell neighborhood
      // — the per-row-heavy side); the broadcast secondary must NOT
      // (a repartition before a broadcast collect is pure overhead)
      def side(typ: String, idAs: String, pfx: String) =
        (if (typ == "purchase") Tables.eventsSpread(s, dir)
         else Tables.events(s, dir)).where(col("event_type") === typ)
          .select(col("event_id").as(idAs),
            ((col("user_id") % 120) - 60 + 0.005).as(s"${pfx}lat"),
            (col("value") / 4 - 90 + 0.005).as(s"${pfx}lon"),
            expr("unix_micros(ts) DIV 1000000").as(s"${pfx}t"))
      val pairs = GeoMatchup.matchup(
          side("purchase", "pid", "p"), side("error", "sid", "s"),
          col("plat"), col("plon"), col("pt"),
          col("slat"), col("slon"), col("st"),
          rtMeters = 300000, ttSeconds = 14400, maxAbsLat = 61.0,
          broadcastSecondary = false) // see matchPairs: broadcast died at 100×
        .select(col("pid"), col("sid"),
          round(col("dist_km") + lit(1e-9), 4).as("dist_km"), col("dt_s"))
      // total (pid, sid) order via BucketedSort — same rationale as j1
      // (this gate's 100× cost was its output sort, not the matchup)
      orderedByEventSpan(s, dir, pairs, col("pid"), col("sid"))
    },

    // J4: as-of join — latest click at-or-before each purchase, per user
    // (DailyDifferenceAverageSpark.py:295-374 semantics)
    "j4_asof_join" -> { (s, dir) =>
      val p = Tables.events(s, dir).where(col("event_type") === "purchase")
        .select(col("event_id").as("pid"), col("user_id"), col("ts"))
      val c = Tables.events(s, dir).where(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("cts"), col("event_id").as("ceid"))
      AsofJoin.lastEarlier(p, c, Seq("user_id"),
          col("ts"), col("cts"), Seq("cts"), rightTie = "ceid")
        .where(col("matched_cts").isNotNull)
        .select(col("pid"), col("user_id"), unix_micros(col("ts")).as("pts_us"),
          unix_micros(col("matched_cts")).as("click_ts_us"))
        .orderBy("pid")
    },

    // J4 via the custom physical operator (plans.AsofJoinPhysical):
    // identical semantics and oracle as j4_asof_join, but planned
    // through AsofJoinNode -> AsofJoinStrategy -> sort-merge
    // AsofJoinExec — the driver gate thereby verifies the custom exec.
    "j4b_asof_merge_exec" -> { (s, dir) =>
      val p = Tables.events(s, dir).where(col("event_type") === "purchase")
        .select(col("event_id").as("pid"), col("user_id"), col("ts"))
      val c = Tables.events(s, dir).where(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      graft.plans.AsofJoinPhysical.lastEarlierMerge(p, c,
          keys = Seq("user_id"), leftTime = "ts", rightTime = "ts",
          rightTie = "event_id")
        .where(col("r_ts").isNotNull)
        .select(col("pid"), col("user_id"), unix_micros(col("ts")).as("pts_us"),
          unix_micros(col("r_ts")).as("click_ts_us"))
        .orderBy("pid")
    },

    // J5 + A13: two-dataset time alignment + comparison stats
    // (CorrMapSpark.py:94-145; TimeSeriesSpark.py:337-355): daily mean
    // series of two event types, inner-joined on day, then slope/
    // intercept/r of the paired series.
    "j5_series_comparison" -> { (s, dir) =>
      val e = Tables.events(s, dir)
      val x = e.where(col("event_type") === "click")
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(avg(col("value")).as("x"))
      val y = e.where(col("event_type") === "purchase")
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(avg(col("value")).as("y"))
      x.join(y, "day")
        .agg(round(regr_slope(col("y"), col("x")) + lit(1e-9), 6).as("slope"),
          round(regr_intercept(col("y"), col("x")) + lit(1e-9), 6).as("icept"),
          round(corr(col("y"), col("x")) + lit(1e-9), 6).as("r"),
          count(lit(1)).as("n"),
          // slope standard error: √(SSres/(n−2)/Sxx) with
          // SSres = Syy − slope·Sxy (linregress's std_err)
          round(sqrt((regr_syy(col("y"), col("x"))
              - regr_slope(col("y"), col("x")) * regr_sxy(col("y"), col("x")))
            / (count(lit(1)) - 2) / regr_sxx(col("y"), col("x")))
            + lit(1e-9), 6).as("err"))
    },

    // A13 completion: the full linregress tuple including the two-sided
    // p-value of the slope (TimeSeriesSpark.py:346-353). The t-CDF has
    // no DuckDB equivalent, so this query carries no oracle — the
    // driver records the weaker rows-only check; StudentTSpec verifies
    // the math against closed forms and published critical values.
    "j5b_regression_pvalue" -> { (s, dir) =>
      import graft.functions.StudentT
      val e = Tables.events(s, dir)
      val x = e.where(col("event_type") === "click")
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(avg(col("value")).as("x"))
      val y = e.where(col("event_type") === "purchase")
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(avg(col("value")).as("y"))
      val p = udf((r: Double, n: Long) =>
        StudentT.twoSidedP(StudentT.corrT(r, n), (n - 2).toDouble))
      x.join(y, "day")
        .agg(round(regr_slope(col("y"), col("x")) + lit(1e-9), 6).as("slope"),
          round(corr(col("y"), col("x")) + lit(1e-9), 6).as("r"),
          corr(col("y"), col("x")).as("r_raw"),
          count(lit(1)).as("n"))
        .withColumn("p", round(p(col("r_raw"), col("n")) + lit(1e-9), 6))
        .drop("r_raw")
    },

    // J6: dates where both datasets have data (CorrelationMap.py:97-117)
    "j6_both_present" -> { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(count(when(col("event_type") === "click", 1)).as("cnt_click"),
          count(when(col("event_type") === "purchase", 1)).as("cnt_purchase"))
        .where(col("cnt_click") > 0 && col("cnt_purchase") > 0)
        .orderBy("day")
    },

    // J8 (beyond ref): NEAREST as-of join — each purchase pairs with
    // the same user's closest click in time, either direction (pandas
    // merge_asof direction='nearest'; the reference's as-of ops are
    // backward-only). Candidates come from the user equi-join (per-user
    // event counts are bounded), then one min_by(struct) aggregate
    // picks the winner — no window over the event stream.
    "j8_asof_nearest" -> { (s, dir) =>
      val p = Tables.events(s, dir).where(col("event_type") === "purchase")
        .select(col("event_id").as("pid"), col("user_id"),
          unix_micros(col("ts")).as("pts"))
      val c = Tables.events(s, dir).where(col("event_type") === "click")
        .select(col("event_id").as("cid"), col("user_id"),
          unix_micros(col("ts")).as("cts"))
      p.join(c, "user_id")
        .groupBy(col("pid"))
        .agg(min(struct(abs(col("pts") - col("cts")).as("gap_us"),
          col("cid"))).as("best"))
        .select(col("pid"), col("best.cid").as("cid"),
          col("best.gap_us").as("gap_us"))
        .orderBy("pid")
    },

    // A19 (beyond ref): equi-depth histogram — decile BOUNDARIES from
    // one percentile aggregate (broadcast back), then every row buckets
    // itself by comparison. First shipped as ntile over an
    // UNPARTITIONED window: 28.7 s at the 100× probe because a global
    // window funnels every row into one task ("windows don't shard" —
    // SCALING.md); the boundary form is two shardable aggregates. At
    // true scale the exact percentile swaps for the approx_percentile
    // sketch (same argument as t_length_quantiles).
    "a19_equidepth" -> { (s, dir) =>
      val qs = array((1 to 9).map(i => lit(i / 10.0)): _*)
      val bounds = broadcast(Tables.events(s, dir)
        .agg(percentile(col("value"), qs).as("bs")))
      Tables.eventsSpread(s, dir)
        .select(col("value")).crossJoin(bounds)
        .select(col("value"),
          (size(filter(col("bs"), b => col("value") > b)) + 1)
            .cast("long").as("bucket"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          round(min(col("value")) + lit(1e-9), 4).as("lo"),
          round(max(col("value")) + lit(1e-9), 4).as("hi"),
          round(avg(col("value")) + lit(1e-9), 4).as("mean"))
        .orderBy("bucket")
    }
  )

  def oracle: Map[String, String] = Map(
    "j1_tolerance_join" ->
      """WITH p AS (SELECT event_id pid, epoch_us(ts) pts, value pv FROM events
        |           WHERE event_type = 'purchase'),
        |     e AS (SELECT event_id eid, epoch_us(ts) ets, value ev FROM events
        |           WHERE event_type = 'error')
        |SELECT pid, eid, round(abs(pv - ev) + 1e-9, 4) AS dv, abs(pts - ets) AS dt_us
        |FROM p JOIN e ON abs(pts - ets) <= 7200000000 AND abs(pv - ev) <= 5.0
        |ORDER BY pid, eid""".stripMargin,

    "j1c_matchup_store" ->
      """WITH p AS (SELECT event_id pid, epoch_us(ts) pts, value pv FROM events
        |           WHERE event_type = 'purchase'),
        |     e AS (SELECT event_id eid, epoch_us(ts) ets, value ev FROM events
        |           WHERE event_type = 'error'),
        |     pairs AS (SELECT pid, eid, round(abs(pv - ev) + 1e-9, 4) AS dv,
        |                      abs(pts - ets) AS dt_us
        |               FROM p JOIN e ON abs(pts - ets) <= 7200000000
        |                            AND abs(pv - ev) <= 5.0)
        |SELECT pid % 997 AS bucket, count(*) AS n_pairs,
        |       min(pid) AS min_pid, max(pid) AS max_pid,
        |       min(eid) AS min_eid, max(eid) AS max_eid,
        |       CAST(sum(dt_us) AS BIGINT) AS sum_dt_us,
        |       CAST(sum(CAST(round(dv * 10000) AS BIGINT)) AS BIGINT) AS sum_dv_e4
        |FROM pairs GROUP BY 1 ORDER BY 1""".stripMargin,

    "j2_match_once" ->
      """WITH p AS (SELECT event_id pid, epoch_us(ts) pts, value pv FROM events
        |           WHERE event_type = 'purchase'),
        |     e AS (SELECT event_id eid, epoch_us(ts) ets, value ev FROM events
        |           WHERE event_type = 'error'),
        |     pairs AS (SELECT pid, eid, abs(pv - ev) AS dv
        |               FROM p JOIN e ON abs(pts - ets) <= 7200000000
        |                            AND abs(pv - ev) <= 5.0)
        |SELECT pid, eid, round(dv + 1e-9, 4) AS dv
        |FROM (SELECT *, row_number() OVER (PARTITION BY pid
        |        ORDER BY dv ASC, eid ASC) rn FROM pairs)
        |WHERE rn = 1 ORDER BY pid""".stripMargin,

    "j3_match_all" ->
      """WITH p AS (SELECT event_id pid, epoch_us(ts) pts, value pv FROM events
        |           WHERE event_type = 'purchase'),
        |     e AS (SELECT event_id eid, epoch_us(ts) ets, value ev FROM events
        |           WHERE event_type = 'error')
        |SELECT pid, count(*) AS n_matches, min(eid) AS min_eid,
        |       max(eid) AS max_eid, round(avg(ev) + 1e-9, 4) AS avg_ev
        |FROM p JOIN e ON abs(pts - ets) <= 7200000000 AND abs(pv - ev) <= 5.0
        |GROUP BY pid ORDER BY pid""".stripMargin,

    "j7_geo_matchup" ->
      """WITH p AS (SELECT event_id pid, (user_id % 120) - 60 + 0.005 plat,
        |                  value/4 - 90 + 0.005 plon,
        |                  epoch_us(ts) // 1000000 pt
        |           FROM events WHERE event_type = 'purchase'),
        |     e AS (SELECT event_id sid, (user_id % 120) - 60 + 0.005 slat,
        |                  value/4 - 90 + 0.005 slon,
        |                  epoch_us(ts) // 1000000 st
        |           FROM events WHERE event_type = 'error')
        |SELECT pid, sid,
        |       round(2*6371*asin(sqrt(pow(sin(radians(slat - plat)/2), 2) +
        |         cos(radians(plat))*cos(radians(slat)) *
        |         pow(sin(radians(slon - plon)/2), 2))) + 1e-9, 4) AS dist_km,
        |       abs(pt - st) AS dt_s
        |FROM p JOIN e ON abs(pt - st) <= 14400
        |  AND 2*6371*asin(sqrt(pow(sin(radians(slat - plat)/2), 2) +
        |      cos(radians(plat))*cos(radians(slat)) *
        |      pow(sin(radians(slon - plon)/2), 2))) * 1000.0 <= 300000
        |ORDER BY pid, sid""".stripMargin,

    "j4_asof_join" ->
      """WITH p AS (SELECT event_id pid, user_id, epoch_us(ts) pts_us, ts
        |           FROM events WHERE event_type = 'purchase'),
        |     c AS (SELECT user_id, ts cts FROM events WHERE event_type = 'click')
        |SELECT pid, user_id, pts_us, epoch_us(max(cts)) AS click_ts_us
        |FROM p JOIN c USING (user_id)
        |WHERE c.cts <= p.ts
        |GROUP BY pid, user_id, pts_us
        |ORDER BY pid""".stripMargin,

    "j4b_asof_merge_exec" ->
      """WITH p AS (SELECT event_id pid, user_id, epoch_us(ts) pts_us, ts
        |           FROM events WHERE event_type = 'purchase'),
        |     c AS (SELECT user_id, ts cts FROM events WHERE event_type = 'click')
        |SELECT pid, user_id, pts_us, epoch_us(max(cts)) AS click_ts_us
        |FROM p JOIN c USING (user_id)
        |WHERE c.cts <= p.ts
        |GROUP BY pid, user_id, pts_us
        |ORDER BY pid""".stripMargin,

    "j5_series_comparison" ->
      """WITH x AS (SELECT strftime(ts, '%Y-%m-%d') AS day, avg(value) x FROM events
        |           WHERE event_type = 'click' GROUP BY 1),
        |     y AS (SELECT strftime(ts, '%Y-%m-%d') AS day, avg(value) y FROM events
        |           WHERE event_type = 'purchase' GROUP BY 1)
        |SELECT round(regr_slope(y, x) + 1e-9, 6) AS slope,
        |       round(regr_intercept(y, x) + 1e-9, 6) AS icept,
        |       round(corr(y, x) + 1e-9, 6) AS r, count(*) AS n,
        |       round(sqrt((regr_syy(y, x) - regr_slope(y, x) * regr_sxy(y, x))
        |             / (count(*) - 2) / regr_sxx(y, x)) + 1e-9, 6) AS err
        |FROM x JOIN y USING (day)""".stripMargin,

    "j6_both_present" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day,
        |       count(CASE WHEN event_type = 'click' THEN 1 END) AS cnt_click,
        |       count(CASE WHEN event_type = 'purchase' THEN 1 END) AS cnt_purchase
        |FROM events GROUP BY 1
        |HAVING cnt_click > 0 AND cnt_purchase > 0
        |ORDER BY day""".stripMargin,

    "j8_asof_nearest" ->
      """WITH p AS (SELECT event_id pid, user_id, epoch_us(ts) pts FROM events
        |           WHERE event_type = 'purchase'),
        |     c AS (SELECT event_id cid, user_id, epoch_us(ts) cts FROM events
        |           WHERE event_type = 'click'),
        |r AS (SELECT pid, cid, abs(pts - cts) gap_us,
        |        row_number() OVER (PARTITION BY pid
        |          ORDER BY abs(pts - cts), cid) rn
        |      FROM p JOIN c USING (user_id))
        |SELECT pid, cid, gap_us FROM r WHERE rn = 1 ORDER BY pid""".stripMargin,

    "a19_equidepth" ->
      """WITH bounds AS (
        |  SELECT quantile_cont(value, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) bs
        |  FROM events),
        |b AS (SELECT value,
        |        len(list_filter(bs, x -> value > x)) + 1 AS bucket
        |      FROM events CROSS JOIN bounds)
        |SELECT bucket, count(*) AS n,
        |       round(min(value) + 1e-9, 4) AS lo,
        |       round(max(value) + 1e-9, 4) AS hi,
        |       round(avg(value) + 1e-9, 4) AS mean
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
