package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Series/window operators and composite aggregation patterns
  * (SURVEY §2.5 W3/W6/W9, U1/U2; §2.4 A11/A12/A16; §2.7 streaming
  * window semantics in batch form).
  */
object SeriesQueries extends QueryModule {

  /** Extreme-scale drop-in for `w13_rolling_dau` (the SCALING.md
    * documented form, now real): per-day HLL sketches of user ids,
    * union-merged across the 7-day frame — the shuffle carries
    * fixed-size sketches (≤ ~2^lgK bytes each), never user ids. A
    * sliding DISTINCT has no window-function expression, and at
    * extreme scale the exact banded self-join's 7× user-id
    * re-shuffle dominates; sketches make the window merge O(days ×
    * sketch) regardless of cardinality. Estimates carry HLL's
    * standard error (≈1.04/√2^lgK — 0.8% at the default lgK=14),
    * bounded by SketchSpec against the exact form.
    */
  def rollingDauHll(events: org.apache.spark.sql.DataFrame,
                    lgK: Int = 14): org.apache.spark.sql.DataFrame = {
    val daily = events
      .select(col("event_type"), to_date(col("ts")).as("d"), col("user_id"))
      .groupBy(col("event_type"), col("d"))
      .agg(hll_sketch_agg(col("user_id"), lit(lgK)).as("sk"))
    // each day's sketch participates in the 7 output frames it covers;
    // emit only days that themselves have activity (w13's frame)
    daily.select(col("event_type"), col("sk"),
        explode(sequence(col("d"), date_add(col("d"), 6))).as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(hll_union_agg(col("sk")).as("wsk"))
      .join(daily.select(col("event_type"), col("d").as("day")),
        Seq("event_type", "day"))
      .select(col("event_type"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        hll_sketch_estimate(col("wsk")).as("wau7_est"))
  }

  private def dailyByType(s: SparkSession, dir: String, typ: String): DataFrame =
    Tables.events(s, dir).where(col("event_type") === typ)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(round(avg(col("value")) + lit(1e-9), 4).as("avg_v"), count(lit(1)).as("cnt"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // W3: global sort of an aggregated series by a measure
    // (TimeSeriesSpark.py:488 sortByKey)
    "w3_global_sort" -> { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(round(avg(col("value")) + lit(1e-9), 4).as("avg_v"))
        .orderBy(col("avg_v").desc, col("day"))
    },

    // W6: seasonal-cycle removal by group de-meaning
    // (Filtering.applySeasonalCycleFilter1d, Filtering.py:40-51):
    // subtract the (event_type, hour-of-day) mean from each value.
    "w6_seasonal_demean" -> { (s, dir) =>
      val w = Window.partitionBy(col("event_type"), hour(col("ts")))
      // +1e-9 nudges values off exact .00005 rounding boundaries, where
      // the engines' different summation orders would otherwise round in
      // opposite directions (same shift is applied in the oracle SQL).
      Tables.events(s, dir)
        .withColumn("deseason", col("value") - avg(col("value")).over(w))
        .select(col("event_id"), round(col("deseason") + lit(1e-9), 4).as("deseason"))
        .orderBy("event_id")
    },

    // W7: zero-phase low-pass over daily series (Filtering.py:87-97's
    // filtfilt role) — order-5 forward+backward moving-average cascade,
    // two passes, partitioned per series so it runs distributed.
    "w7_lowpass" -> { (s, dir) =>
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(avg(col("value")).as("v"))
      graft.kernels.SeriesFilters
        .lowPass(daily, Seq("event_type"), "day", "v", windowSize = 5, passes = 2)
        .select(col("event_type"), col("day"),
          round(col("lowpass") + lit(1e-9), 4).as("smooth_v"))
        .orderBy("event_type", "day")
    },

    // W9/A15: merge per-dataset series into time-keyed rows
    // (NexusHandler._mergeDataSeries:215-244) — a day × event_type pivot.
    "w9_pivot_series" -> { (s, dir) =>
      val e = Tables.events(s, dir)
      e.groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(
          round(avg(when(col("event_type") === "click", col("value"))) + lit(1e-9), 4).as("click_avg"),
          round(avg(when(col("event_type") === "view", col("value"))) + lit(1e-9), 4).as("view_avg"),
          round(avg(when(col("event_type") === "purchase", col("value"))) + lit(1e-9), 4).as("purchase_avg"),
          round(avg(when(col("event_type") === "signup", col("value"))) + lit(1e-9), 4).as("signup_avg"),
          round(avg(when(col("event_type") === "error", col("value"))) + lit(1e-9), 4).as("error_avg"))
        .orderBy("day")
    },

    // U1: union of per-dataset result series (TimeSeriesSpark.py:166-233)
    "u1_union_series" -> { (s, dir) =>
      dailyByType(s, dir, "click").withColumn("series", lit("click"))
        .unionByName(dailyByType(s, dir, "purchase").withColumn("series", lit("purchase")))
        .orderBy("series", "day")
    },

    // A11: two-level weighted average — weighted mean of group means
    // (TimeSeriesSpark.calculate_monthly_average:261-326)
    "a11_two_level_weighted" -> { (s, dir) =>
      val perOrder = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(avg(col("l_quantity")).as("m"), count(lit(1)).as("c"))
      perOrder.join(Tables.orders(s, dir),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mo"))
        .agg(round(sum(col("m") * col("c")) / sum(col("c")) + lit(1e-9), 4).as("wavg"),
          sum(col("c")).as("n"))
        .orderBy("yr", "mo")
    },

    // A12/U2: aggregate pushdown — inner rows answered from summaries,
    // border rows recomputed, combined (TimeSeriesSolr.py:284-327,
    // TimeSeries.py:311-334). The union of disjoint partials must equal
    // the direct aggregate (which is what the oracle computes).
    "a12_agg_pushdown" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val cutoff = lit("1998-01-01").cast("timestamp")
      val inner = li.where(col("l_shipdate") < cutoff)
        .groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity")).as("s"), count(lit(1)).as("c"))
      val border = li.where(col("l_shipdate") >= cutoff)
        .groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity")).as("s"), count(lit(1)).as("c"))
      inner.unionByName(border)
        .groupBy(col("l_returnflag"))
        .agg(round(sum(col("s")) + lit(1e-9), 4).as("sum_q"), sum(col("c")).as("cnt"),
          round(sum(col("s")) / sum(col("c")) + lit(1e-9), 4).as("mean_q"))
        .orderBy("l_returnflag")
    },

    // A16: approximate value at a point — row nearest to a probe
    // coordinate per key (nexusmodel.get_approximate_value_for_lat_lon
    // :223-250)
    "a16_nearest_value" -> { (s, dir) =>
      val probe = lit(1705320000000000L) // 2024-01-15 12:00 UTC in µs
      val e = Tables.events(s, dir)
        .withColumn("d_us", abs(unix_micros(col("ts")) - probe))
      val w = Window.partitionBy(col("user_id")).orderBy(col("d_us").asc, col("event_id").asc)
      e.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select(col("user_id"), col("event_id"), round(col("value") + lit(1e-9), 4).as("value_r"),
          col("d_us"))
        .orderBy("user_id")
    },

    // W10 (beyond the reference): event-time RANGE-frame rolling mean —
    // trailing 7 days per type over the daily series. RANGE frames are
    // gap-correct (a missing day still bounds the window by time, not
    // row count), which ROWS frames get wrong on sparse series.
    "w10_rolling_range" -> { (s, dir) =>
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"),
          unix_timestamp(date_trunc("day", col("ts"))).as("d"))
        .agg(avg(col("value")).as("v"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("d"))
        .rangeBetween(-518400, 0) // 6 days back + current = 7-day window
      daily.select(col("event_type"), col("d"),
          round(avg(col("v")).over(w) + lit(1e-9), 4).as("roll7"))
        .orderBy("event_type", "d")
    },

    // §2.7: tumbling-window aggregation — the batch shape of the
    // Structured Streaming ingest pipeline's windowed stats.
    "st_window_1h" -> { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), round(avg(col("value")) + lit(1e-9), 4).as("avg_v"))
        .select(unix_micros(col("w.start")).as("w_start_us"), col("event_type"),
          col("cnt"), col("avg_v"))
        .orderBy("w_start_us", "event_type")
    },

    // Session windows (the other half of §2.7's stateful streaming
    // surface, in batch form): per-type activity sessions split on
    // 5-minute silence. Spark merges event windows [ts, ts+gap);
    // the oracle reproduces that with gaps-and-islands (new session
    // iff ts - prev >= gap; session end = last ts + gap).
    // Run-length encoding of the value signal around a 100.0
    // threshold — run boundaries depend on neighbor VALUES, which no
    // built-in window can express. Oracle = gaps-and-islands. The batch
    // entrypoint routes to the SHARDED plan (per-(key, day) RLE +
    // boundary stitch) — the flatMapGroupsWithState fold remains the
    // streaming form (runsStream) and is spec-covered; its batch twin
    // is ≤#keys-way parallel and is no longer the default.
    "st_state_rle" -> { (s, dir) =>
      graft.streaming.StateTracker.highLowRuns(Tables.events(s, dir), 100.0)
    },

    // Same RLE over the round-robin-spread input (the single-row-group
    // testdata otherwise scans in one task) — kept as a separate gate
    // so both the raw and spread scan shapes stay oracled.
    "st_rle_sharded" -> { (s, dir) =>
      graft.streaming.StateTracker.highLowRunsSharded(
        Tables.eventsSpread(s, dir), 100.0)
    },

    // Stream-stream interval join (batch shape): each purchase paired
    // with the same user's clicks in the 4 hours before it — the
    // watermarked two-stream join of §2.7's streaming surface
    // (StreamingSpec drives the same operator on MemoryStreams with
    // cross-batch arrival and watermark eviction).
    "st_stream_join" -> { (s, dir) =>
      val p = Tables.events(s, dir).where(col("event_type") === "purchase")
        .select(col("event_id").as("pid"), col("user_id").as("p_user"),
          col("ts"))
      val c = Tables.events(s, dir).where(col("event_type") === "click")
        .select(col("event_id").as("ceid"), col("user_id").as("c_user"),
          col("ts").as("cts"))
      graft.streaming.StreamingIngest.intervalJoin(
          p, "ts", c, "cts", col("p_user") === col("c_user"),
          lookbackSeconds = 14400, watermark = "2 hours")
        .select(col("pid"), col("ceid"), col("p_user").as("user_id"),
          (unix_micros(col("ts")) - unix_micros(col("cts"))).as("gap_us"))
        .orderBy("pid", "ceid")
    },

    // Retention cohorts: users grouped by first-seen week, counted in
    // each later activity week — the cohort-retention triangle of
    // event analytics. Two linear aggregates (first-seen per user;
    // distinct user-week grain) and one equi-join on user_id; no
    // window, no per-pair state.
    "st_retention_cohort" -> { (s, dir) =>
      val wk = (unix_micros(col("ts")) / lit(604800000000L)).cast("long")
      val activity = Tables.events(s, dir)
        .select(col("user_id"), wk.as("w")).distinct()
      val cohort = activity.groupBy(col("user_id"))
        .agg(min(col("w")).as("cohort_w"))
      activity.join(cohort, "user_id")
        .groupBy(col("cohort_w"), (col("w") - col("cohort_w")).as("week_n"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy("cohort_w", "week_n")
    },

    // Rolling 7-day distinct users per event type (the DAU/WAU pair of
    // event analytics). Sliding DISTINCT has no window form — distinct
    // doesn't decompose over overlapping frames — so the scalable
    // shape is: dedup to (type, day, user) grain first (the big
    // aggregate, linear), then EXPLODE each output day's 7-day frame
    // on the tiny dau side and equi-join the grain on the exact
    // (type, day). First shipped as a range join banded only on
    // event_type (5 keys): a near-nested-loop that measured 57 s at
    // the 100× probe; the exploded-frame equi-join runs 4 s — same
    // rows out, the join key now carries the day. The sketch drop-in
    // at extreme scale is a per-day HLL merged across the frame (a17).
    "w13_rolling_dau" -> { (s, dir) =>
      // r14: left in its r13 shape after three measured rewrites LOST:
      // a second countDistinct in the frame join's .agg Expand-
      // multiplies the joined rows ×2; a two-level (type, day, user)
      // pre-aggregate costs as much as countDistinct's internal dedup;
      // and a lazy checkpoint of `grain` (it has two consumers) traded
      // a cheap pipelined recompute for a materialization barrier and
      // benched +0.5 s. Recompute-vs-persist only pays here when the
      // subtree is expensive — this one is a single scan + dedup.
      val grain = Tables.events(s, dir)
        .select(col("event_type"), to_date(col("ts")).as("d"), col("user_id"))
        .distinct()
      val dau = grain.groupBy(col("event_type"), col("d"))
        .agg(countDistinct(col("user_id")).as("dau"))
      val frame = dau.select(col("event_type"), col("d"), col("dau"),
        explode(sequence(date_sub(col("d"), 6), col("d"))).as("md"))
      val win = grain.select(col("event_type"), col("d").as("md"), col("user_id"))
      frame.join(win, Seq("event_type", "md"))
        .groupBy(col("event_type"), col("d"), col("dau"))
        .agg(countDistinct(col("user_id")).as("wau7"))
        .select(col("event_type"), date_format(col("d"), "yyyy-MM-dd").as("day"),
          col("dau"), col("wau7"))
        .orderBy("event_type", "day")
    },

    // Time-weighted (trapezoidal) average over an IRREGULAR series —
    // the correct mean when observations are unevenly spaced (a plain
    // avg over-weights bursts; satellite passes and buoy reports are
    // exactly this shape). Per (user, type): Σ (v_i + v_{i+1})/2 · Δt_i
    // / Σ Δt_i via one lead() window over high-cardinality keys.
    "w12_time_weighted" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy("us", "event_id")
      val segs = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"), col("event_id"), col("value"))
        .withColumn("nus", lead(col("us"), 1).over(w))
        .withColumn("nv", lead(col("value"), 1).over(w))
        .where(col("nus").isNotNull)
      segs.groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n_segs"),
          round(sum((col("value") + col("nv")) / 2.0 * (col("nus") - col("us")))
            / sum(col("nus") - col("us")) + lit(1e-9), 4).as("tw_avg"),
          round(avg(col("value")) + lit(1e-9), 4).as("plain_avg"))
        .orderBy("user_id", "event_type")
    },

    // Series resampling with linear gap-fill: a sparse per-type daily
    // series (every-37th event) projected onto the full day grid, with
    // missing days linearly interpolated between the surrounding known
    // points. The known-point lookup is two ignore-nulls running
    // windows per type (low-cardinality partitions of bounded length —
    // a day grid, not the event stream, so the single-task-per-type
    // window is bounded at any corpus scale).
    "w11_resample_interp" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val sampled = Tables.events(s, dir)
        .where(col("event_id") % 37 === 0)
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(avg(col("value")).as("v"))
      val ext = sampled.groupBy(col("event_type"))
        .agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
      val grid = ext.select(col("event_type"),
        explode(sequence(col("d0"), col("d1"))).as("d"))
      val wPrev = Window.partitionBy("event_type").orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
      val wNext = Window.partitionBy("event_type").orderBy("d")
        .rowsBetween(0, Window.unboundedFollowing)
      grid.join(sampled, Seq("event_type", "d"), "left")
        .select(col("event_type"), col("d"), col("v"),
          last(col("v"), ignoreNulls = true).over(wPrev).as("pv"),
          last(when(col("v").isNotNull, col("d")), ignoreNulls = true)
            .over(wPrev).as("pd"),
          first(col("v"), ignoreNulls = true).over(wNext).as("nv"),
          first(when(col("v").isNotNull, col("d")), ignoreNulls = true)
            .over(wNext).as("nd"))
        .select(col("event_type"), date_format(col("d"), "yyyy-MM-dd").as("day"),
          col("v").isNotNull.as("is_known"),
          round(when(col("v").isNotNull, col("v"))
            .otherwise(col("pv") + (col("nv") - col("pv"))
              * datediff(col("d"), col("pd"))
              / datediff(col("nd"), col("pd"))) + lit(1e-9), 4).as("v_fill"))
        .orderBy("event_type", "day")
    },

    // Event funnel (view → click → purchase): per user, the first view,
    // the first click AT OR AFTER that view, and the first purchase at
    // or after that click — the step-ordered conversion analysis of an
    // event pipeline. Each step is one min-aggregate keyed by user
    // (high-cardinality uniform key at scale); steps chain by joining
    // the previous step's result back to the filtered event stream, so
    // nothing ever materializes per-pair state.
    "st_funnel" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      def firstAfter(df: DataFrame, typ: String, prev: DataFrame,
                     prevCol: String, outCol: String): DataFrame =
        df.where(col("event_type") === typ)
          .join(prev, "user_id")
          .where(col("us") >= col(prevCol))
          .groupBy(prev.columns.map(col): _*)
          .agg(min(col("us")).as(outCol))
      val v = ev.where(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("us")).as("view_us"))
      val c = firstAfter(ev, "click", v, "view_us", "click_us")
      val p = firstAfter(ev, "purchase", c, "click_us", "purchase_us")
      v.join(c.select(col("user_id"), col("click_us")), Seq("user_id"), "left")
        .join(p.select(col("user_id"), col("purchase_us")), Seq("user_id"), "left")
        .select(col("user_id"), col("view_us"), col("click_us"),
          col("purchase_us"),
          (col("purchase_us") - col("view_us")).as("funnel_us"))
        .orderBy("user_id")
    },

    "st_session_gap" -> { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"), session_window(col("ts"), "5 minutes"))
        .agg(count(lit(1)).as("n_events"),
          round(avg(col("value")) + lit(1e-9), 4).as("avg_v"))
        .select(col("event_type"),
          unix_micros(col("session_window.start")).as("sess_start_us"),
          unix_micros(col("session_window.end")).as("sess_end_us"),
          col("n_events"), col("avg_v"))
        .orderBy("event_type", "sess_start_us")
    }
  )

  def oracle: Map[String, String] = Map(
    "w3_global_sort" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day, round(avg(value) + 1e-9, 4) AS avg_v
        |FROM events GROUP BY 1 ORDER BY avg_v DESC, day""".stripMargin,

    "w6_seasonal_demean" ->
      """SELECT event_id,
        |       round(value - avg(value) OVER (PARTITION BY event_type, hour(ts))
        |             + 1e-9, 4) AS deseason
        |FROM events ORDER BY event_id""".stripMargin,

    "w7_lowpass" ->
      """WITH daily AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
        |                      avg(value) v
        |               FROM events GROUP BY 1, 2),
        |p1f AS (SELECT event_type, day, avg(v) OVER (PARTITION BY event_type
        |          ORDER BY day ASC ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) f
        |        FROM daily),
        |p1b AS (SELECT event_type, day, avg(f) OVER (PARTITION BY event_type
        |          ORDER BY day DESC ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) lp
        |        FROM p1f),
        |p2f AS (SELECT event_type, day, avg(lp) OVER (PARTITION BY event_type
        |          ORDER BY day ASC ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) f
        |        FROM p1b),
        |p2b AS (SELECT event_type, day, avg(f) OVER (PARTITION BY event_type
        |          ORDER BY day DESC ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) lp
        |        FROM p2f)
        |SELECT event_type, day, round(lp + 1e-9, 4) AS smooth_v
        |FROM p2b ORDER BY event_type, day""".stripMargin,

    "w9_pivot_series" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day,
        |       round(avg(CASE WHEN event_type = 'click' THEN value END) + 1e-9, 4) AS click_avg,
        |       round(avg(CASE WHEN event_type = 'view' THEN value END) + 1e-9, 4) AS view_avg,
        |       round(avg(CASE WHEN event_type = 'purchase' THEN value END) + 1e-9, 4) AS purchase_avg,
        |       round(avg(CASE WHEN event_type = 'signup' THEN value END) + 1e-9, 4) AS signup_avg,
        |       round(avg(CASE WHEN event_type = 'error' THEN value END) + 1e-9, 4) AS error_avg
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "u1_union_series" ->
      """SELECT day, avg_v, cnt, series FROM (
        |  SELECT strftime(ts, '%Y-%m-%d') AS day, round(avg(value) + 1e-9, 4) avg_v,
        |         count(*) cnt, 'click' series
        |  FROM events WHERE event_type = 'click' GROUP BY 1
        |  UNION ALL
        |  SELECT strftime(ts, '%Y-%m-%d') AS day, round(avg(value) + 1e-9, 4) avg_v,
        |         count(*) cnt, 'purchase' series
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1)
        |ORDER BY series, day""".stripMargin,

    "a11_two_level_weighted" ->
      """WITH per_o AS (SELECT l_orderkey, avg(l_quantity) m, count(*) c
        |               FROM lineitem GROUP BY 1)
        |SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mo,
        |       round(sum(m * c) / sum(c) + 1e-9, 4) AS wavg, CAST(sum(c) AS BIGINT) AS n
        |FROM per_o JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "a12_agg_pushdown" ->
      """SELECT l_returnflag, round(sum(l_quantity) + 1e-9, 4) AS sum_q, count(*) AS cnt,
        |       round(sum(l_quantity) / count(*) + 1e-9, 4) AS mean_q
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "a16_nearest_value" ->
      """SELECT user_id, event_id, round(value + 1e-9, 4) AS value_r, d_us
        |FROM (SELECT *, abs(epoch_us(ts) - 1705320000000000) AS d_us,
        |             row_number() OVER (PARTITION BY user_id
        |               ORDER BY abs(epoch_us(ts) - 1705320000000000) ASC,
        |                        event_id ASC) AS rn
        |      FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "w10_rolling_range" ->
      """WITH daily AS (SELECT event_type,
        |                      CAST(epoch(date_trunc('day', ts)) AS BIGINT) d,
        |                      avg(value) v
        |               FROM events GROUP BY 1, 2)
        |SELECT event_type, d,
        |       round(avg(v) OVER (PARTITION BY event_type ORDER BY d
        |             RANGE BETWEEN 518400 PRECEDING AND CURRENT ROW) + 1e-9, 4)
        |         AS roll7
        |FROM daily ORDER BY event_type, d""".stripMargin,

    "st_window_1h" ->
      """SELECT epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS w_start_us,
        |       event_type, count(*) AS cnt, round(avg(value) + 1e-9, 4) AS avg_v
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "st_rle_sharded" -> RleOracle,
    "st_state_rle" -> RleOracle
  ) ++ oracleRest

  /** One oracle, two implementations (stateful scan vs sharded
    * two-pass) — the differential is the point.
    */
  private val RleOracle =
    """WITH e AS (SELECT event_type, epoch_us(ts) us, event_id, value,
        |                  CASE WHEN value >= 100.0 THEN 1 ELSE 0 END b
        |           FROM events),
        |x AS (SELECT *, CASE WHEN lag(b) OVER w IS NULL
        |                       OR lag(b) OVER w <> b
        |                     THEN 1 ELSE 0 END new_r
        |      FROM e WINDOW w AS (PARTITION BY event_type ORDER BY us, event_id)),
        |g AS (SELECT *, sum(new_r) OVER (PARTITION BY event_type ORDER BY us, event_id
        |                  ROWS UNBOUNDED PRECEDING) rid
        |      FROM x)
        |SELECT event_type, CAST(min(b) AS BIGINT) AS bucket,
        |       min(us) AS start_us, max(us) AS end_us,
        |       count(*) AS n_events, round(avg(value) + 1e-9, 4) AS avg_v
        |FROM g GROUP BY event_type, rid
        |ORDER BY event_type, start_us""".stripMargin

  private def oracleRest: Map[String, String] = Map(
    "st_stream_join" ->
      """WITH p AS (SELECT event_id pid, user_id, epoch_us(ts) pts FROM events
        |           WHERE event_type = 'purchase'),
        |     c AS (SELECT event_id ceid, user_id, epoch_us(ts) cts FROM events
        |           WHERE event_type = 'click')
        |SELECT pid, ceid, user_id, pts - cts AS gap_us
        |FROM p JOIN c USING (user_id)
        |WHERE cts BETWEEN pts - 14400000000 AND pts
        |ORDER BY pid, ceid""".stripMargin,

    "st_retention_cohort" ->
      """WITH act AS (SELECT DISTINCT user_id,
        |               epoch_us(ts) // 604800000000 AS w
        |             FROM events),
        |coh AS (SELECT user_id, min(w) AS cohort_w FROM act GROUP BY 1)
        |SELECT coh.cohort_w, act.w - coh.cohort_w AS week_n,
        |       count(DISTINCT act.user_id) AS n_users
        |FROM act JOIN coh ON act.user_id = coh.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "w13_rolling_dau" ->
      """WITH grain AS (SELECT DISTINCT event_type, CAST(ts AS DATE) d, user_id
        |               FROM events),
        |dau AS (SELECT event_type, d, count(DISTINCT user_id) AS dau
        |        FROM grain GROUP BY 1, 2)
        |SELECT dau.event_type, strftime(dau.d, '%Y-%m-%d') AS day, dau.dau,
        |       count(DISTINCT g.user_id) AS wau7
        |FROM dau JOIN grain g
        |  ON g.event_type = dau.event_type
        | AND g.d BETWEEN dau.d - INTERVAL 6 DAY AND dau.d
        |GROUP BY 1, 2, 3 ORDER BY 1, 2""".stripMargin,

    "w12_time_weighted" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) us, event_id, value
        |           FROM events),
        |segs AS (SELECT *,
        |    lead(us) OVER w AS nus, lead(value) OVER w AS nv
        |  FROM e WINDOW w AS (PARTITION BY user_id, event_type
        |                      ORDER BY us, event_id))
        |SELECT user_id, event_type, count(*) AS n_segs,
        |       round(sum((value + nv) / 2.0 * (nus - us))
        |             / sum(nus - us) + 1e-9, 4) AS tw_avg,
        |       round(avg(value) + 1e-9, 4) AS plain_avg
        |FROM segs WHERE nus IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "w11_resample_interp" ->
      """WITH s AS (SELECT event_type, CAST(ts AS DATE) d, avg(value) v
        |           FROM events WHERE event_id % 37 = 0 GROUP BY 1, 2),
        |ext AS (SELECT event_type, min(d) d0, max(d) d1 FROM s GROUP BY 1),
        |grid AS (SELECT event_type,
        |           CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) d
        |         FROM ext),
        |j AS (SELECT g.event_type, g.d, s.v
        |      FROM grid g LEFT JOIN s ON s.event_type = g.event_type AND s.d = g.d),
        |g2 AS (SELECT *,
        |        count(v) OVER (PARTITION BY event_type ORDER BY d) gp,
        |        count(v) OVER (PARTITION BY event_type ORDER BY d DESC) gn
        |       FROM j),
        |f AS (SELECT *,
        |        max(v) OVER (PARTITION BY event_type, gp) pv,
        |        max(CASE WHEN v IS NOT NULL THEN d END)
        |          OVER (PARTITION BY event_type, gp) pd,
        |        max(v) OVER (PARTITION BY event_type, gn) nv,
        |        min(CASE WHEN v IS NOT NULL THEN d END)
        |          OVER (PARTITION BY event_type, gn) nd
        |      FROM g2)
        |SELECT event_type, strftime(d, '%Y-%m-%d') AS day,
        |       v IS NOT NULL AS is_known,
        |       round(CASE WHEN v IS NOT NULL THEN v
        |             ELSE pv + (nv - pv) * date_diff('day', pd, d)
        |                  / CAST(date_diff('day', pd, nd) AS DOUBLE) END
        |             + 1e-9, 4) AS v_fill
        |FROM f ORDER BY event_type, day""".stripMargin,

    "st_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) us FROM events),
        |v AS (SELECT user_id, min(us) AS view_us FROM e
        |      WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, v.view_us, min(e.us) AS click_us
        |      FROM e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.us >= v.view_us
        |      GROUP BY 1, 2),
        |p AS (SELECT e.user_id, min(e.us) AS purchase_us
        |      FROM e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.us >= c.click_us
        |      GROUP BY 1)
        |SELECT v.user_id, v.view_us, c.click_us, p.purchase_us,
        |       p.purchase_us - v.view_us AS funnel_us
        |FROM v LEFT JOIN c ON c.user_id = v.user_id
        |       LEFT JOIN p ON p.user_id = v.user_id
        |ORDER BY v.user_id""".stripMargin,

    "st_session_gap" ->
      """WITH e AS (SELECT event_type, epoch_us(ts) us, value FROM events),
        |x AS (SELECT *, CASE WHEN lag(us) OVER w IS NULL
        |                       OR us - lag(us) OVER w >= 300000000
        |                     THEN 1 ELSE 0 END new_s
        |      FROM e WINDOW w AS (PARTITION BY event_type ORDER BY us)),
        |g AS (SELECT *, sum(new_s) OVER (PARTITION BY event_type ORDER BY us
        |                  ROWS UNBOUNDED PRECEDING) sid
        |      FROM x)
        |SELECT event_type, min(us) AS sess_start_us,
        |       max(us) + 300000000 AS sess_end_us,
        |       count(*) AS n_events, round(avg(value) + 1e-9, 4) AS avg_v
        |FROM g GROUP BY event_type, sid ORDER BY event_type, sess_start_us""".stripMargin
  )
}
