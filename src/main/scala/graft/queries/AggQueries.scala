package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.GeoFunctions._

/** Aggregation kernels re-expressed over the driver testdata
  * (SURVEY §2.4). The reference computes these as hand-rolled numpy
  * map/combineByKey RDD kernels; here each is a declarative groupBy so
  * Catalyst plans partial (map-side) + final hash aggregation — the
  * scalable equivalent of the reference's combineByKey partials.
  */
object AggQueries extends QueryModule {

  /** Fixed sketch-calibration corpus for `a17c_sketch_tight` —
    * generated inline (never from the SF dir), so it is IDENTICAL at
    * every SF and across rounds: 200k rows, grp = id%4, per-group
    * user space d = grp*10000+15001 (odd ⇒ gcd(4,d)=1 ⇒ the 50k ids
    * of each group cover every residue ⇒ exact distinct users per
    * group is exactly d: 15001/25001/35001/45001 — the cardinalities
    * SketchProbe measured the band on), v = (id*37)%10007 as double.
    * The DuckDB oracle regenerates the same rows via range().
    */
  private[graft] def sketchCorpus(s: SparkSession): DataFrame =
    s.range(0, 200000L, 1, 32)
      .select(
        (col("id") % 4).as("grp"),
        (col("id") % ((col("id") % 4) * 10000 + 15001)).as("u"),
        ((col("id") * 37) % 10007).cast("double").as("v"))

  /** Band for the tight HLL boolean: the MEASURED relative error of
    * Spark's approx_count_distinct at rsd=0.02 on sketchCorpus
    * (deterministic — fixed input set, merge-order-independent
    * registers), plus margin. Measured r13 (graft.tools.SketchProbe):
    * per-group rel err 0.0060 / 0.0194 / 0.0051 / 0.0132 — worst
    * 0.0194 (grp=1), band = 0.0194 + ~1% margin = 0.03. A measured
    * figure with provenance, NOT a loosened round-trip: if HLL++
    * drifts by more than the margin on a bit-identical input, the
    * pinned-true boolean flips loudly. (Default-rsd error on the same
    * corpus measured up to 0.0507 — that regime is what a17b's wide
    * band covers on SF-varying data.)
    */
  private[graft] val SketchTightBand: Double = 0.03

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1: per-day box statistics (TimeSeriesSpark.calc_average_on_day,
    // algorithms_spark/TimeSeriesSpark.py:493-554): min/max/count/std plus
    // weighted mean (reference weights by cos(lat); weight column here
    // is l_extendedprice).
    "a1_daily_stats" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(date_format(col("l_shipdate"), "yyyy-MM-dd").as("day"))
        .agg(
          count(lit(1)).as("cnt"),
          round(min(col("l_quantity")) + lit(1e-9), 4).as("min_q"),
          round(max(col("l_quantity")) + lit(1e-9), 4).as("max_q"),
          round(stddev_samp(col("l_quantity")) + lit(1e-9), 4).as("std_q"),
          round(weightedMean(col("l_quantity"), col("l_extendedprice")) + lit(1e-9), 4).as("wmean_q"))
        .orderBy("day")
    },

    // A2: per-cell sum/count partials → mean (TimeAvgMapSpark.py:28-96,
    // 181-198): grid cell ≡ (returnflag, linestatus).
    "a2_time_avg_map" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")) + lit(1e-9), 4).as("sum_q"),
          count(col("l_quantity")).as("cnt"),
          round(sum(col("l_quantity")) / count(col("l_quantity")) + lit(1e-9), 4).as("avg_q"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // A3: climatology map — same partials but month-of-year windows
    // across years (ClimMapSpark.py:29-98,176-207).
    "a3_clim_map" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .where(month(col("l_shipdate")) === 7)
        .groupBy(col("l_returnflag"), year(col("l_shipdate")).cast("long").as("yr"))
        .agg(round(sum(col("l_quantity")) + lit(1e-9), 4).as("sum_q"),
          count(lit(1)).as("cnt"),
          round(avg(col("l_quantity")) + lit(1e-9), 4).as("avg_q"))
        .orderBy("l_returnflag", "yr")
    },

    // A4: per-cell Pearson correlation via one-pass sums
    // (CorrMapSpark.py:29-151,228-271); Spark's corr uses the same
    // one-pass algebra.
    "a4_corr_map" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(round(corr(col("l_quantity"), col("l_extendedprice")) + lit(1e-9), 6).as("r"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },

    // A5: daily anomaly mean+std with parallel variance merge
    // (DailyDifferenceAverageSpark.py:263-292): anomaly = value − global
    // climatological mean of the event type.
    "a5_anomaly_daily" -> { (s, dir) =>
      val e = Tables.events(s, dir)
      val clim = e.groupBy(col("event_type")).agg(avg(col("value")).as("clim_mean"))
      e.join(broadcast(clim), "event_type")
        .withColumn("diff", col("value") - col("clim_mean"))
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("event_type"))
        .agg(round(avg(col("diff")) + lit(1e-9), 4).as("mean_diff"),
          round(stddev_samp(col("diff")) + lit(1e-9), 4).as("std_diff"),
          count(lit(1)).as("cnt"))
        .orderBy("day", "event_type")
    },

    // A6: Hovmöller — per (time bucket, band) stats
    // (HofMoellerSpark.py:27-102): band ≡ user_id decile.
    "a6_hovmoller" -> { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"),
          (col("user_id") / 10).cast("long").as("band"))
        .agg(count(lit(1)).as("cnt"),
          round(avg(col("value")) + lit(1e-9), 4).as("avg_v"),
          round(min(col("value")) + lit(1e-9), 4).as("min_v"),
          round(max(col("value")) + lit(1e-9), 4).as("max_v"),
          round(stddev_samp(col("value")) + lit(1e-9), 4).as("std_v"))
        .orderBy("day", "band")
    },

    // A8: dataset list with counts and extents (SolrProxy facets :62-135)
    "a8_dataset_list" -> { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          unix_micros(min(col("ts"))).as("min_ts_us"),
          unix_micros(max(col("ts"))).as("max_ts_us"))
        .orderBy("event_type")
    },

    // A9: distinct days in range (SolrProxy.pyx:155-184)
    "a9_distinct_days" -> { (s, dir) =>
      Tables.events(s, dir)
        .select(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .distinct()
        .orderBy("day")
    },

    // A10: distinct bounds (SolrProxy.pyx:283-320)
    "a10_distinct_bounds" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .select(col("l_returnflag"), col("l_linestatus"))
        .distinct()
        .orderBy("l_returnflag", "l_linestatus")
    },

    // A13/A14: per-group linear regression + correlation map
    // (LongitudeLatitudeMap.regression_on_tiles, TimeSeriesSpark.py:337-355)
    "a14_regression_map" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          round(regr_slope(col("l_extendedprice"), col("l_quantity")) + lit(1e-9), 4).as("slope"),
          round(regr_intercept(col("l_extendedprice"), col("l_quantity")) + lit(1e-9), 4).as("icept"),
          round(corr(col("l_extendedprice"), col("l_quantity")) + lit(1e-9), 6).as("r"),
          round(avg(col("l_extendedprice")) + lit(1e-9), 4).as("avg_p"),
          round(stddev_samp(col("l_extendedprice")) + lit(1e-9), 4).as("std_p"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag")
    },

    // A17 (beyond the reference — SURVEY §2.4 note "our engine gets
    // approx_count_distinct for free"): the sketch scale path. Exact
    // distinct/percentile need the full value set per group; the HLL++
    // and t-digest sketches are fixed-size mergeable partials, the
    // form that survives 100 TB and streaming. The gate is rows-only
    // (DuckDB's approx algorithms differ); SketchSpec bounds the
    // error against the exact values.
    "a17_approx_sketch" -> { (s, dir) =>
      // sketches ONLY: HLL++ and t-digest partials are fixed-size and
      // merge map-side, so this scales like a plain aggregate. The
      // exact forms (countDistinct's per-key shuffle, percentile's
      // full value buffer per group) are exactly what does NOT survive
      // 100 TB — SketchSpec computes them at gate scale and bounds the
      // sketch error against them.
      Tables.eventsSpread(s, dir)
        .groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id")).as("approx_users"),
          round(percentile_approx(col("value"), lit(0.5), lit(10000))
            + lit(1e-9), 4).as("approx_p50"),
          count(lit(1)).as("cnt"))
        .orderBy("event_type")
    },

    // Sketch ERROR-BOUND gate (r10, same pattern as e_pca_eigen_check):
    // the sketch VALUES have no engine-independent oracle (HLL++
    // register layout and t-digest centroiding are implementation-
    // specific — that's why a17 is pinned-only), but their accuracy
    // CONTRACTS are checkable against exact aggregates DuckDB computes
    // too: the HLL estimate within 5×rsd of the exact distinct count
    // (exact value itself hash-oracled; the TIGHT 1×rsd band lives in
    // SketchSpec — this gate's band is wide because HLL error is
    // statistical and a 3×rsd tail outlier at some SF/seed would flip
    // the oracle-pinned boolean as a false failure, while real drift
    // is gross), and the approximate median inside the exact p45–p55
    // band (rank error at accuracy=10000 is orders of magnitude
    // tighter). Distinct-count and percentile
    // aggregates are SPLIT into two aggregations joined on the key —
    // mixing them in one .agg forces Expand row-multiplication.
    "a17b_sketch_bounds" -> { (s, dir) =>
      val ev = Tables.eventsSpread(s, dir)
      // exact countDistinct and the HLL sketch in SEPARATE aggregations
      // joined on the key (r14, guide §2.3 "aggregate before you
      // shuffle" + the known Expand trap): mixed in one .agg, Spark
      // plans the HLL partial KEYED BY (event_type, user_id) — one
      // 512-register buffer allocated and zeroed per DISTINCT KEY PAIR,
      // not per group. Split, the HLL partial is keyed by event_type
      // alone (5 buffers per task) and the exact distinct keeps its
      // two-level shape. HLL registers are merge-order-independent
      // (elementwise max), so the estimate is bit-identical either way.
      // r15 NOTE — a two-branch shape (HLL fused into the percentile
      // .agg; both are non-distinct, so no Expand) was measured and
      // REVERTED: the TypedImperative percentiles force
      // ObjectHashAggregate, which runs without whole-stage codegen,
      // and the HLL update there cost 15.6 s of task time vs 6.6 s for
      // the two codegen-separated partials (StageProf, sf0.1; gate
      // 0.9-1.1 s → 2.2 s). Keeping the HLL in its own HashAggregate
      // branch is the codegen rule (§4.1) beating the fewer-scans rule.
      val dExact = ev.groupBy(col("event_type")).agg(
        countDistinct(col("user_id")).as("n_users"))
      val dHll = ev.groupBy(col("event_type").as("__et")).agg(
        approx_count_distinct(col("user_id")).as("hll"))
      // null-SAFE joins (r15, VERDICT/ADVICE): a NULL event_type forms
      // a group under groupBy but an inner equi-join would silently
      // drop it — <=> matches null to null, so the split shape emits
      // exactly the rows the fused .agg emitted (SketchSpec pins this
      // with a null-keyed corpus)
      val d = dExact.join(dHll, col("event_type") <=> col("__et")).drop("__et")
      val p = ev.groupBy(col("event_type").as("__et2")).agg(
        percentile_approx(col("value"), lit(0.5), lit(10000)).as("p50a"),
        expr("percentile(value, 0.45)").as("p45"),
        expr("percentile(value, 0.55)").as("p55"))
      d.join(p, col("event_type") <=> col("__et2")).drop("__et2")
        .select(col("event_type"), col("n_users"),
          (abs(col("hll") - col("n_users"))
            <= col("n_users") * lit(0.25)).as("hll_ok"),
          (col("p50a") >= col("p45") && col("p50a") <= col("p55")).as("p50_ok"))
        .orderBy("event_type")
    },

    // Tight sketch-accuracy twin of a17b (r13): a17b's 0.25 band is
    // deliberately loose because eventsSpread varies with SF and HLL
    // error is statistical — a tail outlier at some SF would flip the
    // pinned boolean as a false failure. THIS gate removes the
    // statistics instead of widening the band: the corpus is generated
    // inline (SF-independent, fixed by construction), so the HLL++
    // estimate is one deterministic number (register maxes are
    // merge-order-independent) and the band can sit at the MEASURED
    // error plus margin — see sketchCorpus for the measured figures —
    // all of it inside the 1×rsd (0.05 at default precision) contract.
    // The approx-median check uses the accuracy contract directly:
    // rank error ≤ n/accuracy = 50000/10000 = 5 positions per group,
    // far inside the exact p49.5–p50.5 band (±250 positions), so the
    // boolean holds under any partial-merge order.
    "a17c_sketch_tight" -> { (s, dir) =>
      val c = sketchCorpus(s)
      // split exact-distinct from the HLL (r14, same rationale as
      // a17b): mixed, the rsd=0.02 sketch's 4096-register buffer was
      // allocated per distinct (grp, u) pair — ~200k buffers, measured
      // 18.9 s of task time in the partial stage; split, 4 buffers per
      // task. Register maxes are merge-order-independent, so the
      // estimate (and the gate's booleans) are value-identical.
      // r15: joins made null-safe (<=>); the two-branch HLL+percentile
      // fusion was measured-and-REVERTED for the same
      // ObjectHashAggregate-codegen reason as a17b above.
      val dExact = c.groupBy(col("grp")).agg(
        countDistinct(col("u")).as("n_users"))
      // rsd=0.02: 4096 registers instead of 512 — still a fixed-size
      // mergeable partial (the 100 TB shape), bought for a 2.5×
      // tighter measured band (see SketchTightBand)
      val dHll = c.groupBy(col("grp").as("__g")).agg(
        approx_count_distinct(col("u"), 0.02).as("hll"))
      val d = dExact.join(dHll, col("grp") <=> col("__g")).drop("__g")
      val p = c.groupBy(col("grp").as("__g2")).agg(
        percentile_approx(col("v"), lit(0.5), lit(10000)).as("p50a"),
        expr("percentile(v, 0.495)").as("p495"),
        expr("percentile(v, 0.505)").as("p505"))
      d.join(p, col("grp") <=> col("__g2")).drop("__g2")
        .select(col("grp"), col("n_users"),
          (abs(col("hll") - col("n_users"))
            <= col("n_users") * lit(SketchTightBand)).as("hll_tight_ok"),
          (col("p50a") >= col("p495") && col("p50a") <= col("p505"))
            .as("p50_tight_ok"))
        .orderBy("grp")
    },

    // A18 (beyond the reference): multi-dimensional CUBE rollup — all
    // 2^d grouping sets in ONE pass (Expand + single hash aggregate),
    // vs d separate scans+aggregations. The reference computes its
    // facet rollups (A8-A10) one at a time; CUBE is the engine-native
    // generalization.
    "a18_cube_rollup" -> { (s, dir) =>
      Tables.documents(s, dir)
        .cube(col("lang"), col("source"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"))
        .select(coalesce(col("lang"), lit("ALL")).as("lang_g"),
          coalesce(col("source"), lit("ALL")).as("src_g"),
          col("n"), col("sum_chars"))
        .orderBy("lang_g", "src_g")
    },

    // F-battery (SURVEY §2.6 F1-F4, F8, F11): unit conversions, wind
    // U/V round-trip, longitude wrap, haversine, deterministic id — all
    // codegen'd Column expressions, no UDFs.
    "f_scalar_battery" -> { (s, dir) =>
      val e = Tables.eventsSpread(s, dir)
      val dirDeg = (col("user_id") * 37 % 360).cast("double")
      val lon360 = when(col("value") >= 360, col("value") - 360).otherwise(col("value"))
      val u = windU(col("value"), dirDeg)
      val v = windV(col("value"), dirDeg)
      e.select(
          col("event_id"),
          round(kelvinToCelsius(col("value")) + lit(1e-9), 4).as("celsius"),
          round(lonTo180(lon360) + lit(1e-9), 4).as("lon180"),
          round(u + lit(1e-9), 4).as("wind_u"),
          round(v + lit(1e-9), 4).as("wind_v"),
          round(uvToSpeed(u, v) + lit(1e-9), 4).as("speed_rt"),
          // speed 0 ⇒ direction undefined; signed-zero atan2 conventions
          // differ across engines, so pin it to 0
          round(when(col("value") === 0, lit(0.0))
            .otherwise(uvToDirDeg(u, v)) + lit(1e-9), 4).as("dir_rt"),
          round(haversineKm((col("user_id") - 75).cast("double"), lonTo180(lon360),
            lit(0.0), lit(0.0)) + lit(1e-9), 4).as("hav_km"),
          md5(concat_ws("|", col("event_id"), col("user_id"))).as("tid"))
        .orderBy("event_id")
    },

    // The Student-t CDF kernel (A13's p-value numerics — Lentz
    // continued fraction + Lanczos log-gamma) oracled against
    // INDEPENDENT closed forms: at df=1/2/4 the regularized incomplete
    // beta I_x(df/2, 1/2) reduces to elementary functions
    // (df=1: (2/π)·asin(√x); df=2: 1−s with s=t/√(2+t²);
    // df=4: 1−1.5s+0.5s³ with s=t/√(4+t²)). Fixed t-grid of exact
    // binary quarters so the only thing compared IS the CDF numerics;
    // j5b's pinned status narrows to the regression→p composition.
    "f_tcdf_fixed" -> { (s, dir) =>
      import s.implicits._
      val p2 = udf((t: Double, df: Long) =>
        graft.functions.StudentT.twoSidedP(t, df.toDouble))
      (for { i <- 0 to 40; df <- Seq(1L, 2L, 4L) } yield (i.toLong, df))
        .toDF("i", "df")
        .select(col("i"), col("df"),
          round(p2(col("i").cast("double") * 0.25, col("df")) + lit(1e-9), 6)
            .as("p2"))
        .orderBy("i", "df")
    }
  )

  def oracle: Map[String, String] = Map(
    // the exact distinct count is hash-oracled; the sketch bounds are
    // booleans pinned true (a drifting HLL/t-digest flips one loudly)
    "a17b_sketch_bounds" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users,
        |       true AS hll_ok, true AS p50_ok
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    // regenerates sketchCorpus row for row (grp = i%4, u covers every
    // residue of the odd per-group modulus ⇒ exact n_users =
    // 15001/25001/35001/45001); the sketch booleans are pinned true
    // at the MEASURED band — see SketchTightBand's provenance comment
    "a17c_sketch_tight" ->
      """WITH g AS (
        |  SELECT i % 4 AS grp, i % ((i % 4) * 10000 + 15001) AS u
        |  FROM range(0, 200000) r(i))
        |SELECT CAST(grp AS BIGINT) AS grp,
        |       count(DISTINCT u) AS n_users,
        |       true AS hll_tight_ok, true AS p50_tight_ok
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,

    "a18_cube_rollup" ->
      """SELECT coalesce(lang, 'ALL') AS lang_g, coalesce(source, 'ALL') AS src_g,
        |       count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY CUBE(lang, source)
        |ORDER BY lang_g, src_g""".stripMargin,

    "a1_daily_stats" ->
      """SELECT strftime(l_shipdate, '%Y-%m-%d') AS day, count(*) AS cnt,
        |       round(min(l_quantity) + 1e-9, 4) AS min_q, round(max(l_quantity) + 1e-9, 4) AS max_q,
        |       round(stddev_samp(l_quantity) + 1e-9, 4) AS std_q,
        |       round(sum(l_quantity * l_extendedprice) / sum(l_extendedprice) + 1e-9, 4) AS wmean_q
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "a2_time_avg_map" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity) + 1e-9, 4) AS sum_q,
        |       count(l_quantity) AS cnt,
        |       round(sum(l_quantity) / count(l_quantity) + 1e-9, 4) AS avg_q
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "a3_clim_map" ->
      """SELECT l_returnflag, year(l_shipdate) AS yr, round(sum(l_quantity) + 1e-9, 4) AS sum_q,
        |       count(*) AS cnt, round(avg(l_quantity) + 1e-9, 4) AS avg_q
        |FROM lineitem WHERE month(l_shipdate) = 7
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "a4_corr_map" ->
      """SELECT l_returnflag, round(corr(l_quantity, l_extendedprice) + 1e-9, 6) AS r,
        |       count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "a5_anomaly_daily" ->
      """WITH clim AS (SELECT event_type, avg(value) AS clim_mean FROM events GROUP BY 1)
        |SELECT strftime(e.ts, '%Y-%m-%d') AS day, e.event_type,
        |       round(avg(e.value - c.clim_mean) + 1e-9, 4) AS mean_diff,
        |       round(stddev_samp(e.value - c.clim_mean) + 1e-9, 4) AS std_diff,
        |       count(*) AS cnt
        |FROM events e JOIN clim c ON e.event_type = c.event_type
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "a6_hovmoller" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day, user_id // 10 AS band,
        |       count(*) AS cnt, round(avg(value) + 1e-9, 4) AS avg_v,
        |       round(min(value) + 1e-9, 4) AS min_v, round(max(value) + 1e-9, 4) AS max_v,
        |       round(stddev_samp(value) + 1e-9, 4) AS std_v
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "a8_dataset_list" ->
      """SELECT event_type, count(*) AS cnt, epoch_us(min(ts)) AS min_ts_us,
        |       epoch_us(max(ts)) AS max_ts_us
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "a9_distinct_days" ->
      """SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS day FROM events ORDER BY 1""".stripMargin,

    "a10_distinct_bounds" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem ORDER BY 1, 2""".stripMargin,

    "a14_regression_map" ->
      """SELECT l_returnflag,
        |       round(regr_slope(l_extendedprice, l_quantity) + 1e-9, 4) AS slope,
        |       round(regr_intercept(l_extendedprice, l_quantity) + 1e-9, 4) AS icept,
        |       round(corr(l_extendedprice, l_quantity) + 1e-9, 6) AS r,
        |       round(avg(l_extendedprice) + 1e-9, 4) AS avg_p,
        |       round(stddev_samp(l_extendedprice) + 1e-9, 4) AS std_p,
        |       count(*) AS cnt
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "f_scalar_battery" ->
      """SELECT event_id,
        |       round(value - 273.15 + 1e-9, 4) AS celsius,
        |       round(CASE WHEN l360 > 180 THEN l360 - 360 ELSE l360 END + 1e-9, 4) AS lon180,
        |       round(u + 1e-9, 4) AS wind_u, round(v + 1e-9, 4) AS wind_v,
        |       round(sqrt(u*u + v*v) + 1e-9, 4) AS speed_rt,
        |       round(CASE WHEN value = 0 THEN 0.0
        |                  WHEN degrees(atan2(-u, -v)) < 0
        |                    THEN degrees(atan2(-u, -v)) + 360
        |                  ELSE degrees(atan2(-u, -v)) END + 1e-9, 4) AS dir_rt,
        |       round(2 * 6371.0 * asin(sqrt(
        |         pow(sin(radians(0 - (user_id - 75)) / 2), 2) +
        |         cos(radians(user_id - 75)) * cos(radians(0)) *
        |         pow(sin(radians(0 - (CASE WHEN l360 > 180 THEN l360 - 360 ELSE l360 END)) / 2), 2)
        |       )) + 1e-9, 4) AS hav_km,
        |       md5(concat_ws('|', event_id, user_id)) AS tid
        |FROM (
        |  SELECT *,
        |         CASE WHEN value >= 360 THEN value - 360 ELSE value END AS l360,
        |         value * cos(radians(90 - (user_id * 37 % 360))) AS u,
        |         value * sin(radians(90 - (user_id * 37 % 360))) AS v
        |  FROM events)
        |ORDER BY event_id""".stripMargin,

    // closed-form t-CDF special cases (elementary-function reductions
    // of I_x(df/2, 1/2)); the t grid is exact binary quarters so both
    // engines evaluate identical doubles
    "f_tcdf_fixed" ->
      """WITH g AS (
        |  SELECT i, df, CAST(i AS DOUBLE) * 0.25 AS t
        |  FROM range(0, 41) r(i) CROSS JOIN (VALUES (1), (2), (4)) d(df))
        |SELECT CAST(i AS BIGINT) AS i, CAST(df AS BIGINT) AS df,
        |  round(CASE df
        |    WHEN 1 THEN (2.0 / pi()) * asin(sqrt(1.0 / (1.0 + t * t)))
        |    WHEN 2 THEN 1.0 - t / sqrt(2.0 + t * t)
        |    ELSE 1.0 - 1.5 * (t / sqrt(4.0 + t * t))
        |         + 0.5 * pow(t / sqrt(4.0 + t * t), 3)
        |  END + 1e-9, 6) AS p2
        |FROM g ORDER BY i, df""".stripMargin
  )
}
