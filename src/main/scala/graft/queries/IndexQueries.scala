package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.TileIndexOps

/** Tile-index predicate layer re-expressed over the driver testdata
  * (SURVEY §2.2 P1–P7, §2.5 W1/W4, §2.1 S4/S10).
  *
  * The reference prunes tiles with Solr range queries; here the same
  * predicate shapes are Catalyst filters over parquet scans, where they
  * push down to the reader (PushedFilters + min/max skipping).
  */
object IndexQueries extends QueryModule {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P1: point lookup by id list (find_tiles_by_id, SolrProxy.pyx:29-60)
    "p1_lookup_by_id" -> { (s, dir) =>
      Tables.orders(s, dir)
        .where(col("o_orderkey").isin(1L, 7L, 42L, 4242L, 9999L))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
        .orderBy("o_orderkey")
    },

    // P2: bbox ∩ interval-overlap scan (find_tiles_in_box, SolrProxy.pyx:186-217):
    // per-customer order interval [min,max] overlapping the query window.
    "p2_interval_overlap" -> { (s, dir) =>
      val iv = Tables.orders(s, dir)
        .groupBy("o_custkey")
        .agg(min("o_orderdate").as("lo"), max("o_orderdate").as("hi"))
      iv.where(TileIndexOps.overlaps(col("lo"), col("hi"),
          lit("1997-01-01").cast("timestamp"), lit("1997-06-30").cast("timestamp")))
        .select(col("o_custkey"),
          date_format(col("lo"), "yyyy-MM-dd").as("lo_day"),
          date_format(col("hi"), "yyyy-MM-dd").as("hi_day"))
        .orderBy("o_custkey")
    },

    // P4: exact-bounds identity lookup (find_tiles_by_exact_bounds,
    // SolrProxy.pyx:322-355): equality on the interval endpoints.
    "p4_exact_bounds" -> { (s, dir) =>
      val iv = Tables.orders(s, dir)
        .groupBy("o_custkey")
        .agg(min("o_orderdate").as("lo"), max("o_orderdate").as("hi"))
      iv.where(col("lo") === lit("1995-01-01").cast("timestamp"))
        .select(col("o_custkey"), date_format(col("hi"), "yyyy-MM-dd").as("hi_day"))
        .orderBy("o_custkey")
    },

    // P5: box + point-in-interval (find_all_tiles_in_box_at_time,
    // SolrProxy.pyx:357-378): value-range box at a time instant window.
    "p5_box_at_time" -> { (s, dir) =>
      val e = Tables.events(s, dir)
      e.where(col("value").between(100.0, 200.0) &&
          TileIndexOps.containsPoint(lit("2024-01-05").cast("timestamp"),
            lit("2024-01-10").cast("timestamp"), col("ts")))
        .select(col("event_id"), col("user_id"), col("event_type"),
          round(col("value") + lit(1e-9), 4).as("value_r"),
          unix_micros(col("ts")).as("ts_us"))
        .orderBy("event_id")
    },

    // P6: strictly-within + computed projection product(avg,count)
    // (find_all_tiles_within_box_at_time, SolrProxy.pyx:403-425; F15 :424)
    "p6_within_product" -> { (s, dir) =>
      val e = Tables.events(s, dir)
      e.where(TileIndexOps.within(col("user_id"), col("user_id"), lit(20L), lit(80L)) &&
          col("value").between(50.0, 250.0))
        .select(col("event_id"), col("user_id"),
          round(col("value") * col("user_id").cast("double") + lit(1e-9), 4).as("prod"))
        .orderBy("event_id")
    },

    // P7: boundary tiles — intersects the box but not within it
    // (find_all_boundary_tiles_at_time, SolrProxy.pyx:427-451), over
    // per-customer intervals vs a date box.
    "p7_boundary" -> { (s, dir) =>
      val iv = Tables.orders(s, dir)
        .groupBy("o_custkey")
        .agg(min("o_orderdate").as("lo"), max("o_orderdate").as("hi"))
      iv.where(TileIndexOps.boundary(col("lo"), col("hi"),
          lit("1996-01-01").cast("timestamp"), lit("1999-12-31").cast("timestamp")))
        .select(col("o_custkey"),
          date_format(col("lo"), "yyyy-MM-dd").as("lo_day"),
          date_format(col("hi"), "yyyy-MM-dd").as("hi_day"))
        .orderBy("o_custkey")
    },

    // P8/W1: as-of pick — latest row per key with date ≤ cutoff
    // (find_tile_by_polygon_and_most_recent_day_of_year, SolrProxy.pyx:137-153)
    "w1_asof_pick" -> { (s, dir) =>
      val o = Tables.orders(s, dir).where(col("o_orderdate") <= lit("1998-01-01").cast("timestamp"))
      TileIndexOps.asOfPick(o, Seq(col("o_custkey")), col("o_orderdate"), col("o_orderkey"))
        .select(col("o_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
        .orderBy("o_custkey")
    },

    // W4: deterministic paging (SolrProxy.pyx:488-504)
    "w4_paging" -> { (s, dir) =>
      TileIndexOps.page(Tables.orders(s, dir),
          Seq(col("o_totalprice").desc, col("o_orderkey").asc), start = 10, rows = 20)
        .select(col("o_orderkey"), round(col("o_totalprice") + lit(1e-9), 4).as("price"))
    },

    // S4+scan pruning: projection + pushed filters reach the parquet reader
    "s4_scan_pruned" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .where(col("l_shipdate").between(lit("1996-01-01").cast("timestamp"),
          lit("1996-03-31").cast("timestamp")) && col("l_partkey") < 500)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          round(col("l_quantity") + lit(1e-9), 4).as("qty"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // P3: polygon filter — native PolygonContains expression; the
    // PolygonBBoxPushdown optimizer rule injects the bbox range
    // conjunction automatically, which Catalyst pushes to the scan
    // (find_tiles_in_polygon, SolrProxy.pyx:219-281; the reference's
    // geo:[..TO..] trick as a Rule[LogicalPlan])
    "p3_polygon_filter" -> { (s, dir) =>
      graft.plans.GraftExtensions.enable(s)
      val wkt = "POLYGON ((10.005 20.005, 450.005 60.005, 200.005 140.005, 10.005 20.005))"
      Tables.events(s, dir)
        .where(graft.plans.GraftExtensions.polygonContains(
          wkt, col("value"), col("user_id").cast("double")))
        .select(col("event_id"), round(col("value") + lit(1e-9), 4).as("value_r"), col("user_id"))
        .orderBy("event_id")
    },

    // S10: delete-by-query semantics (tools/deletebyquery) = the surviving set
    "s10_delete_by_query" -> { (s, dir) =>
      Tables.customer(s, dir)
        .where(!(col("c_mktsegment") === "BUILDING" && col("c_acctbal") < 0))
        .select(col("c_custkey"), col("c_mktsegment"), round(col("c_acctbal") + lit(1e-9), 4).as("bal"))
        .orderBy("c_custkey")
    },

    // S11: MERGE-style upsert — a changes batch (repriced keys ≡ 7 mod
    // 100 + brand-new keys above the snapshot range) applied to the
    // orders snapshot in one full-outer join (sources.Merge.upsert).
    // The `op` audit column plus sum-preserving price math make any
    // matched/unmatched misclassification visible in the hash.
    "s11_merge_upsert" -> { (s, dir) =>
      val base = Tables.orders(s, dir)
        .select(col("o_orderkey").as("k"), col("o_totalprice").as("price"),
          col("o_orderstatus").as("status"))
      val upd = base.where(col("k") % 100 === 7)
        .select(col("k"), (col("price") * 1.1).as("price"), lit("R").as("status"))
      val ins = base.where(col("k") % 100 === 13)
        .select((col("k") + 100000000L).as("k"), col("price"), lit("N").as("status"))
      graft.sources.Merge.upsert(base, upd.unionByName(ins), "k")
        .select(col("k"), round(col("price") + lit(1e-9), 4).as("price"),
          col("status"), col("op"))
        .orderBy("k")
    }
  )

  def oracle: Map[String, String] = Map(
    "p1_lookup_by_id" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
        |WHERE o_orderkey IN (1, 7, 42, 4242, 9999) ORDER BY o_orderkey""".stripMargin,

    "p2_interval_overlap" ->
      """WITH iv AS (SELECT o_custkey, min(o_orderdate) lo, max(o_orderdate) hi
        |            FROM orders GROUP BY o_custkey)
        |SELECT o_custkey, strftime(lo, '%Y-%m-%d') AS lo_day,
        |       strftime(hi, '%Y-%m-%d') AS hi_day
        |FROM iv
        |WHERE lo <= TIMESTAMP '1997-06-30' AND hi >= TIMESTAMP '1997-01-01'
        |ORDER BY o_custkey""".stripMargin,

    "p4_exact_bounds" ->
      """WITH iv AS (SELECT o_custkey, min(o_orderdate) lo, max(o_orderdate) hi
        |            FROM orders GROUP BY o_custkey)
        |SELECT o_custkey, strftime(hi, '%Y-%m-%d') AS hi_day
        |FROM iv WHERE lo = TIMESTAMP '1995-01-01'
        |ORDER BY o_custkey""".stripMargin,

    "p5_box_at_time" ->
      """SELECT event_id, user_id, event_type, round(value + 1e-9, 4) AS value_r,
        |       epoch_us(ts) AS ts_us
        |FROM events
        |WHERE value BETWEEN 100.0 AND 200.0
        |  AND ts >= TIMESTAMP '2024-01-05' AND ts <= TIMESTAMP '2024-01-10'
        |ORDER BY event_id""".stripMargin,

    "p6_within_product" ->
      """SELECT event_id, user_id, round(value * user_id + 1e-9, 4) AS prod
        |FROM events
        |WHERE user_id BETWEEN 20 AND 80 AND value BETWEEN 50.0 AND 250.0
        |ORDER BY event_id""".stripMargin,

    "p7_boundary" ->
      """WITH iv AS (SELECT o_custkey, min(o_orderdate) lo, max(o_orderdate) hi
        |            FROM orders GROUP BY o_custkey)
        |SELECT o_custkey, strftime(lo, '%Y-%m-%d') AS lo_day,
        |       strftime(hi, '%Y-%m-%d') AS hi_day
        |FROM iv
        |WHERE (lo <= TIMESTAMP '1999-12-31' AND hi >= TIMESTAMP '1996-01-01')
        |  AND NOT (lo >= TIMESTAMP '1996-01-01' AND hi <= TIMESTAMP '1999-12-31')
        |ORDER BY o_custkey""".stripMargin,

    "w1_asof_pick" ->
      """SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS day
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |      FROM orders WHERE o_orderdate <= TIMESTAMP '1998-01-01')
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,

    "w4_paging" ->
      """SELECT o_orderkey, round(o_totalprice + 1e-9, 4) AS price FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20 OFFSET 10""".stripMargin,

    "s4_scan_pruned" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, round(l_quantity + 1e-9, 4) AS qty
        |FROM lineitem
        |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-03-31'
        |  AND l_partkey < 500
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "p3_polygon_filter" ->
      // triangle A(10.005,20.005) B(450.005,60.005) C(200.005,140.005),
      // CCW: interior = positive cross product against each edge
      """SELECT event_id, round(value + 1e-9, 4) AS value_r, user_id
        |FROM events
        |WHERE value BETWEEN 10.005 AND 450.005
        |  AND user_id BETWEEN 20.005 AND 140.005
        |  AND 440*(user_id - 20.005) - 40*(value - 10.005) > 0
        |  AND -250*(user_id - 60.005) - 80*(value - 450.005) > 0
        |  AND -190*(user_id - 140.005) + 120*(value - 200.005) > 0
        |ORDER BY event_id""".stripMargin,

    "s10_delete_by_query" ->
      """SELECT c_custkey, c_mktsegment, round(c_acctbal + 1e-9, 4) AS bal
        |FROM customer
        |WHERE NOT (c_mktsegment = 'BUILDING' AND c_acctbal < 0)
        |ORDER BY c_custkey""".stripMargin,

    "s11_merge_upsert" ->
      """WITH base AS (SELECT o_orderkey k, o_totalprice price,
        |                     o_orderstatus status FROM orders),
        |upd AS (SELECT k, price * 1.1 AS price, 'R' AS status FROM base
        |        WHERE k % 100 = 7
        |        UNION ALL
        |        SELECT k + 100000000, price, 'N' FROM base WHERE k % 100 = 13)
        |SELECT coalesce(u.k, b.k) AS k,
        |       round(coalesce(u.price, b.price) + 1e-9, 4) AS price,
        |       coalesce(u.status, b.status) AS status,
        |       CASE WHEN b.k IS NULL THEN 'insert'
        |            WHEN u.k IS NULL THEN 'keep'
        |            ELSE 'update' END AS op
        |FROM base b FULL OUTER JOIN upd u ON b.k = u.k
        |ORDER BY k""".stripMargin
  )
}
