package graft.ops

import graft.functions.GeoFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Full spatio-temporal matchup join (SURVEY J1/J7: Matchup.py:429-592,
  * doms/MatchupQuery.py:157-346): satellite points × in-situ points
  * within `rt` meters (great-circle) and `tt` seconds.
  *
  * Grid strategy replacing the reference's per-partition KD-trees:
  * both sides land on a (latCell, lonCell, timeCell) grid sized so any
  * admissible pair is at most one cell apart on every axis; the primary
  * side explodes into its 3×3×3 neighborhood (constant 27×, and in
  * practice pruned to 27 distinct keys), the secondary maps to exactly
  * one key, and the join is a plain equi-join on the cell key with the
  * exact haversine+time predicate applied afterwards.
  *
  * Longitude cells are sized at the *widest* latitude in play
  * (cos(maxAbsLat), clamped to [[CapLat]]); latitudes beyond the clamp
  * run through dedicated polar-cap passes (see [[CapLat]]), so domains
  * touching the poles match without banding. Cell keys are uniform
  * shuffle keys; skewed cells fall to AQE.
  *
  * Longitude cells WRAP: the cell index is taken modulo the number of
  * cells around the full circle (cell width rounded UP to an exact
  * divisor of 360°, so every cell has uniform width and the seam cell
  * is never narrower than the admissible Δlon). A domain crossing the
  * antimeridian therefore matches without pre-rotation — the automatic
  * form of what the reference gets from its per-partition azimuthal
  * projection (Matchup.py:536-578); the haversine/geodesic admission
  * predicates are wrap-correct by construction.
  */
object GeoMatchup {

  /** Cell sizing uses EXACT spherical bounds on the same Earth radius
    * as the haversine predicate (a flat-Earth approximation under-sizes
    * lon cells near the poles and silently drops admissible pairs):
    * meridional: max Δlat for distance rt is exactly rt/R;
    * zonal at |lat| ≤ θ: max Δlon is 2·asin(sin(rt/2R)/cos θ)
    * (attained by a same-latitude pair at θ). A 0.1% widening margin
    * absorbs floating-point rounding — wider cells only admit more
    * candidates, never lose pairs.
    */
  private[ops] val EarthRadiusM = GeoFunctions.EarthRadiusKm * 1000
  private val StepMargin = 1.001

  /** @param primary   (idCols..., lat, lon, time-seconds) — exploded ×27
    * @param secondary same shape, single cell key
    * @param rtMeters  great-circle radius tolerance
    * @param ttSeconds time tolerance
    * @param maxAbsLat widest |latitude| in the domain (degrees),
    *                  bounds the longitude cell width
    * @param broadcastSecondary replicate the secondary to every task
    *                  (right when it's the small in-situ side: the
    *                  ×27-exploded primary then never shuffles at all).
    *                  When false, a shuffle-hash hint still pins the
    *                  build side to the secondary — the optimizer's
    *                  size estimate does not account for the ×27
    *                  explode and would otherwise happily broadcast
    *                  the big side.
    * @return pairs with all columns of both sides + `dist_km`, `dt_s`
    */
  /** Extra cell widening when the admission predicate is WGS84
    * geodesic: ellipsoidal distances differ from the spherical bound by
    * under 0.6% anywhere on Earth, so 1% wider cells keep the
    * one-cell-apart guarantee (wider cells only admit more candidates).
    */
  private val GeodesicMargin = 1.01

  /** Latitudes above this go through dedicated POLAR-CAP passes: the
    * zonal cell-sizing bound 2·asin(sin(rt/2R)/cos θ) degenerates as
    * θ → 90° (cells widen to the whole circle), so cells are sized at
    * min(maxAbsLat, CapLat) and cap points join in tolerance-banded
    * passes keyed on (hemisphere, time cell) instead. The cap's point
    * population shrinks with its area (∝ 1 − cos 5° ≈ 0.4% of a
    * hemisphere), so the coarse key is load-safe by geometry.
    */
  private[ops] val CapLat = 85.0

  def matchup(primary: DataFrame, secondary: DataFrame,
              pLat: Column, pLon: Column, pTime: Column,
              sLat: Column, sLon: Column, sTime: Column,
              rtMeters: Double, ttSeconds: Long,
              maxAbsLat: Double = 66.0,
              broadcastSecondary: Boolean = false,
              geodesic: Boolean = false,
              structKeys: Boolean = false): DataFrame = {
    // negative tolerances would silently return empty — fail loudly at
    // entry like the maxAbsLat contract below. tt=0 is VALID (the
    // reference's Matchup.py get_int_arg('tt') has no lower bound and
    // an exact-time matchup is a real request): the admit predicate
    // dt_s <= 0 keeps only identical timestamps, and the time-cell
    // divisor clamps to 1 s so the cell key never divides by zero.
    require(rtMeters > 0, s"geo matchup: rtMeters must be positive, got $rtMeters")
    require(ttSeconds >= 0, s"geo matchup: ttSeconds must be non-negative, got $ttSeconds")
    val tCellSec = math.max(1L, ttSeconds).toDouble
    val effLat = math.min(maxAbsLat, CapLat)
    val capActive = maxAbsLat > CapLat
    val margin = StepMargin * (if (geodesic) GeodesicMargin else 1.0)
    val latStep = math.toDegrees(rtMeters / EarthRadiusM) * margin
    val sinHalf = math.sin(rtMeters / (2 * EarthRadiusM)) /
      math.cos(math.toRadians(effLat))
    require(sinHalf < 1.0,
      s"tolerance $rtMeters m wraps the $effLat° parallel — band by latitude")
    val lonStepMin = math.toDegrees(2 * math.asin(sinHalf)) * margin
    // round the lon cell count DOWN (cell width UP) to an exact divisor
    // of 360°: uniform cells tile the circle exactly, so modular ±1
    // adjacency holds across the antimeridian seam too — a remainder
    // cell narrower than the admissible Δlon would put near-seam pairs
    // two cells apart and silently drop them
    val nLon = math.max(1, math.floor(360.0 / lonStepMin).toInt)
    val lonStep = 360.0 / nLon

    def cell(c: Column, step: Double): Column = floor(c / step).cast("long")
    def lonCell(c: Column): Column =
      pmod(floor((c + 180.0) / lonStep).cast("long"), lit(nLon.toLong))
    // maxAbsLat is a CONTRACT about the data: lon cells are sized at
    // cos(effLat), so a row between effLat and the cap would get
    // under-sized cells and its admissible pairs could land 2+ cells
    // apart — silently missing from the output. Fail loudly instead
    // (with the cap active, cells are sized at CapLat and rows beyond
    // it go through the cap passes, so every latitude is covered).
    // The check rides as a FILTER evaluated once per input row — an
    // inline wrap of the cell expression evaluated 27x inside the
    // exploded neighbor array and measured +25% on the j7 gate at 10x.
    def latGuard(in: DataFrame, latC: Column): DataFrame =
      if (capActive) in
      // a NULL latitude is a non-matching ROW (dropped, same as the
      // cap passes' filters treat it), never a query abort: without
      // the isNull arm the when falls through to raise_error on NULL
      // and one record with a missing coordinate kills the whole job
      // with a misleading beyond-maxAbsLat message
      else in.where(when(latC.isNull, lit(false))
        .when(abs(latC) <= lit(effLat), lit(true))
        .otherwise(raise_error(concat(
          lit(s"geo matchup: |latitude| beyond maxAbsLat=$effLat would " +
            "silently lose matches (lon cells are sized for it) — raise " +
            "maxAbsLat to cover the domain, got lat="), latC.cast("string")))))

    // haversine (spherical) is the oracle-reproducible default; the
    // geodesic option matches the reference's WGS84 measurement
    // (Matchup.py:464-468) at the tolerance boundary
    val dist =
      if (geodesic) graft.functions.GeoDistance.geodesicKm(pLat, pLon, sLat, sLon)
      else GeoFunctions.haversineKm(pLat, pLon, sLat, sLon)
    def admit(pairs: DataFrame): DataFrame = pairs
      .withColumn("dist_km", dist)
      .withColumn("dt_s", abs(pTime - sTime))
      // time predicate FIRST: And short-circuits left-to-right and
      // Catalyst does not cost-reorder deterministic conjuncts, so the
      // iterative WGS84 geodesic solve (the dominant per-candidate cost
      // in geodesic mode) is skipped for every candidate the cheap
      // |dt| check already rejects (+/-1 time-cell adjacency admits
      // dt up to ~2x tt, so that is a large fraction)
      .where(col("dt_s") <= ttSeconds && col("dist_km") * 1000.0 <= rtMeters)

    def joined(p: DataFrame, sKeyed: DataFrame, key: String): DataFrame = {
      val s = if (broadcastSecondary) broadcast(sKeyed)
              else sKeyed.hint("shuffle_hash")
      admit(p.join(s, key)).drop(key)
    }

    val neighbors = Seq(-1, 0, 1)
    // Packed cell key (r15, default): (la, lo, t) encoded into ONE
    // long — ((t * nLatTotal) + la + laOff) * nLon + lo — so the
    // equi-join runs on a primitive bigint (LongHashedRelation build,
    // one-long exchange hashing) instead of a three-field struct, and
    // the ×27 neighbor explode allocates 27 longs per row instead of
    // 27 structs. Injectivity is PLAN-TIME-PROVEN, not guarded per
    // row: la is bounded by the latGuard/cap filters that run before
    // the cells are computed (|lat| ≤ min(maxAbsLat, CapLat) ⇒
    // |floor(lat/latStep)| ≤ laMax−1, ±1 neighbor included in laOff's
    // slack), lo is pmod'ed into [0, nLon) on both sides, and the t
    // multiplier overflows only beyond |time| ≈ 2^62/(nLat·nLon)
    // seconds — far outside any epoch. GeoMatchupSpec pins value
    // identity against the struct-keyed twin (structKeys = true).
    val laMax = math.floor(CapLat / latStep).toLong + 2
    val laOff = laMax
    val nLatTotal = 2 * laMax + 1
    def packCell(la: Column, lo: Column, t: Column): Column =
      (t * nLatTotal + (la + laOff)) * nLon + lo
    // array_distinct: with few lon cells (huge tolerance) the modular
    // neighbor keys collide, and duplicate keys would duplicate pairs
    // (distinct encoded longs ⟺ distinct cells, by injectivity)
    val pCells = explode(array_distinct(array((for {
      dLat <- neighbors; dLon <- neighbors; dT <- neighbors
    } yield {
      val la = cell(pLat, latStep) + dLat
      val lo = pmod(lonCell(pLon) + dLon, lit(nLon.toLong))
      val t = cell(pTime, tCellSec) + dT
      if (structKeys) struct(la.as("la"), lo.as("lo"), t.as("t"))
      else packCell(la, lo, t)
    }): _*)))

    // main pass: when the cap is active, BOTH sides restrict to the
    // sub-cap domain — every pair with a capward member is owned by
    // exactly one cap pass below, so no pair duplicates across passes
    val (pMain, sMain) =
      if (capActive)
        (primary.where(abs(pLat) <= CapLat), secondary.where(abs(sLat) <= CapLat))
      else (latGuard(primary, pLat), latGuard(secondary, sLat))
    val sCell =
      if (structKeys) struct(
        cell(sLat, latStep).as("la"),
        lonCell(sLon).as("lo"),
        cell(sTime, tCellSec).as("t"))
      else packCell(cell(sLat, latStep), lonCell(sLon), cell(sTime, tCellSec))
    val mainPairs = joined(
      pMain.withColumn("__cell", pCells),
      sMain.withColumn("__cell", sCell),
      "__cell")

    if (!capActive) mainPairs
    else {
      // polar-cap passes: near the pole, longitudes diverge, so cap
      // candidates key only on (hemisphere, time cell) — correct
      // because any admissible pair lies within latStep in latitude,
      // so one side in the cap bounds the other to the adjacent band.
      // Cross-hemisphere cap pairs can never be admissible (the
      // wraps-parallel require above bounds rt far below pole-to-pole)
      def hemi(latC: Column): Column = when(latC >= 0, 1).otherwise(-1)
      // same packed-key rationale as the main pass: (h, t) → t*2+hbit,
      // injective since hbit ∈ {0, 1}
      def packCap(h: Column, t: Column): Column =
        t * 2L + when(h > 0, 1L).otherwise(0L)
      def capKey(h: Column, t: Column): Column =
        if (structKeys) struct(h.as("h"), t.as("t")) else packCap(h, t)
      def pKeyed(in: DataFrame): DataFrame = in.withColumn("__cap", explode(
        array(neighbors.map(d =>
          capKey(hemi(pLat), cell(pTime, tCellSec) + d)): _*)))
      def sKeyed(in: DataFrame): DataFrame = in.withColumn("__cap",
        capKey(hemi(sLat), cell(sTime, tCellSec)))
      // pass A owns every pair whose SECONDARY is in the cap; pass B
      // owns cap-primary × sub-cap-secondary. A ∩ B = ∅ (s side), and
      // neither overlaps the main pass (one member is capward).
      val passA = joined(
        pKeyed(primary.where(abs(pLat) > CapLat - latStep)),
        sKeyed(secondary.where(abs(sLat) > CapLat)), "__cap")
      val passB = joined(
        pKeyed(primary.where(abs(pLat) > CapLat)),
        sKeyed(secondary.where(
          abs(sLat) > CapLat - latStep && abs(sLat) <= CapLat)), "__cap")
      mainPairs.unionByName(passA).unionByName(passB)
    }
  }
}
