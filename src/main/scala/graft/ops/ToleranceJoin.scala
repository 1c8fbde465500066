package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tolerance (distance) join — the reference's satellite↔in-situ
  * matchup (SURVEY J1, algorithms_spark/Matchup.py:429-592).
  *
  * The reference builds a KD-tree per partition and pads each
  * partition's spatio-temporal envelope by the tolerance so border
  * matches aren't lost (Matchup.py:523-542). The Spark-native
  * equivalent: band the most selective join dimension into
  * tolerance-sized buckets, explode ONE side into its bucket and both
  * neighbors (the padding), equi-join on the bucket id — a plain
  * shuffle-hash/sort-merge join Catalyst can plan and AQE can rebalance
  * — then apply the exact tolerance predicates. Every candidate pair
  * appears in exactly one bucket of the non-exploded side, so no dedup
  * is needed.
  *
  * At 100 TB: the bucket id is a uniform shuffle key (time bands), so
  * this scales as an ordinary equi-join; skewed bands fall to AQE skew
  * splitting. Explosion factor is a constant 3.
  */
object ToleranceJoin {

  /** Equi-join `left` and `right` on tolerance bands of a numeric key.
    *
    * @param leftKey  band key expression in `left` (e.g. epoch micros)
    * @param rightKey band key expression in `right`
    * @param tol      band width = maximum |leftKey - rightKey| allowed
    * @param exact    exact predicate evaluated after the band join
    *                 (must imply |leftKey-rightKey| <= tol)
    * @param broadcastRight replicate the right side to every task;
    *                 otherwise a shuffle-hash hint pins the build side
    *                 to the right — Catalyst's stats are blind to the
    *                 explode and would broadcast the big left side
    */
  def bandJoin(left: DataFrame, right: DataFrame,
               leftKey: Column, rightKey: Column, tol: Long,
               exact: Column, broadcastRight: Boolean = false): DataFrame = {
    require(tol > 0, s"bandJoin: tol must be positive, got $tol")
    // floor, not cast-truncation: truncation toward zero makes band 0
    // span (-tol, +tol) — twice every other band's width — so keys
    // clustered around zero (signed deltas) pile into ONE skewed
    // shuffle bucket with ~4x the candidate pairs; floor keeps every
    // band exactly tol wide (adjacency and pair coverage unchanged)
    val lBanded = left.withColumn("__band",
      explode(array(Seq(-1, 0, 1).map(i => floor(leftKey / tol).cast("long") + i): _*)))
    val rBanded = right.withColumn("__band", floor(rightKey / tol).cast("long"))
    val r = if (broadcastRight) broadcast(rBanded) else rBanded.hint("shuffle_hash")
    lBanded.join(r, "__band").where(exact).drop("__band")
  }

  /** Two-dimensional band join: cells on (key1/tol1, key2/tol2) with a
    * 3×3 neighborhood explode on the left. Same contract as
    * [[bandJoin]] — every admissible pair meets in exactly one cell of
    * the non-exploded side — but candidates divide by the second
    * dimension's selectivity (e.g. time×value banding at 10× data cut
    * j2's candidates ~12× for a 3× wider explode). Worth it whenever
    * the exact predicate constrains a second dimension the 1-D band
    * ignores; the cell key stays a uniform shuffle key.
    */
  /** 2-D cell encoding bounds (r15): the (b1, b2) cell pair is packed
    * into ONE long — `b1 * 2^21 + (b2 + 2^20)` — so the equi-join key
    * is a primitive bigint instead of a two-field struct. Effects,
    * all measured on the j1/j2/j3 family: the shuffled-hash build
    * becomes a LongHashedRelation (Spark's specialized long-key map)
    * instead of a generic UnsafeRow-keyed relation, the 9-way explode
    * allocates 9 longs per row instead of 9 two-field structs, and
    * the exchange hashes/compares one long. The packing is INJECTIVE
    * on the guarded domain (|b2| bounded by 2^20-2 so ±1 neighbors
    * stay in range, |b1| below 2^41 so the product cannot overflow),
    * which keeps the contract "every admissible pair meets in exactly
    * one cell of the non-exploded side" — a collision could merge two
    * distinct cells and emit a pair twice, so out-of-domain keys fail
    * LOUDLY (raise_error) instead of wrapping. ToleranceJoinSpec pins
    * value-identity against the struct-keyed twin.
    */
  private val B2Mul = 1L << 21
  private val B2Off = 1L << 20
  private[ops] def packGuard(b1: Column, b2: Column): Column =
    when(abs(b2) < B2Off - 2 && abs(b1) < (1L << 41), lit(true))
      .otherwise(raise_error(concat(
        lit("bandJoin2: band index outside the packable domain " +
          "(|key2/tol2| must stay below 2^20-2 and |key1/tol1| below " +
          "2^41) — got b1="), b1.cast("string"), lit(", b2="),
        b2.cast("string"))))

  def bandJoin2(left: DataFrame, right: DataFrame,
                leftKey1: Column, rightKey1: Column, tol1: Long,
                leftKey2: Column, rightKey2: Column, tol2: Double,
                exact: Column, broadcastRight: Boolean = false): DataFrame = {
    require(tol1 > 0, s"bandJoin2: tol1 must be positive, got $tol1")
    require(tol2 > 0, s"bandJoin2: tol2 must be positive, got $tol2")
    // floor for the same uniform-band-width reason as bandJoin
    def b1(k: Column) = floor(k / tol1).cast("long")
    def b2(k: Column) = floor(k / tol2).cast("long")
    // the domain guard rides as one FILTER per input row (two long
    // compares), not inside the 9-cell explode — the latGuard lesson
    // from GeoMatchup (inline wraps evaluated per neighbor measured
    // +25% on j7)
    val lG = left.where(packGuard(b1(leftKey1), b2(leftKey2)))
    val rG = right.where(packGuard(b1(rightKey1), b2(rightKey2)))
    val cells = for { d1 <- Seq(-1, 0, 1); d2 <- Seq(-1, 0, 1) } yield
      (b1(leftKey1) + d1) * B2Mul + (b2(leftKey2) + d2) + B2Off
    val l = lG.withColumn("__band", explode(array(cells: _*)))
    val rBanded = rG.withColumn("__band",
      b1(rightKey1) * B2Mul + b2(rightKey2) + B2Off)
    val r = if (broadcastRight) broadcast(rBanded) else rBanded.hint("shuffle_hash")
    l.join(r, "__band").where(exact).drop("__band")
  }

  /** Struct-keyed r13 form of [[bandJoin2]], kept as the differential
    * twin ToleranceJoinSpec compares the packed-key production form
    * against (value identity on the same inputs).
    */
  private[graft] def bandJoin2Struct(left: DataFrame, right: DataFrame,
                leftKey1: Column, rightKey1: Column, tol1: Long,
                leftKey2: Column, rightKey2: Column, tol2: Double,
                exact: Column, broadcastRight: Boolean = false): DataFrame = {
    require(tol1 > 0, s"bandJoin2: tol1 must be positive, got $tol1")
    require(tol2 > 0, s"bandJoin2: tol2 must be positive, got $tol2")
    val cells = for { d1 <- Seq(-1, 0, 1); d2 <- Seq(-1, 0, 1) } yield
      struct((floor(leftKey1 / tol1).cast("long") + d1).as("b1"),
        (floor(leftKey2 / tol2).cast("long") + d2).as("b2"))
    val l = left.withColumn("__band", explode(array(cells: _*)))
    val rBanded = right.withColumn("__band", struct(
      floor(rightKey1 / tol1).cast("long").as("b1"),
      floor(rightKey2 / tol2).cast("long").as("b2")))
    val r = if (broadcastRight) broadcast(rBanded) else rBanded.hint("shuffle_hash")
    l.join(r, "__band").where(exact).drop("__band")
  }

  /** Match-once (SURVEY J2, Matchup.py:456-473): keep, per primary key,
    * the single match minimizing `dist` (ties broken by `tieBreak` asc
    * — the result is deterministic whenever (dist, tieBreak) is unique
    * within a primary, the same contract the reference's reduceByKey
    * min had). Implemented as a `min_by` AGGREGATE, not a window: the
    * aggregate partial-combines map-side, so only one candidate row
    * per (primary, partition) reaches the exchange — the window form
    * shuffled and sorted the ENTIRE pair relation (47 s → 22 s on the
    * 567M-pair 100× probe; the remainder is enumerating the candidate
    * pairs, which no reducer can avoid).
    */
  def matchOnce(pairs: DataFrame, primaryKey: Column, dist: Column,
                tieBreak: Column): DataFrame = {
    val all = struct(pairs.columns.map(col): _*)
    pairs.groupBy(primaryKey)
      .agg(min_by(all, struct(dist, tieBreak)).as("__best"))
      .select(col("__best.*"))
  }
}
