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
  def bandJoin2(left: DataFrame, right: DataFrame,
                leftKey1: Column, rightKey1: Column, tol1: Long,
                leftKey2: Column, rightKey2: Column, tol2: Double,
                exact: Column, broadcastRight: Boolean = false): DataFrame = {
    require(tol1 > 0, s"bandJoin2: tol1 must be positive, got $tol1")
    require(tol2 > 0, s"bandJoin2: tol2 must be positive, got $tol2")
    // floor for the same uniform-band-width reason as bandJoin
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
