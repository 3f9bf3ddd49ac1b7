package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) joins — the matched-PAIRS forms Spark has no
  * operator for. `point ∈ [start, end]` (or interval overlap) written
  * directly plans a theta join (BroadcastNestedLoopJoin / per-key
  * O(L·R)); tiling turns both into plain equi-joins (extension surface;
  * the reference's closest shape is its audit-window trigger query,
  * `aupostgres.sql`'s per-row timestamps — it has no range join
  * either). The aggregate-only cousin (how MANY points precede an
  * event) is q74's RANGE-frame window; these operators materialize the
  * pairs themselves.
  *
  * Construction: pick a tile width W. Each interval explodes to its
  * covered tiles `start DIV W .. end DIV W` (≤ span/W + 1 rows); a
  * point lives in EXACTLY ONE tile, so a (point, interval) pair meets
  * exactly once. Two INTERVALS can share many tiles, so the overlap
  * join adds the responsibility-tile rule: a pair is emitted only in
  * the tile containing `greatest(start_a, start_b)` — which lies in
  * both sides' tile ranges whenever the intervals truly overlap — so
  * each pair again survives in exactly one tile and NO distinct pass is
  * needed, which is the whole trick. A residual predicate discards
  * same-tile non-overlaps.
  *
  * Scale shape: ONE shuffle of each side on (keys, tile) — or zero for
  * the interval side under `broadcast()` when dims are small. Tile
  * width trades replication for selectivity: W ≈ the median interval
  * span keeps replication ≤ 2× while a tile only meets its own ~2
  * intervals' windows. Long-tail intervals replicate more rows but
  * never concentrate on one reducer (their tiles differ); hot TILES
  * (many rows in one (key, tile)) are AQE skew-join territory, same as
  * any equi-join.
  *
  * Domain: non-negative tick values (epoch seconds here) — `DIV`
  * truncates toward zero, which is floor only for non-negatives, so a
  * negative tick would tile wrong and pairs would be silently lost.
  * Each operator folds an `assert_true` guard into its tile
  * expressions (the logHistSketch idiom — column pruning can never
  * elide it): negative ticks and end < start FAIL the job instead.
  * Bounds are INCLUSIVE on both ends. Non-key columns must have
  * DISJOINT names across the two sides (enforced up front — a shared
  * name would be ambiguous in the residual filter).
  */
object Intervals {

  /** `c DIV tile`, with `guard` asserted first — inside the expression,
    * so no plan rewrite can drop the check (assert_true is null on
    * pass, throws on fail).
    */
  private def guardedTile(c: Column, tile: Long, guard: Column,
      msg: String): Column =
    when(assert_true(guard, concat(lit(s"Intervals: $msg: "),
      c.cast("string"))).isNull,
      call_function("div", c, lit(tile)))

  private def requireDisjoint(left: DataFrame, right: DataFrame,
      keys: Seq[String]): Unit = {
    val shared = left.columns.toSet
      .intersect(right.columns.toSet) -- keys
    require(shared.isEmpty,
      s"non-key columns shared across both sides: ${shared.mkString(", ")}" +
        " — alias them apart before joining")
  }

  /** @param points    point side; `ptCol` is a non-negative long
    * @param intervals interval side; `startCol <= endCol`, both
    *                  non-negative longs
    * @param keys      equality keys present on both sides (the
    *                  co-partitioning)
    * @param tileSec   tile width in the point/interval unit
    * @return all columns of both sides (keys once) for every pair with
    *         `start <= pt <= end`, each pair exactly once
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      keys: Seq[String], ptCol: String, startCol: String, endCol: String,
      tileSec: Long): DataFrame = {
    require(tileSec > 0, s"tileSec must be positive, got $tileSec")
    requireDisjoint(points, intervals, keys)
    val pt = points.withColumn("__tile",
      guardedTile(col(ptCol), tileSec,
        col(ptCol) >= 0, s"negative $ptCol"))
    val iv = intervals.withColumn("__tile",
      explode(sequence(
        guardedTile(col(startCol), tileSec,
          col(startCol) >= 0 && col(endCol) >= col(startCol),
          s"negative $startCol or $endCol < $startCol"),
        call_function("div", col(endCol), lit(tileSec)))))
    pt.join(iv, keys :+ "__tile")
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("__tile")
  }

  /** Interval × interval OVERLAP join: every pair with
    * `aStart <= bEnd AND bStart <= aEnd` (inclusive overlap), each pair
    * exactly once via the responsibility-tile rule — both sides explode
    * to their covered tiles, and a meeting pair is kept only in the
    * tile of `greatest(aStart, bStart)`; for a true overlap that tile
    * is covered by BOTH intervals, and it is unique, so no distinct
    * pass. Same one-shuffle-per-side shape as [[pointInInterval]].
    *
    * @param left  interval side a; `aStartCol <= aEndCol`, non-negative
    * @param right interval side b; `bStartCol <= bEndCol`, non-negative
    * @return all columns of both sides (keys once) per overlapping pair
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
      keys: Seq[String], aStartCol: String, aEndCol: String,
      bStartCol: String, bEndCol: String, tileSec: Long): DataFrame = {
    require(tileSec > 0, s"tileSec must be positive, got $tileSec")
    requireDisjoint(left, right, keys)
    def tiled(df: DataFrame, s: String, e: String) =
      df.withColumn("__tile",
        explode(sequence(
          guardedTile(col(s), tileSec,
            col(s) >= 0 && col(e) >= col(s),
            s"negative $s or $e < $s"),
          call_function("div", col(e), lit(tileSec)))))
    tiled(left, aStartCol, aEndCol)
      .join(tiled(right, bStartCol, bEndCol), keys :+ "__tile")
      .filter(col(aStartCol) <= col(bEndCol) &&
        col(bStartCol) <= col(aEndCol))
      // responsibility tile: emit the pair only where the later start
      // lands — unique, and inside both tile ranges iff they overlap
      .filter(call_function("div",
        greatest(col(aStartCol), col(bStartCol)), lit(tileSec)) === col("__tile"))
      .drop("__tile")
  }
}
