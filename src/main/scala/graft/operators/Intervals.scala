package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range-containment) join — the matched-PAIRS form Spark has
  * no operator for. `point ∈ [start, end]` written directly plans a
  * theta join (BroadcastNestedLoopJoin / per-key O(L·R)); tiling turns
  * it into a plain equi-join (extension surface; the reference's
  * closest shape is its audit-window trigger query,
  * `aupostgres.sql`'s per-row timestamps — it has no range join
  * either). The aggregate-only cousin (how MANY points precede an
  * event) is q74's RANGE-frame window; this operator materializes the
  * pairs themselves.
  *
  * Construction: pick a tile width W. Each interval explodes to its
  * covered tiles `start DIV W .. end DIV W` (≤ span/W + 1 rows); each
  * point lives in EXACTLY ONE tile `pt DIV W` — so a matching
  * (point, interval) pair meets in exactly one tile and the equi-join
  * on (keys, tile) emits it exactly once: no distinct pass is needed,
  * which is the whole trick. The residual `pt BETWEEN start AND end`
  * filter discards same-tile non-overlaps.
  *
  * Scale shape: ONE shuffle of each side on (keys, tile) — or zero for
  * the interval side under `broadcast()` when dims are small. Tile
  * width trades replication for selectivity: W ≈ the median interval
  * span keeps replication ≤ 2× while a tile only meets its own ~2
  * intervals' windows. Long-tail intervals replicate more rows but
  * never concentrate on one reducer (their tiles differ); hot TILES
  * (many points and intervals in one (key, tile)) are AQE skew-join
  * territory, same as any equi-join.
  *
  * Domain: non-negative tick values (epoch seconds here) — `DIV`
  * truncates toward zero, which is floor only for non-negatives; shift
  * negative domains before joining. Bounds are INCLUSIVE on both ends.
  */
object Intervals {

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
    val pt = points.withColumn("__tile", expr(s"$ptCol DIV $tileSec"))
    val iv = intervals.withColumn("__tile",
      explode(sequence(expr(s"$startCol DIV $tileSec"),
        expr(s"$endCol DIV $tileSec"))))
    pt.join(iv, keys :+ "__tile")
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("__tile")
  }
}
