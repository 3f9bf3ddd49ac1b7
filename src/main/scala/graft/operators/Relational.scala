package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Set-based re-expressions of the reference's row-at-a-time upsert /
  * dedup / surrogate-key / audit patterns (SURVEY.md §2.4 A1-A4, §2.10 C1).
  *
  * Scale notes: every operator here is a constant number of shuffles on the
  * key columns, no driver-side loops; when the delta/dim side is small
  * Catalyst broadcast-joins it automatically (we avoid full-outer joins for
  * merge precisely so the small side stays broadcastable).
  */
object Relational {

  /** Per-column conflict resolution for [[merge]] — mirrors the reference's
    * `ON CONFLICT (title) DO UPDATE SET` clause shapes
    * (process_publications_dag.py:224-232).
    */
  sealed trait Resolve
  /** `col = EXCLUDED.col` — new value wins even when null. */
  case object Overwrite extends Resolve
  /** `col = COALESCE(EXCLUDED.col, old.col)` — new wins unless null. */
  case object CoalesceNewOld extends Resolve
  /** keep the existing value for matched rows. */
  case object KeepOld extends Resolve

  /** MERGE / upsert: rows of `delta` matching `base` on `keys` update the
    * base row per `resolve` (default CoalesceNewOld); unmatched delta rows
    * insert; unmatched base rows pass through.
    *
    * Implemented as base⟕delta + delta-anti-base union — NOT a full outer
    * join — so a small delta is broadcast on both sides (two broadcast
    * joins, zero extra shuffles at scale).
    *
    * Preconditions: `delta` has at most one row per key (dedup first — the
    * reference gets this for free from its per-row loop); both frames share
    * the schema.
    */
  def merge(
      base: DataFrame,
      delta: DataFrame,
      keys: Seq[String],
      resolve: Map[String, Resolve] = Map.empty): DataFrame = {
    val valueCols = base.columns.filterNot(keys.contains).toSeq
    val d = delta
      .select(delta.columns.toSeq.map(c =>
        if (keys.contains(c)) col(c) else col(c).as(s"__new_$c")): _*)
      .withColumn("__matched", lit(true))
    val isMatched = col("__matched").isNotNull // null ⇔ no delta row joined
    val resolved = base.join(d, keys, "left").select(
      (keys.map(col) ++ valueCols.map { c =>
        val nw = col(s"__new_$c")
        val old = col(c)
        (resolve.getOrElse(c, CoalesceNewOld) match {
          case Overwrite      => when(isMatched, nw).otherwise(old)
          case CoalesceNewOld => coalesce(nw, old)
          case KeepOld        => old
        }).as(c)
      }): _*)
    val inserts = delta.join(base.select(keys.map(col): _*), keys, "left_anti")
    resolved.unionByName(inserts.select(base.columns.toSeq.map(col): _*))
  }

  /** Key-dedup with SQL UNIQUE-constraint null semantics: rows with a null
    * key are all kept (nulls compare distinct — the reference's
    * `ON CONFLICT (doi) DO NOTHING` never fires for null doi,
    * process_publications_dag.py:67); non-null keys keep exactly the first
    * row under `tiebreak` (deterministic representative).
    */
  def dedupByKey(df: DataFrame, key: String, tiebreak: Seq[Column]): DataFrame = {
    val keyed = df.filter(col(key).isNotNull)
    val nullKeyed = df.filter(col(key).isNull)
    val w = Window.partitionBy(col(key)).orderBy(tiebreak: _*)
    keyed
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
      .unionByName(nullKeyed)
  }

  /** SERIAL-compatible surrogate-key allocation (SURVEY §2.4 A3): assign
    * dense ids `maxExisting+1 .. maxExisting+n` to `newValues` ordered by
    * `orderCol`.
    *
    * Distributed: global sort (range partitioned) + `zipWithIndex` (two
    * passes, no single-partition window) — ids follow the global sort order
    * deterministically, so repeated runs over the same input allocate the
    * same ids. `monotonically_increasing_id` is neither dense nor stable and
    * is deliberately not used.
    */
  def allocateIds(
      newValues: DataFrame,
      orderCol: String,
      startAfter: Long,
      idCol: String = "id"): DataFrame = {
    val spark = newValues.sparkSession
    val sorted = newValues.orderBy(col(orderCol))
    val schema = StructType(StructField(idCol, LongType, nullable = false) +: sorted.schema.fields)
    val rows = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq((startAfter + i + 1) +: r.toSeq)
    }
    spark.createDataFrame(rows, schema)
  }

  /** Dimension upsert (the set-based `get_or_insert_*`,
    * process_publications_dag.py:27-43): add unseen `nameCol` values from
    * `incoming` to `dim` with fresh dense ids; returns the updated dim.
    */
  def upsertDim(dim: DataFrame, incoming: DataFrame, nameCol: String,
      idCol: String = "id"): DataFrame = {
    val fresh = incoming.select(col(nameCol)).distinct()
      .join(dim.select(col(nameCol)), Seq(nameCol), "left_anti")
    val maxId = dim.agg(coalesce(max(col(idCol)), lit(0L)).cast(LongType))
      .head().getLong(0)
    dim.unionByName(allocateIds(fresh, nameCol, maxId, idCol)
      .select(dim.columns.toSeq.map(col): _*))
  }

  /** Per-group top-k (SURVEY §2.5 W1): one shuffle, ranking window. */
  def topKPerGroup(df: DataFrame, partitionCols: Seq[Column],
      order: Seq[Column], k: Int, rankName: String = "rn"): DataFrame = {
    val w = Window.partitionBy(partitionCols: _*).orderBy(order: _*)
    df.withColumn(rankName, row_number().over(w)).filter(col(rankName) <= k)
  }

  /** 2-D Pareto frontier (skyline), both dimensions MAXIMIZED: keep the
    * rows no other row dominates, where p dominates q iff p.x ≥ q.x,
    * p.y ≥ q.y, and at least one is strict. Identical (x, y) duplicates
    * don't dominate each other, so ties on the frontier all survive.
    *
    * Sort-based, NOT the quadratic NOT-EXISTS: per-x max(y), then a
    * running max of that over x DESCENDING — a frontier x is one whose
    * ymax strictly exceeds every ymax at larger x, and within a
    * frontier x only the y = ymax rows are undominated. One keyed
    * aggregation plus one window over the DISTINCT-x relation (the
    * single-partition sort is |distinct x| rows, not |rows| — for an
    * ultra-high-cardinality x, range-tile the x axis and merge tile
    * frontiers, the same tiling idea as [[Intervals]]).
    */
  def paretoFrontier2(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val byX = df.groupBy(col(xCol)).agg(max(col(yCol)).as("__ymax"))
    val wDesc = Window.orderBy(col(xCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontierX = byX
      .withColumn("__prevmax", max(col("__ymax")).over(wDesc))
      .filter(col("__prevmax").isNull || col("__ymax") > col("__prevmax"))
      .select(col(xCol), col("__ymax"))
    df.join(broadcast(frontierX), Seq(xCol))
      .filter(col(yCol) === col("__ymax"))
      .drop("__ymax")
  }
}
