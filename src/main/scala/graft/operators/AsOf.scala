package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join — the time-series lookup Spark has no
  * built-in operator for. For each left row, attach the payload of the
  * LATEST right row with `right.ts <= left.ts` in the same key group.
  *
  * Implementation is composition, not a custom physical operator (builder
  * guidance: compose existing ops when semantics allow): union both
  * sides, then one ranking window per key carrying the last right-side
  * payload forward (`last(..., ignoreNulls)` over rows-unbounded-
  * preceding). ONE shuffle on the key — never the range-condition
  * theta-join (O(L·R) per key) a naive formulation plans.
  *
  * Ordering contract (fully deterministic): rows sort by
  * (ts, side, tieBreak) with right rows first at equal ts — so a right
  * row AT the left row's timestamp matches (<= semantics) — and among
  * right rows sharing a timestamp the highest `tieBreak` wins. Left rows
  * with no prior right row get NULL payload (left-outer semantics).
  *
  * Null-timestamp contract: rows with a NULL `tsCol` are EXCLUDED from
  * both sides — "most recent prior to an unknown time" is undefined, and
  * a null right timestamp must not act as ts = -infinity (which is what
  * Spark's NULLS FIRST ascending default would silently do in the
  * window; SQL engines ordering NULLS LAST would diverge on the same
  * input). This matches range/as-of semantics in SQL (`ts <= t` is never
  * true for NULL).
  */
object AsOf {

  /** @param keys     equality keys (the shuffle key)
    * @param tsCol    ordering column, present on both sides
    * @param payload  right-side columns to attach (output as `asof_<name>`)
    * @param tieBreak right-side column ordering simultaneous right rows
    *                 (highest wins; also output as `asof_<tieBreak>`)
    */
  def joinAsOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, payload: Seq[String], tieBreak: String): DataFrame = {
    val pCols = tieBreak +: payload
    val pStruct = struct(pCols.map(col): _*)
    val pType = right.select(pStruct.as("__p")).schema.head.dataType

    val leftCols = left.columns.toSeq
    val l = left.filter(col(tsCol).isNotNull)
      .withColumn("__side", lit(1))
      .withColumn("__tb", lit(null).cast(right.schema(tieBreak).dataType))
      .withColumn("__p", lit(null).cast(pType))
    val r = {
      val base = right.filter(col(tsCol).isNotNull)
        .withColumn("__side", lit(0))
        .withColumn("__tb", col(tieBreak))
        .withColumn("__p", pStruct)
      // null-pad the left-only columns so unionByName lines up
      leftCols.filterNot(right.columns.contains).foldLeft(base) { (df, c) =>
        df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }.select((leftCols ++ Seq("__side", "__tb", "__p")).map(col): _*)
    }

    // right rows precede left rows at equal ts (<= semantics); __tb only
    // orders right rows among themselves (left __tb is null, but __side
    // already separates the sides)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc, col("__tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.select((leftCols ++ Seq("__side", "__tb", "__p")).map(col): _*)
      .unionByName(r)
      .withColumn("__last", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        pCols.map(c => col(s"__last.$c").as(s"asof_$c")): _*)
  }
}
