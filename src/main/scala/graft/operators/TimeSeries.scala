package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered per-entity time-series windows over the events stream —
  * lag/lead deltas and row-frame moving aggregates, the sequence
  * analytics (inter-event gaps, short-horizon rolling spend) that sit
  * beside the sessionizer and funnel. Extension surface beyond the
  * reference's single ranking window.
  *
  * Scale shape: ONE shuffle keyed on the entity, then sorted windows
  * within each partition — no self-joins, no global sort; the frames
  * are row-bounded so state per key is O(frame), not O(history).
  * All outputs are exact integers (epoch micros, cents) so any engine
  * reproduces them bit-for-bit.
  */
object TimeSeries {

  /** Per `entityCol`, ordered by (`tsCol`, `idCol`) — the id tiebreak
    * makes the order total, so lag/lead are well-defined under ties:
    *
    *  - `gap_us`      micros since the previous event (null on first)
    *  - `next_gap_us` micros to the next event (null on last)
    *  - `mov3_cents`  rolling sum of `valueCol` cents over this and the
    *                  two preceding rows
    *  - `seq`         1-based position in the entity's stream
    */
  def eventDeltas(events: DataFrame, entityCol: String, tsCol: String,
      idCol: String, valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(entityCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
    val us = unix_micros(col(tsCol))
    val cents = round(col(valueCol) * 100).cast("long")
    events
      .withColumn("gap_us", us - lag(us, 1).over(w))
      .withColumn("next_gap_us", lead(us, 1).over(w) - us)
      .withColumn("mov3_cents",
        sum(cents).over(w.rowsBetween(-2, Window.currentRow)))
      .withColumn("seq", row_number().over(w))
  }
}
