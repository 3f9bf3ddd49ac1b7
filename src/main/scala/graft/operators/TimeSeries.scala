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

  /** Classic COHORT-RETENTION matrix: entities grouped by the week of
    * their first event, each cohort's active-entity count tracked per
    * week of age. Weeks are integer epoch-micros div (7 days of
    * micros) — no calendar/timezone function, so any engine buckets
    * identically (the bucket boundary is the Unix epoch, not Monday;
    * fine for retention, which only needs CONSISTENT 7-day bins).
    *
    * Two keyed aggregations (first-week per entity; distinct
    * entity-weeks) and one broadcast-sized join — no window, no
    * self-join; at 100 TB both aggs partial-aggregate before the
    * shuffle.
    *
    * @return (cohort_wk, age_wk, n_active) — age 0 row = cohort size
    */
  def cohortRetention(events: DataFrame, entityCol: String,
      tsCol: String): DataFrame = {
    val wk = expr(s"unix_micros($tsCol) div ${7L * 86400 * 1000000}L")
    val activity = events
      .select(col(entityCol).as("entity"), wk.as("wk"))
      .distinct()
    val cohorts = activity.groupBy(col("entity"))
      .agg(min(col("wk")).as("cohort_wk"))
    activity.join(cohorts, Seq("entity"))
      .groupBy(col("cohort_wk"),
        (col("wk") - col("cohort_wk")).as("age_wk"))
      .agg(count(lit(1)).as("n_active"))
  }
}
