package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-funnel analytics over an event log: for a stage sequence like
  * view → click → purchase, count the users who reached each stage IN
  * ORDER (a stage-k event only counts if it happens at-or-after the
  * user's first qualifying stage-(k-1) event). The standard product /
  * conversion metric, and a good stress of sequential window semantics
  * (reference analog: the event-style tables its DAG aggregates,
  * `process_publications_dag.py` count stages; funnel ordering is the
  * training-pipeline extension).
  *
  * Scale shape: ONE shuffle on the user key. Every stage's
  * first-qualifying timestamp is a window `min` over the same
  * user-partitioned window, so Catalyst plans k Window nodes over a
  * single Exchange (the partitioning is reused), then one partial+final
  * aggregate folds users into k stage counts. No self-joins, no
  * per-stage passes over the raw log; state per user is k timestamps.
  * Skewed users (bot traffic) bound the window cost per user, not the
  * plan — cap with a per-user event limit upstream if needed.
  */
object Funnel {

  /** Per-user first-qualifying timestamp for each stage: one row per
    * user with columns (userCol, s0..s{k-1}), where s_i is the first
    * stage-i event at-or-after the user's s_{i-1} (NULL = never reached).
    * The shared core of [[reach]] and the streaming twin's parity spec.
    */
  def stageTimes(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val w = Window.partitionBy(col(userCol))
    val staged = stages.zipWithIndex.foldLeft(
        events.select(col(userCol), col(typeCol), col(tsCol))) {
      case (df, (stage, i)) =>
        val qualifies =
          if (i == 0) col(typeCol) === stage
          else col(typeCol) === stage && col(s"__s${i - 1}").isNotNull &&
            col(tsCol) >= col(s"__s${i - 1}")
        df.withColumn(s"__s$i", min(when(qualifies, col(tsCol))).over(w))
    }
    // one row per user — window values are constant per user
    staged.groupBy(col(userCol))
      .agg(max(col("__s0")).as("s0"),
        stages.indices.drop(1).map(i => max(col(s"__s$i")).as(s"s$i")): _*)
  }

  /** Per-stage reach counts. Returns (stage_idx, stage, n_users), one row
    * per stage, where n_users = users whose first qualifying stage-k
    * event exists (ordering enforced with `>=` — a same-timestamp next
    * stage counts, matching the inclusive semantics of session tools).
    */
  def reach(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, stages: Seq[String]): DataFrame = {
    val perUser = stageTimes(events, userCol, typeCol, tsCol, stages)
    // fold users into per-stage non-null counts — partial+final agg,
    // no second shuffle (the user partitioning is reused)
    val totals = perUser.agg(
      count(col("s0")).as("n0"),
      stages.indices.drop(1).map(i => count(col(s"s$i")).as(s"n$i")): _*)
    totals.select(explode(array(stages.zipWithIndex.map { case (stage, i) =>
      struct(lit(i + 1).as("stage_idx"), lit(stage).as("stage"),
        col(s"n$i").as("n_users"))
    }: _*)).as("f")).select(col("f.stage_idx"), col("f.stage"), col("f.n_users"))
  }
}
