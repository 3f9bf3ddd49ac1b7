package graft

import graft.operators.AsOf
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  // (event_id, user, ts, value)
  private val purchases = Seq(
    (100L, 1L, 50L, 10L),  // after clicks at 10 and 30 → click 2
    (101L, 1L, 30L, 11L),  // AT click 2's ts → matches it (<=)
    (102L, 1L, 5L, 12L),   // before any click → null
    (103L, 2L, 99L, 13L))  // user 2 has no clicks → null
    .toDF("event_id", "user_id", "ts_sec", "value_cents")
  private val clicks = Seq(
    (1L, 1L, 10L, 70L),
    (2L, 1L, 30L, 71L),
    (3L, 1L, 30L, 72L),    // same ts as click 2: higher event_id wins
    (4L, 3L, 1L, 73L))
    .toDF("event_id", "user_id", "ts_sec", "value_cents")

  test("joinAsOf: latest prior-or-equal right row per key, deterministic tiebreak") {
    val out = AsOf.joinAsOf(purchases, clicks, Seq("user_id"), "ts_sec",
        payload = Seq("value_cents"), tieBreak = "event_id")
      .select($"event_id", $"asof_event_id", $"asof_value_cents")
      .as[(Long, Option[Long], Option[Long])].collect()
      .map { case (k, a, b) => k -> ((a, b)) }.toMap
    assert(out(100L) == (Some(3L), Some(72L))) // ties: highest event_id
    assert(out(101L) == (Some(3L), Some(72L))) // <=: same-ts click matches
    assert(out(102L) == (None, None))
    assert(out(103L) == (None, None))
  }

  test("joinAsOf: null timestamps excluded from both sides, never ts=-infinity") {
    // right row with null ts must NOT match every left row (the NULLS
    // FIRST ascending default would make it ts=-infinity in the window);
    // a left row with null ts has no defined "prior" and is dropped.
    val l = Seq((1L, Some(20L), 10L), (2L, None, 11L))
      .toDF("event_id", "ts_sec", "value_cents")
      .select($"event_id", $"ts_sec".cast("long").as("ts_sec"), $"value_cents")
    val r = Seq((7L, Option.empty[Long], 70L), (8L, Some(5L), 71L))
      .toDF("event_id", "ts_sec", "value_cents")
      .select($"event_id", $"ts_sec".cast("long").as("ts_sec"), $"value_cents")
    val lk = l.withColumn("user_id", lit(1L))
    val rk = r.withColumn("user_id", lit(1L))
    val out = AsOf.joinAsOf(lk, rk, Seq("user_id"), "ts_sec",
        payload = Seq("value_cents"), tieBreak = "event_id")
      .select($"event_id", $"asof_event_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(out == Map(1L -> Some(8L))) // matches the ts=5 row, not the null-ts row
  }

  test("joinAsOf plans one keyed window, not a range theta-join") {
    val plan = AsOf.joinAsOf(purchases, clicks, Seq("user_id"), "ts_sec",
        Seq("value_cents"), "event_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }
}
