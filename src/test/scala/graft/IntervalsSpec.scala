package graft

import graft.operators.Intervals
import org.apache.spark.sql.functions._

class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  test("pointInInterval ≡ naive theta join; each pair exactly once; bounds inclusive") {
    val ev = Tables(spark, sf, "events")
      .select($"event_id", $"user_id",
        unix_timestamp($"ts").as("ts_sec"), $"event_type")
    val inc = ev.filter($"event_type" === "error")
      .select($"event_id".as("incident_id"), $"user_id",
        $"ts_sec".as("start_sec"), ($"ts_sec" + 1800L).as("end_sec"))
    val pts = ev.select($"event_id", $"user_id", $"ts_sec")
    val tiled = Intervals.pointInInterval(pts, inc, Seq("user_id"),
        "ts_sec", "start_sec", "end_sec", tileSec = 900L)
      .select($"incident_id", $"event_id")
      .as[(Long, Long)].collect().toSeq
    // exactly-once: the bag has no duplicates even though wide intervals
    // span several tiles — a pair meets only in the point's own tile
    assert(tiled.size == tiled.toSet.size, "tiling produced duplicate pairs")
    val naive = pts.as("e").join(inc.as("i"),
        $"e.user_id" === $"i.user_id" &&
          $"e.ts_sec" >= $"i.start_sec" && $"e.ts_sec" <= $"i.end_sec")
      .select($"incident_id", $"e.event_id")
      .as[(Long, Long)].collect().toSet
    assert(tiled.toSet == naive && naive.nonEmpty)
    // the error event itself sits on the inclusive lower bound
    val self = tiled.filter { case (i, e) => i == e }
    assert(self.nonEmpty, "inclusive start must match the opening event")
  }

  test("tile width does not change the result set") {
    val pts = Seq((1L, 1L, 100L), (2L, 1L, 900L), (3L, 1L, 1800L),
      (4L, 2L, 100L)).toDF("event_id", "user_id", "ts_sec")
    val iv = Seq((10L, 1L, 0L, 900L), (11L, 1L, 1800L, 3600L),
      (12L, 2L, 200L, 300L)).toDF("iv_id", "user_id", "start_sec", "end_sec")
    def run(w: Long) = Intervals.pointInInterval(pts, iv, Seq("user_id"),
        "ts_sec", "start_sec", "end_sec", w)
      .select($"iv_id", $"event_id").as[(Long, Long)].collect().toSet
    val expect = Set((10L, 1L), (10L, 2L), (11L, 3L))
    for (w <- Seq(1L, 7L, 900L, 100000L)) assert(run(w) == expect, s"W=$w")
  }

  test("plan is an equi-join on (keys, tile) — no nested loop") {
    val ev = Tables(spark, sf, "events")
      .select($"event_id", $"user_id", unix_timestamp($"ts").as("ts_sec"))
    val iv = ev.limit(10)
      .select($"event_id".as("iv_id"), $"user_id",
        $"ts_sec".as("start_sec"), ($"ts_sec" + 600L).as("end_sec"))
    val plan = Intervals.pointInInterval(ev, iv, Seq("user_id"),
        "ts_sec", "start_sec", "end_sec", 900L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(2000))
  }

  // ------------------------------------------------------------------
  // interval × interval overlap
  // ------------------------------------------------------------------

  private lazy val evSec = Tables(spark, sf, "events")
    .select($"event_id", $"user_id",
      unix_timestamp($"ts").as("ts_sec"), $"event_type")
  private lazy val incidents = evSec.filter($"event_type" === "error")
    .select($"event_id".as("incident_id"), $"user_id",
      $"ts_sec".as("inc_start"), ($"ts_sec" + 1800L).as("inc_end"))
  private lazy val sessions = evSec.filter($"event_type" === "click")
    .select($"event_id".as("click_id"), $"user_id",
      $"ts_sec".as("click_start"), ($"ts_sec" + 600L).as("click_end"))

  test("intervalOverlap ≡ naive theta join; each pair exactly once") {
    val tiled = Intervals.intervalOverlap(incidents, sessions,
        Seq("user_id"), "inc_start", "inc_end", "click_start", "click_end",
        tileSec = 900L)
      .select($"incident_id", $"click_id")
      .as[(Long, Long)].collect().toSeq
    assert(tiled.size == tiled.toSet.size,
      "responsibility-tile rule must emit each pair once")
    val naive = incidents.as("a").join(sessions.as("b"),
        $"a.user_id" === $"b.user_id" &&
          $"a.inc_start" <= $"b.click_end" &&
          $"b.click_start" <= $"a.inc_end")
      .select($"incident_id", $"click_id")
      .as[(Long, Long)].collect().toSet
    assert(tiled.toSet == naive && naive.nonEmpty)
  }

  test("overlap tile width does not change the result set") {
    val a = Seq((10L, 1L, 0L, 1000L), (11L, 1L, 5000L, 6000L),
      (12L, 2L, 0L, 10L)).toDF("a_id", "user_id", "a_start", "a_end")
    val b = Seq((20L, 1L, 900L, 5500L), (21L, 1L, 6000L, 7000L),
      (22L, 2L, 11L, 12L), (23L, 2L, 10L, 20L))
      .toDF("b_id", "user_id", "b_start", "b_end")
    def run(w: Long) = Intervals.intervalOverlap(a, b, Seq("user_id"),
        "a_start", "a_end", "b_start", "b_end", w)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    // (10,20) overlap mid; (11,20) touch at 5000..5500; (11,21) touch at
    // the inclusive boundary 6000; (12,23) single-tick overlap at 10;
    // (12,22) disjoint (11 > 10)
    val expect = Set((10L, 20L), (11L, 20L), (11L, 21L), (12L, 23L))
    for (w <- Seq(1L, 7L, 900L, 100000L)) assert(run(w) == expect, s"W=$w")
  }

  test("overlap plan is an equi-join on (keys, tile) — no nested loop") {
    val plan = Intervals.intervalOverlap(incidents, sessions,
        Seq("user_id"), "inc_start", "inc_end", "click_start", "click_end",
        tileSec = 900L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("negative ticks fail the job instead of silently dropping pairs") {
    val pts = Seq((1L, 1L, -100L)).toDF("event_id", "user_id", "ts_sec")
    val iv = Seq((10L, 1L, 0L, 900L)).toDF("iv_id", "user_id", "start_sec", "end_sec")
    val ex = intercept[Exception] {
      Intervals.pointInInterval(pts, iv, Seq("user_id"),
        "ts_sec", "start_sec", "end_sec", 900L).count()
    }
    assert(ex.getMessage != null)
    val a = Seq((10L, 1L, 5L, 3L)).toDF("a_id", "user_id", "a_start", "a_end")
    val b = Seq((20L, 1L, 0L, 10L)).toDF("b_id", "user_id", "b_start", "b_end")
    intercept[Exception] {
      Intervals.intervalOverlap(a, b, Seq("user_id"),
        "a_start", "a_end", "b_start", "b_end", 2L).count()
    }
  }

  test("shared non-key column names are rejected up front") {
    val a = Seq((10L, 1L, 0L, 10L)).toDF("id", "user_id", "start_sec", "end_sec")
    val b = Seq((20L, 1L, 5L, 15L)).toDF("id", "user_id", "b_start", "b_end")
    val ex = intercept[IllegalArgumentException] {
      Intervals.intervalOverlap(a, b, Seq("user_id"),
        "start_sec", "end_sec", "b_start", "b_end", 10L)
    }
    assert(ex.getMessage.contains("id"))
  }
}
