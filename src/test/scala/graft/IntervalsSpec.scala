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
}
