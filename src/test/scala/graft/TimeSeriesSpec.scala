package graft

import graft.operators.TimeSeries
import org.apache.spark.sql.functions._

/** Per-entity lag/lead deltas and row-frame moving sums: exact values
  * on a crafted stream, tie handling, partition isolation.
  */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    // user 1: 3 events at t=10s, 25s, 25s (tie broken by event_id)
    (101L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(10)), 1L, 1.00),
    (102L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(25)), 1L, 2.00),
    (103L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(25)), 1L, 4.00),
    // user 2: single event — all deltas null, mov3 = own value
    (201L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(7)), 2L, 9.99)
  ).toDF("event_id", "ts", "user_id", "value")

  test("gaps, rolling sums, and sequence numbers are exact") {
    val out = TimeSeries.eventDeltas(rows, "user_id", "ts", "event_id", "value")
      .select($"event_id", $"seq", $"gap_us", $"next_gap_us", $"mov3_cents")
      .as[(Long, Int, Option[Long], Option[Long], Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(out(101L) == ((101L, 1, None, Some(15000000L), 100L)))
    // the tied pair orders by event_id: 102 before 103, zero gap between
    assert(out(102L) == ((102L, 2, Some(15000000L), Some(0L), 300L)))
    assert(out(103L) == ((103L, 3, Some(0L), None, 700L)))
    assert(out(201L) == ((201L, 1, None, None, 999L)))
  }

  test("the 3-row frame truly slides: 4th event drops the 1st") {
    val more = (1L to 5L).map(i =>
      (i, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(i * 100)),
        1L, 1.00))
      .toDF("event_id", "ts", "user_id", "value")
    val mov = TimeSeries.eventDeltas(more, "user_id", "ts", "event_id", "value")
      .select($"event_id", $"mov3_cents").as[(Long, Long)].collect().toMap
    assert(mov == Map(1L -> 100L, 2L -> 200L, 3L -> 300L, 4L -> 300L,
      5L -> 300L))
  }

  test("matches an independent self-join computation on real events") {
    val ev = Tables(spark, sf, "events").filter($"user_id" % 25 === 3)
    val fast = TimeSeries.eventDeltas(ev, "user_id", "ts", "event_id", "value")
      .select($"event_id", $"gap_us").as[(Long, Option[Long])]
      .collect().toMap
    // independent: previous event via a max() anti-pattern join
    val a = ev.select($"event_id", $"user_id", unix_micros($"ts").as("us"))
    val prev = a.as("x").join(a.as("y"),
        $"x.user_id" === $"y.user_id" &&
          ($"y.us" < $"x.us" ||
            ($"y.us" === $"x.us" && $"y.event_id" < $"x.event_id")))
      .groupBy($"x.event_id".as("event_id"), $"x.us".as("us"))
      .agg(max(struct($"y.us", $"y.event_id")).as("p"))
      .select($"event_id", ($"us" - $"p.us").as("gap"))
      .as[(Long, Long)].collect().toMap
    assert(prev.nonEmpty)
    prev.foreach { case (id, gap) => assert(fast(id).contains(gap)) }
    // events with no predecessor are exactly the per-user minima
    val firsts = fast.collect { case (id, None) => id }.toSet
    assert(firsts.size + prev.size == fast.size)
  }

  test("cohortRetention: crafted cohorts, age-0 equals cohort size, revisits dedup") {
    def ev(id: Long, user: Long, day: Long) =
      (id, java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(day * 86400)), user, 1.0)
    // users 1,2 first active in week 0; user 1 returns twice in week 1
    // (dedups to one active mark); user 3 first active in week 2
    val rows = Seq(
      ev(1, 1L, 0), ev(2, 2L, 3),
      ev(3, 1L, 7), ev(4, 1L, 8),
      ev(5, 3L, 14), ev(6, 2L, 15)
    ).toDF("event_id", "ts", "user_id", "value")
    val m = TimeSeries.cohortRetention(rows, "user_id", "ts")
      .as[(Long, Long, Long)].collect().toSet
    assert(m == Set((0L, 0L, 2L), (0L, 1L, 1L), (0L, 2L, 1L),
      (2L, 0L, 1L)))
  }
}
