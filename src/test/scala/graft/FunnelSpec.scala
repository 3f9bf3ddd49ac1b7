package graft

import java.sql.Timestamp
import graft.operators.Funnel
import org.apache.spark.sql.functions._

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private lazy val events = Seq(
    // user 1: full ordered funnel
    (1L, "view", ts(10)), (1L, "click", ts(20)), (1L, "purchase", ts(30)),
    // user 2: purchase BEFORE the view — must not count past stage 1
    (2L, "purchase", ts(5)), (2L, "view", ts(10)), (2L, "click", ts(20)),
    // user 3: view only
    (3L, "view", ts(10)),
    // user 4: click with no prior view — counts nowhere
    (4L, "click", ts(10)),
    // user 5: same-timestamp next stage counts (inclusive >=)
    (5L, "view", ts(10)), (5L, "click", ts(10)), (5L, "purchase", ts(11))
  ).toDF("user_id", "event_type", "ts")

  test("reach enforces stage order per user") {
    val out = Funnel.reach(events, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .select($"stage", $"n_users").as[(String, Long)].collect().toMap
    assert(out == Map("view" -> 4L, "click" -> 3L, "purchase" -> 2L))
  }

  test("reach uses the FIRST qualifying prior-stage event, not any") {
    // click before the first view, then another after: the later click
    // qualifies, so the user converts
    val e = Seq(
      (9L, "click", ts(5)), (9L, "view", ts(10)), (9L, "click", ts(15)),
      (9L, "purchase", ts(20))
    ).toDF("user_id", "event_type", "ts")
    val out = Funnel.reach(e, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .select($"stage", $"n_users").as[(String, Long)].collect().toMap
    assert(out == Map("view" -> 1L, "click" -> 1L, "purchase" -> 1L))
  }

  test("reach plans a single shuffle for all stage windows") {
    val plan = Funnel.reach(events, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase")).queryExecution.executedPlan.toString
    // the user-partitioned Exchange is reused by every Window node and
    // the final fold is a driver-size single-row agg
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 keyed shuffle, got $exchanges:\n$plan")
  }
}
