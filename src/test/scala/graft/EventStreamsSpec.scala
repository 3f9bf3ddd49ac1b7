package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.functions._

/** Streaming specs: drive each streaming query over the events parquet
  * with the memory sink and compare against the batch twin where the
  * output modes allow it.
  */
class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  // the streaming file source requires a DIRECTORY; link the single
  // events.parquet file into a temp dir (read-only testdata stays untouched)
  private lazy val eventsPath: String = {
    val dir = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.createSymbolicLink(
      dir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$sf/events.parquet"))
    dir.toString
  }

  test("hourly windowed agg (complete mode) matches the batch query") {
    val stream = EventStreams.hourlyCounts(
      EventStreams.readEvents(spark, eventsPath))
    EventStreams.runToMemory(stream, "hourly_complete", outputMode = "complete")
    val streamed = spark.table("hourly_complete")
      .as[(Long, String, Long, Long)].collect().toSet
    val batch = SparkEntry.queries("q61_events_hourly")(spark, sf)
      .as[(Long, String, Long, Long)].collect().toSet
    assert(streamed == batch)
  }

  test("sliding windows produce overlapping buckets") {
    val stream = EventStreams.slidingTypeRates(
      EventStreams.readEvents(spark, eventsPath))
    EventStreams.runToMemory(stream, "sliding_complete", outputMode = "complete")
    val rows = spark.table("sliding_complete")
      .as[(Long, String, Long)].collect()
    assert(rows.nonEmpty)
    // every event lands in 3 overlapping 30min/10min windows per type
    val batchTotal = Tables(spark, sf, "events").count()
    assert(rows.map(_._3).sum == 3 * batchTotal)
  }

  test("streaming dedup keeps event_ids unique") {
    val stream = EventStreams.dedupEvents(
      EventStreams.readEvents(spark, eventsPath))
      .select(col("event_id"))
    EventStreams.runToMemory(stream, "dedup_append")
    val ids = spark.table("dedup_append").as[Long].collect()
    assert(ids.length == ids.distinct.length)
    assert(ids.nonEmpty)
  }

  test("stream-stream interval join matches the batch equivalent") {
    val stream = EventStreams.purchasesAfterSignup(
      EventStreams.readEvents(spark, eventsPath))
    EventStreams.runToMemory(stream, "ss_join")
    val streamed = spark.table("ss_join")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val ev = Tables(spark, sf, "events")
    val signups = ev.filter($"event_type" === "signup")
      .select($"user_id".as("s_user"), $"ts".as("s_ts"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"ts".as("p_ts"),
        $"value".as("amount"), $"event_id")
    val batch = purchases.join(signups,
        $"p_user" === $"s_user" && $"p_ts" >= $"s_ts" &&
          $"p_ts" <= $"s_ts" + expr("INTERVAL 1 HOUR"))
      .select($"p_user", $"event_id", unix_timestamp($"s_ts"),
        unix_timestamp($"p_ts"), round($"amount" * 100).cast("long"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("stateful sessionization emits closed sessions consistent with batch") {
    val stream = EventStreams.sessionize(
      EventStreams.readEvents(spark, eventsPath))
    EventStreams.runToMemory(stream.toDF(), "sessions_append")
    val streamed = spark.table("sessions_append")
      .select($"user_id", $"session_start_sec", $"n_events", $"duration_sec")
      .as[(Long, Long, Long, Long)].collect().toSet
    val batch = SparkEntry.queries("q62_sessionize")(spark, sf)
      .select($"user_id", $"start_sec", $"n_events", $"duration_sec")
      .as[(Long, Long, Long, Long)].collect().toSet
    // one (watermark-open) tail session per user may be unemitted in the
    // stream; every emitted session must match a batch session exactly
    assert(streamed.nonEmpty)
    assert(streamed.subsetOf(batch),
      s"streamed-only sessions: ${(streamed -- batch).take(3)}")
    val missing = batch -- streamed
    assert(missing.size <= batch.groupBy(_._1).size,
      "at most one open tail session per user may be missing")
  }

  test("streaming funnel progress equals batch stage times up to the watermark") {
    import graft.operators.Funnel
    val stages = Seq("view", "click", "purchase")
    val stream = EventStreams.funnelProgress(
      EventStreams.readEvents(spark, eventsPath), stages)
    EventStreams.runToMemory(stream.toDF(), "funnel_append")
    val streamed = spark.table("funnel_append")
      .select($"user_id", $"stage_idx", $"first_ts_us")
      .as[(Long, Int, Long)].collect().toSet

    // the stream can only have finalized events at or before the final
    // watermark (max event time - 2h); batch-restrict to the same horizon
    val ev = Tables(spark, sf, "events")
      .select($"user_id", $"event_type", unix_micros($"ts").as("ts_us"))
    val wmMs = ev.agg(max($"ts_us")).as[Long].head() / 1000L - 2L * 3600 * 1000
    val horizon = ev.filter($"ts_us" <= wmMs * 1000L)
    val perUser = Funnel.stageTimes(horizon, "user_id", "event_type", "ts_us", stages)
    val batch = stages.indices.flatMap { i =>
      perUser.select($"user_id", $"s$i").as[(Long, Option[Long])].collect()
        .collect { case (u, Some(ts)) => (u, i + 1, ts) }
    }.toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch,
      s"stream-only: ${(streamed -- batch).take(3)}; batch-only: ${(batch -- streamed).take(3)}")
  }

  private def writeEventsFile(dir: String, name: String,
      rows: Seq[(Long, Long, Long, String, Double, String)]): Unit =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(1).write.mode("append").parquet(s"$dir/$name")

  test("same-timestamp cross-stage ties apply in funnel-stage order (stream == batch)") {
    import graft.operators.Funnel
    val stages = Seq("view", "click", "purchase")
    val baseUs = 1690000000000000L
    val hUs = 3600L * 1000000L
    def ns(us: Long) = us * 1000L
    val dir = java.nio.file.Files.createTempDirectory("funnel_tie").toString
    writeEventsFile(dir, "batch0", Seq(
      // user 1: view and click at the SAME instant — stage order must
      // apply the view first so the click passes the inclusive gate
      (1L, ns(baseUs), 1L, "view", 0.0, "{}"),
      (2L, ns(baseUs), 1L, "click", 0.0, "{}"),
      (3L, ns(baseUs + hUs), 1L, "purchase", 0.0, "{}"),
      // user 2: click strictly BEFORE its view — gate must reject it
      (4L, ns(baseUs), 2L, "click", 0.0, "{}"),
      (5L, ns(baseUs + 1L), 2L, "view", 0.0, "{}"),
      // watermark pusher (own user; beyond the horizon itself)
      (6L, ns(baseUs + 4 * hUs), 99L, "view", 0.0, "{}")))
    val stream = EventStreams.funnelProgress(
      EventStreams.readEvents(spark, s"$dir/batch0"), stages)
    EventStreams.runToMemory(stream.toDF(), "funnel_tie")
    val streamed = spark.table("funnel_tie")
      .select($"user_id", $"stage_idx", $"first_ts_us")
      .as[(Long, Int, Long)].collect().toSet
    assert(streamed == Set(
      (1L, 1, baseUs), (1L, 2, baseUs), (1L, 3, baseUs + hUs),
      (2L, 1, baseUs + 1L)))
    // and the batch twin agrees over the same watermark horizon
    val horizon = spark.read.parquet(s"$dir/batch0")
      .select($"user_id", $"event_type", expr("ts DIV 1000").as("ts_us"))
      .filter($"ts_us" <= baseUs + 2 * hUs)
    val perUser = Funnel.stageTimes(horizon, "user_id", "event_type", "ts_us", stages)
    val batch = stages.indices.flatMap { i =>
      perUser.select($"user_id", col(s"s$i")).as[(Long, Option[Long])].collect()
        .collect { case (u, Some(ts)) => (u, i + 1, ts) }
    }.toSet
    assert(streamed == batch)
  }

  test("stateTtl drops idle funnel progress past the retention horizon") {
    val stages = Seq("view", "click")
    val baseUs = 1690000000000000L
    val hUs = 3600L * 1000000L
    def ns(us: Long) = us * 1000L
    val dir = java.nio.file.Files.createTempDirectory("funnel_ttl").toString
    writeEventsFile(dir, "drops", Seq(
      (1L, ns(baseUs), 1L, "view", 0.0, "{}"),
      (2L, ns(baseUs + 4 * hUs), 99L, "view", 0.0, "{}")))
    val stream = EventStreams.funnelProgress(
      EventStreams.readEvents(spark, s"$dir/drops", maxFilesPerTrigger = Some(1)),
      stages, stateTtl = Some(java.time.Duration.ofHours(1)))
    val q = stream.toDF().writeStream.format("memory").queryName("funnel_ttl")
      .outputMode("append").start()
    q.processAllAvailable() // view applied; TTL (1h) expires user 1's state
    writeEventsFile(dir, "drops", Seq(
      (3L, ns(baseUs + 2 * hUs + 1L), 1L, "click", 0.0, "{}"),
      (4L, ns(baseUs + 6 * hUs), 99L, "view", 0.0, "{}")))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("funnel_ttl")
      .select($"user_id", $"stage_idx", $"first_ts_us")
      .as[(Long, Int, Long)].collect().toSet
    // the view emits; the later click finds the user's progress expired
    // (gate un-met) — the documented TTL trade-off, and proof state died
    // (the watermark-pusher user's own stage-1 hits are irrelevant here)
    assert(streamed.filter(_._1 == 1L) == Set((1L, 1, baseUs)))
  }
}
