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
}
