package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface over the `events` table (extension per
  * SURVEY §2.11 — the reference's closest analog is its @daily batch DAG;
  * streams give the same pipeline incremental semantics via
  * readStream → transforms → writeStream with watermarked state).
  *
  * Batch/stream parity: the transforms here are the streaming twins of
  * SparkEntry q61 (hourly windows) and q62 (sessionization) — same
  * aggregates, same column names, so a user can swap `spark.read` for
  * `spark.readStream` without rewriting queries.
  */
object EventStreams {

  /** events parquet schema with `ts` at the given type: LongType when
    * the files store TIMESTAMP(NANOS) (nanosAsLong maps them to long),
    * TimestampType when they store TIMESTAMP(MICROS).
    */
  private def eventsFileSchema(tsType: org.apache.spark.sql.types.DataType): StructType =
    StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", tsType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))

  /** File-source stream over an events parquet path (driver testdata or a
    * production landing dir). `maxFilesPerTrigger=1` gives deterministic
    * incremental batches in tests; at scale leave the default.
    *
    * Timestamp unit is PROBED from the existing files with a batch read
    * (the stream source needs an explicit schema, and the landing data
    * has shipped both TIMESTAMP(NANOS) — which nanosAsLong surfaces as
    * a nanosecond long needing DIV 1000 — and plain TIMESTAMP(MICROS),
    * which must pass through untouched; assuming either unit corrupts
    * the other by ×1000). Batch reads get the same treatment in
    * [[graft.Tables.normalizeEvents]]. The probe needs at least one
    * landed file; for a stream over a not-yet-populated landing dir
    * pass `tsType` explicitly (LongType for nanos files,
    * TimestampNTZType or TimestampType for micros) — construction then
    * never touches the directory.
    */
  def readEvents(spark: SparkSession, path: String,
      maxFilesPerTrigger: Option[Int] = None,
      tsType: Option[org.apache.spark.sql.types.DataType] = None): DataFrame = {
    val nanosKey = "spark.sql.legacy.parquet.nanosAsLong"
    // the file's own ts mapping: LongType for TIMESTAMP(NANOS) files
    // (via nanosAsLong), TimestampNTZType for TIMESTAMP(MICROS,
    // isAdjustedToUTC=false) — request exactly it, then normalize.
    // The probe needs nanosAsLong (a NANOS footer fails schema
    // resolution without it), but the setting is SESSION-GLOBAL, so it
    // is restored right after: a micros-era stream must not silently
    // change how every later parquet read in the session surfaces
    // NANOS columns.
    val fileTsType = tsType.getOrElse {
      val prev = spark.conf.getOption(nanosKey)
      spark.conf.set(nanosKey, "true")
      try spark.read.parquet(path).schema("ts").dataType
      catch { case e: org.apache.spark.sql.AnalysisException =>
        throw new IllegalArgumentException(
          s"readEvents: cannot probe the ts unit of $path (no files yet?) — " +
            s"pass tsType explicitly for an empty landing dir", e)
      } finally prev match {
        case Some(v) => spark.conf.set(nanosKey, v)
        case None => spark.conf.unset(nanosKey)
      }
    }
    // for NANOS files the STREAM itself needs the flag too — that set
    // is lasting and deliberate (there is no per-read switch), and only
    // happens when the landing dir actually holds nanos files
    if (fileTsType == LongType) spark.conf.set(nanosKey, "true")
    val r = spark.readStream.schema(eventsFileSchema(fileTsType))
    val r2 = maxFilesPerTrigger.fold(r)(n => r.option("maxFilesPerTrigger", n))
    val raw = r2.parquet(path)
    // downstream consumers (watermarks, unix_micros) expect a session-TZ
    // TimestampType; the session runs UTC so the NTZ cast is
    // value-preserving
    if (fileTsType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else raw.withColumn("ts", col("ts").cast(TimestampType))
  }

  /** Tumbling 1-hour windowed aggregation with a 2-hour watermark —
    * streaming twin of q61_events_hourly. Append-mode-compatible.
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .select(unix_timestamp(col("window.start")).as("hour_epoch"),
        col("event_type"), col("n_events"), col("value_cents"))

  /** Sliding 30-minute windows every 10 minutes (overlapping windows are
    * the canonical streaming shape Spark's `window` handles natively).
    */
  def slidingTypeRates(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "30 minutes", "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(unix_timestamp(col("window.start")).as("window_start_epoch"),
        col("event_type"), col("n_events"))

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class SessionState(start: Long, last: Long, n: Long)
  final case class SessionOut(user_id: Long, session_start_sec: Long,
      n_events: Long, duration_sec: Long)

  /** Stateful sessionization via flatMapGroupsWithState: 30-minute
    * inactivity gap closes a session (streaming twin of q62, with state
    * timeouts doing what the batch lag-window does).
    */
  def sessionize(events: DataFrame): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", "2 hours")
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var st = state.getOption
          val closed = scala.collection.mutable.ArrayBuffer[SessionOut]()
          for (e <- sorted) {
            val sec = e.ts.getTime / 1000
            st match {
              case Some(s) if sec - s.last <= 1800 =>
                // a late in-watermark event may predate the session's
                // bounds: extend them, never move `last` backwards (a
                // backwards `last` yields negative durations and false
                // splits on the next on-time event)
                st = Some(SessionState(
                  start = math.min(s.start, sec),
                  last = math.max(s.last, sec),
                  n = s.n + 1))
              case Some(s) =>
                closed += SessionOut(userId, s.start, s.n, s.last - s.start)
                st = Some(SessionState(sec, sec, 1))
              case None =>
                st = Some(SessionState(sec, sec, 1))
            }
          }
          if (state.hasTimedOut) {
            val out = st.map(s => SessionOut(userId, s.start, s.n, s.last - s.start))
            state.remove()
            out.iterator ++ closed.iterator
          } else {
            st.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last * 1000 + 1800 * 1000)
            }
            closed.iterator
          }
      }
  }

  final case class FunnelEvent(user_id: Long, ts: java.sql.Timestamp,
      event_type: String)
  final case class FunnelBuf(ts_us: Long, tpe: String)
  final case class FunnelState(buf: Seq[FunnelBuf], firsts: Seq[Long],
      last_seen_us: Long)
  final case class FunnelHit(user_id: Long, stage_idx: Int, stage: String,
      first_ts_us: Long)

  /** Streaming ordered-funnel progress — the incremental twin of batch
    * `Funnel.reach`/`stageTimes`: emits (user, stage_idx, stage,
    * first_ts_us) the moment a user FIRST completes each stage, with
    * batch-exact semantics for any event-time disorder inside the
    * watermark.
    *
    * Exactness mechanism: events buffer in state until the watermark
    * passes them, then apply in global event-time order — so a late
    * in-watermark `view` correctly precedes an already-buffered `click`,
    * which a process-on-arrival design would mis-order (the batch
    * definition of stage k is the MIN qualifying timestamp, which is
    * order-sensitive). Same-timestamp ties break by FUNNEL STAGE ORDER
    * (not event-type name): a view and a click at the same instant must
    * apply view-first, matching the batch inclusive `>=` gate
    * (`Funnel.stageTimes`) — an alphabetical tie-break would consume the
    * click before its gating view and silently drop the conversion.
    * State per user = funnel progress (k longs) + the ≤ watermark-horizon
    * event buffer, so buffer state is bounded by the delay, not the
    * stream length. Progress state itself persists without a timeout by
    * default (a conversion may arrive days later); on a long-running
    * stream with unbounded distinct users pass `stateTtl` — a user whose
    * last funnel event is older than the TTL (in event time) has their
    * progress dropped, trading "conversions later than TTL re-emit
    * earlier stages" for bounded state. Users who never produce a
    * funnel-relevant event leave NO state behind.
    *
    * Checkpoint note: the state encoding gained a `last_seen_us` field;
    * a query restored from a checkpoint written by an older build must
    * restart from a fresh checkpoint (state schema is not migrated).
    */
  def funnelProgress(events: DataFrame, stages: Seq[String],
      stateTtl: Option[java.time.Duration] = None): Dataset[FunnelHit] = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", "2 hours")
      // keep the watermarked `ts` attribute itself — projecting it away
      // (e.g. to unix_micros) would drop the event-time tag the timeout
      // needs; µs are derived inside the handler instead
      .select(col("user_id"), col("ts"), col("event_type"))
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelHit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[FunnelEvent], state: GroupState[FunnelState]) =>
          def micros(t: java.sql.Timestamp): Long =
            t.getTime * 1000L + (t.getNanos % 1000000) / 1000L
          val ttlUs = stateTtl.map(d => d.toMillis * 1000L)
          val st = state.getOption
            .getOrElse(FunnelState(Nil, stages.map(_ => -1L), -1L))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          // only funnel-relevant types are worth buffer space
          val incoming = batch.collect {
            case e if stages.contains(e.event_type) =>
              FunnelBuf(micros(e.ts), e.event_type)
          }.toVector
          // ties on ts_us break by stage position: a same-instant
          // (view, click) must apply the gating view first — the batch
          // gate is inclusive (b.ts_us >= firsts(k-1)) so the click then
          // counts, matching Funnel.stageTimes exactly
          val (ready, pending) = (st.buf ++ incoming)
            .sortBy(b => (b.ts_us, stages.indexOf(b.tpe)))
            .partition(_.ts_us <= wmUs)
          val lastSeen = (st.last_seen_us +: incoming.map(_.ts_us)).max
          val firsts = st.firsts.toArray
          val hits = Seq.newBuilder[FunnelHit]
          for (b <- ready) {
            val k = stages.indexOf(b.tpe)
            if (firsts(k) < 0L &&
                (k == 0 || (firsts(k - 1) >= 0L && b.ts_us >= firsts(k - 1)))) {
              firsts(k) = b.ts_us
              hits += FunnelHit(uid, k + 1, stages(k), b.ts_us)
            }
          }
          // a fully-converted user needs no buffer; otherwise keep the
          // > watermark tail and wake up when the watermark passes it
          val keep = if (firsts.forall(_ >= 0L)) Nil else pending
          val expired = ttlUs.exists(t =>
            keep.isEmpty && lastSeen >= 0L && wmUs >= lastSeen + t)
          // lastSeen < 0 ⇒ this user has NEVER produced a funnel-relevant
          // event (the group fires for every user in the batch, funnel
          // types or not) — storing empty progress would leak one state
          // entry per non-funnel user forever, with or without a TTL
          if (expired) {
            state.remove()
          } else if (keep.isEmpty && lastSeen < 0L) {
            if (state.exists) state.remove()
          } else {
            state.update(FunnelState(keep, firsts.toSeq, lastSeen))
            val bufWakeMs = keep.map(_.ts_us).minOption.map(_ / 1000L)
            val ttlWakeMs = ttlUs.collect {
              case t if lastSeen >= 0L => (lastSeen + t) / 1000L
            }
            (bufWakeMs.toSeq ++ ttlWakeMs.toSeq).minOption.foreach { w =>
              state.setTimeoutTimestamp(
                math.max(w, state.getCurrentWatermarkMs() + 1L))
            }
          }
          hits.result().iterator
      }
  }

  /** Exactly-once-ish ingest dedup: drop replayed events by event_id
    * within the watermark horizon (state auto-expires past it — unbounded
    * keys never accumulate). The streaming twin of batch
    * `dropDuplicates(id)`.
    */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: each purchase joins the same user's
    * signup within the preceding hour. Both sides watermarked so join
    * state is bounded; the time-range predicate is what lets Spark expire
    * buffered rows.
    */
  def purchasesAfterSignup(events: DataFrame): DataFrame = {
    val signups = events.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("ts").as("s_ts"))
      .withWatermark("s_ts", "2 hours")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("value").as("amount"), col("event_id"))
      .withWatermark("p_ts", "2 hours")
    purchases.join(signups,
      col("p_user") === col("s_user") &&
        col("p_ts") >= col("s_ts") &&
        col("p_ts") <= col("s_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("p_user").as("user_id"), col("event_id"),
        unix_timestamp(col("s_ts")).as("signup_sec"),
        unix_timestamp(col("p_ts")).as("purchase_sec"),
        round(col("amount") * 100).cast("long").as("amount_cents"))
  }

  /** Drain a stream into an in-memory table synchronously (test/dev). */
  def runToMemory(df: DataFrame, name: String, outputMode: String = "append"): Unit = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(outputMode).start()
    q.processAllAvailable()
    q.stop()
  }
}
