package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** Structured Streaming faces of the event-time operators in
  * [[graft.queries.EventQueries]]: the same windowed aggregation and
  * sessionization semantics, expressed as incremental queries with
  * watermarks and keyed state.
  *
  * The batch testdata (`events.parquet`) doubles as the stream source for
  * local smoke: `readStream.parquet` over the directory replays it, and a
  * memory sink + `processAllAvailable()` makes the run synchronous
  * (StreamingSpec drives exactly that path).
  */
object EventStream {

  /** The events schema when the testdata stores ts as parquet
    * TIMESTAMP(NANOS), which Spark 4 reads only as a raw long under
    * `spark.sql.legacy.parquet.nanosAsLong` (ts normalized to
    * microsecond TIMESTAMP_NTZ by [[graft.Tables.table]]; streams convert
    * the same way). Newer testdata drops stamp ts as plain timestamp[us];
    * [[readEvents]] probes the staged directory's footer and handles both. */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // parquet TIMESTAMP(NANOS) under nanosAsLong
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Source: replay a parquet events directory as a stream. The event-time
    * column must stay TIMESTAMP (LTZ) — Spark rejects TIMESTAMP_NTZ as a
    * watermark column — so run with the session timezone pinned to UTC
    * (as Verify/Bench/tests do) to make window boundaries agree with the
    * NTZ batch twins; [[hourlyCounts]] converts its output back to NTZ.
    *
    * File streams require an explicit schema, and the testdata has shipped
    * ts two ways (TIMESTAMP(NANOS) → raw long under the legacy flag;
    * later drops: plain timestamp[us]) — so probe the directory's parquet
    * footer once at stream-definition time (callers stage files before
    * defining the stream) and branch the normalization, exactly like the
    * batch reader [[graft.Tables.table]]. Feeding the micros value through
    * the nanos `div 1000` path is the 1970-01-20 failure mode this guards. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    val onDisk = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(onDisk).parquet(dir)
    onDisk("ts").dataType match {
      case LongType =>
        stream.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        stream.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  /** Tumbling 1-hour windowed aggregation with a 2-hour watermark —
    * the streaming twin of q_events_hourly. Late rows beyond the
    * watermark are dropped instead of growing state without bound. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("event_count"),
        sum(col("value")).as("total_value"))
      .select(col("window.start").cast("timestamp_ntz").as("hour_ts"),
        col("event_type"), col("event_count"), col("total_value"))

  /** Hopping (sliding) 1-hour/30-minute windowed aggregation — the
    * streaming twin of q_events_hopping. Identical shape to
    * [[hourlyCounts]]: the native window() generator expands each event
    * into its two overlapping windows BELOW the partial aggregate, so
    * the fan-out combines map-side and state is one row per open
    * (window, type) cell, closed by the same 2-hour watermark. */
  def hoppingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("event_count"),
        sum(col("value")).as("total_value"))
      .select(col("window.start").cast("timestamp_ntz").as("window_start"),
        col("event_type"), col("event_count"), col("total_value"))

  /** One finalized session per user per inactivity gap — the streaming twin
    * of q_events_sessions, via flatMapGroupsWithState with an event-time
    * timeout. State per user is O(1) (count + bounds), so executors hold
    * #active-users state regardless of event volume. */
  case class SessionState(start: Long, end: Long, events: Long, value: Double)
  case class SessionOut(userId: Long, start: java.sql.Timestamp,
                        end: java.sql.Timestamp, events: Long, value: Double)

  def sessionize(spark: SparkSession, events: DataFrame,
                 gapSeconds: Long = 1800): Dataset[SessionOut] = {
    import spark.implicits._
    val typed = events.select(col("user_id"), col("ts").cast("timestamp"),
      col("value")).as[(Long, java.sql.Timestamp, Double)]

    def finalize(userId: Long, s: SessionState): SessionOut =
      SessionOut(userId, new java.sql.Timestamp(s.start),
        new java.sql.Timestamp(s.end), s.events, s.value)

    def update(userId: Long, rows: Iterator[(Long, java.sql.Timestamp, Double)],
               state: GroupState[SessionState]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        val out = finalize(userId, state.get)
        state.remove()
        Iterator.single(out)
      } else {
        val sorted = rows.toSeq.sortBy(_._2.getTime)
        var closed = List.empty[SessionOut]
        var cur = state.getOption
        sorted.foreach { case (_, ts, v) =>
          val t = ts.getTime
          val gapMs = gapSeconds * 1000
          cur match {
            // within gap of the session bounds on either side: merge and
            // only ever widen (out-of-order arrivals within the watermark)
            case Some(s) if t <= s.end + gapMs && t >= s.start - gapMs =>
              cur = Some(s.copy(start = math.min(s.start, t),
                end = math.max(s.end, t),
                events = s.events + 1, value = s.value + v))
            // far EARLIER than the session: its own session, immediately
            // final (everything still coming is at or after `sorted`'s
            // later rows; batch semantics would close it the same way)
            case Some(s) if t < s.start - gapMs =>
              closed ::= finalize(userId, SessionState(t, t, 1, v))
            // far later: close the current session, start a new one
            case Some(s) =>
              closed ::= finalize(userId, s)
              cur = Some(SessionState(t, t, 1, v))
            case None =>
              cur = Some(SessionState(t, t, 1, v))
          }
        }
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.end + gapSeconds * 1000)
        }
        closed.reverseIterator
      }
    }

    typed
      .withWatermark("ts", "2 hours")
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Streaming exact dedup: drop events whose `event_id` was already seen
    * within the watermark horizon — the streaming face of q_dedup_exact,
    * with state bounded by the watermark instead of growing forever. */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Gap-sessionization via the built-in session_window aggregate — the
    * declarative twin of [[sessionize]] (which keeps explicit state to
    * show the flatMapGroupsWithState shape). session_window's end is
    * last-event + gap by definition. */
  def sessionizeNative(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("event_count"), sum(col("value")).as("session_value"))
      .select(col("user_id"),
        col("session_window.start").cast("timestamp_ntz").as("session_start"),
        col("event_count"), col("session_value"))

  /** Per-user ordered-attribution funnel state: epoch-millis of the first
    * signup, first qualifying click, first qualifying purchase; -1 =
    * stage not reached. Three longs — O(1) per key by construction. */
  case class FunnelState(t1: Long, t2: Long, t3: Long)
  case class FunnelOut(userId: Long, t1: Option[Long], t2: Option[Long],
                       t3: Option[Long])

  /** Streaming twin of q_events_funnel: strict ordered conversion funnel
    * (first signup → first click within `windowMs` after it → first
    * purchase within `windowMs` after that), one snapshot row per user
    * per batch in Update mode.
    *
    * State machine per user, events applied in event-time order (rows
    * within an invocation are sorted; ACROSS batches the design assumes
    * the per-user stream is watermark-ordered, the file-replay ingestion
    * shape — an earlier-timestamped signup arriving in a later batch
    * would revise t1 without replaying clicks between old and new t1,
    * which an O(1)-state operator cannot do by construction; the
    * buffer-until-watermark variant that can costs O(events in the
    * watermark horizon) per key and the same three-long state machine
    * downstream). Late rows beyond the 2h watermark are dropped by Spark.
    *
    * State is reaped by an event-time timeout once the watermark passes
    * t1 + 2·window (after that no event can change any stage: t2 ≤ t1+w,
    * t3 ≤ t2+w), or last-seen + 2·window for users who never signed up —
    * so executors hold state only for users inside the attribution
    * horizon, not the whole history. */
  def funnel(spark: SparkSession, events: DataFrame,
             windowMs: Long = 86400000L): Dataset[FunnelOut] = {
    import spark.implicits._
    val typed = events
      .select(col("user_id"), col("event_type"),
        date_trunc("second", col("ts")).cast("timestamp").as("ts"))
      .as[(Long, String, java.sql.Timestamp)]

    def update(userId: Long, rows: Iterator[(Long, String, java.sql.Timestamp)],
               state: GroupState[FunnelState]): Iterator[FunnelOut] = {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        var s = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L))
        var maxSeen = -1L
        rows.toSeq.sortBy(_._3.getTime).foreach { case (_, tpe, ts) =>
          val t = ts.getTime
          maxSeen = math.max(maxSeen, t)
          tpe match {
            case "signup" if s.t1 < 0 || t < s.t1 => s = s.copy(t1 = t)
            case "click" if s.t1 >= 0 && s.t2 < 0 &&
              t > s.t1 && t <= s.t1 + windowMs => s = s.copy(t2 = t)
            case "purchase" if s.t2 >= 0 && s.t3 < 0 &&
              t > s.t2 && t <= s.t2 + windowMs => s = s.copy(t3 = t)
            case _ => ()
          }
        }
        state.update(s)
        val horizon = (if (s.t1 >= 0) s.t1 else maxSeen) + 2 * windowMs
        state.setTimeoutTimestamp(
          math.max(horizon, state.getCurrentWatermarkMs() + 1))
        Iterator.single(FunnelOut(userId,
          Some(s.t1).filter(_ >= 0), Some(s.t2).filter(_ >= 0),
          Some(s.t3).filter(_ >= 0)))
      }
    }

    typed
      .withWatermark("ts", "2 hours")
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Running moments per event type as Welford accumulators (count,
    * mean, M2). The batch query's integer-sum device exists for DuckDB
    * oracle exactness over a BOUNDED corpus; an unbounded stream would
    * overflow a long sum-of-squares (v2² ~1e10 per event wraps after
    * ~1e9 events — and once wrapped, variance goes negative and the
    * degenerate-variance guard silently disables detection forever).
    * Welford is the standard overflow-free online form: mean/M2 stay in
    * the data's own magnitude at any stream length, and population
    * variance = M2/n matches the batch formula. Inputs are still
    * e2-snapped first, so both paths score the same snapped values. */
  case class MomentState(n: Long, mean: Double, m2: Double)
  case class AnomalyOut(eventId: Long, eventType: String,
                        valueSnapped: Double, zScore: Double)

  /** Streaming ONLINE anomaly detection — the streaming face of
    * q_events_anomaly, with the one semantic change streaming forces:
    * each event is scored against the moments of the history seen so
    * far (the online contract: you cannot z-score against a global mean
    * you have not finished observing; the batch query retro-scores
    * against full-series moments). Events inside the `minCount` warm-up
    * or in a zero-variance prefix are never flagged — the same
    * degenerate-variance guard as batch, prefix-wise.
    *
    * State per event_type is three numbers, and the key cardinality is
    * the event-type vocabulary — bounded by the schema, not the
    * stream — so unlike the per-user funnel there is nothing to reap:
    * no per-group timeout is ever set and state lives forever. The O(1)
    * bound is on PERSISTED state only: each invocation buffers and sorts
    * its (event_type, micro-batch) slice in memory (`rows.toSeq.sortBy`,
    * the same idiom as funnel/sessions), so peak task memory is the hot
    * type's share of one micro-batch and a skewed type concentrates that
    * batch on one task — size micro-batches (maxFilesPerTrigger /
    * maxOffsetsPerTrigger) with that in mind on a production ingest. The
    * timeout CONF is still EventTimeTimeout: flatMapGroupsWithState
    * only drops later-than-watermark rows under that conf
    * (FlatMapGroupsWithStateExecBase applies
    * applyRemovingRowsOlderThanWatermark only when
    * timeoutConf == EventTimeTimeout — under NoTimeout the watermark
    * would be inert and an hours-late row would be scored against
    * moments that already include its successors, retro-scoring in
    * violation of the online contract). Rows within a batch apply in
    * (ts, event_id) order; across batches the design assumes
    * watermark-ordered replay (the file-ingestion shape, same note as
    * [[funnel]]). State schema is the Welford triple from first
    * release — the integer-sum draft never shipped, so there are no
    * checkpoints to migrate. */
  def onlineAnomaly(spark: SparkSession, events: DataFrame,
                    threshold: Double = 3.0,
                    minCount: Long = 30L): Dataset[AnomalyOut] = {
    import spark.implicits._
    val typed = events
      .select(col("event_id"), col("event_type"), col("ts"), col("value"))
      .withWatermark("ts", "2 hours")
      .as[(Long, String, java.sql.Timestamp, Double)]

    def update(eventType: String,
               rows: Iterator[(Long, String, java.sql.Timestamp, Double)],
               state: GroupState[MomentState]): Iterator[AnomalyOut] = {
      // unreachable (no timeout is ever set), present for GroupState
      // contract completeness
      if (state.hasTimedOut) return Iterator.empty
      var s = state.getOption.getOrElse(MomentState(0L, 0d, 0d))
      val out = Seq.newBuilder[AnomalyOut]
      rows.toSeq.sortBy(r => (r._3.getTime, r._1)).foreach {
        case (id, _, _, value) =>
          val v = math.floor(value * 100d + 0.5d) / 100d // snapE2 value
          if (s.n >= minCount) {
            val variance = s.m2 / s.n
            if (variance > 0d) {
              val z = (v - s.mean) / math.sqrt(variance)
              if (math.abs(z) >= threshold)
                out += AnomalyOut(id, eventType, v,
                  math.floor(z * 1000d + 0.5d) / 1000d)
            }
          }
          val n1 = s.n + 1
          val d = v - s.mean
          val mean1 = s.mean + d / n1
          s = MomentState(n1, mean1, s.m2 + d * (v - mean1))
      }
      state.update(s)
      out.result().iterator
    }

    typed
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }

  // referenced from flatMapGroupsWithState closures via a LOCAL copy in
  // each method: a direct module-field reference captures the whole
  // (non-serializable) EventStream$ module into the task closure
  private val HourMs = 3600000L

  /** Per-type gap-filled hourly grid state: the next grid hour to emit
    * (MaxValue until the first event fixes the grid origin) and the
    * not-yet-final hour counts. `pending` is bounded by the hours inside
    * the watermark horizon (a 2h watermark holds ≤ ~3 open hours) — rows
    * later than the watermark are dropped, rows at or after it land in
    * hours that are still open, so a closed hour can never reopen. */
  case class GapfillState(nextHour: Long, pending: Map[Long, Long],
                          lastDataHour: Long)
  case class HourCountOut(eventType: String, hourTs: java.sql.Timestamp,
                          eventCount: Long)

  /** Streaming twin of q_events_gapfill — the TIMER-driven operator the
    * declarative twins can't express: a windowed aggregation only emits
    * windows that saw data, but a gap-filled series must emit a ZERO row
    * for every silent hour. flatMapGroupsWithState per event_type keeps
    * the dense-grid cursor as state; each invocation (data-driven or the
    * event-time timeout firing on a silent key) finalizes every grid hour
    * whose end the watermark has passed — present hours with their
    * counts, silent hours with 0 — and re-arms the timer at the next
    * unfinalized hour end, so the grid keeps advancing even when the key
    * itself never sees another event (the watermark advances on OTHER
    * keys' data; that is what makes this timer-driven rather than
    * data-driven). Unlike the batch query, the live grid has no max
    * hour: a type that goes quiet keeps emitting zeros each time the
    * watermark passes another hour — exactly what a downstream
    * dashboard/alerting consumer wants from a resampler. Key cardinality
    * is the event-type vocabulary (schema-bounded, the onlineAnomaly
    * note) — but the PER-KEY lifetime is not: with no horizon, a
    * permanently retired event type keeps a timer armed and emits a zero
    * row every hour forever, so output rows and timer churn grow
    * linearly per dead type. `maxSilentHours` is the retirement path:
    * once a key has zero-filled that many hours past its last data hour
    * it stops re-arming and removes its state (mirroring the funnel
    * reaper). A type that later revives re-registers as a fresh key
    * whose grid restarts at the new first hour — the retired gap is NOT
    * backfilled (by then the zeros would be stale history, not a live
    * signal). None (the default) keeps the emit-forever resampler
    * contract. */
  def gapfillHourly(spark: SparkSession, events: DataFrame,
                    maxSilentHours: Option[Int] = None): Dataset[HourCountOut] = {
    import spark.implicits._
    val typed = events.select(col("event_type"), col("ts"))
      .withWatermark("ts", "2 hours")
      .as[(String, java.sql.Timestamp)]
    val hourMs = HourMs // local copy: keep the module out of the closure
    val silentCap = maxSilentHours

    def update(tpe: String, rows: Iterator[(String, java.sql.Timestamp)],
               state: GroupState[GapfillState]): Iterator[HourCountOut] = {
      var s = state.getOption.getOrElse(
        GapfillState(Long.MaxValue, Map.empty, Long.MinValue))
      rows.foreach { case (_, ts) =>
        val h = Math.floorDiv(ts.getTime, hourMs) * hourMs
        s = GapfillState(math.min(s.nextHour, h),
          s.pending.updated(h, s.pending.getOrElse(h, 0L) + 1L),
          math.max(s.lastDataHour, h))
      }
      val wm = state.getCurrentWatermarkMs()
      val out = Seq.newBuilder[HourCountOut]
      var retired = false
      if (s.nextHour != Long.MaxValue) {
        var h = s.nextHour
        while (!retired && h + hourMs <= wm) {
          // pending keys are data hours (all <= lastDataHour), so every
          // grid hour past lastDataHour is a zero-fill; past the horizon,
          // retire instead of emitting
          if (silentCap.exists(m => h > s.lastDataHour + m.toLong * hourMs))
            retired = true
          else {
            out += HourCountOut(tpe, new java.sql.Timestamp(h),
              s.pending.getOrElse(h, 0L))
            s = s.copy(nextHour = h + hourMs, pending = s.pending - h)
            h += hourMs
          }
        }
      }
      if (retired) state.remove() // also clears the armed timer
      else {
        state.update(s)
        // re-arm at the next hour end; a timeout timestamp must sit beyond
        // the current watermark or Spark rejects it
        if (s.nextHour != Long.MaxValue)
          state.setTimeoutTimestamp(math.max(s.nextHour + hourMs, wm + 1))
      }
      out.result().iterator
    }

    typed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Per-type trailing moving-average state: open hour sums in e2
    * fixed-point (same bound as [[GapfillState]].pending) plus the ≤2
    * most recent CLOSED hours — all a 3-hour trailing window can reach.
    * O(1) per key by construction. */
  case class MovingAvgState(pending: Map[Long, Long],
                            recent: List[(Long, Long)])
  case class MovingAvgOut(eventType: String, hourTs: java.sql.Timestamp,
                          movingAvgValue: Double, windowHours: Long)

  /** Streaming twin of q_events_moving_avg: per-event values snap to e2
    * fixed-point ([[graft.Clean.snapE2]]'s floor formula) and accumulate
    * into open hour buckets; when the watermark closes an hour, its
    * trailing ≤3-bucket average emits — computed over the hours PRESENT
    * in the series, silent hours absent, exactly the batch RANGE-interval
    * frame (inclusive 7200s lookback). The long sums make the streaming
    * emission bit-identical to the batch window: same integer
    * accumulation, same single rounded division at the end. Hours close
    * in ascending order (the `sorted`), so each closed hour sees exactly
    * the recent-closed list the batch frame would. Timer-driven like
    * [[gapfillHourly]] — a quiet key still closes its last open hours
    * when the watermark passes them — but with no dense grid there is
    * nothing to emit after the backlog closes, so the timer only re-arms
    * while hours are pending. */
  def movingAvgHourly(spark: SparkSession, events: DataFrame): Dataset[MovingAvgOut] = {
    import spark.implicits._
    val typed = events.select(col("event_type"), col("ts"), col("value"))
      .withWatermark("ts", "2 hours")
      .as[(String, java.sql.Timestamp, Double)]
    val hourMs = HourMs // local copy: keep the module out of the closure

    def update(tpe: String,
               rows: Iterator[(String, java.sql.Timestamp, Double)],
               state: GroupState[MovingAvgState]): Iterator[MovingAvgOut] = {
      var s = state.getOption.getOrElse(MovingAvgState(Map.empty, Nil))
      rows.foreach { case (_, ts, v) =>
        val h = Math.floorDiv(ts.getTime, hourMs) * hourMs
        val e2 = math.floor(v * 100d + 0.5d).toLong // snapE2, scalar form
        s = s.copy(pending = s.pending.updated(h, s.pending.getOrElse(h, 0L) + e2))
      }
      val wm = state.getCurrentWatermarkMs()
      val out = Seq.newBuilder[MovingAvgOut]
      s.pending.keys.filter(_ + hourMs <= wm).toSeq.sorted.foreach { h =>
        val sum = s.pending(h)
        val inWindow = s.recent.filter(_._1 >= h - 2 * hourMs)
        val n = inWindow.size + 1L
        val avg = (inWindow.map(_._2).sum + sum) / 100d / n
        out += MovingAvgOut(tpe, new java.sql.Timestamp(h),
          math.floor(avg * 100d + 0.5d) / 100d, n) // roundHalfUp(_, 2)
        s = MovingAvgState(s.pending - h, ((h, sum) :: inWindow).take(2))
      }
      state.update(s)
      if (s.pending.nonEmpty)
        state.setTimeoutTimestamp(
          math.max(s.pending.keys.min + hourMs, wm + 1))
      out.result().iterator
    }

    typed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Per-user cohort state: the first-activity week (epoch ms) and the
    * week offsets already reported. `maxOffset` bounds the set — and
    * therefore per-user state — at maxOffset+1 members: offsets past the
    * horizon are neither emitted nor remembered (retention reports
    * rarely read past week 12; the default keeps a decade). */
  case class CohortState(cohortWeek: Long, seen: Set[Int])
  case class RetentionHit(cohortWeek: java.sql.Timestamp, weekOffset: Int)

  /** Streaming twin of q_events_retention, emitting INCREMENTS: one
    * (cohort_week, week_offset) row the first time each user is active
    * in a week — the downstream `groupBy.count` of those rows is the
    * batch query's active_users grid. The cohort week is fixed by the
    * user's first-seen event (within-batch rows apply in event-time
    * order; across batches the design assumes watermark-ordered replay,
    * the [[funnel]] note — and when that assumption breaks, a pre-cohort
    * week arriving late is DROPPED by the off >= 0 guard in `update`
    * rather than emitted as an impossible negative offset: in Append
    * mode the cohort cannot rewind). The week bucket is computed by the SAME
    * `date_trunc("week")` column expression the batch query uses —
    * reimplementing ISO-week arithmetic in scalar code would be a
    * desynchronization bug waiting to happen. Unlike the windowed twins
    * nothing waits for the watermark: an increment is final the moment
    * it is first observed (a set can only gain a member once), so this
    * emits data-driven in Append mode with no timers. */
  def retentionHits(spark: SparkSession, events: DataFrame,
                    maxOffset: Int = 520): Dataset[RetentionHit] = {
    import spark.implicits._
    val typed = events
      .select(col("user_id"), col("ts"),
        date_trunc("week", col("ts")).cast("timestamp").as("week_ts"))
      .withWatermark("ts", "2 hours")
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp)]

    def update(userId: Long,
               rows: Iterator[(Long, java.sql.Timestamp, java.sql.Timestamp)],
               state: GroupState[CohortState]): Iterator[RetentionHit] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      val out = Seq.newBuilder[RetentionHit]
      var s = state.getOption.orNull
      rows.toSeq.sortBy(_._2.getTime).foreach { case (_, _, week) =>
        val w = week.getTime
        if (s == null) s = CohortState(w, Set.empty)
        // integer weeks-since-cohort; ms week starts make this exact.
        // off >= 0 matters: an event inside the watermark but arriving in
        // a LATER micro-batch with a week before the stored cohortWeek
        // would yield a negative offset — a row the batch retention grid
        // can never contain, silently corrupting the downstream
        // groupBy.count. Cohorts cannot rewind in Append mode (the
        // already-emitted offsets are final against the old cohort), so
        // the late pre-cohort week is dropped, not re-anchored — the
        // same degrade-by-dropping shape as the funnel caveat.
        val off = ((w - s.cohortWeek) / (7 * 86400000L)).toInt
        if (off >= 0 && off <= maxOffset && !s.seen(off)) {
          s = s.copy(seen = s.seen + off)
          out += RetentionHit(new java.sql.Timestamp(s.cohortWeek), off)
        }
      }
      state.update(s)
      out.result().iterator
    }

    typed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Per-user as-of state: the latest click seen, as (epoch-sec ms,
    * event_id, value) — one triple per user, O(1) by construction. The
    * value is an Option so a click whose VALUE is null still counts as a
    * match (mirroring the batch operator's presence-struct device). */
  case class AsOfState(sec: Long, eventId: Long, value: Option[Double])
  case class AsOfOut(eventId: Long, userId: Long, sec: java.sql.Timestamp,
                     value: Option[Double], lastClickValue: Option[Double])

  /** Streaming twin of q_events_asof — the stateful temporal-enrichment
    * join (each purchase annotated with the user's latest click value
    * at-or-before it) that batch expresses as
    * [[graft.operators.AsOfJoin]]'s union + ignore-nulls window. Here
    * the "right side" collapses to one triple of state per user: rows
    * apply in (sec, kind, event_id) order — clicks sort before purchases
    * at the same second (the ≤ visibility rule) and a same-second click
    * with a greater event_id supersedes (the latestPerKeyTs tiebreak),
    * so a single replayed batch reproduces the batch join EXACTLY
    * (AsOfStreamSpec pins row-set equality). Across micro-batches the
    * watermark-ordered-replay caveat of [[funnel]] applies. State is one
    * triple per user and lives for the user's lifetime — the enrichment
    * contract itself is unbounded-horizon; a deployment that can bound
    * "how stale may a click be" should add an event-time timeout at
    * lastClick + horizon. */
  def asofEnrich(spark: SparkSession, events: DataFrame): Dataset[AsOfOut] = {
    import spark.implicits._
    val typed = events
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts"), date_trunc("second", col("ts")).cast("timestamp").as("sec"),
        col("value"))
      .withWatermark("ts", "2 hours")
      .as[(Long, Long, String, java.sql.Timestamp, java.sql.Timestamp, Option[Double])]

    def update(userId: Long,
               rows: Iterator[(Long, Long, String, java.sql.Timestamp, java.sql.Timestamp, Option[Double])],
               state: GroupState[AsOfState]): Iterator[AsOfOut] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      val out = Seq.newBuilder[AsOfOut]
      var s = state.getOption.orNull
      rows.toSeq.sortBy(r => (r._5.getTime, if (r._3 == "click") 0 else 1, r._1))
        .foreach { case (id, _, kind, _, sec, v) =>
          val t = sec.getTime
          if (kind == "click") {
            // greatest (sec, event_id) wins — the batch tiebreak
            if (s == null || s.sec < t || (s.sec == t && s.eventId < id))
              s = AsOfState(t, id, v)
          } else {
            val last = if (s != null && s.sec <= t) s.value else None
            out += AsOfOut(id, userId, sec, v, last)
          }
        }
      if (s != null) state.update(s)
      out.result().iterator
    }

    typed.groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Watermarked stream-stream interval join — correlate each `click`
    * event with the same user's `purchase` events within `maxDelay` after
    * it (attribution-window semantics; the streaming analog of
    * [[graft.operators.RangeJoin]]'s bounded band). Both sides carry
    * event-time watermarks and the join condition bounds `r_ts` to
    * (l_ts, l_ts + maxDelay], so Spark evicts join state older than
    * watermark + delay — state holds only the interval's events, not the
    * stream. A self-join of one stream under two filters is the standard
    * shape; inner stream-stream joins emit in Append mode as matches
    * arrive. */
  def correlate(events: DataFrame, leftType: String = "click",
                rightType: String = "purchase",
                maxDelay: String = "30 minutes"): DataFrame = {
    val l = events.filter(col("event_type") === leftType)
      .select(col("user_id"), col("event_id").as("l_id"), col("ts").as("l_ts"))
      .withWatermark("l_ts", "2 hours")
    val r = events.filter(col("event_type") === rightType)
      .select(col("user_id").as("r_user"), col("event_id").as("r_id"),
        col("ts").as("r_ts"), col("value").as("r_value"))
      .withWatermark("r_ts", "2 hours")
    l.join(r, expr(
      s"user_id = r_user AND r_ts > l_ts AND r_ts <= l_ts + interval $maxDelay"))
      .select(col("user_id"), col("l_id"), col("r_id"),
        col("l_ts"), col("r_ts"), col("r_value"))
  }

  /** LEFT-OUTER watermarked stream-stream interval join — the streaming
    * face of `q_events_attrib` (view→purchase attribution pairs, one
    * null-view row per unattributed purchase), and the join shape
    * [[correlate]]'s inner form doesn't cover: an outer stream-stream
    * join can only emit its null-padded rows once the WATERMARK has
    * passed the row's join window (before that a match could still
    * arrive), so correctness depends on Spark's symmetric-hash-join
    * state eviction, not just on matching. Both sides carry 4-hour
    * watermarks; the condition bounds view_ts to
    * (purchase_ts − 2 h, purchase_ts], so join state holds only the
    * interval's events. Output columns/types/arithmetic are exactly the
    * batch query's (second-truncated epoch integers);
    * StreamStreamJoinSpec pins row equality on a replay (with a
    * far-future flush batch to drive the watermark past the tail) and
    * that the final state holds the interval's rows, not the stream's.
    *
    * Row-identity with the batch twin needs one subtlety: the batch
    * null arm is an anti-join on purchase_id (a purchase with ≥1 match
    * never gets a null row), which is exactly the outer join's
    * semantics — NOT a union of inner matches and all-purchases. */
  def attribJoin(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"),
        date_trunc("second", col("ts")).as("purchase_ts"),
        col("value").as("revenue"))
      .withWatermark("purchase_ts", "4 hours")
    val views = events.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
        date_trunc("second", col("ts")).as("view_ts"))
      .withWatermark("view_ts", "4 hours")
    purchases.join(views, expr(
        """p_user = v_user
          | AND view_ts > purchase_ts - interval 2 hours
          | AND view_ts <= purchase_ts""".stripMargin), "leftOuter")
      .select(col("purchase_id"), col("p_user").as("user_id"),
        unix_timestamp(col("purchase_ts")).as("purchase_sec"),
        col("revenue"), col("view_id"),
        unix_timestamp(col("view_ts")).as("view_sec"),
        (unix_timestamp(col("purchase_ts")) -
          unix_timestamp(col("view_ts"))).as("delay_sec"))
  }

  /** FULL-OUTER watermarked stream-stream interval join — [[attribJoin]]
    * with the OTHER eviction arm completed: unmatched purchases emit
    * null-view rows (the left-outer arm) AND unmatched views emit
    * null-purchase rows, each authorized only when the WATERMARK closes
    * the row's join window on its own side — so correctness rests on
    * BOTH directions of symmetric-hash-join state eviction (a view can
    * only be declared unmatched once no purchase within its 2-hour
    * forward window can still arrive; a purchase once no view within
    * its lookback can). The batch twin is `q_events_attrib_full`
    * (inner pairs ∪ anti-join null arms — exactly the outer join's
    * semantics on both sides); StreamStreamFullOuterSpec pins replay
    * row-equality with both null arms populated, state eviction, and
    * restart durability across a checkpoint. Output user_id coalesces
    * across sides so every row names its user. */
  def attribJoinFull(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"),
        date_trunc("second", col("ts")).as("purchase_ts"),
        col("value").as("revenue"))
      .withWatermark("purchase_ts", "4 hours")
    val views = events.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
        date_trunc("second", col("ts")).as("view_ts"))
      .withWatermark("view_ts", "4 hours")
    purchases.join(views, expr(
        """p_user = v_user
          | AND view_ts > purchase_ts - interval 2 hours
          | AND view_ts <= purchase_ts""".stripMargin), "fullOuter")
      .select(col("purchase_id"),
        coalesce(col("p_user"), col("v_user")).as("user_id"),
        unix_timestamp(col("purchase_ts")).as("purchase_sec"),
        col("revenue"), col("view_id"),
        unix_timestamp(col("view_ts")).as("view_sec"),
        (unix_timestamp(col("purchase_ts")) -
          unix_timestamp(col("view_ts"))).as("delay_sec"))
  }

  /** RIGHT-outer face completing the outer-join family — the view-side
    * arm alone: every view emits (with its matched purchases, or one
    * null-purchase row once the watermark closes its forward window);
    * unmatched purchases emit nothing. Same machinery as
    * [[attribJoinFull]] with only the view-side eviction arm carrying
    * null output; batch twin `q_events_attrib_right`. */
  def attribJoinRight(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"),
        date_trunc("second", col("ts")).as("purchase_ts"),
        col("value").as("revenue"))
      .withWatermark("purchase_ts", "4 hours")
    val views = events.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
        date_trunc("second", col("ts")).as("view_ts"))
      .withWatermark("view_ts", "4 hours")
    purchases.join(views, expr(
        """p_user = v_user
          | AND view_ts > purchase_ts - interval 2 hours
          | AND view_ts <= purchase_ts""".stripMargin), "rightOuter")
      .select(col("purchase_id"),
        coalesce(col("p_user"), col("v_user")).as("user_id"),
        unix_timestamp(col("purchase_ts")).as("purchase_sec"),
        col("revenue"), col("view_id"),
        unix_timestamp(col("view_ts")).as("view_sec"),
        (unix_timestamp(col("purchase_ts")) -
          unix_timestamp(col("view_ts"))).as("delay_sec"))
  }

  /** Sink: drive a streaming DataFrame into an in-memory table and block
    * until the source is drained (local smoke / tests). Windowed aggregates
    * need Complete mode to surface windows still behind the watermark. */
  def runToMemory(df: DataFrame, name: String,
                  mode: OutputMode = OutputMode.Append): StreamingQuery =
    df.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Production-shaped sink: partitioned parquet with checkpointing. */
  def runToParquet(df: DataFrame, outDir: String,
                   checkpointDir: String): DataStreamWriter[Row] =
    df.writeStream
      .outputMode(OutputMode.Append)
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
}
