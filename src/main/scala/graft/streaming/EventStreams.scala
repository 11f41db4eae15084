package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-stream operators as Structured Streaming transforms. The batch
  * twins (checked against the DuckDB oracle) live in
  * [[graft.queries.Events]]; these run the same logic with watermarks
  * over unbounded input. The reference has no event-time concept
  * (arrival-time only, SURVEY §2.4) — this is part of the
  * beyond-reference surface.
  */
object EventStreams {

  /** Tumbling 1-hour counts per event type, 2-hour watermark: late rows
    * beyond the watermark are dropped and state for closed windows is
    * reclaimed — the property that keeps state bounded at 100 TB/day.
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("hour"), col("event_type"), col("n"))

  /** Session aggregates via the built-in session_window (30-min gap) —
    * the streaming form of the batch lag/cumsum sessionization.
    */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("user_id"), col("n_events"))

  case class UserEvent(user_id: Long, ts: Timestamp, event_type: String, value: Double)
  case class UserRunning(user_id: Long, n_events: Long, total_value: Double)

  /** Custom keyed state (KeyValueGroupedDataset.mapGroupsWithState):
    * running per-user counters — the pattern for state Spark's built-in
    * aggregations can't express. State is per-key and partitioned by the
    * grouping key, so it scales horizontally with executors.
    *
    * `ttl`: pass a processing-time duration ("1 hour") to evict idle
    * keys — required for unbounded key spaces at 100 TB. Note the cost:
    * with processing-time timeouts Spark schedules timeout-check
    * micro-batches continuously even with no input (that is why the
    * default here is no TTL — tests and bounded key spaces don't want a
    * busy-looping query).
    */
  case class OpenSession(startUs: Long, endUs: Long, n: Long)
  case class PendingSessions(sessions: Seq[OpenSession])
  case class SessionOut(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long)

  /** Timestamp ↔ microseconds, Spark's native timestamp precision.
    * Sessionizing on the full µs value (not `Timestamp.getTime`'s
    * ms floor) keeps the operator bit-identical to the batch twin's
    * µs arithmetic for ANY input — a gap straddling the session
    * boundary within one millisecond splits on both sides or neither.
    */
  private def tsToUs(ts: Timestamp): Long =
    Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  private def usToTs(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Completed 30-min-gap sessions via `flatMapGroupsWithState` — the
    * 0..n-outputs-per-group form of custom keyed state. State holds ALL
    * of a user's not-yet-final sessions, and a session is emitted only
    * once the watermark passes its end + gap — the point where no
    * admissible event (ts ≥ watermark) can extend it on either side
    * (an extender would need ts ≤ end + gap < watermark). Emission
    * therefore EXACTLY matches the batch twin `events_sessionize`
    * (oracle-checked) over all data the watermark admits; sub-watermark
    * stragglers are dropped by Spark itself, the same rows every
    * watermarked operator drops. Pending sessions per user are bounded
    * by lateness/gap (≤ watermark-delay/gap + 1 ≈ 5 here), so state
    * stays small and is reclaimed by the EVENT-TIME timeout as the
    * watermark advances — the bounded-state contract at 100 TB/day.
    */
  def completedSessions(events: Dataset[UserEvent],
      gapMinutes: Int = 30): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60000000L

    // Uniform interval merge over (state ∪ batch), sorted by start:
    // any interval within the gap of the current one merges — the
    // batch twin's lag/cumsum rule, symmetric over sorted times, so
    // late events merge backwards into existing sessions and with each
    // other.
    def merge(intervals: Seq[OpenSession]): List[OpenSession] =
      intervals.sortBy(s => (s.startUs, s.endUs))
        .foldLeft(List.empty[OpenSession]) {
          case (cur :: done, s) if s.startUs <= cur.endUs + gapUs =>
            OpenSession(cur.startUs, math.max(cur.endUs, s.endUs), cur.n + s.n) :: done
          case (acc, s) => s :: acc
        }.reverse

    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[UserEvent], state: GroupState[PendingSessions]) =>
          val prior = state.getOption.map(_.sessions).getOrElse(Seq.empty)
          val merged = merge(prior ++
            rows.map(e => OpenSession(tsToUs(e.ts), tsToUs(e.ts), 1)))
          // The watermark itself is ms-floored (Spark keeps event-time
          // stats at ms precision); comparing in µs against wm*1000 is
          // exact — end+gap < wm·1000 ⟺ floor((end+gap)/1000) < wm.
          val wm = state.getCurrentWatermarkMs()
          val (done, open) = merged.partition(_.endUs + gapUs < wm * 1000L)
          if (open.isEmpty) state.remove()
          else {
            state.update(PendingSessions(open))
            // Re-arm at the earliest pending finalization point (the
            // first ms watermark that finalizes it); the timestamp must
            // be > the current watermark, so a pending session already
            // due fires on the next watermark advance.
            state.setTimeoutTimestamp(
              math.max(open.map(s => (s.endUs + gapUs) / 1000L + 1).min, wm + 1))
          }
          done.map(s =>
            SessionOut(uid, usToTs(s.startUs), usToTs(s.endUs), s.n))
            .iterator
      }
  }

  case class FunnelEvent(user_id: Long, event_id: Long, ts: Timestamp,
      event_type: String)
  case class BufEvent(us: Long, eventId: Long, typ: String)
  case class FunnelBuffer(events: Seq[BufEvent])
  case class ViewOutcome(user_id: Long, view_event_id: Long, stage: Long)

  /** STREAMING WINDOWED FUNNEL — per-VIEW conversion outcomes under a
    * conversion deadline `windowUs` (view → click ≤ W → purchase ≤ W of
    * that click), the streaming twin of the batch
    * `events_funnel_windowed` semantics at view grain. Per-user final
    * stages never finalize on an unbounded stream (a new view can
    * always arrive), but a single VIEW's outcome is immutable once the
    * watermark passes `view + 2W`: every event that could still change
    * it (a click in (v, v+W], a purchase within W of such a click)
    * lies at or below v + 2W, and anything admitted later has
    * ts ≥ watermark > v + 2W. So the operator buffers each user's
    * events, finalizes views as the watermark crosses their horizon,
    * and EVICTS events older than `watermark − 2W` — influencing
    * events always FOLLOW their view in (us, event_id) stream order,
    * so nothing a pending view needs is ever dropped. State per user
    * is bounded by 2W of events whatever the stream length — the
    * bounded-state contract — and is reclaimed via the event-time
    * timeout, re-armed at the earliest pending horizon.
    *
    * Outcome rule (identical to the batch twin's stacked running-min
    * windows, restricted per view): stage 3 if some click in
    * (v, v+W] (stream order) has a following purchase within W;
    * else stage 2 if some click in (v, v+W]; else stage 1.
    */
  def viewConversions(events: Dataset[FunnelEvent],
      windowUs: Long): Dataset[ViewOutcome] = {
    import events.sparkSession.implicits._
    val horizonUs = 2L * windowUs

    def follows(a: BufEvent, b: BufEvent): Boolean =
      a.us > b.us || (a.us == b.us && a.eventId > b.eventId)

    def stageOf(v: BufEvent, sorted: Seq[BufEvent]): Long = {
      val clicksInWindow = sorted.filter(e =>
        e.typ == "click" && follows(e, v) && e.us - v.us <= windowUs)
      if (clicksInWindow.exists(c => sorted.exists(p =>
          p.typ == "purchase" && follows(p, c) && p.us - c.us <= windowUs))) 3L
      else if (clicksInWindow.nonEmpty) 2L
      else 1L
    }

    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[FunnelEvent], state: GroupState[FunnelBuffer]) =>
          val prior = state.getOption.map(_.events).getOrElse(Seq.empty)
          val all = (prior ++ rows.map(e =>
              BufEvent(tsToUs(e.ts), e.event_id, e.event_type)))
            .sortBy(e => (e.us, e.eventId))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (doneViews, pendingViews) = all.filter(_.typ == "view")
            .partition(_.us + horizonUs < wmUs)
          val out = doneViews.map(v =>
            ViewOutcome(uid, v.eventId, stageOf(v, all)))
          // Evict anything past the horizon; keep the rest (a kept
          // event can still decide a pending or future view's
          // outcome). The horizon test alone also evicts finalized
          // views — a view finalizes exactly when it crosses it.
          val kept = all.filter(_.us + horizonUs >= wmUs)
          if (kept.isEmpty) state.remove()
          else {
            state.update(FunnelBuffer(kept))
            val nextDue = pendingViews.map(v => (v.us + horizonUs) / 1000L + 1)
              .minOption.getOrElse(wmUs / 1000L + 60000L)
            state.setTimeoutTimestamp(math.max(nextDue, wmUs / 1000L + 1))
          }
          out.iterator
      }
  }

  case class AttrEvent(user_id: Long, event_id: Long, ts: Timestamp,
      event_type: String, value: Double)
  case class AttrBuf(us: Long, eventId: Long, typ: String, cents: Long)
  case class AttrBuffer(events: Seq[AttrBuf])
  case class AttrOut(user_id: Long, purchase_event_id: Long, channel: String,
      cents: Long)

  /** STREAMING LAST-TOUCH ATTRIBUTION — the streaming twin of
    * `events_attribution`: each purchase's floor-cents value is
    * attributed to the most recent click within `windowUs` (stream
    * order), else the most recent view, else 'direct'. A purchase
    * finalizes as soon as the watermark passes its OWN timestamp —
    * every event that could still become its touch PRECEDES it in
    * stream order, and anything admitted later has ts ≥ watermark >
    * purchase ts. State per user is one `windowUs` horizon of touch
    * events plus the not-yet-final purchases — far smaller than the
    * funnel's 2W buffer, the cheapest member of the custom-state
    * family.
    */
  def attributedPurchases(events: Dataset[AttrEvent],
      windowUs: Long): Dataset[AttrOut] = {
    import events.sparkSession.implicits._

    def precedes(a: AttrBuf, b: AttrBuf): Boolean =
      a.us < b.us || (a.us == b.us && a.eventId < b.eventId)

    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[AttrEvent], state: GroupState[AttrBuffer]) =>
          val prior = state.getOption.map(_.events).getOrElse(Seq.empty)
          val all = (prior ++ rows.map(e => AttrBuf(tsToUs(e.ts), e.event_id,
              e.event_type, math.floor(e.value * 100).toLong)))
            .sortBy(e => (e.us, e.eventId))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (duePurch, pendPurch) = all.filter(_.typ == "purchase")
            .partition(_.us < wmUs)
          val out = duePurch.map { p =>
            def lastWithin(typ: String): Option[AttrBuf] =
              all.filter(e => e.typ == typ && precedes(e, p) &&
                p.us - e.us <= windowUs).lastOption
            val channel =
              if (lastWithin("click").isDefined) "click"
              else if (lastWithin("view").isDefined) "view"
              else "direct"
            AttrOut(uid, p.eventId, channel, p.cents)
          }
          // Touch events older than any unfinalized purchase's lookback
          // are dead; finalized purchases leave the buffer.
          val kept = all.filter(e =>
            if (e.typ == "purchase") e.us >= wmUs
            else e.us + windowUs >= wmUs)
          if (kept.isEmpty) state.remove()
          else {
            state.update(AttrBuffer(kept))
            val nextDue = pendPurch.map(_.us / 1000L + 1)
              .minOption.getOrElse(wmUs / 1000L + 60000L)
            state.setTimeoutTimestamp(math.max(nextDue, wmUs / 1000L + 1))
          }
          out.iterator
      }
  }

  /** Stream-stream interval join: each purchase paired with the same
    * user's views from the preceding `lookback`. Input needs columns
    * (user_id, event_id, event_type, ts). The watermarks on BOTH sides
    * plus the time-range join condition are what let Spark drop
    * buffered view state once the watermark passes `p_ts - lookback` —
    * the bounded-state contract for joining two unbounded streams.
    * This is the streaming counterpart of the batch as-of join's
    * candidate stage (`events_asof_view_before_purchase`): the batch
    * twin then keeps only the latest view per purchase; streaming
    * "latest" composes this join with a downstream keyed aggregation,
    * so the operator exposes the interval-join surface directly.
    */
  def viewsBeforePurchases(events: DataFrame,
      lookback: String = "1 hour"): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        col("ts").as("v_ts"))
      .withWatermark("v_ts", "2 hours")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "2 hours")
    purchases.join(views,
      col("v_user") === col("p_user") &&
        col("v_ts") < col("p_ts") &&
        col("v_ts") >= col("p_ts") - expr(s"INTERVAL $lookback"))
      .select(col("purchase_id"), col("p_user").as("user_id"), col("p_ts"),
        col("view_id"), col("v_ts"))
  }

  def runningUserTotals(events: Dataset[UserEvent],
      ttl: Option[String] = None): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(timeoutConf) {
        (userId: Long, rows: Iterator[UserEvent], state: GroupState[UserRunning]) =>
          if (state.hasTimedOut) {
            val cur = state.get
            state.remove()
            cur
          } else {
            val prev = state.getOption.getOrElse(UserRunning(userId, 0L, 0.0))
            var n = prev.n_events
            var total = prev.total_value
            rows.foreach { e => n += 1; total += e.value }
            val next = UserRunning(userId, n, total)
            state.update(next)
            ttl.foreach(state.setTimeoutDuration)
            next
          }
      }
  }
}
