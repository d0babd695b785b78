package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming user-journey monitor — the q125 transition matrix maintained
  * at ingest time with REAL cross-batch state: the last event per user
  * lives in `flatMapGroupsWithState` (the T6 ValueState pattern), so a
  * transition that straddles a micro-batch boundary — user's last event
  * of batch N followed by their first of batch N+1 — is emitted exactly
  * once, which no stateless per-batch lag can do (it would silently drop
  * every boundary-straddling pair and undercount forever).
  *
  * Within a batch a user's events are folded in (ts, event_id) order (the
  * unique composite, same as the batch relation); ACROSS batches the
  * monitor assumes replay/ingest order respects per-user event time — the
  * file-replay and Kafka-partition-per-key shapes guarantee it. Under
  * that contract the union of per-batch emissions aggregates EXACTLY to
  * the batch q125 relation (StreamingSpec pins it). When arrival order
  * can NOT be trusted (Kafka repartitioning, late data), use the
  * watermark-buffered [[transitionsBuffered]]/[[funnelBuffered]] variants
  * below — same emissions, no order contract, late data dropped at the
  * watermark.
  *
  * Output per emission: (from_type, to_type) — one row per observed
  * transition; the consumer aggregates (a streaming groupBy/count or the
  * metric-store upsert, both already in the repo).
  */
object StreamingJourney {

  case class LastEvent(eventType: String, tsMicros: Long, eventId: Long)
  case class Transition(from_type: String, to_type: String)

  /** The state-transition function, exposed for deterministic testing. */
  def journeyFn(userId: Long,
                rows: Iterator[(Long, String, Long, Long)],
                state: GroupState[LastEvent]): Iterator[Transition] = {
    var last = state.getOption
    val out = scala.collection.mutable.ArrayBuffer[Transition]()
    rows.toSeq.sortBy(r => (r._3, r._4)).foreach {
      case (_, tpe, ts, id) =>
        last.foreach(p => out += Transition(p.eventType, tpe))
        last = Some(LastEvent(tpe, ts, id))
    }
    last.foreach(state.update)
    out.iterator
  }

  /** Wire the monitor onto any (user_id, event_type, ts, event_id)
    * stream. */
  def transitions(events: DataFrame)
                 (implicit s: SparkSession): Dataset[Transition] = {
    import s.implicits._
    events.select(col("user_id").cast("long"), col("event_type"),
        unix_micros(col("ts")), col("event_id").cast("long"))
      .as[(Long, String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[LastEvent, Transition](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(journeyFn)
  }

  // ---- streaming funnel -------------------------------------------------

  case class FunnelState(stage: Int, tMicros: Long)
  case class Advance(user_id: Long, stage_idx: Long)

  /** Streaming form of the q124 ordered funnel: per-user state is
    * (reached stage, its event time); an arriving event advances the user
    * iff it is the NEXT step's type with a strictly later timestamp.
    * Processing a user's events in ascending (ts, event_id) order makes
    * the greedy advance provably equal to the batch min-ts chain: at
    * stage k−1 with time t, the first qualifying step-k event the scan
    * meets IS min{ts > t} — exactly q124's `MIN(ts) WHERE ts > t` — so
    * under the replay contract (per-user event-time order across
    * batches) the emitted advances aggregate to the batch funnel
    * bit-for-bit (StreamingSpec pins it).
    *
    * Emits one (user_id, stage_idx) row per advance, 1-based; the stage-k
    * population is COUNT(user) WHERE stage_idx = k over all emissions.
    */
  def funnelFn(steps: IndexedSeq[String])(
      userId: Long, rows: Iterator[(Long, String, Long, Long)],
      state: GroupState[FunnelState]): Iterator[Advance] = {
    var st = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
    val out = scala.collection.mutable.ArrayBuffer[Advance]()
    rows.toSeq.sortBy(r => (r._3, r._4)).foreach { case (_, tpe, ts, _) =>
      if (st.stage < steps.length && tpe == steps(st.stage) &&
          (st.stage == 0 || ts > st.tMicros)) {
        st = FunnelState(st.stage + 1, ts)
        out += Advance(userId, st.stage.toLong)
      }
    }
    state.update(st)
    out.iterator
  }

  /** Wire the funnel onto any (user_id, event_type, ts, event_id)
    * stream. */
  def funnel(events: DataFrame,
             steps: Seq[String] = Seq("signup", "view", "click", "purchase"))
            (implicit s: SparkSession): Dataset[Advance] = {
    import s.implicits._
    events.select(col("user_id").cast("long"), col("event_type"),
        unix_micros(col("ts")), col("event_id").cast("long"))
      .as[(Long, String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, Advance](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        funnelFn(steps.toIndexedSeq))
  }

  // ---- order-robust (watermark-buffered) variants -----------------------
  //
  // The plain monitors above are exact only under the replay contract:
  // arrival order respects per-user EVENT time across batches. Real Kafka
  // repartitioning or late data breaks that silently — wrong transitions,
  // not missing rows. These variants drop the contract: arrivals are held
  // in per-user state and folded ONLY once the event-time watermark passes
  // them (the T9 event-time-timer machinery), so any arrival order whose
  // disorder stays inside the watermark delay converges to the exact batch
  // relation. Arrivals older than the watermark at the previous flush are
  // LATE — already overtaken by emissions — and are dropped, the same
  // policy as the T4 windowed aggregates. Per-user state is bounded by the
  // delay window (buffered events ≤ one delay's worth), not the history.

  case class JourneyBuf(buf: Seq[(String, Long, Long)],
                        last: Option[LastEvent], frontier: Long)

  /** Buffered transition fold: flush the ≤-watermark prefix of the buffer
    * in (ts, event_id) order through the [[journeyFn]] chain; keep the
    * rest; re-arm an event-time timer at the earliest pending event so the
    * flush happens even if the user never sends another row. */
  def journeyBufFn(userId: Long, rows: Iterator[(Long, String, Long, Long)],
                   state: GroupState[JourneyBuf]): Iterator[Transition] = {
    val st = state.getOption.getOrElse(JourneyBuf(Nil, None, Long.MinValue))
    val wm = state.getCurrentWatermarkMs() * 1000L
    val fresh = rows.map(r => (r._2, r._3, r._4))
      .filter(_._2 > st.frontier).toList // ≤ frontier: late, already passed
    val (flush, keep) = (st.buf ++ fresh).partition(_._2 <= wm)
    var last = st.last
    val out = scala.collection.mutable.ArrayBuffer[Transition]()
    flush.sortBy(e => (e._2, e._3)).foreach { case (tpe, ts, id) =>
      last.foreach(p => out += Transition(p.eventType, tpe))
      last = Some(LastEvent(tpe, ts, id))
    }
    state.update(JourneyBuf(keep, last, wm))
    if (keep.nonEmpty)
      state.setTimeoutTimestamp(keep.map(_._2).min / 1000L + 1)
    out.iterator
  }

  /** Order-robust [[transitions]]: `delay` is the watermark the stream is
    * allowed to be disordered within (e.g. "1 hour"). The watermarked
    * timestamp column rides along to the stateful operator (the
    * event-time-timeout checker requires it in scope). */
  def transitionsBuffered(events: DataFrame, delay: String)
                         (implicit s: SparkSession): Dataset[Transition] = {
    import s.implicits._
    events.withWatermark("ts", delay)
      .select(col("user_id").cast("long"), col("event_type"),
        unix_micros(col("ts")), col("event_id").cast("long"), col("ts"))
      .as[(Long, String, Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[JourneyBuf, Transition](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (k, rows, st) =>
          journeyBufFn(k, rows.map(r => (r._1, r._2, r._3, r._4)), st))
  }

  case class FunnelBuf(buf: Seq[(String, Long, Long)], stage: Int,
                       tMicros: Long, frontier: Long)

  /** Buffered funnel fold — same flush discipline over the greedy advance
    * chain (which equals the batch min-ts chain once events fold in event
    * time, the [[funnelFn]] proof). */
  def funnelBufFn(steps: IndexedSeq[String])(
      userId: Long, rows: Iterator[(Long, String, Long, Long)],
      state: GroupState[FunnelBuf]): Iterator[Advance] = {
    val st = state.getOption.getOrElse(
      FunnelBuf(Nil, 0, Long.MinValue, Long.MinValue))
    val wm = state.getCurrentWatermarkMs() * 1000L
    val fresh = rows.map(r => (r._2, r._3, r._4))
      .filter(_._2 > st.frontier).toList
    val (flush, keep) = (st.buf ++ fresh).partition(_._2 <= wm)
    var stage = st.stage
    var t = st.tMicros
    val out = scala.collection.mutable.ArrayBuffer[Advance]()
    flush.sortBy(e => (e._2, e._3)).foreach { case (tpe, ts, _) =>
      if (stage < steps.length && tpe == steps(stage) &&
          (stage == 0 || ts > t)) {
        stage += 1; t = ts
        out += Advance(userId, stage.toLong)
      }
    }
    state.update(FunnelBuf(keep, stage, t, wm))
    if (keep.nonEmpty)
      state.setTimeoutTimestamp(keep.map(_._2).min / 1000L + 1)
    out.iterator
  }

  case class SessionBuf(buf: Seq[(Long, Long)], startMs: Long,
                        lastMs: Long, n: Long, frontier: Long)
  case class ClosedSession(user_id: Long, session_start_ms: Long,
                           n_events: Long, duration_ms: Long)

  /** Streaming gap sessionization — the q137 relation maintained at
    * ingest: per user the open session rides state, a ≥`gapMs`
    * event-time gap closes it (emitted exactly once), and the
    * watermark-buffered flush makes the boundaries exact under
    * disorder — a session can only close once the watermark proves no
    * earlier event can still arrive inside it. Emits CLOSED sessions;
    * the open tail per user stays in state by definition (it could
    * still grow), so on a replayed prefix the emissions equal the batch
    * q137 relation minus each user's final session (StreamingSpec pins
    * exactly that equality).
    */
  def sessionsBufFn(gapMs: Long)(
      userId: Long, rows: Iterator[(Long, Long, Long)],
      state: GroupState[SessionBuf]): Iterator[ClosedSession] = {
    // everything in event-time MILLIS — the q137 batch twin's unit
    val st = state.getOption.getOrElse(
      SessionBuf(Nil, -1L, -1L, 0L, Long.MinValue))
    val wm = state.getCurrentWatermarkMs()
    val fresh = rows.map(r => (r._2, r._3)).filter(_._1 > st.frontier).toList
    val (flush, keep) = (st.buf ++ fresh).partition(_._1 <= wm)
    var (start, last, n) = (st.startMs, st.lastMs, st.n)
    val out = scala.collection.mutable.ArrayBuffer[ClosedSession]()
    flush.sortBy(identity).foreach { case (ts, _) =>
      if (n == 0L) { start = ts; last = ts; n = 1L }
      else if (ts - last >= gapMs) {
        out += ClosedSession(userId, start, n, last - start)
        start = ts; last = ts; n = 1L
      } else { last = ts; n += 1L }
    }
    state.update(SessionBuf(keep, start, last, n, wm))
    if (keep.nonEmpty)
      state.setTimeoutTimestamp(keep.map(_._1).min + 1)
    out.iterator
  }

  /** Wire the streaming sessionizer; `delay` is the disorder watermark,
    * `gapMinutes` the session gap (q137's 30-minute default). */
  def sessions(events: DataFrame, delay: String, gapMinutes: Int = 30)
              (implicit s: SparkSession): Dataset[ClosedSession] = {
    import s.implicits._
    val fn = sessionsBufFn(gapMinutes * 60000L) _
    events.withWatermark("ts", delay)
      .select(col("user_id").cast("long"), unix_millis(col("ts")),
        col("event_id").cast("long"), col("ts"))
      .as[(Long, Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionBuf, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (k, rows, st) => fn(k, rows.map(r => (r._1, r._2, r._3)), st))
  }

  /** Order-robust [[funnel]]. */
  def funnelBuffered(events: DataFrame, delay: String,
                     steps: Seq[String] =
                       Seq("signup", "view", "click", "purchase"))
                    (implicit s: SparkSession): Dataset[Advance] = {
    import s.implicits._
    val fn = funnelBufFn(steps.toIndexedSeq) _
    events.withWatermark("ts", delay)
      .select(col("user_id").cast("long"), col("event_type"),
        unix_micros(col("ts")), col("event_id").cast("long"), col("ts"))
      .as[(Long, String, Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelBuf, Advance](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (k, rows, st) => fn(k, rows.map(r => (r._1, r._2, r._3, r._4)), st))
  }
}
