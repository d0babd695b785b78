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
  * the batch q125 relation (StreamingSpec pins it).
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
}
