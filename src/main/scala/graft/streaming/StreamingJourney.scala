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
}
