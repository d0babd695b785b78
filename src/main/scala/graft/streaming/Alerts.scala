package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.SensorReading

/** Stateful per-key stream operators (SURVEY §2.10 T6-T10) — the
  * reference's `ProcessFunction`/`KeyedProcessFunction` demos as
  * `flatMapGroupsWithState`.
  */
object Alerts {

  case class TempAlert(id: String, prev: Double, curr: Double)
  case class KeyCount(id: String, count: Long)
  case class RisingAlert(id: String, sinceTs: Long, atTs: Long)

  /** T6: "previous value per key" — alert when the temperature jumps by
    * more than `threshold` between consecutive readings
    * (`flink-base/.../process/TempChangeAlert.scala:12-19`, ValueState).
    */
  def tempChangeAlerts(readings: Dataset[SensorReading], threshold: Double)
                      (implicit s: SparkSession): Dataset[TempAlert] = {
    import s.implicits._
    readings.groupByKey(_.id)
      .flatMapGroupsWithState[Double, TempAlert](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (id: String, rows: Iterator[SensorReading], state: GroupState[Double]) =>
          var last = state.getOption
          val out = scala.collection.mutable.ArrayBuffer[TempAlert]()
          // within a micro-batch, order by event time (the reference sees
          // records one-at-a-time in arrival order; batch order is ts)
          rows.toSeq.sortBy(_.timestamp).foreach { r =>
            last.foreach { p =>
              if (math.abs(r.temperature - p) > threshold)
                out += TempAlert(id, p, r.temperature)
            }
            last = Some(r.temperature)
          }
          last.foreach(state.update)
          out.iterator
      }
  }

  /** T8: count-with-timeout — per-key running count emitted when the key
    * goes quiet (`flink-process/.../myprocess/CountWithTimeoutFunction.java:
    * 14-67`: processing-time timer at the next 30 s boundary). The timer
    * becomes `ProcessingTimeTimeout` + `setTimeoutDuration`.
    */
  /** The state-transition function, exposed for deterministic testing with
    * `TestGroupState` (real timers need wall-clock batches). */
  def countWithTimeoutFn(timeoutMs: Long)(
      key: String, rows: Iterator[String], state: GroupState[Long])
  : Iterator[KeyCount] =
    if (state.hasTimedOut) {
      val c = state.getOption.getOrElse(0L)
      state.remove()
      Iterator.single(KeyCount(key, c))
    } else {
      val c = state.getOption.getOrElse(0L) + rows.size
      state.update(c)
      state.setTimeoutDuration(timeoutMs)
      Iterator.empty
    }

  def countWithTimeout(lines: Dataset[String], timeoutMs: Long = 30000)
                      (implicit s: SparkSession): Dataset[KeyCount] = {
    import s.implicits._
    lines.groupByKey(identity)
      .flatMapGroupsWithState[Long, KeyCount](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout)(
        countWithTimeoutFn(timeoutMs))
  }

  /** T9: event-time "keeps rising for `riseMs`" alert
    * (`flink-base/.../process/MyProcess.scala:24-38`): state tracks the
    * last temperature and when the monotone rise started; the reference's
    * event-time timer becomes an emit-on-arrival check (an alert fires with
    * the first event at ≥ riseMs of rise — same alerts, delivered on the
    * next event rather than by timer; documented processing delta).
    */
  def risingTempAlerts(readings: Dataset[SensorReading], riseMs: Long)
                      (implicit s: SparkSession): Dataset[RisingAlert] = {
    import s.implicits._
    // state: (lastTemp, riseStartTs, alreadyFired)
    readings.groupByKey(_.id)
      .flatMapGroupsWithState[(Double, Long, Boolean), RisingAlert](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (id: String, rows: Iterator[SensorReading],
         state: GroupState[(Double, Long, Boolean)]) =>
          var st = state.getOption.getOrElse((Double.MinValue, -1L, false))
          val out = scala.collection.mutable.ArrayBuffer[RisingAlert]()
          rows.toSeq.sortBy(_.timestamp).foreach { r =>
            val (lastTemp, since, fired) = st
            if (since < 0 || r.temperature <= lastTemp) {
              st = (r.temperature, r.timestamp, false)
            } else {
              if (!fired && r.timestamp - since >= riseMs) {
                out += RisingAlert(id, since, r.timestamp)
                st = (r.temperature, since, true)
              } else st = (r.temperature, since, fired)
            }
          }
          state.update(st)
          out.iterator
      }
  }

  case class CusumPoint(key: String, ts: Long, value: Long, cusum: Long,
                        alarm: Boolean)

  /** Streaming one-sided CUSUM per key — the q173 change-point statistic
    * maintained at ingest with O(1) state per key: the prefix identity
    * `S_t = P_t − min(0, min_{j≤t} P_j)` needs only the running
    * deviation prefix `P` and its running minimum, so the state is two
    * longs however long the stream. Emits every point with its CUSUM
    * value and the alarm flag (`cusum > alarmAt`). Exact integer
    * arithmetic throughout — the streamed values equal the batch
    * [[graft.ops.Relational.cusum]] / the textbook recurrence on the
    * same points (StreamingSpec T15 pins it on a shuffled replay).
    *
    * Ordering contract: rows sort by (ts, value) WITHIN a micro-batch
    * (the tempChangeAlerts device); cross-batch disorder is out of
    * scope for this monitor — feed it through a watermark-buffered
    * stage first if the source reorders across batches.
    */
  def cusumMonitorFn(target: Long, alarmAt: Long)(
      key: String, rows: Iterator[(String, Long, Long)],
      state: GroupState[(Long, Long)]): Iterator[CusumPoint] = {
    var (p, minP) = state.getOption.getOrElse((0L, 0L))
    val out = rows.toSeq.sortBy(r => (r._2, r._3)).map { case (_, ts, v) =>
      p += v - target
      if (p < minP) minP = p // minP = min(0, min_j P_j), init 0
      CusumPoint(key, ts, v, p - minP, p - minP > alarmAt)
    }
    state.update((p, minP))
    out.iterator
  }

  /** [[cusumMonitorFn]] wired as a stream: input columns
    * (key, ts, value). */
  def cusumMonitor(points: DataFrame, target: Long, alarmAt: Long)
                  (implicit s: SparkSession): Dataset[CusumPoint] = {
    import s.implicits._
    points.select(col("key").cast("string"), col("ts").cast("long"),
        col("value").cast("long"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), CusumPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        cusumMonitorFn(target, alarmAt))
  }

  /** The streaming word count tutorial entry (`flink-base/.../wc/
    * StreamWorldCount.scala:13-16`): lines → words → per-word running count
    * (update output mode = Flink's retracting keyed sum).
    */
  def streamingWordCount(lines: DataFrame): DataFrame =
    lines.select(explode(split(col("line"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").count()

  /** T10: side outputs (`FreezingAlert.scala:15-27`) — Spark has no side
    * outputs; the idiom is two filters over one stream (dual queries share
    * the source; document as such). Returns (alerts, mainstream).
    */
  def freezingAlertSplit(readings: DataFrame, freezeBelow: Double = 32.0)
  : (DataFrame, DataFrame) =
    (readings.filter(col("temperature") < freezeBelow),
      readings.filter(col("temperature") >= freezeBelow))

  /** U3/U4: split/select + connect/coMap (`SplitSelectStream.scala:14-33`):
    * demux via filters, re-connect via unionByName after normalizing
    * schemas. */
  def splitConnect(readings: DataFrame, threshold: Double): DataFrame = {
    val high = readings.filter(col("temperature") >= threshold)
      .select(col("id"), lit("high").as("level"), col("temperature"))
    val low = readings.filter(col("temperature") < threshold)
      .select(col("id"), lit("low").as("level"), col("temperature"))
    high.unionByName(low)
  }
}
