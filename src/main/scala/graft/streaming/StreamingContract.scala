package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The event-stream contract audit as a PER-TRIGGER ingest leg — the
  * q216 one-row range/shape gate (NULL users, negative values,
  * out-of-window timestamps, unknown event types, clicks missing the
  * item key) factored so the SAME aggregate serves both callers:
  *
  *  - batch: [[graft.queries.RankQueries]]'s q216 registry entry runs it
  *    over the whole events table (oracle-checked against DuckDB);
  *  - streaming: [[StreamingFrontDoor]] runs it per micro-batch and
  *    cross-checks that the SUMMED per-batch counters equal the
  *    whole-corpus row bit-for-bit.
  *
  * Every column is a count over rows, so the relation is batch-additive
  * EXACTLY (the [[StreamingHealth]] contract): no counter depends on
  * cross-batch state, which is what makes an at-least-once replay
  * auditable — re-emitting a batch's row is visible as a sum mismatch,
  * never silently absorbed.
  *
  * The item probe is the SAME regexp both engines use for extraction
  * (equality against '', not a cast — DuckDB raises on
  * CAST('' AS BIGINT), Spark nulls), so the counters agree bit-for-bit.
  * One map-side-combined aggregate over the scan; nothing shuffles but
  * eight counters.
  */
object StreamingContract {

  /** Event types the contract admits; anything else counts as unknown. */
  val KnownTypes: Seq[String] = Seq("view", "click", "purchase", "signup",
    "error")

  /** One contract row over `events` (any batch: a micro-batch or the
    * whole table). Output: (n_events, n_null_user, n_negative_value,
    * n_ts_out_of_range, n_unknown_type, n_click_missing_item).
    */
  def contractBatch(events: DataFrame): DataFrame =
    events.agg(count(lit(1)).as("n_events"),
      sum(when(col("user_id").isNull, 1L).otherwise(0L))
        .as("n_null_user"),
      sum(when(col("value") < 0.0, 1L).otherwise(0L))
        .as("n_negative_value"),
      sum(when(col("ts") < lit("2024-01-01").cast("timestamp") ||
          col("ts") >= lit("2025-01-01").cast("timestamp"), 1L)
        .otherwise(0L)).as("n_ts_out_of_range"),
      sum(when(!col("event_type").isin(KnownTypes: _*), 1L).otherwise(0L))
        .as("n_unknown_type"),
      sum(when(col("event_type") === "click" &&
          (col("props").isNull ||
            regexp_extract(col("props"), "\"k\": (-?\\d+)", 1) === ""),
          1L).otherwise(0L)).as("n_click_missing_item"))
}
