package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join — the ingest-time twin of the
  * batch interval join (q47, `graft.ops.RangeJoin.intervalJoin`): each
  * click pairs with the same user's views in the `lookbackMs` window
  * ending at the click. This is TRUE two-sided streaming join state
  * (both sides buffer), not a foreachBatch probe against a store like
  * the dedup/retrieval pipelines: Spark bounds each side's buffer from
  * the watermark plus the join's time-range predicate, so state tracks
  * ingest-rate × (watermark delay + lookback) — never stream history.
  *
  * Contract: `clicks` has (click_id, user_id, cts), `views` has
  * (view_id, user_id, vts), both with event-time columns; emission is
  * append-mode inner join, so every matched pair is emitted exactly
  * once and the result set equals the batch interval join on the same
  * rows whatever the arrival order (StreamingSpec pins it on a
  * shuffled replay).
  */
object StreamingAttribution {

  def intervalJoinStream(clicks: DataFrame, views: DataFrame,
                         lookbackMs: Long = 300000L,
                         watermarkDelay: String = "10 minutes")
  : DataFrame = {
    require(lookbackMs > 0 && lookbackMs % 1000 == 0,
      s"lookbackMs must be a positive whole-second count: $lookbackMs")
    val c = clicks.select(col("click_id"), col("user_id"), col("cts"))
      .withWatermark("cts", watermarkDelay)
    val v = views.select(col("view_id"), col("user_id").as("__vu"),
        col("vts"))
      .withWatermark("vts", watermarkDelay)
    c.join(v,
        col("user_id") === col("__vu") &&
          col("vts") <= col("cts") &&
          col("vts") >= col("cts") -
            expr(s"INTERVAL ${lookbackMs / 1000} SECONDS"))
      .select(col("click_id"), col("view_id"), col("user_id"),
        col("cts"), col("vts"))
  }
}
