package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact dedup — the ingest-time counterpart of the batch
  * [[graft.llm.Dedup.exactCanonicalByHash]]: documents are keyed by the
  * xxhash64 of their content and only the first arrival survives.
  *
  * Scale posture: `dropDuplicatesWithinWatermark` bounds the dedup state —
  * keys older than the watermark horizon are evicted, so state size tracks
  * the ingest rate × horizon, not corpus history (the plain
  * `dropDuplicates` form keeps every key forever — the 100 TB ingest
  * anti-pattern). State is 8 bytes of hash per doc, like the batch
  * hash-first shuffle; 64-bit collisions pass one extra doc through, which
  * the downstream batch canonicalization pass (q28) removes — dedup here is
  * a volume reducer, not the final arbiter.
  */
object StreamingDedup {

  /** First-arrival-wins content dedup over a streaming frame with event
    * time in `tsCol`; duplicates arriving within `horizon` of each other
    * are dropped. */
  def dedupByContent(docs: DataFrame, tsCol: String = "ts",
                     textCol: String = "text",
                     horizon: String = "10 minutes"): DataFrame =
    docs.withColumn("__h", xxhash64(col(textCol)))
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("__h")
      .drop("__h")
}
