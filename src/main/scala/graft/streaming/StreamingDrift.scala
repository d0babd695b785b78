package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.llm.TextAnalysis

/** Ingest-time mix-drift monitor — the streaming twin of the q99
  * per-source divergence audit, in the frozen-artifact pattern of
  * [[StreamingQuality]]: a batch REFERENCE corpus freezes the unigram LM
  * (token counts + total) once; every arriving micro-batch is then scored
  * per source against that frozen blend. The use case is the ops
  * dashboard question "which feed changed?": a crawler that silently
  * switched language, a source that started emitting boilerplate, or a
  * connector replaying one hot domain shows up as that source's
  * `kl_bits` jumping in the trigger where it happened — long before the
  * nightly batch audit re-runs.
  *
  * Semantics, stated precisely: `xent_corpus_bits` is the batch's tokens
  * scored by the FROZEN corpus model ([[TextAnalysis.lmSurprisalWithStats]]'s
  * whole-bit arithmetic, OOV at c = 1 → max bits), while
  * `ent_source_bits` is the same tokens scored by the source's
  * distribution WITHIN THIS BATCH — so `kl_bits` is per-trigger drift
  * against the reference blend, deliberately NOT a running aggregate: the
  * monitor answers "is this window's mix off?", and a window with no
  * drift scores the same whether it arrives first or last. No cross-batch
  * state; a single-batch stream therefore equals the batch twin on the
  * same rows, and when the reference IS the scored frame the result is
  * bit-identical to the inline q99 path except for OOV handling, which
  * cannot occur in that case (StreamingSpec pins both).
  *
  * Freshness trade, same as the quality gate: arrivals never shift the
  * frozen counts until the reference is re-frozen (re-freeze from the
  * appendable LM store — [[StreamingQuality.appendLmStore]] +
  * [[StreamingQuality.freezeFromStore]] — to fold ingested batches in).
  *
  * 100 TB posture: per batch, one (source, token, tf) map-side aggregate,
  * a left join against the vocabulary-sized frozen counts (a join side,
  * never driver state), broadcast per-source totals (|sources| rows) and
  * the 1-row frozen total. No window, no driver state, no full-history
  * read.
  */
object StreamingDrift {

  /** Score ONE frame (batch semantics) against a frozen reference LM —
    * the function both the stream's foreachBatch and the batch twin call.
    * Output: (source, n_tokens, sum_corpus_bits, sum_source_bits,
    * xent_corpus_bits, ent_source_bits, kl_bits) — the q99 schema.
    *
    * `counts`/`totals` are a [[StreamingQuality.FrozenLm]]'s frames (the
    * drift monitor ignores the quality cutoffs; sharing the artifact
    * means one store serves both the gate and the monitor). */
  def driftBatch(docs: DataFrame, counts: DataFrame, totals: DataFrame,
                 groupCol: String = "source",
                 textCol: String = "text"): DataFrame = {
    val tf = docs.select(col(groupCol),
        explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy(col(groupCol), col("token"))
      .agg(count(lit(1)).as("tf"))
    val nSrc = tf.groupBy(groupCol).agg(sum("tf").as("n_src"))
    val corpusBits = (length(bin(expr("n_total div c"))) - 1).cast("long")
    val sourceBits = (length(bin(expr("n_src div tf"))) - 1).cast("long")
    tf.join(counts, Seq("token"), "left")
      .withColumn("c", coalesce(col("c"), lit(1L)))
      .join(broadcast(nSrc), Seq(groupCol))
      .crossJoin(broadcast(totals))
      .groupBy(col(groupCol))
      .agg(sum("tf").as("n_tokens"),
        sum(col("tf") * corpusBits).as("sum_corpus_bits"),
        sum(col("tf") * sourceBits).as("sum_source_bits"))
      .withColumn("xent_corpus_bits",
        col("sum_corpus_bits").cast("double") / col("n_tokens"))
      .withColumn("ent_source_bits",
        col("sum_source_bits").cast("double") / col("n_tokens"))
      .withColumn("kl_bits",
        col("xent_corpus_bits") - col("ent_source_bits"))
  }

  /** Convenience overload on the shared frozen artifact. */
  def driftBatch(docs: DataFrame,
                 frozen: StreamingQuality.FrozenLm): DataFrame =
    driftBatch(docs, frozen.counts, frozen.totals,
      groupCol = "source", textCol = frozen.textCol)

  /** The monitor as a stream writer: each micro-batch's per-source drift
    * relation is handed to `emit` with its batch id. Attach a checkpoint
    * location and start. */
  def driftMonitorStream(stream: DataFrame,
                         frozen: StreamingQuality.FrozenLm,
                         groupCol: String = "source")
                        (emit: (DataFrame, Long) => Unit)
  : DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      emit(driftBatch(batch, frozen.counts, frozen.totals, groupCol,
        frozen.textCol), id)
    }
}
