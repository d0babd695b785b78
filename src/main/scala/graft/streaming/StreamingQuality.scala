package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.llm.TextAnalysis

/** Ingest-time quality gate — the streaming twin of the q91 surprisal
  * buckets, in the frozen-artifact pattern of the BM25 probe scorer and
  * the frozen-quantizer embedding stream: a batch REFERENCE corpus fixes
  * the unigram LM (token counts + total) and the per-group tercile
  * cutoffs once at gate start; every arriving document is then scored
  * and bucketed against that frozen reference. The use case is triage at
  * the front door: an arrival bucketed 'tail' against the curated
  * corpus's LM is routed to review/downweighting before it lands,
  * instead of waiting for the next batch re-bucketing.
  *
  * Per-batch scoring is an aggregation over the batch's own exploded
  * tokens (per-doc tf), so the stream runs through `foreachBatch` — the
  * [[StreamingDedup]] protocol — with NO cross-batch state: a document's
  * score depends only on itself and the frozen reference, so the union
  * of micro-batch emissions equals the batch twin on the same rows
  * (StreamingSpec pins it, including bit-identity with the inline q91
  * path when the reference IS the scored corpus).
  *
  * Freshness trade, stated plainly: arrivals shift neither the counts
  * nor the cutoffs until the reference is re-frozen and the gate
  * restarted (the batch-0-quantizer retrain contract). Out-of-vocabulary
  * tokens score at the maximum (c = 1) — see
  * [[TextAnalysis.lmSurprisalWithStats]].
  */
object StreamingQuality {

  /** A frozen reference: persisted token counts (vocabulary-sized, a join
    * side — never driver state), the 1-row total, and the per-group
    * tercile cutoffs. Release with [[FrozenLm.release]] when the gate
    * stops (cache ownership stays with the caller, the CacheScope rule).
    */
  final case class FrozenLm(counts: DataFrame, totals: DataFrame,
                            cuts: DataFrame, groupCol: String,
                            idCol: String, textCol: String) {
    def release(): Unit = { counts.unpersist(); cuts.unpersist() }
  }

  /** Freeze the reference LM + cutoffs from a batch corpus. The counts
    * are persisted AND materialized (every micro-batch joins them; an
    * unpersisted plan would re-scan the reference corpus per trigger);
    * the cutoffs are the q91 terciles of the reference scored against
    * its own stats. */
  def freeze(ref: DataFrame, groupCol: String = "lang",
             idCol: String = "doc_id",
             textCol: String = "text"): FrozenLm = {
    val (counts, totals) = TextAnalysis.lmStats(ref, textCol)
    val c = counts.persist()
    c.count()
    val sur = ref.select(col(idCol), col(groupCol))
      .join(TextAnalysis.lmSurprisalWithStats(ref, c, totals, idCol,
        textCol), idCol)
      .select(col(idCol), col(groupCol), col("xent_bits"))
    val cuts = TextAnalysis.tercileCutoffs(sur, groupCol).persist()
    cuts.count()
    FrozenLm(c, totals, cuts, groupCol, idCol, textCol)
  }

  /** Score ONE frame (batch semantics) against a frozen reference —
    * the function both the stream's foreachBatch and the batch twin
    * call. Output: (id, group, xent_bits, bucket). */
  def bucketBatch(docs: DataFrame, frozen: FrozenLm): DataFrame = {
    val sur = docs.select(col(frozen.idCol), col(frozen.groupCol))
      .join(TextAnalysis.lmSurprisalWithStats(docs, frozen.counts,
        frozen.totals, frozen.idCol, frozen.textCol), frozen.idCol)
      .select(col(frozen.idCol), col(frozen.groupCol), col("xent_bits"))
    TextAnalysis.bucketJoin(sur, frozen.cuts, frozen.groupCol,
      frozen.idCol)
  }

  /** The gate as a stream writer: each micro-batch is bucketed against
    * the frozen reference and handed to `emit` with its batch id.
    * Attach a checkpoint location and start. */
  def surprisalGateStream(stream: DataFrame, frozen: FrozenLm)
                         (emit: (DataFrame, Long) => Unit)
  : DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      emit(bucketBatch(batch, frozen), id)
    }

  /** Persist a frozen reference as a store: `path/counts` holds per-batch
    * (token, c) rows (folded by token at freeze time — the derive-from-
    * postings trick, so appends keep the totals consistent for free) and
    * `path/cuts` the write-time tercile cutoffs. Single-writer, like
    * every store in the repo. A gate then starts from the artifact alone
    * — no reference-corpus rescan. */
  def writeLmStore(ref: DataFrame, path: String,
                   groupCol: String = "lang", idCol: String = "doc_id",
                   textCol: String = "text"): Unit = {
    val frozen = freeze(ref, groupCol, idCol, textCol)
    try {
      frozen.counts.write.mode("overwrite").parquet(s"$path/counts")
      frozen.cuts.write.mode("overwrite").parquet(s"$path/cuts")
    } finally frozen.release()
  }

  /** Fold a new batch's token counts into the store — the incremental
    * vocabulary update (one aggregate over the batch, appended; the
    * freeze-time fold sums per token across batch files). The CUTOFFS
    * stay write-time: appends shift every document's xent, so refreshed
    * terciles need a [[writeLmStore]] rebuild — the same
    * rewrite-to-retrain contract as the frozen-quantizer stream. */
  def appendLmStore(batch: DataFrame, path: String,
                    textCol: String = "text"): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(batch.sparkSession.sparkContext.hadoopConfiguration)
    require(fs.exists(new org.apache.hadoop.fs.Path(s"$path/counts")),
      s"LM store at $path has no counts artifact — only stores written " +
        "by writeLmStore are appendable")
    TextAnalysis.lmStats(batch, textCol)._1
      .write.mode("append").parquet(s"$path/counts")
  }

  /** Rehydrate a frozen reference from a store: counts folded by token
    * across appended batches (totals derived from the fold), cutoffs as
    * written. Scoring against a just-written store equals scoring against
    * the in-memory [[freeze]] bit-for-bit (StreamingSpec pins it). */
  def freezeFromStore(spark: org.apache.spark.sql.SparkSession,
                      path: String, groupCol: String = "lang",
                      idCol: String = "doc_id",
                      textCol: String = "text"): FrozenLm = {
    val counts = spark.read.parquet(s"$path/counts")
      .groupBy("token").agg(sum("c").as("c")).persist()
    counts.count()
    val cuts = spark.read.parquet(s"$path/cuts")
      .select(col(groupCol), col("__c1"), col("__c2"))
      .persist()
    cuts.count()
    FrozenLm(counts, counts.agg(sum("c").as("n_total")), cuts, groupCol,
      idCol, textCol)
  }
}
