package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.TextAnalysis

/** Streaming corpus-health monitor — the q120 dashboard at ingest time,
  * under the repo's frozen-artifact discipline: the top-K vocabulary is
  * frozen ONCE from a reference corpus into a stored artifact (like the
  * LM store, Bloom bits, and BPE merges), and every micro-batch is scored
  * against THAT vocabulary — a batch-local top-K would silently re-define
  * "OOV" per trigger and make the counts incomparable across batches.
  *
  * Per (source) and micro-batch: docs, token mass, blocklist-density
  * drops, low-quality share, OOV mass — every column an exact integer and
  * batch-ADDITIVE, so the per-source sums across micro-batches equal the
  * batch twin bit-for-bit (the front door asserts exactly this).
  * Exact-duplicate load is deliberately NOT here: duplicate detection is
  * cross-batch state, which is [[StreamingDedup]]'s store — a stateless
  * per-batch "dup count" would silently undercount and read as healthy.
  */
object StreamingHealth {

  /** Freeze the reference corpus's top-K vocabulary (count desc, term asc
    * — q114's total order) as a stored artifact: (rank, tok) rows. */
  def writeVocabStore(docs: DataFrame, path: String, topK: Int = 20,
                      textCol: String = "text"): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    val top = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok"))
      .limit(topK)
      .select("tok").as[String].collect()
    top.zipWithIndex.map { case (t, r) => (r, t) }.toSeq
      .toDF("rank", "tok")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Rehydrate the frozen vocabulary in rank order; fail-loud on an
    * empty or missing artifact (the [[TextAnalysis.readBpeStore]]
    * contract — a silently empty vocabulary would score EVERY token OOV
    * and read as a corpus-wide anomaly). */
  def readVocabStore(spark: SparkSession, path: String): Seq[String] = {
    val rows = spark.read.parquet(path)
      .select("rank", "tok")
      .collect().sortBy(_.getInt(0)).map(_.getString(1)).toSeq
    require(rows.nonEmpty, s"vocab store at $path is empty — only stores " +
      "written by writeVocabStore are readable")
    rows
  }

  /** Score one micro-batch against the frozen vocabulary: per-source
    * additive health counts. Stateless — safe under retries, and the
    * per-source sums over any batch partition of the corpus equal the
    * whole-corpus relation. */
  def healthBatch(batch: DataFrame, vocab: Seq[String],
                  textCol: String = "text"): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    val vocabArr = array(vocab.map(lit): _*)
    val blArr = array(TextAnalysis.BlocklistTerms.sorted.map(lit): _*)
    TextAnalysis.qualityScore(batch, textCol)
      .select(col("source"),
        col("n_tokens").cast("long").as("__nt"),
        size(filter(toks, t => array_contains(blArr, t)))
          .cast("long").as("__hits"),
        col("quality_score"),
        size(filter(toks, t => !array_contains(vocabArr, t)))
          .cast("long").as("__oov"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("__nt").as("n_tokens"),
        sum((col("__hits") * lit(10L) >= col("__nt")).cast("long"))
          .as("n_blocklist_drop"),
        sum((col("quality_score") < lit(0.65)).cast("long"))
          .as("n_quality_low"),
        sum("__oov").as("n_oov"))
  }
}
