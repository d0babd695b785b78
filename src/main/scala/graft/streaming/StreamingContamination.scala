package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.llm.{Dedup, TextAnalysis}

/** Ingest-time decontamination screen — the q102 action at the front door,
  * in the frozen-artifact pattern of [[StreamingQuality]]/[[StreamingDrift]]:
  * the eval/benchmark sets' complete w-grams are frozen ONCE into a Bloom
  * filter (built by Spark's distributed `bloom_filter_agg`, so the build
  * itself is an aggregate, never driver state beyond the final bits);
  * every arriving train-candidate document is then probed per micro-batch
  * and flagged before it lands. The batch audit (q61) and rewrite (q102)
  * run nightly; this gate keeps leaked eval data from ever entering the
  * training store between runs.
  *
  * Error contract, stated precisely: Bloom membership has one-sided
  * error, so a document flagged `is_kept = true` is GUARANTEED to share no
  * complete w-gram with the frozen eval sets (no false negatives), while
  * a flagged document may rarely be a false positive (~the sized FPR) —
  * the conservative direction for a contamination gate: clean data never
  * leaks through; a false flag costs one needless review. LlmOpsSpec
  * measures the realized excess against the exact join.
  *
  * Per-batch scoring is stateless (a document's flag depends only on
  * itself and the frozen filter), so the union of micro-batch emissions
  * equals the batch twin on the same rows (StreamingSpec pins it).
  * Freshness: a new benchmark set means re-freezing and restarting the
  * gate — the same rebuild-to-retrain contract as every frozen artifact.
  *
  * 100 TB posture: the filter is a few MB broadcast as a literal into
  * whole-stage codegen ([[TextAnalysis.mightContain]] — no UDF); each
  * batch is one shingle projection + aggregate. No joins, no shuffle of
  * anything corpus-sized, no state store.
  */
object StreamingContamination {

  /** A frozen eval-gram filter: the Bloom bits plus the parameters that
    * built it (driver-held — bounded by `numBits/8` bytes). */
  final case class FrozenGrams(bloom: Array[Byte], w: Int,
                               textCol: String)

  /** Freeze the eval sets' distinct complete w-grams into a Bloom filter.
    * Size `estimatedItems` ≈ the distinct eval-gram count and `numBits` ≈
    * 8–10× that (the defaults here are 2^22 bits over 2^19 items = 8
    * bits/item ≈ 2% FPR; 10× gives ~1% — the
    * [[TextAnalysis.contaminationBloom]] sizing rule; a wild
    * overestimate saturates the filter). Fails loud on an eval corpus
    * with no complete w-gram: a null Bloom would otherwise make
    * [[screenBatch]] keep every document silently — a contamination
    * gate that screens nothing must not look like one that passed. */
  def freeze(evalDocs: DataFrame, w: Int = 5,
             numBits: Long = 1L << 22, estimatedItems: Long = 1L << 19,
             idCol: String = "doc_id",
             textCol: String = "text"): FrozenGrams = {
    val bloomAgg = org.apache.spark.sql.GraftExpressionBridge.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(
        org.apache.spark.sql.GraftExpressionBridge.expression(col("h")),
        org.apache.spark.sql.catalyst.expressions.Literal(estimatedItems),
        org.apache.spark.sql.catalyst.expressions.Literal(numBits))
        .toAggregateExpression())
    val bytes = Dedup.shingles(evalDocs, w, idCol, textCol)
      .select(xxhash64(col("shingle")).as("h"))
      .agg(bloomAgg)
      .head().getAs[Array[Byte]](0)
    require(bytes != null,
      s"freeze: eval corpus has no complete $w-gram — an empty Bloom " +
        "gate would silently keep every document; pass a smaller w or " +
        "a non-empty eval set")
    FrozenGrams(bytes, w, textCol)
  }

  /** Screen ONE frame (batch semantics) against a frozen filter — the
    * function both the stream's foreachBatch and the batch twin call.
    * Output: (id, n_grams, n_hit, is_kept) — the q102 schema; docs too
    * short for a complete shingle carry zero grams and are kept. */
  def screenBatch(docs: DataFrame, frozen: FrozenGrams,
                  minHits: Long = 1L,
                  idCol: String = "doc_id"): DataFrame = {
    val hits = Dedup.shingles(docs, frozen.w, idCol, frozen.textCol)
      .withColumn("__hit",
        TextAnalysis.mightContain(lit(frozen.bloom),
          xxhash64(col("shingle"))).cast("long"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"), sum(col("__hit")).as("n_hit"))
    docs.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        (coalesce(col("n_hit"), lit(0L)) < lit(minHits)).as("is_kept"))
  }

  /** The gate as a stream writer: each micro-batch's flag relation is
    * handed to `emit` with its batch id. Attach a checkpoint location
    * and start. */
  def contaminationGateStream(stream: DataFrame, frozen: FrozenGrams,
                              minHits: Long = 1L,
                              idCol: String = "doc_id")
                             (emit: (DataFrame, Long) => Unit)
  : DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      emit(screenBatch(batch, frozen, minHits, idCol), id)
    }

  /** Persist a frozen filter (bits + build params) as a 1-row parquet
    * artifact. Single-writer, like every store in the repo. */
  def writeBloomStore(frozen: FrozenGrams, path: String,
                      spark: SparkSession): Unit = {
    import spark.implicits._
    Seq((frozen.bloom, frozen.w, frozen.textCol))
      .toDF("bloom", "w", "text_col")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Rehydrate a frozen filter from a store — bit-identical to the
    * written one (StreamingSpec pins probe equality). */
  def freezeFromStore(spark: SparkSession, path: String): FrozenGrams = {
    val row = spark.read.parquet(path).head()
    FrozenGrams(row.getAs[Array[Byte]]("bloom"), row.getAs[Int]("w"),
      row.getAs[String]("text_col"))
  }
}
