package graft.jobs

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.llm.{Dedup, TextAnalysis}
import graft.sinks.Sinks

/** End-to-end training-data curation pipeline (the north-star composition):
  * documents → PII/link scrub → exact dedup → MinHash-LSH near-dup removal
  * → repetition filter → quality filter → language ID → curated parquet +
  * per-stage survival stats.
  *
  * Shape notes for 100 TB: every stage is a narrow transform or a
  * key-bucketed join (no driver state); near-dup removal drops the higher
  * id of each verified pair (deterministic survivor choice); stats come
  * from one pass per stage boundary.
  *
  * Usage: runMain graft.jobs.CurationJob [sfDir] [outDir]
  */
object CurationJob {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = JobMains.args2(args)
    val spark = JobMains.session("curation")
    spark.sparkContext.setLogLevel("WARN")

    val raw = Tables.documents(spark, sfDir)
    val total = raw.count()

    // 0. PII/link scrub BEFORE dedup: masking first means two docs that
    //    differ only in masked spans dedup together
    val docs = raw.withColumn("text", TextAnalysis.scrub(col("text")))

    // 1. exact dedup: keep canonical ids only
    val exact = Dedup.exactCanonical(docs)
      .filter(col("doc_id") === col("canonical_id"))
      .drop("canonical_id").persist()
    val afterExact = exact.count()

    // 2. near-dup removal: MinHash-LSH candidates verified at jaccard ≥ 0.8,
    //    drop the higher id of each pair
    val nearDupLosers = Dedup.minHashDedupPairs(exact, w = 3, tau = 0.8)
      .select(col("id_b").as("doc_id")).distinct()
    val afterNear = exact.join(nearDupLosers, Seq("doc_id"), "left_anti")
      .persist()
    val nAfterNear = afterNear.count()

    // 3. repetition filter: drop boilerplate/spam-shaped docs whose top
    //    3-gram dominates (broadcast the tiny (id, ratio) side)
    val repetitive = TextAnalysis.repetitionRatio(afterNear)
      .filter(col("rep_ratio") > 0.2).select("doc_id")
    val afterRep = afterNear.join(repetitive, Seq("doc_id"), "left_anti")
      .persist()
    val nAfterRep = afterRep.count()

    // 4. quality filter + language ID
    val curated = TextAnalysis.langId(
        TextAnalysis.qualityScore(afterRep)
          .filter(col("quality_score") >= 0.5))
      .select("doc_id", "text", "lang", "pred_lang", "source",
        "n_tokens", "quality_score")
    val nCurated = curated.count()

    curated.write.mode("overwrite").parquet(s"$outDir/curated")
    val stats = Seq(
      ("input", total), ("after_exact_dedup", afterExact),
      ("after_near_dedup", nAfterNear), ("after_repetition", nAfterRep),
      ("curated", nCurated))
    import spark.implicits._
    Sinks.writeText(stats.toDF("stage", "docs")
      .select(concat_ws("=", col("stage"), col("docs"))), s"$outDir/stats")
    println(s"[curation] $stats -> $outDir")
    spark.stop()
  }
}
