package graft.jobs

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.llm.{Dedup, Retrieval, Similarity, TextAnalysis}
import graft.sinks.Sinks

/** End-to-end training-data curation pipeline (the north-star composition):
  * documents → PII/link scrub → exact dedup → MinHash-LSH near-dup cluster
  * resolution with best-of-quality retention (the q88 policy) →
  * chunk-level span rewrite (C4 move) → overlapping-window
  * substring rewrite (ExactSubstr move, catching tile-straddling spans) →
  * SEMANTIC near-dup cluster resolution over the embedding table →
  * repetition filter → quality filter (+ the model-based classifier hook
  * and the carried CCNet surprisal bucket) → language ID → per-language
  * length-tail trim → per-source cap → language mixture sampling →
  * content-hash split + contamination audit + mixture-weight targets +
  * BM25 probe screen + sequence packing + epoch shuffle order → curated
  * parquet + per-stage survival stats.
  *
  * Shape notes for 100 TB: every stage is a narrow transform or a
  * key-bucketed join (no driver state); near-dup removal resolves the
  * verified pairs into connected-component clusters, then LEXICAL
  * retention keeps each cluster's highest-quality member (ties to the
  * larger id — the keepBestInCluster / q88 policy) while SEMANTIC
  * retention (stage 2c) keeps the canonical min id; both transitive and
  * deterministic; stats come from one pass per stage boundary.
  *
  * Usage: runMain graft.jobs.CurationJob [sfDir] [outDir]
  */
object CurationJob {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = JobMains.args2(args)
    val spark = JobMains.session("curation")
    spark.sparkContext.setLogLevel("WARN")
    // library stages (surprisalBuckets, lengthTailFilter, mixtureWeights)
    // persist internals under the caller-releases CacheScope contract —
    // scope the whole run so every tracked cache frees at job end
    try graft.core.CacheScope.scoped { run(spark, sfDir, outDir) }
    finally spark.stop()
  }

  private def run(spark: org.apache.spark.sql.SparkSession,
                  sfDir: String, outDir: String): Unit = {
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
    //    resolved into clusters (transitive: A~B, B~C drops B AND C even
    //    though A,C never pair — per-pair dropping would keep C). Retention
    //    is the q88 policy: each cluster keeps its highest-QUALITY member
    //    (ties to the larger id), not blindly the min id — the production
    //    choice when duplicate copies differ in boilerplate/truncation
    val nearPairs = Dedup.minHashDedupPairs(exact, w = 3, tau = 0.8)
      .select("id_a", "id_b")
    val survivors = Dedup.keepBestInCluster(
        Dedup.connectedComponents(exact.select(col("doc_id")), nearPairs,
          "doc_id"),
        TextAnalysis.qualityScore(exact)
          .select(col("doc_id"), col("quality_score")))
      .filter(col("is_kept")).select("doc_id")
    val afterNear = exact.join(survivors, Seq("doc_id"), "left_semi")
      .persist()
    val nAfterNear = afterNear.count()

    // 2b. chunk-level span rewrite (the C4 move): spans already seen
    //     earlier in the corpus are REMOVED from surviving docs rather
    //     than dropping the whole doc; docs rewritten to nothing drop out.
    //     Runs after whole-doc dedup so the first-occurrence table is over
    //     survivors only
    val rewritten = Dedup.chunkDedupRewrite(afterNear, w = 16)
      .filter(length(col("text")) > 0)
      .select("doc_id", "text")
      .join(afterNear.drop("text"), "doc_id")
      .persist()
    val nAfterChunk = rewritten.count()
    afterNear.unpersist()

    // 2b-ii. OVERLAPPING-window pass (the ExactSubstr move): a repeated
    //     span that straddles the tiling's chunk boundaries survives 2b —
    //     the stride-1 window rewrite removes those too
    // localCheckpoint, not persist: it materializes like the persist did
    // AND truncates the logical plan (the connectedComponents lineage
    // trick) — by this stage the accumulated DAG's toString is what blows
    // the driver, not the data
    val unstraddled = Dedup.substringDedupRewrite(rewritten, w = 8)
      .filter(length(col("text")) > 0)
      .select("doc_id", "text")
      .join(rewritten.drop("text"), "doc_id")
      .localCheckpoint()
    val nAfterSub = unstraddled.count()
    rewritten.unpersist()

    // 2c. SEMANTIC near-dup removal — the embedding-space twin of stage 2:
    //     cosine-near pairs over the aligned embedding table resolved into
    //     clusters, keeping each cluster's canonical min id. Docs without
    //     an embedding row pass through (can't be semantically deduped)
    val emb = Tables.embeddings(spark, sfDir)
      .join(unstraddled.select(col("doc_id").as("vec_id")), Seq("vec_id"),
        "left_semi")
    val semPairs = Similarity.embeddingNearDupPairsIvf(emb, tau = 0.45)
      .select("id_a", "id_b")
    val semDropped = Dedup
      .connectedComponents(emb.select(col("vec_id")), semPairs, "vec_id")
      .filter(col("id") =!= col("comp")).select(col("id").as("doc_id"))
    val afterSem = unstraddled.join(semDropped, Seq("doc_id"), "left_anti")
      .persist()
    val nAfterSem = afterSem.count()
    // (unstraddled is a localCheckpoint — its blocks free on GC/job end,
    // there is no cache entry to unpersist)

    // 3. repetition filter: drop boilerplate/spam-shaped docs whose top
    //    3-gram dominates (broadcast the tiny (id, ratio) side)
    val repetitive = TextAnalysis.repetitionRatio(afterSem)
      .filter(col("rep_ratio") > 0.2).select("doc_id")
    val afterRep = afterSem.join(repetitive, Seq("doc_id"), "left_anti")
      .persist()
    val nAfterRep = afterRep.count()

    // 4. quality filter + language ID. The hashed-bag classifier score is
    //    CARRIED, not filtered on: its stand-in weights are deterministic
    //    placeholders — a production run swaps in trained weights and
    //    moves the filter onto `clf_score` (the CCNet move); the heuristic
    //    gate below is honest on any data
    val curated = TextAnalysis.langId(
        TextAnalysis.qualityScore(afterRep)
          .filter(col("quality_score") >= 0.5))
      .join(TextAnalysis.classifierScore(afterRep,
          TextAnalysis.hashedWeights(64))
        .select(col("doc_id"), col("score").as("clf_score")), "doc_id")
      // LEFT join, mirroring clf_score's full-coverage contract: a doc
      // that tokenizes to zero tokens has no surprisal row, and a carried
      // column must carry (null = "no tokens to score"), never filter
      .join(TextAnalysis.surprisalBuckets(afterRep)
        .select(col("doc_id"), col("bucket").as("surprisal_bucket")),
        Seq("doc_id"), "left")
      .select("doc_id", "text", "lang", "pred_lang", "source",
        "n_tokens", "quality_score", "clf_score", "surprisal_bucket")
      .persist() // three consumers: the count, the trim agg, the trim join
    val nCurated = curated.count()
    // surprisal_bucket is CARRIED like clf_score, not filtered on: on
    // uniform synthetic text the tail third is an arbitrary cut; a
    // production run drops or downweights bucket = 'tail' (the CCNet
    // move). Geometry note (ProfileBuckets, measured): this corpus's
    // near-uniform vocabulary makes whole-bit surprisal knife-edge —
    // at this pipeline position most docs share one xent value, so the
    // carried column is mostly 'head' here; the raw-corpus terciles
    // (q91's gate relation) are healthy thirds at every scale

    // 4a. per-language token-length tail trim (q89): a handful of
    //     pathological long docs otherwise dominate packing bins and
    //     truncation waste downstream
    val trimmed = curated.join(
        TextAnalysis.lengthTailFilter(curated, p = 0.99).select("doc_id"),
        "doc_id")
      .persist() // two consumers: the count and sourceCap + cap join
    val nTrimmed = trimmed.count()
    curated.unpersist()

    // 4b. domain balance: cap each source's share (content-hash draw order,
    //     stable across re-runs), then rebalance the language mixture
    //     (downweight the dominant language, keep the tail whole)
    val capped = trimmed.join(
      TextAnalysis.sourceCap(trimmed, cap = 20).select("doc_id"), "doc_id")
    val mixed = TextAnalysis.mixtureSample(capped, targets = Seq("en" -> 0.7))
      .drop("draw").persist()
    val nMixed = mixed.count()

    // 5. training layout: content-hash 80/10/10 split (exact dups — already
    //    removed here, but stable under re-runs — share a split),
    //    2048-PIECE sequence packing bins under a tokenizer TRAINED ON THE
    //    CURATED SET ITSELF (the real token-budget statistic — whitespace
    //    counts misprice long words; packSequences stays the whitespace
    //    form for the oracle gate), and a deterministic epoch-0 shuffle
    val merges = TextAnalysis.learnBpeMerges(mixed, numMerges = 200)
    val bpeBins = graft.ops.Scale.globalCumSum(
        TextAnalysis.bpePieceCounts(mixed, merges)
          .select(col("doc_id"), col("n_pieces")),
        "doc_id", "n_pieces", "cum_pieces")
      .withColumn("bin", expr("(cum_pieces - n_pieces) div 2048L"))
    val withLayout = mixed
      .join(TextAnalysis.dataSplit(mixed).select("doc_id", "split"), "doc_id")
      .join(bpeBins.select("doc_id", "n_pieces", "bin"), "doc_id")
      .join(TextAnalysis.shuffleOrder(mixed)
        .select("doc_id", "shuffle_rank"), "doc_id")

    withLayout.write.mode("overwrite").parquet(s"$outDir/curated")
    // 6. release gates: the decontamination report (per-eval-doc train
    //    overlap) and the data-quality audit over the SHIPPED layout —
    //    what a release reads before training starts
    TextAnalysis.contamination(mixed)
      .write.mode("overwrite").parquet(s"$outDir/contamination")
    // the shipped set's temperature-scaled sampling targets (q92): what a
    // training loader reads to draw sources at alpha = 0.5
    TextAnalysis.mixtureWeights(mixed)
      .write.mode("overwrite").parquet(s"$outDir/mixture_weights")
    graft.ops.Audit.audit(withLayout,
        rowRules = Seq(
          "null_text" -> col("text").isNull,
          "empty_text" -> (length(col("text")) === 0),
          "bad_split" -> !col("split").isin("train", "val", "test"),
          "negative_bin" -> (col("bin") < 0)),
        uniqueKeys = Seq("doc_id", "shuffle_rank"))
      .write.mode("overwrite").parquet(s"$outDir/audit")
    // 6b. retrieval probe screen: BM25 top hits of the benchmark-shaped
    //     probe queries over the shipped TRAIN split — the release report
    //     a reviewer reads next to the n-gram contamination counts (a doc
    //     ranking high for an eval probe is a leakage suspect even when no
    //     exact n-gram overlaps). Reads the artifact just WRITTEN, like a
    //     reviewer would — which also keeps the scorer's plan off the full
    //     pipeline lineage (the typed top-k aggregate's encoder expressions
    //     on top of the whole curation DAG OOM'd the driver's plan
    //     stringification at sf0.01)
    Retrieval.bm25TopK(
        spark.read.parquet(s"$outDir/curated")
          .filter(col("split") === "train"),
        Retrieval.DefaultQueries, k = 5)
      .write.mode("overwrite").parquet(s"$outDir/probe_hits")
    val stats = Seq(
      ("input", total), ("after_exact_dedup", afterExact),
      ("after_near_dedup", nAfterNear), ("after_chunk_rewrite", nAfterChunk),
      ("after_substring_rewrite", nAfterSub),
      ("after_semantic_dedup", nAfterSem), ("after_repetition", nAfterRep),
      ("curated", nCurated), ("after_length_trim", nTrimmed),
      ("after_cap_and_mixture", nMixed))
    import spark.implicits._
    Sinks.writeText(stats.toDF("stage", "docs")
      .select(concat_ws("=", col("stage"), col("docs"))), s"$outDir/stats")
    println(s"[curation] $stats -> $outDir")
  }
}
