package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.llm.{Dedup, Multimodal, Retrieval, Similarity, TextAnalysis}

/** LLM-training-data-pipeline operator queries (north-star surface):
  * dedup family, embedding similarity search, text analysis, multimodal
  * plumbing. The approximate paths (q30 MinHash-LSH, q33 ANN) run with
  * recall-1.0-tuned parameters and exact verification, so they share the
  * oracles of their exact twins (q29/q32). q31 SimHash votes on the
  * portable mod-2^57 fingerprint hash so its signatures are SQL-oracle
  * reproducible (see [[simhashPairs]]).
  */
object LlmQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Exact dedup: canonical id per text (hash-groupBy family). */
  def dedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exactCanonical(Tables.documents(s, dir))
      .select("doc_id", "canonical_id")

  /** Exact 3-gram Jaccard near-dup pairs (τ = 0.5). */
  def jaccardPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(Tables.documents(s, dir), w = 3, tau = 0.5)

  /** Prefix-filter exact Jaccard (q152) — the PPJoin-style candidate
    * path: rarity-ordered prefixes join instead of every shingle, zero
    * false negatives by the prefix lemma. Shares q29's oracle — the
    * output EQUALS the exhaustive exact pairs, which is the lemma
    * checked on real data. */
  def prefixJaccardPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.prefixFilterJaccardPairs(Tables.documents(s, dir), w = 3,
      tauNum = 1, tauDen = 2)

  /** MinHash-LSH candidates verified by exact Jaccard. 32 bands × 2 rows
    * puts the catch probability at τ=0.5 at 1−0.75³² ≈ 0.9999, and the
    * verify step makes every emitted pair exact — so the output equals the
    * exact q29 ground truth and shares its oracle (LlmOpsSpec pins recall
    * 1.0 at these parameters). */
  def minhashDedup(s: SparkSession, dir: String): DataFrame =
    Dedup.minHashDedupPairs(Tables.documents(s, dir), w = 3, tau = 0.5,
      bands = 32, rowsPerBand = 2)

  /** SimHash Hamming-≤3 pairs via pigeonhole bands. Token bits vote on the
    * portable mod-2^57 polynomial fingerprint (the q37/q55 hash family, ours
    * to choose — the reference has no simhash) instead of xxhash64, so the
    * signature — and hence the pair set — is reproducible bit-for-bit by the
    * SQL oracle. */
  def simhashPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.simHashPairs(Tables.documents(s, dir), maxDist = 3,
        tokenHash = TextAnalysis.fingerprint, hashDistinctFirst = true)
      .withColumn("hamming", col("hamming").cast("long"))

  /** Prefix-blocked Levenshtein near-dup pairs (q172) — the char-level
    * dedup lens ([[graft.llm.Dedup.editDistancePairs]]): 24-char
    * opening blocks, blocks over 64 docs dropped whole (the hot-key
    * cap), pairs within edit distance 16 emitted with the distance.
    * Both engines run the same candidate generation and the same
    * textbook Levenshtein, so the pair set hash-matches exactly.
    */
  def editDistanceDedup(s: SparkSession, dir: String): DataFrame =
    Dedup.editDistancePairs(Tables.documents(s, dir), prefixLen = 24,
      maxDist = 16, maxBlock = 64)

  /** Brute-force cosine top-5 for query vectors vec_id < 10. */
  def knnBrute(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10), k = 5)
      .select(col("query_id"), col("neighbor_id"),
        round(col("score"), 6).as("score"), col("rnk").cast("long").as("rnk"))
  }

  /** LSH-bucketed approximate top-5 (the scale path). 2 planes × 16 tables
    * reaches recall 1.0 on the probe set (LlmOpsSpec pins it), so the output
    * equals brute force and shares the q32 oracle. */
  def knnLsh(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    Similarity.lshTopK(emb, emb.filter(col("vec_id") < 10), k = 5,
        nPlanes = 2, tables = 16)
      .select(col("query_id"), col("neighbor_id"),
        round(col("score"), 6).as("score"), col("rnk").cast("long").as("rnk"))
  }

  /** Per-language corpus statistics (all-integer outputs). */
  def textStats(s: SparkSession, dir: String): DataFrame = {
    val t = col("text")
    val toks = TextAnalysis.tokens(t)
    Tables.documents(s, dir)
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(toks)).as("total_tokens"),
        sum(length(t)).as("total_chars"),
        sum(length(regexp_replace(t, "[^.,;:!?'\"()]", ""))).as("punct_chars"),
        sum(size(filter(toks,
          x => x.isin(TextAnalysis.DefaultStopwords.map(lit): _*))))
          .as("stopword_tokens"))
  }

  /** Language-ID confusion counts: stopword-vote prediction × labeled lang. */
  def langId(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.langId(Tables.documents(s, dir))
      .groupBy("pred_lang", "lang").agg(count(lit(1)).as("n"))

  /** Per-document quality features + composite score. */
  def qualityScore(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.qualityScore(Tables.documents(s, dir))
      .withColumn("n_tokens", col("n_tokens").cast("long"))
      .select("doc_id", "n_tokens", "mean_token_len", "punct_ratio",
        "stopword_ratio", "quality_score")

  /** Preference-pair construction (q230) — the RLHF/DPO data-prep move:
    * per source (the prompt-group analog), pair the best-quality
    * document against the worst as (chosen, rejected), margin > 0
    * required (a tie is not a preference). Both ends come from ONE
    * map-side-combined struct-argmax aggregate — `max(struct(q, −id))`
    * / `min(struct(q, id))`, the LPA argmax device, so ties break
    * deterministically to the smaller doc_id and nothing rank-windows
    * over the corpus. The oracle takes the textbook two-window
    * ROW_NUMBER form — the aggregate-vs-window adversarial pairing.
    *
    * 100 TB posture: one aggregate into ≤ |sources| rows; the pair
    * join runs on that bounded relation.
    */
  def preferencePairs(s: SparkSession, dir: String): DataFrame = {
    // quality lives on a 0.1 grid ({0, .3, .4} summands), so the pair
    // arithmetic runs on integer TENTHS — a float margin would be a
    // double subtraction on Spark vs a decimal one in the oracle
    // (0.30000000000000004 vs 0.3, the r14 near-miss this comment pins)
    val q = TextAnalysis.qualityScore(Tables.documents(s, dir))
      .select(col("doc_id"), col("source"),
        round(col("quality_score") * 10, 0).cast("long").as("q10"))
    q.groupBy(col("source"))
      .agg(
        max(struct(col("q10").as("q"), (-col("doc_id")).as("nid")))
          .as("__c"),
        min(struct(col("q10").as("q"), col("doc_id").as("id"))).as("__r"))
      .select(col("source"),
        (-col("__c.nid")).as("chosen_id"), col("__c.q").as("chosen_q10"),
        col("__r.id").as("rejected_id"), col("__r.q").as("rejected_q10"))
      .filter(col("chosen_q10") > col("rejected_q10"))
      .withColumn("margin_q10", col("chosen_q10") - col("rejected_q10"))
  }

  /** Overflow-safe polynomial rolling-hash fingerprint per document. */
  def fingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))

  /** Multimodal metadata decode over binary payloads — REAL header
    * parsing since r17 (JPEG added r18): [[Multimodal.synthesizeMedia]]
    * builds one valid PNG/GIF/BMP/WAV/JFIF file per document (format +
    * dimensions drawn deterministically from doc_id, text bytes as the
    * body), and [[Multimodal.decodeMeta]] recovers width/height/duration
    * by parsing the actual file headers (fixed-offset integer reads and
    * a JPEG marker-chain walk per the public specs — no imaging
    * library). The oracle recomputes the expected values from the doc_id
    * formulas, so equality proves the byte-level decode inverts the
    * synthesis. */
  def multimodalMeta(s: SparkSession, dir: String): DataFrame = {
    implicit val sp: SparkSession = s
    Multimodal.decodeMeta(
        Multimodal.synthesizeMedia(Tables.documents(s, dir)))
      .toDF()
      .select(col("doc_id"), col("codec"), col("nBytes").as("n_bytes"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("durationMs").as("duration_ms"))
  }

  /** URL canonicalization dedup + per-host cap (q244, r16 VERDICT item
    * #6) — the standard crawl-curation stage the llm/ family lacked. The
    * documents table carries no URL, so one is SYNTHESIZED per doc with
    * deliberate non-canonical mess drawn deterministically from doc_id:
    * mixed-case scheme/host, an explicit `:80` on even ids, a trailing
    * slash on ids ≡ 0 (mod 5), `utm_`/`gclid` tracking params (keys in
    * MIXED CASE on ids ≡ 0 (mod 3) — the r17 ADVICE case-insensitivity
    * fix under proof), and a fragment. [[Dedup.canonicalizeUrls]] must scrub ALL of it back to
    * the clean form the oracle recomputes directly from the formulas —
    * the q38 synthesis-inversion proof structure. Dedup then keeps each
    * canonical URL's min-id copy and caps every host at 10 docs via the
    * two-phase content-hash draw (q64 device keyed on host). */
  def urlCanonicalDedupQ(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val url = concat(
      when(id % 3 === 0, lit("HTTP://WWW."))
        .when(id % 3 === 1, lit("http://www."))
        .otherwise(lit("Http://wWw.")),
      col("source"), lit(".Example.COM"),
      when(id % 2 === 0, lit(":80")).otherwise(lit("")),
      lit("/Page/"), (id % 50).cast("string"),
      when(id % 5 === 0, lit("/")).otherwise(lit("")),
      // tracking keys in mixed case on a third of the ids — the r17
      // ADVICE fix (key-case-insensitive strip) is what scrubs these
      when(id % 3 === 0, lit("?UTM_Source=feed&item="))
        .otherwise(lit("?utm_source=feed&item=")),
      (id % 7).cast("string"),
      when(id % 4 === 0,
        concat(when(id % 3 === 0, lit("&GCLID=g"))
          .otherwise(lit("&gclid=g")), id.cast("string")))
        .otherwise(lit("")),
      lit("#sec"), (id % 3).cast("string"))
    Dedup.urlCanonicalDedup(
      Tables.documents(s, dir).withColumn("url", url), cap = 10)
  }

  /** Gopher repetition-filter battery (q246): the six per-document
    * n-gram repetition metrics + keep flag of
    * [[TextAnalysis.repetitionStats]], integer-milli exact. */
  def gopherRepetition(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.repetitionStats(Tables.documents(s, dir))

  /** Embedding-cosine near-dup pairs (τ = 0.45 — the corpus has no planted
    * embedding dups, so the threshold sits just inside the natural tail).
    * Runs the recall-CERTIFIED IVF path: measure the candidate generator's
    * recall on a deterministic held-out sample first, use the IVF cells
    * when the certificate passes (the gate corpora — recall 1.0 at rung 1,
    * LlmOpsSpec pins equality with the exact all-pairs form), and escalate
    * to the exact scan when the measurement says the cells cannot prune
    * (sf0.1's uniform random vectors at this low τ — the boundary
    * TuneIvfSf01 measured, now handled by escalation instead of
    * documentation: exact there costs LESS than a ≥0.5-candidate-fraction
    * IVF). No cartesian outside the measured fallback; recall is exact at
    * every scale by construction. */
  def embeddingDedup(s: SparkSession, dir: String): DataFrame =
    Similarity.embeddingNearDupPairsCertified(Tables.embeddings(s, dir),
      tau = 0.45)

  /** Near-dup cluster resolution: exact jaccard pairs (the q29 relation) →
    * connected components → every doc labeled with its cluster's canonical
    * (min) id — the survivor-selection step that turns pair output into an
    * actually deduplicated corpus. Singletons label themselves. */
  def dedupClusters(s: SparkSession, dir: String): DataFrame =
    Dedup.nearDupClusters(Tables.documents(s, dir), w = 3, tau = 0.5)
      .select(col("id").as("doc_id"), col("comp").as("cluster_id"))

  /** IVF ANN top-5 (inverted-file layout — the stored-index scale path).
    * 12 tables × 64 cells, 16 query-side probes reaches recall 1.0 at all
    * three local corpora — sf0.001/sf0.01 (gate) and sf0.1 (bench), per
    * TuneIvfSf01; LlmOpsSpec pins equality with brute force — so it shares
    * the q32 oracle, same contract as q33's hyperplane variant. */
  def knnIvf(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 10), k = 5)
      .select(col("query_id"), col("neighbor_id"),
        round(col("score"), 6).as("score"), col("rnk").cast("long").as("rnk"))
  }

  /** Contrastive hard-negative mining: per query (vec_id < 10), the 5
    * HIGHEST-cosine neighbors strictly below the q42 near-dup threshold
    * (τ = 0.45). Near-dups are positives, not negatives — the exclusion
    * applies BEFORE the rank so each excluded near-dup frees its slot for
    * the next-deeper candidate. IVF-pruned scoring (the q52 machinery);
    * LlmOpsSpec pins equality with the exact brute-force form. */
  def hardNegativesQ(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    Similarity.hardNegatives(emb, emb.filter(col("vec_id") < 10), k = 5,
        tau = 0.45)
      .select(col("query_id"), col("neighbor_id"),
        round(col("score"), 6).as("score"), col("rnk").cast("long").as("rnk"))
  }

  /** Top-3 distinctive terms per document — TF-IDF with rational IDF
    * (tf·n_docs/df: one exact-integer division is bit-deterministic across
    * engines where ln-based weights are only ulp-close; see
    * TextAnalysis.topTermsPerDoc). */
  def topTerms(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.topTermsPerDoc(Tables.documents(s, dir), k = 3)

  /** Per-label embedding centroids (class prototypes): per-dimension mean,
    * rounded at 1e-6 per the order-sensitive-sum rule. */
  def labelCentroids(s: SparkSession, dir: String): DataFrame =
    Similarity.labelCentroids(Tables.embeddings(s, dir))
      .select(col("label"), col("dim"), col("mu"),
        col("n").cast("long").as("n"))

  /** Deterministic content-hash 80/10/10 split — exact duplicates land in
    * the same split (no train/val leakage), assignment stable across
    * engines via the portable mod-2^57 fingerprint. */
  def dataSplit(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.dataSplit(Tables.documents(s, dir))

  /** Leakage-safe 80/10/10 split: q55's content-hash assignment applied
    * per near-dup CLUSTER (the q51 relation) rather than per doc — every
    * member inherits the canonical member's bucket, so whole clusters
    * land in one split and no similarity edge crosses train/eval (the
    * leakage q61 detects). Singletons degrade to exactly q55. */
  def leakageSafeSplitQ(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    TextAnalysis.leakageSafeSplit(docs,
      Dedup.nearDupClusters(docs, w = 3, tau = 0.5)
        .select(col("id").as("doc_id"), col("comp").as("cluster_id")))
  }

  /** Token-budget sequence packing (2048/bin) over the two-phase prefix
    * sum — the single-task global-window form is the anti-pattern
    * (PlanSpec asserts no SinglePartition exchange). */
  def seqPacking(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.packSequences(Tables.documents(s, dir), budget = 2048)

  /** Int8 quantization audit: per-vector grid bounds (exact float→double,
    * no rounding needed) plus integer summaries of the code array — code
    * sums/extremes are exact ints, and the per-code round() is
    * half-away-from-zero in both engines, so the whole row is
    * hash-deterministic. */
  def quantStats(s: SparkSession, dir: String): DataFrame =
    Similarity.quantizeInt8(Tables.embeddings(s, dir))
      .select(col("vec_id"), col("q_min"), col("q_max"),
        aggregate(col("qvec"), lit(0L), (a, q) => a + q.cast("long"))
          .as("code_sum"),
        array_min(col("qvec")).cast("long").as("code_min"),
        array_max(col("qvec")).cast("long").as("code_max"))

  /** Perceptual (aHash) signature per media payload — integer-only
    * arithmetic end to end (64-way byte-chunk means, bit = cell·64 > Σcells)
    * so the 64-bit hash is bit-reproducible by the SQL oracle, unlike the
    * xxhash64-defined q31. The corpus payloads are ASCII text bytes, so SQL
    * codepoints equal the bytes the Scala side reads. */
  def perceptualHashes(s: SparkSession, dir: String): DataFrame = {
    implicit val sp: SparkSession = s
    Multimodal.perceptualHash(
      Multimodal.asMedia(Tables.documents(s, dir))).toDF()
  }

  /** MapType column handling — the reference's `channelInfo:
    * Map<String,String>` shape (`ActionLogJob.java:580`, SURVEY §1.1):
    * props parsed as a map, exploded, values aggregated per key. */
  def propsMap(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(explode(from_json(col("props"),
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.StringType)))
        .as(Seq("map_key", "map_value")))
      .groupBy("map_key")
      .agg(count(lit(1)).as("n"),
        sum(col("map_value").cast("long")).as("value_sum"))

  /** PII/link scrub stats: masked text length + per-kind match counts
    * (the corpus plants no emails/URLs, so counts are zero and clean_len
    * equals length — the planted-content behavior is unit-tested in
    * LlmOpsSpec; this query gate-checks the masking pipeline shape). */
  def scrubStats(s: SparkSession, dir: String): DataFrame = {
    val t = col("text")
    Tables.documents(s, dir).select(col("doc_id"),
      length(TextAnalysis.scrub(t)).cast("long").as("clean_len"),
      countMatchesLong(t, TextAnalysis.EmailRe).as("n_emails"),
      countMatchesLong(t, TextAnalysis.UrlRe).as("n_urls"))
  }

  private def countMatchesLong(t: org.apache.spark.sql.Column, re: String) =
    TextAnalysis.countMatches(t, re).cast("long")

  /** Most-repeated-3-gram frequency share per document (Gopher-style
    * repetition filter signal). */
  def repetition(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.repetitionRatio(Tables.documents(s, dir), w = 3)

  /** Exact corpus-wide top-10 tokens via the mergeable Misra-Gries summary
    * + exact second pass (graft.ops.Scale.heavyHittersExact). sketchK=32 ≥
    * the corpus vocabulary (31), where the MG summary never decrements and
    * the candidate set is unconditionally complete — the n/(k+1) survival
    * bound alone would NOT cover this near-uniform distribution at k=16
    * (no token reaches n/17), so the parameter choice is the honesty. */
  def heavyHitters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = Tables.documents(s, dir)
      .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
      .as[String]
    graft.ops.Scale.heavyHittersExact(toks, sketchK = 32, topN = 10)
      .select(col("item").as("token"), col("cnt"))
  }

  /** Train→eval 5-gram contamination over the q55 content-hash split —
    * near-dup pairs straddling the split boundary surface as nonzero
    * contamination (the leakage exact-dup-safe splitting can't catch). */
  def contamination(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.contamination(Tables.documents(s, dir), w = 5)

  /** Decontamination rewrite — q61's audit turned into the action: TRAIN
    * docs sharing ≥ 1 complete 5-gram with any val/test doc are flagged
    * is_kept = false (train pays; eval is the measurement instrument). */
  def decontaminate(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.decontaminate(Tables.documents(s, dir), w = 5)

  /** Token-budget selection: best docs by the q36 quality order until 40%
    * (2/5, exact integers) of the corpus tokens are spent. */
  def tokenBudget(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.tokenBudgetSelect(Tables.documents(s, dir),
      budgetNum = 2L, budgetDen = 5L)

  /** DSIR-shaped importance selection: the en subset as the target
    * distribution, keep the top quarter (1/4, exact integers) by
    * integer-bit importance weight. */
  def dsirSelect(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    TextAnalysis.dsirSelect(docs, docs.filter(col("lang") === "en"),
      keepNum = 1L, keepDen = 4L)
  }

  /** Cross-document repeated 5-gram spans (boilerplate/template discovery,
    * df ≥ 2, top-100 by spread) — random text shares no long shingles, so
    * survivors are the planted near-dup templates. */
  def boilerplate(s: SparkSession, dir: String): DataFrame =
    Dedup.boilerplateGrams(Tables.documents(s, dir), w = 5)

  /** Deterministic stratified mixture sample: downweight en to 30%,
    * es to 60%, keep the tail — content-hash draws, engine-stable. */
  def mixtureSample(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.mixtureSample(Tables.documents(s, dir),
        targets = Seq("en" -> 0.3, "es" -> 0.6))
      .select("doc_id", "lang", "draw")

  /** Token-count-weighted bottom-k sample (k = 100): inclusion
    * probability ∝ document length, integer-exact keys, plans as
    * TakeOrderedAndProject — see TextAnalysis.weightedSampleK. */
  def weightedSampleQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.weightedSampleK(Tables.documents(s, dir), k = 100,
      weightCol = TextAnalysis.tokenCount(col("text")))

  /** Low-resource upsampling (zh ×2.5, fr ×3.0): deterministic
    * fractional replication with a 0-based copy index — see
    * TextAnalysis.mixtureUpsample. */
  def mixtureUpsampleQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.mixtureUpsample(Tables.documents(s, dir),
        targets = Seq("zh" -> 2.5, "fr" -> 3.0))
      .select("doc_id", "lang", "rep")

  /** CCNet head/middle/tail: per-language perplexity terciles under the
    * corpus unigram LM — see TextAnalysis.perplexityBuckets. */
  def perplexityBucketsQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.perplexityBuckets(Tables.documents(s, dir), buckets = 3)

  /** Per-language weighted bottom-20: equal slots per stratum, inclusion
    * ∝ token count within — see TextAnalysis.weightedSampleKPerGroup. */
  def weightedSamplePerLangQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.weightedSampleKPerGroup(Tables.documents(s, dir), k = 20,
      weightCol = TextAnalysis.tokenCount(col("text")))

  /** Per-source cap (10/source): salted content-hash draw ordering, so the
    * survivor set is engine- and partitioning-stable. */
  def sourceCap(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.sourceCap(Tables.documents(s, dir), cap = 10)

  /** Corpus-trained unigram-LM surprisal per document — whole-bit
    * quantization (exact integer arithmetic) for cross-engine determinism;
    * see TextAnalysis.lmSurprisal. */
  def lmSurprisal(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.lmSurprisal(Tables.documents(s, dir))

  /** Per-source token-distribution divergence from the corpus blend — the
    * mix-drift audit in q65's exact whole-bit arithmetic (KL proxy =
    * corpus-model cross entropy − own-model entropy, floor-bits). */
  def sourceDivergence(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.sourceDivergence(Tables.documents(s, dir))
      .select("source", "n_tokens", "sum_corpus_bits", "sum_source_bits",
        "xent_corpus_bits", "ent_source_bits", "kl_bits")

  /** Bigram-LM conditional surprisal (order-2 twin of q65 — repetitive
    * transitions score near zero where the unigram mix looks normal). */
  def lmBigram(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.lmBigramSurprisal(Tables.documents(s, dir))

  /** Incremental dedup of the val/test batch against the train-split
    * corpus's signature store + itself — the daily-ingest dedup layout.
    * Identical banding to q30 (recall-1.0-tuned, LlmOpsSpec), so the
    * output is exactly the q29 pair relation restricted to pairs with a
    * non-train member, canonicalized (stored id, new id). */
  def incrementalDedup(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    // split as a COLUMN + scope-tracked persist: one fingerprint pass and
    // no docs↔split self-join — both batch sides filter the cached frame
    val withSplit = graft.core.CacheScope.track(docs.withColumn("bucket",
        pmod(TextAnalysis.fingerprint(col("text")), lit(100L)))
      .persist())
    val newDocs = withSplit.filter(col("bucket") >= 80).drop("bucket")
    val oldDocs = withSplit.filter(col("bucket") < 80).drop("bucket")
    val store = Dedup.bandedSignatures( // multiset shingles: MINs are
      // duplicate-insensitive, one less exchange (r18)
      Dedup.shingles(oldDocs, w = 3, distinct = false)
        .filter(col("shingle").isNotNull),
      bands = 32, rowsPerBand = 2)
    Dedup.incrementalDedupPairs(newDocs, docs, store, w = 3, tau = 0.5,
      bands = 32, rowsPerBand = 2)
  }

  /** Chunk-level exact dedup (16-token tiles): per-doc retention after
    * removing chunks already seen earlier in the corpus. */
  def chunkDedup(s: SparkSession, dir: String): DataFrame =
    Dedup.chunkDedup(Tables.documents(s, dir), w = 16)

  /** Chunk-dedup rewrite: duplicate chunks actually removed, text rebuilt
    * from surviving chunks in order (C4-style span removal). */
  def chunkRewrite(s: SparkSession, dir: String): DataFrame =
    Dedup.chunkDedupRewrite(Tables.documents(s, dir), w = 16)

  /** PQ-compressed ANN top-5 (ADC + exact refine). m=16/k=32/refine=160
    * is measured recall 1.0 at sf0.001, sf0.01 AND sf0.1 (TunePq: minimum
    * refine 91/95/114 — uniform random vectors are PQ's worst case), so it
    * shares the q32 oracle — same contract as q33/q52. */
  def knnPq(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    Similarity.pqTopK(emb, emb.filter(col("vec_id") < 10), k = 5)
      .select(col("query_id"), col("neighbor_id"),
        round(col("score"), 6).as("score"), col("rnk").cast("long").as("rnk"))
  }

  /** Deterministic epoch-shuffle rank over the two-phase prefix count —
    * content-hash draw order, never a single-task global window. */
  def corpusShuffle(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.shuffleOrder(Tables.documents(s, dir))

  /** Curriculum epoch layout: q91 difficulty terciles as the major order
    * (head first), q69's salted content-hash shuffle within each tier. */
  def curriculumOrderQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.curriculumOrder(Tables.documents(s, dir))

  /** Collocation mining: top-100 adjacent pairs by PMI ratio, count ≥ 5 —
    * the planted boilerplate templates dominate on this corpus. */
  def phraseMiningQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.phraseMining(Tables.documents(s, dir))

  /** The composed training layout (the selection loop closed): q77
    * classifier score → q103 token budget in score order → q105
    * curriculum order over the kept set, whose tercile cutoffs come from
    * the kept set itself. One relation per doc; unranked docs carry −1. */
  def trainingLayoutQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.trainingLayout(Tables.documents(s, dir), classifierWeights)

  /** Per-doc 5-gram novelty: the share of each doc's distinct grams first
    * seen at that doc (min-id ownership) — the dedup-ROI curve. */
  def ngramNoveltyQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.ngramNovelty(Tables.documents(s, dir), w = 5)

  /** Gopher rule-battery verdicts (word-count window narrowed to the gate
    * corpus' register, the operator's other thresholds at the paper's
    * values) — counts AND per-rule-family boolean so the oracle pins both
    * the arithmetic and the verdict. */
  def gopherRulesQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.gopherRules(Tables.documents(s, dir),
      minWords = 10, maxWords = 1000)
      .select("doc_id", "n_words", "sum_word_len", "n_alpha_words",
        "n_symbolish", "n_lines", "n_bullet_lines", "n_ellipsis_lines",
        "n_stop_present", "keep")

  /** Deterministic contrastive crop pairs (w = 8): the salted content-hash
    * offsets AND the cropped strings, so the oracle pins the draw, the
    * slice arithmetic, and the reassembly. */
  def cropPairsQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.cropPairs(Tables.documents(s, dir), w = 8)

  /** Content-defined-chunking dedup (gram window 4, target chunk ~8
    * tokens) — q67's relation with the CDC knife, same output shape. */
  def cdcDedupQ(s: SparkSession, dir: String): DataFrame =
    Dedup.cdcDedup(Tables.documents(s, dir), w = 4, m = 8)

  /** Winnowing match pairs (k = 4, win = 4 → guarantee threshold t = 7
    * tokens, ≥ 2 shared fingerprints) — the MOSS sketch next to
    * MinHash/SimHash. */
  def winnowPairsQ(s: SparkSession, dir: String): DataFrame =
    Dedup.winnowPairs(Tables.documents(s, dir), k = 4, win = 4,
      minShared = 2)

  /** Frozen-tokenizer segmentation (apply-in-order BPE) — per-doc piece
    * counts under TextAnalysis.FrozenBpeMerges; the oracle replays the
    * same 40 merges as a recursive first-occurrence-replace CTE. */
  def bpeSegment(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bpePieceCountsInOrder(Tables.documents(s, dir))

  /** Top-K-vocabulary OOV audit (K = 20 over the corpus term counts). */
  def vocabCoverageQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.vocabCoverage(Tables.documents(s, dir), topK = 20)

  /** Blocklist-density filter (hits·10 < n_tokens keeps the doc). */
  def blocklistFilterQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.blocklistFilter(Tables.documents(s, dir))

  /** Exact-count stratified split over (lang, source): the lowest-draw
    * ⌊n/10⌋ of every stratum is eval. */
  def stratifiedSplitQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.stratifiedSplit(Tables.documents(s, dir))

  /** Cluster-balanced subsample: ≤ 30 exemplars per q90 semantic cluster,
    * chosen by the salted id-hash draw. */
  def clusterCapQ(s: SparkSession, dir: String): DataFrame =
    Similarity.clusterBalancedCap(Tables.embeddings(s, dir), cap = 30)

  /** Per-source corpus health report: volume, exact-dup load, blocklist
    * drops, low-quality share, OOV mass — all exact integers. */
  def sourceHealthQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.sourceHealthReport(Tables.documents(s, dir))

  /** Frozen-tokenizer encode: the per-doc piece-id sequence (pos, piece,
    * piece_id) a training run actually consumes. */
  def bpeEncodeQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bpeEncode(Tables.documents(s, dir))

  /** Packed training batches: q118's bins rolled up to one row per
    * sequence with the member docs in id order. */
  def packedBatchesQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.packedBatches(Tables.documents(s, dir))

  /** Tokenizer fertility per (lang, source) under the frozen tokenizer. */
  def bpeFertilityQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bpeFertility(Tables.documents(s, dir))

  /** Sequence packing denominated in frozen-tokenizer pieces (2048/bin). */
  def bpePackingQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.packSequencesBpe(Tables.documents(s, dir))

  /** JL random projection 64 → 16 dims (deterministic hyperplane literals,
    * one codegen'd dot per output coordinate). */
  def randomProjection(s: SparkSession, dir: String): DataFrame =
    Similarity.randomProjection(Tables.embeddings(s, dir), outDim = 16)

  /** Corpus mixture report: doc/token counts over CUBE(lang, source) —
    * every rollup level in one pass (partial aggregation per level,
    * map-side combined; the mixture dashboard of a curation pipeline). */
  def corpusCube(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .cube("lang", "source")
      .agg(grouping_id().as("gid"),
        count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col("text")).cast("long")).as("n_tokens"))

  /** Cross-modal dedup audit: every exact-Jaccard near-dup pair (the q29
    * relation) joined back to the embedding table on both members, emitting
    * lexical overlap next to embedding cosine — the "does surface dedup
    * agree with semantic similarity" check a curation pipeline runs before
    * trusting either signal. The pair relation is tiny next to the feature
    * table, so both fetch joins broadcast the pair side and the embedding
    * table is only point-read (at warehouse scale: id-bucketed lookups).
    * Cosine is ROUND(…,6) on both engines (order-sensitive-sum rule). */
  def pairAudit(s: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.ngramJaccardPairs(Tables.documents(s, dir),
      w = 3, tau = 0.5)
    val emb = Tables.embeddings(s, dir)
    val ea = emb.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val eb = emb.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    // re-hint after the first join: its output is still pair-cardinality,
    // but the hint does not propagate — without it the second join can
    // plan a sort-merge that shuffles the whole embedding table
    broadcast(ea.join(broadcast(pairs), "id_a")).join(eb, "id_b")
      .select(col("id_a"), col("id_b"),
        round(col("jaccard"), 6).as("jaccard"),
        round(Similarity.cosine(col("va"), col("vb")), 6).as("cosine"))
  }

  /** SEMANTIC dedup cluster resolution — the embedding-space twin of q51,
    * completing the lexical/semantic symmetry of the curation pipeline:
    * the q42 embedding near-dup pair relation (recall-certified IVF —
    * exact at every scale by measurement-gated escalation) resolved into
    * canonical clusters by the same hash-min connected components, so
    * every vector is labeled with the min vec_id reachable through
    * cosine-≥τ pairs. Singletons label themselves. At 100 TB both pieces
    * keep their measured postures: the pair generator goes all-pairs only
    * when the sampled certificate proves the cells cannot prune, and the
    * component loop is one shuffle per round with lineage truncation. */
  def embeddingClusters(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    Dedup.connectedComponents(
        emb.select(col("vec_id")),
        Similarity.embeddingNearDupPairsCertified(emb, tau = 0.45)
          .select("id_a", "id_b"),
        idCol = "vec_id")
      .select(col("id").as("vec_id"), col("comp").as("cluster_id"))
  }

  /** Data-quality audit over the documents table — the expectations gate
    * before training (null/empty text, metadata-consistency, vocabulary of
    * the lang column, id uniqueness), all rules in one aggregate pass.
    * The gate corpus is clean, so violations are zero — the audit's SHAPE
    * is what the oracle checks; LlmOpsSpec plants violations to verify the
    * counting. */
  def dataQuality(s: SparkSession, dir: String): DataFrame =
    graft.ops.Audit.audit(Tables.documents(s, dir),
      rowRules = Seq(
        "null_text" -> col("text").isNull,
        "empty_text" -> (length(col("text")) === 0),
        "n_chars_mismatch" -> (col("n_chars") =!= length(col("text"))),
        "unknown_lang" -> !col("lang").isin("de", "en", "es", "fr", "zh")),
      uniqueKeys = Seq("doc_id"))

  /** The q79 audit machinery applied to the SECOND modality — the
    * embeddings table's integrity gate (null/wrong-dim/non-finite/
    * all-zero vectors, label domain, key uniqueness), every rule one
    * conditional sum in the same single-scan aggregate. */
  def embeddingAudit(s: SparkSession, dir: String): DataFrame =
    graft.ops.Audit.audit(Tables.embeddings(s, dir),
      rowRules = Seq(
        "null_embedding" -> col("embedding").isNull,
        "wrong_dim" -> (size(col("embedding")) =!= 64),
        "has_nonfinite" -> exists(col("embedding"),
          x => isnan(x) || abs(x) === lit(Float.PositiveInfinity)),
        "zero_vector" ->
          (size(filter(col("embedding"), x => x =!= lit(0.0f))) === 0),
        "unknown_label" -> (col("label").isNull || col("label") < 0)),
      uniqueKeys = Seq("vec_id"))

  /** Overlapping-window exact-substring dedup rewrite (w = 8) — the
    * Lee-et-al span removal at window granularity; left-anchored, every
    * input document returns exactly once. */
  def substringRewrite(s: SparkSession, dir: String): DataFrame =
    Dedup.substringDedupRewrite(Tables.documents(s, dir), w = 8)

  /** BM25 sparse top-10 over the literal gate query set — odds-idf
    * portable scoring (the cross-engine-deterministic variant; LogIdf is
    * the production form, RetrievalSpec-verified in-JVM). */
  def bm25TopK(s: SparkSession, dir: String): DataFrame =
    Retrieval.bm25TopK(Tables.documents(s, dir), Retrieval.DefaultQueries,
      k = 10)

  /** Hybrid retrieval: reciprocal-rank fusion of the BM25 ranking with the
    * exact-cosine dense ranking over the same query ids (the test corpus
    * aligns doc_id ↔ vec_id, the q73 cross-modal convention). */
  def rrfFusion(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val sparse = Retrieval.bm25TopK(Tables.documents(s, dir),
      Retrieval.DefaultQueries, k = 10)
    val dense = Similarity.bruteForceTopK(emb,
        emb.filter(col("vec_id") < 5), k = 10)
      .withColumnRenamed("neighbor_id", "doc_id")
    Retrieval.rrfFuse(Seq(sparse, dense), c = 60.0, k = 10)
  }

  /** Subword-vocabulary induction (tokenizer-training prep): top-200
    * character 2-4-grams by corpus occurrences (token-frequency-weighted),
    * with type spread — all-integer statistics over a total order. */
  def subwordVocab(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.subwordVocab(Tables.documents(s, dir))

  /** q77's weight vector: 64 buckets of the deterministic stand-in family
    * (a trained fastText-style model integer-quantizes into the same
    * shape). One definition feeds BOTH the Spark plan and the interpolated
    * oracle literal, so they cannot drift. */
  private val classifierWeights: Array[Long] = TextAnalysis.hashedWeights(64)

  /** Model-based quality score: hashed bag-of-tokens linear classifier
    * (CCNet/fastText-shaped) over the portable fingerprint buckets —
    * the trained-model counterpart of q36's heuristic. */
  def qualityClassifier(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.classifierScore(Tables.documents(s, dir), classifierWeights)

  /** One compressed index build per (process, sfDir): the driver's Verify
    * builds it once, and bench repeats measure the SEARCH (the first run's
    * time includes the build — visible in the per-run bench artifact). The
    * index is deterministic, so reuse across repeats changes nothing. */
  private val ivfPqIndexCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Compressed stored-index ANN (IVF partition pruning + PQ codes + exact
    * refine — the FAISS-style layout; see Similarity.writeIvfPqIndex).
    * Registry params compose the two measured recall-1.0 guarantees
    * (q52's probes, q68's refine), so it shares the q32 oracle. */
  def knnIvfPq(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    // fingerprint keys on every temp-index cache (r17 ADVICE): a
    // same-JVM dataset regeneration rebuilds instead of serving stale
    val path = ivfPqIndexCache.computeIfAbsent(
      Tables.datasetCacheKey(dir, "embeddings.parquet"), _ => {
      val p = java.nio.file.Files.createTempDirectory("graft_ivfpq")
        .toString + "/index"
      Similarity.writeIvfPqIndex(emb, p)
      p
    })
    Similarity.searchIvfPqIndex(s, path, emb.filter(col("vec_id") < 10),
        emb, k = 5)
      .select(col("query_id"), col("neighbor_id"),
        round(col("score"), 6).as("score"), col("rnk").cast("long").as("rnk"))
  }

  /** Per-language exact token-length percentiles (p50/p90/p99) — the
    * sequence-budget planning statistic. */
  def tokenPercentiles(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.tokenPercentiles(Tables.documents(s, dir))

  /** Nearest-centroid label assignment over the q54 prototypes — rank-1
    * by cosine, larger label on ties (the max-struct contract). */
  def nearestCentroid(s: SparkSession, dir: String): DataFrame =
    Similarity.nearestCentroid(Tables.embeddings(s, dir))

  /** Distributed k-means corpus clustering (Lloyd, k = 8, 2 mean updates)
    * — full-corpus assignment, not the bounded-sample quantizer training:
    * see Similarity.kmeansLloyd. Deterministic seeds (ids 0..7), rounded
    * means each round, final assignment with cosine score. */
  def kmeansClusters(s: SparkSession, dir: String): DataFrame =
    Similarity.kmeansLloyd(Tables.embeddings(s, dir), k = 8, iters = 2)

  /** CCNet-shaped per-language quality thirds by unigram LM surprisal —
    * head/middle/tail buckets from exact tercile cutoffs (see
    * TextAnalysis.surprisalBuckets). */
  def qualityBuckets(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.surprisalBuckets(Tables.documents(s, dir))

  /** Temperature-scaled (α = 0.5) source sampling weights — the computed
    * targets that feed q63's mixture sampler (see
    * TextAnalysis.mixtureWeights). */
  def sourceMixtureWeights(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.mixtureWeights(Tables.documents(s, dir))

  /** Cross-source duplication matrix — the "who copies from whom" audit
    * over the q29 near-dup pair relation: each pair fetches its members'
    * `source`, undirected (source_lo ≤ source_hi), counted per source
    * pair with the strongest overlap seen. Tells a curation pipeline
    * which feeds mirror each other before it weights them independently.
    * MAX is order-insensitive (unlike AVG), so the jaccard statistic is
    * cross-engine exact. Pair side broadcast, re-hinted after the first
    * join — the q73 plan shape; the output is |sources|² bounded. */
  def dupSourceMatrix(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val pairs = Dedup.ngramJaccardPairs(docs, w = 3, tau = 0.5)
    val src = docs.select(col("doc_id"), col("source"))
    // two hints, one per join, each building the pair-bounded side: join 1
    // streams the corpus-sized source fetch and broadcasts the pair
    // relation; join 2 broadcasts the (pairs × source_a) result — still
    // pair-bounded — into the second corpus-sized source fetch
    val withA = src.select(col("doc_id").as("id_a"), col("source").as("sa"))
      .join(broadcast(pairs), "id_a")
    broadcast(withA)
      .join(src.select(col("doc_id").as("id_b"), col("source").as("sb")),
        "id_b")
      .groupBy(least(col("sa"), col("sb")).as("source_lo"),
        greatest(col("sa"), col("sb")).as("source_hi"))
      .agg(count(lit(1)).as("n_pairs"),
        round(max(col("jaccard")), 6).as("max_jaccard"))
  }

  /** Best-of-cluster retention: the q51 duplicate clusters composed with
    * the q36 quality scorer — every near-dup cluster keeps its highest-
    * quality member (ties to the larger doc_id; see
    * Dedup.keepBestInCluster). The policy step that turns a cluster
    * relation into an actual curation decision. */
  def bestOfCluster(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    Dedup.keepBestInCluster(
      Dedup.nearDupClusters(docs, w = 3, tau = 0.5),
      TextAnalysis.qualityScore(docs)
        .select(col("doc_id"), col("quality_score")))
  }

  /** Per-language token-length tail trim at p99 — sequence-budget outlier
    * removal (see TextAnalysis.lengthTailFilter). */
  def lengthTailTrim(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.lengthTailFilter(Tables.documents(s, dir), p = 0.99)

  /** SEMANTIC best-of-cluster retention — the q88 policy applied to the
    * q76 embedding clusters (doc_id ↔ vec_id alignment, the q73
    * convention): each embedding near-dup cluster keeps the member whose
    * DOCUMENT has the highest quality score. Completes the lexical/
    * semantic retention symmetry. */
  def semanticBestOfCluster(s: SparkSession, dir: String): DataFrame =
    Dedup.keepBestInCluster(
      embeddingClusters(s, dir),
      TextAnalysis.qualityScore(Tables.documents(s, dir))
        .select(col("doc_id").as("vec_id"), col("quality_score")),
      idCol = "vec_id")

  /** Duplicate-cluster size histogram — the audit that tells a curation
    * run whether near-dup structure is a few giant templates or many
    * small pairs (and what best-of-cluster retention will discard):
    * (cluster_size, n_clusters) over the q51 relation. Both aggregates
    * hash-combine map-side; output is bounded by the largest cluster. */
  def clusterSizeHistogram(s: SparkSession, dir: String): DataFrame =
    Dedup.nearDupClusters(Tables.documents(s, dir), w = 3, tau = 0.5)
      .groupBy(col("comp")).agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size")).agg(count(lit(1)).as("n_clusters"))

  /** Pair-similarity histogram at a LOW floor (τ = 0.1) — the
    * threshold-tuning curve at the gate scale, i.e.
    * Dedup.pairScoreHistogram's exact sampleFrac = 1 form; at 100 TB the
    * same operator runs with a sampleFrac sized to the rarest decile of
    * interest (see its error statement). */
  def pairScoreHistogram(s: SparkSession, dir: String): DataFrame =
    Dedup.pairScoreHistogram(Tables.documents(s, dir), w = 3, tau = 0.1,
      sampleFrac = 1.0)

  private val invIndexCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** BM25 over the STORED inverted index (term-group-pruned posting reads;
    * see Retrieval.writeInvertedIndex). Search equals the inline q80 path
    * bit-for-bit (LlmOpsSpec pins it), so it shares the q80 oracle. */
  def bm25Stored(s: SparkSession, dir: String): DataFrame = {
    val path = invIndexCache.computeIfAbsent(
      Tables.datasetCacheKey(dir, "documents.parquet"), _ => {
      val p = java.nio.file.Files.createTempDirectory("graft_inv")
        .toString + "/index"
      Retrieval.writeInvertedIndex(Tables.documents(s, dir), p)
      p
    })
    Retrieval.searchInvertedIndex(s, path, Retrieval.DefaultQueries, k = 10)
  }

  /** Hybrid STORED search — the full production stack from persisted
    * artifacts alone: the stored inverted index's BM25 ranking fused with
    * the stored IVF+PQ index's dense ranking by reciprocal rank. Both
    * stored paths equal their inline twins (q83 == q80 bit-for-bit; the
    * IVF+PQ search recalls the exact top-k at registry parameters — the
    * q72 contract, here driven at k = 10 with a deeper refine and pinned
    * against the q81 relation in LlmOpsSpec), so the fusion shares q81's
    * oracle. */
  def hybridStored(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val sparsePath = invIndexCache.computeIfAbsent(
      Tables.datasetCacheKey(dir, "documents.parquet"), _ => {
      val p = java.nio.file.Files.createTempDirectory("graft_inv")
        .toString + "/index"
      Retrieval.writeInvertedIndex(Tables.documents(s, dir), p)
      p
    })
    val densePath = ivfPqIndexCache.computeIfAbsent(
      Tables.datasetCacheKey(dir, "embeddings.parquet"), _ => {
      val p = java.nio.file.Files.createTempDirectory("graft_ivfpq")
        .toString + "/index"
      Similarity.writeIvfPqIndex(emb, p)
      p
    })
    val sparse = Retrieval.searchInvertedIndex(s, sparsePath,
      Retrieval.DefaultQueries, k = 10)
    val dense = Similarity.searchIvfPqIndex(s, densePath,
        emb.filter(col("vec_id") < 5), emb, k = 10, refine = 256)
      .withColumnRenamed("neighbor_id", "doc_id")
    Retrieval.rrfFuse(Seq(sparse, dense), c = 60.0, k = 10)
  }

  /** MMR-diversified rerank: greedy maximal-marginal-relevance selection
    * (λ = 0.7, k = 5) over the dense top-20 candidates for queries
    * vec_id < 5 — the diversified-retrieval tail after any ANN/BM25 path
    * (candidates are an input; production swaps the brute generator for
    * q52/q72/q83). Rel and pairwise sims 1e-6-rounded before the greedy
    * loop, so every argmax is cross-engine exact; the oracle unrolls the
    * same k selection steps as chained CTEs. */
  def mmrRerankQ(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val cand = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 5),
        k = 20)
      .select(col("query_id"), col("neighbor_id"),
        round(col("score"), 6).as("score"))
    // NOT round(): λ·rel − μ·maxsim lands near the 1e-7 grid, so the 6th
    // decimal ties constantly and Spark (HALF_UP on Double.toString) and
    // DuckDB (on the binary double) disagree on ties. floor(x·1e6 + .5)/1e6
    // is the same IEEE ops on the same bit-identical double in both engines.
    Retrieval.mmrRerank(cand, emb, k = 5, lambda = 0.7)
      .select(col("query_id"), col("neighbor_id"),
        (floor(col("mmr_score") * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("mmr_score"),
        col("rnk").cast("long").as("rnk"))
  }

  /** WEIGHT-driven mixture sample — the q92 temperature targets actually
    * applied, closing the q92 → q63 loop: per-source keep thresholds are
    * DERIVED from the computed weights relation (keep rate ∝ weight /
    * n_tokens, normalized so the scarcest source keeps everything), then
    * the q63 salted content-hash draw decides per document (see
    * TextAnalysis.mixtureSampleWeighted). Emits the surviving rows with
    * their draw and threshold so the oracle pins BOTH the derivation and
    * the sampling predicate. */
  def mixtureWeighted(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    TextAnalysis.mixtureSampleWeighted(docs,
        TextAnalysis.mixtureWeights(docs))
      .select("doc_id", "source", "draw", "keep_threshold")
  }

  /** The COMPOSED curation pipeline's per-document verdict — every stage
    * of CurationJob's keep/drop chain (shared via CurationPipeline, so the
    * gate certifies the actual job path) run end to end: (doc_id,
    * final_keep, drop_stage) for every input document. Individually green
    * stages can still compose wrong (statistics over the wrong relation,
    * trim-before-retention ordering bugs); this row pins the composition.
    * Oracle: the per-stage DuckDB CTEs chained in CurationOracle.sql. */
  def curationE2E(s: SparkSession, dir: String): DataFrame =
    graft.jobs.CurationPipeline.verdict(Tables.documents(s, dir),
      Tables.embeddings(s, dir))

  /** q247 (r17 VERDICT #8): the composed curation verdict with the
    * Gopher repetition battery (q246's six-threshold keep flag) as the
    * repetition gate instead of the single-w dominance ratio —
    * production quality gates run the full battery, and this pins its
    * COMPOSITION into the chain (statistics over the current rewritten
    * text, stage order intact). Flag-gated so q96's oracle is
    * untouched. */
  def curationGopher(s: SparkSession, dir: String): DataFrame =
    graft.jobs.CurationPipeline.verdict(Tables.documents(s, dir),
      Tables.embeddings(s, dir), gopherRepetition = true)

  /** Per-document n-gram novelty (q135): of each doc's distinct 3-grams,
    * the fraction first contributed by THIS doc (corpus-wide min doc_id)
    * — the dedup-aware "how much new content does this add" selection
    * signal. Rides the q29 shingle machinery; one gram-key shuffle + one
    * per-doc aggregate; exact integer counts, one division. */
  def noveltyScoreQ(s: SparkSession, dir: String): DataFrame =
    Dedup.noveltyScore(Tables.documents(s, dir), w = 3)

  /** Z-order layout key (q136): Morton interleave of the byte-length and
    * token-count buckets — the multi-dimension data-skipping sort key
    * (sorting files by it clusters locality in both dimensions, so
    * min/max file stats prune predicates on EITHER). The key is pure
    * integer arithmetic (division/modulo by powers of two), engine-exact
    * by construction; at 100 TB it feeds
    * `repartitionByRange(zkey) + sortWithinPartitions` at write time. */
  def zorderLayout(s: SparkSession, dir: String): DataFrame = {
    val xb = least(expr("n_chars div 16"), lit(255L))
    val yb = least(TextAnalysis.tokenCount(col("text")).cast("long"),
      lit(255L))
    Tables.documents(s, dir)
      .select(col("doc_id"), xb.as("x_bucket"), yb.as("y_bucket"),
        graft.ops.Scale.zOrderKey(xb, yb).as("zkey"))
  }

  /** Directed near-containment pairs at τ = 9/10 (q185) — the
    * excerpt/superset dedup lens Jaccard misses
    * ([[graft.llm.Dedup.containmentPairs]]). */
  def containmentPairsQ(s: SparkSession, dir: String): DataFrame =
    Dedup.containmentPairs(Tables.documents(s, dir), w = 3,
      tauNum = 9, tauDen = 10)

  /** Capped-substrate containment twin (q224) — q185's query with the
    * hot-shingle scale knob ENGAGED: `maxShingleDf = 64`, a cap the gate
    * corpus provably never reaches (measured max 3-shingle document
    * frequency is 9 / 7 / 25 at sf0.001 / 0.01 / 0.1), checked against
    * the UNCAPPED definitional oracle. A non-binding cap must change
    * nothing — so the green row IS the no-false-drop certificate for
    * the cap machinery (the anti-join substrate, the df computation,
    * the loud drop path) on the plan that would actually run at 100 TB,
    * where the cap DOES bind on boilerplate shingles. The q220
    * same-answer-different-plan device applied to the dedup scale knob;
    * PlanSpec locks that the capped plan really carries the df
    * aggregation + anti-join (this is not silently q185 again).
    */
  def containmentCappedQ(s: SparkSession, dir: String): DataFrame =
    Dedup.containmentPairs(Tables.documents(s, dir), w = 3,
      tauNum = 9, tauDen = 10, maxShingleDf = 64)

  /** Sorted-neighborhood blocking pairs (q186) — 24-char key, window 3,
    * exact-Jaccard verify at τ = 1/2
    * ([[graft.llm.Dedup.sortedNeighborhoodPairs]]); the output is the
    * q29 exact pair relation restricted to window-adjacent pairs, which
    * is what the oracle checks. */
  def sortedNeighborhoodQ(s: SparkSession, dir: String): DataFrame =
    Dedup.sortedNeighborhoodPairs(Tables.documents(s, dir), w = 3,
      window = 3, tauNum = 1, tauDen = 2, keyLen = 24)

  /** Source vocabulary-overlap matrix (q200) — the LEXICAL counterpart
    * of q87's duplication matrix: for every source pair, the exact
    * Jaccard of their distinct token vocabularies. Near-1 overlap
    * between supposedly independent sources is the classic sign of a
    * shared upstream crawl; near-0 flags a source whose tokenizer or
    * language diverges from the corpus. One (source, token) distinct
    * relation feeds sizes and both join sides; the pair relation is
    * token-keyed and the output is |sources|²-bounded.
    */
  def sourceVocabOverlap(s: SparkSession, dir: String): DataFrame = {
    val st = graft.core.CacheScope.track(
      Tables.documents(s, dir)
        .select(col("source"),
          explode(TextAnalysis.tokens(col("text"))).as("tok"))
        .distinct().persist())
    st.count() // eager: feeds sizes and both pair sides
    val sz = st.groupBy(col("source")).agg(count(lit(1)).as("n"))
    st.select(col("source").as("source_a"), col("tok"))
      .join(st.select(col("source").as("source_b"), col("tok")), Seq("tok"))
      .filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("inter"))
      .join(broadcast(sz.select(col("source").as("source_a"),
        col("n").as("__na"))), Seq("source_a"))
      .join(broadcast(sz.select(col("source").as("source_b"),
        col("n").as("__nb"))), Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("inter"),
        (col("__na") + col("__nb") - col("inter")).as("union_sz"))
      .withColumn("jaccard",
        col("inter").cast("double") / col("union_sz").cast("double"))
  }

  /** Padding-waste curve across candidate sequence lengths (q203) —
    * the pad-vs-pack audit ([[graft.llm.TextAnalysis.packingWaste]]). */
  def packingWasteQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.packingWaste(Tables.documents(s, dir))

  /** Crawl-over-crawl churn per source (q204): doc_id parity simulates
    * two ingest snapshots of the same corpus; exact-text membership
    * drives retained/removed/added ([[graft.llm.Dedup.snapshotDelta]]). */
  def crawlDeltaQ(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    Dedup.snapshotDelta(
      docs.filter(pmod(col("doc_id"), lit(2L)) === 0L),
      docs.filter(pmod(col("doc_id"), lit(2L)) === 1L))
  }

  /** Postings skew histogram (q205) — power-of-two df buckets
    * ([[graft.llm.Retrieval.postingsSkewHistogram]]). */
  def postingsSkewQ(s: SparkSession, dir: String): DataFrame =
    Retrieval.postingsSkewHistogram(Tables.documents(s, dir))

  /** Per-source winsorized length profile (q206)
    * ([[graft.llm.TextAnalysis.winsorizedLengthStats]]). */
  def winsorizedLengthsQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.winsorizedLengthStats(Tables.documents(s, dir))

  /** Vocabulary coverage curve at V ∈ {100, 1000, 10000} (q207)
    * ([[graft.llm.TextAnalysis.coverageCurve]]). */
  def coverageCurveQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.coverageCurve(Tables.documents(s, dir))

  /** Column null/blank profile of the documents table (q215) — the
    * load-time completeness audit: per string column, how many rows are
    * NULL and how many are non-null but blank after trim. One pass
    * (every counter lives in one aggregate row), then a literal
    * 3-struct explode pivots the row into (column, …) form — no
    * per-column rescans, no driver loop.
    */
  def docColumnProfile(s: SparkSession, dir: String): DataFrame = {
    val cols = Seq("text", "lang", "source")
    val aggs = cols.flatMap { c =>
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
        sum(when(col(c).isNotNull && trim(col(c)) === "", 1L)
          .otherwise(0L)).as(s"__blank_$c"))
    }
    Tables.documents(s, dir)
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
      .select(col("n_rows"), explode(array(cols.map(c =>
        struct(lit(c).as("column"), col(s"__null_$c").as("n_null"),
          col(s"__blank_$c").as("n_blank"))): _*)).as("__p"))
      .select(col("__p.column").as("column"), col("n_rows"),
        col("__p.n_null").as("n_null"), col("__p.n_blank").as("n_blank"),
        expr("(__p.n_null * 1000000) div nullif(n_rows, 0)")
          .as("null_ppm"))
  }

  /** Collocation mining by lift (q217) — the tokenizer/merge-rule
    * analyst's view of the corpus: the top-50 adjacent bigrams ranked
    * by `lift = N · c_xy / (c_x · c_y)` (how much more often the pair
    * co-occurs than independence predicts). PMI is `log` of this —
    * monotone, so the ranking is identical while the score stays ONE
    * IEEE division of exact integers (`log` is only correctly-rounded
    * per libm and can differ in the last ulp across engines). Bigram
    * substrate is the non-distinct w=2 shingle relation (multiplicity
    * matters for counts); rare-pair noise is floored at `minCount`.
    * Deterministic total order (lift desc, bigram) → the global top-50
    * lowers to TakeOrderedAndProject, never a full sort.
    *
    * 100 TB posture: two token-keyed aggregates (unigrams, bigrams),
    * two narrow joins of the bigram relation against the unigram
    * counts, one bounded top-k. The corpus crosses the shuffle as
    * (token, count) pairs only.
    */
  def collocations(s: SparkSession, dir: String,
                   k: Int = 50, minCount: Long = 5L): DataFrame = {
    val docs = Tables.documents(s, dir)
    val toked = docs.select(posexplode(
      TextAnalysis.tokens(col("text"))).as(Seq("pos", "tok")))
    val uni = toked.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val total = uni.agg(sum(col("c")).as("n_tokens"))
    val bi = graft.llm.Dedup.shingles(docs, 2, distinct = false)
      .filter(col("shingle").isNotNull)
      .groupBy(col("shingle")).agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= minCount)
      // substring_index, not split(...)(1): the join pushes derived
      // key predicates below the shingle-completeness filter, where a
      // 1-token shingle makes the ANSI array index error; this form is
      // total on any input
      .withColumn("__x", substring_index(col("shingle"), " ", 1))
      .withColumn("__y", substring_index(col("shingle"), " ", -1))
    bi.join(uni.select(col("tok").as("__x"), col("c").as("c_x")), Seq("__x"))
      .join(uni.select(col("tok").as("__y"), col("c").as("c_y")), Seq("__y"))
      .crossJoin(broadcast(total))
      .select(col("shingle").as("bigram"), col("c_xy"), col("c_x"),
        col("c_y"),
        ((col("n_tokens") * col("c_xy")).cast("double") /
          (col("c_x") * col("c_y")).cast("double")).as("lift"))
      .orderBy(col("lift").desc, col("bigram"))
      .limit(k)
  }

  /** Stratum-mix contingency audit (q223) — is language independent of
    * source, or does one crawl skew the mix? Per (lang, source) cell:
    * the observed count and its ratio to the independence expectation
    * `n_lang·n_source/N`, as the exact integer
    * `obs·N·10⁶ div (n_lang·n_source)` — 10⁶ means the cell holds
    * exactly its independence share; the deviations are the
    * mix-drift signal a χ² would aggregate (kept per-cell and exact
    * instead: which stratum drifted matters more than one number).
    *
    * 100 TB posture: one map-side-combined pair aggregate; margins are
    * two ≤|strata|-row aggregates broadcast back; N is the 1-row
    * crossJoin idiom. The corpus crosses the shuffle once as
    * (lang, source) pairs.
    */
  def stratumMixAudit(s: SparkSession, dir: String): DataFrame = {
    val pairs = Tables.documents(s, dir)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"))
    val langs = pairs.groupBy(col("lang"))
      .agg(sum(col("n_docs")).as("n_lang"))
    val sources = pairs.groupBy(col("source"))
      .agg(sum(col("n_docs")).as("n_source"))
    val total = pairs.agg(sum(col("n_docs")).as("__n"))
    pairs.join(broadcast(langs), Seq("lang"))
      .join(broadcast(sources), Seq("source"))
      .crossJoin(broadcast(total))
      .select(col("lang"), col("source"), col("n_docs"), col("n_lang"),
        col("n_source"),
        // DECIMAL(38,0) numerator/denominator: n_docs·N·10⁶ wraps a
        // BIGINT silently in Spark (non-ANSI) at n_docs·N > ~9.2e18
        // while DuckDB errors — the engines would diverge instead of
        // both failing loud. Scale-0 decimals keep `div` exact integer
        // arithmetic on both (DuckDB computes in HUGEINT). The
        // loud/silent asymmetry doesn't vanish — past 38 digits Spark
        // non-ANSI decimal overflow returns NULL while DuckDB errors —
        // but the widening moves that wrap point beyond any reachable
        // corpus (~10¹⁶ docs before the product nears 10³⁸).
        expr("(cast(n_docs as decimal(38,0)) * __n * 1000000) div " +
          "(cast(n_lang as decimal(38,0)) * n_source)").as("ratio_ppm"))
  }

  val queries: Map[String, Q] = Map(
    "q223_stratum_mix" -> stratumMixAudit,
    "q217_collocations" -> ((s: SparkSession, d: String) =>
      collocations(s, d)),
    "q215_doc_column_profile" -> docColumnProfile,
    "q203_packing_waste" -> packingWasteQ,
    "q204_crawl_delta" -> crawlDeltaQ,
    "q205_postings_skew" -> postingsSkewQ,
    "q206_winsorized_lengths" -> winsorizedLengthsQ,
    "q207_coverage_curve" -> coverageCurveQ,
    "q200_source_vocab_overlap" -> sourceVocabOverlap,
    "q185_containment_pairs" -> containmentPairsQ,
    "q224_containment_capped" -> containmentCappedQ,
    "q186_sorted_neighborhood" -> sortedNeighborhoodQ,
    "q135_novelty_score" -> noveltyScoreQ,
    "q136_zorder_key" -> zorderLayout,
    "q49_scrub" -> scrubStats,
    "q50_repetition" -> repetition,
    "q44_props_map" -> propsMap,
    "q42_embedding_dedup" -> embeddingDedup,
    "q28_dedup_exact" -> dedupExact,
    "q29_jaccard_pairs" -> jaccardPairs,
    "q152_prefix_jaccard" -> prefixJaccardPairs,
    "q30_minhash_dedup" -> minhashDedup,
    "q31_simhash_pairs" -> simhashPairs,
    "q172_edit_dedup" -> editDistanceDedup,
    "q32_knn_brute" -> knnBrute,
    "q33_knn_lsh" -> knnLsh,
    "q34_text_stats" -> textStats,
    "q35_lang_id" -> langId,
    "q36_quality_score" -> qualityScore,
    "q230_preference_pairs" -> preferencePairs,
    "q37_fingerprint" -> fingerprint,
    "q38_multimodal_meta" -> multimodalMeta,
    "q51_dedup_clusters" -> dedupClusters,
    "q52_knn_ivf" -> knnIvf,
    "q53_top_terms" -> topTerms,
    "q54_label_centroids" -> labelCentroids,
    "q55_data_split" -> dataSplit,
    "q56_seq_packing" -> seqPacking,
    "q57_quant_stats" -> quantStats,
    "q58_perceptual_hash" -> perceptualHashes,
    "q59_heavy_hitters" -> heavyHitters,
    "q61_contamination" -> contamination,
    "q62_boilerplate" -> boilerplate,
    "q63_mixture_sample" -> mixtureSample,
    "q240_weighted_sample" -> weightedSampleQ,
    "q241_mixture_upsample" -> mixtureUpsampleQ,
    "q242_perplexity_buckets" -> perplexityBucketsQ,
    "q243_weighted_sample_grouped" -> weightedSamplePerLangQ,
    "q244_url_dedup" -> urlCanonicalDedupQ,
    "q246_gopher_repetition" -> gopherRepetition,
    "q247_curation_gopher" -> curationGopher,
    "q64_source_cap" -> sourceCap,
    "q65_lm_surprisal" -> lmSurprisal,
    "q66_incremental_dedup" -> incrementalDedup,
    "q67_chunk_dedup" -> chunkDedup,
    "q68_knn_pq" -> knnPq,
    "q69_corpus_shuffle" -> corpusShuffle,
    "q70_random_projection" -> randomProjection,
    "q71_corpus_cube" -> corpusCube,
    "q72_knn_ivfpq" -> knnIvfPq,
    "q73_pair_audit" -> pairAudit,
    "q74_chunk_rewrite" -> chunkRewrite,
    "q75_lm_bigram" -> lmBigram,
    "q76_embedding_clusters" -> embeddingClusters,
    "q77_quality_classifier" -> qualityClassifier,
    "q78_subword_vocab" -> subwordVocab,
    "q79_data_quality" -> dataQuality,
    "q80_bm25_topk" -> bm25TopK,
    "q81_rrf_fusion" -> rrfFusion,
    "q82_substring_rewrite" -> substringRewrite,
    "q83_bm25_stored" -> bm25Stored,
    "q84_nearest_centroid" -> nearestCentroid,
    "q85_token_percentiles" -> tokenPercentiles,
    "q86_hybrid_stored" -> hybridStored,
    "q87_dup_source_matrix" -> dupSourceMatrix,
    "q88_best_of_cluster" -> bestOfCluster,
    "q89_length_tail_trim" -> lengthTailTrim,
    "q90_kmeans" -> kmeansClusters,
    "q91_quality_buckets" -> qualityBuckets,
    "q92_mixture_weights" -> sourceMixtureWeights,
    "q93_cluster_sizes" -> clusterSizeHistogram,
    "q94_pair_histogram" -> pairScoreHistogram,
    "q95_semantic_keep" -> semanticBestOfCluster,
    "q96_curation_e2e" -> curationE2E,
    "q97_mixture_weighted" -> mixtureWeighted,
    "q98_hard_negatives" -> hardNegativesQ,
    "q99_source_divergence" -> sourceDivergence,
    "q100_mmr_rerank" -> mmrRerankQ,
    "q101_leakage_safe_split" -> leakageSafeSplitQ,
    "q102_decontaminate" -> decontaminate,
    "q103_token_budget" -> tokenBudget,
    "q104_dsir_select" -> dsirSelect,
    "q105_curriculum_order" -> curriculumOrderQ,
    "q106_phrase_mining" -> phraseMiningQ,
    "q107_ngram_novelty" -> ngramNoveltyQ,
    "q108_training_layout" -> trainingLayoutQ,
    "q109_gopher_rules" -> gopherRulesQ,
    "q110_crop_pairs" -> cropPairsQ,
    "q111_cdc_dedup" -> cdcDedupQ,
    "q112_winnow_pairs" -> winnowPairsQ,
    "q113_bpe_segment" -> bpeSegment,
    "q114_vocab_coverage" -> vocabCoverageQ,
    "q115_blocklist_filter" -> blocklistFilterQ,
    "q116_stratified_split" -> stratifiedSplitQ,
    "q117_bpe_fertility" -> bpeFertilityQ,
    "q118_bpe_packing" -> bpePackingQ,
    "q119_cluster_cap" -> clusterCapQ,
    "q120_source_health" -> sourceHealthQ,
    "q121_bpe_encode" -> bpeEncodeQ,
    "q122_packed_batches" -> packedBatchesQ,
    "q127_embedding_audit" -> embeddingAudit)

  // must match TextAnalysis.tokens (split on \s+, not just ' ') — the gate
  // corpus is single-space text so both agree today, but a fixture with
  // tabs/newlines would silently diverge with the narrower split
  private[queries] val toksSql =
    "list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')"
  private[queries] val stopSql = "['the','a','an','and','or','of','to','in','is','it']"

  // q113/q115 literals interpolated from the SAME Scala values the Spark
  // plans broadcast/fold, so query and oracle cannot drift
  private val bpeMergesSql = TextAnalysis.FrozenBpeMerges.zipWithIndex
    .map { case ((l, r), i) => s"($i, '$l', '$r')" }.mkString(", ")
  private val bpeNumMerges = TextAnalysis.FrozenBpeMerges.length

  /** The shared q113-family segmentation recursion: distinct vocabulary →
    * apply-in-order via repeated FIRST-occurrence replace (provably the
    * leftmost single-pass merge; see q113's note). Emits CTEs
    * `occ$tag (doc_id[, extra cols], w)`, `seg$tag`, and
    * `p$tag (w, np)`; callers append their own aggregation. */
  private def bpeSegCtes(tag: String, occExtra: String = ""): String =
    s"""mg(rank, l, r) AS (VALUES $bpeMergesSql),
      |occ$tag AS (SELECT doc_id,$occExtra unnest($toksSql) AS w
      |            FROM documents),
      |voc$tag AS (SELECT DISTINCT w FROM occ$tag),
      |seg$tag AS (
      |  SELECT w, ' ' || array_to_string(split(w, ''), ' ') || ' ' AS s,
      |         0 AS idx
      |  FROM voc$tag
      |  UNION ALL
      |  SELECT w, CASE WHEN rep <> s THEN rep ELSE s END,
      |         CASE WHEN rep <> s THEN idx ELSE idx + 1 END
      |  FROM (SELECT seg$tag.w, seg$tag.s, seg$tag.idx,
      |               regexp_replace(seg$tag.s,
      |                 ' ' || mg.l || ' ' || mg.r || ' ',
      |                 ' ' || mg.l || mg.r || ' ') AS rep
      |        FROM seg$tag JOIN mg ON mg.rank = seg$tag.idx)
      |  WHERE idx < $bpeNumMerges),
      |p$tag AS (SELECT w, len(split(s, ' ')) - 2 AS np
      |          FROM seg$tag WHERE idx = $bpeNumMerges)""".stripMargin
  private val blocklistSql = TextAnalysis.BlocklistTerms.sorted
    .map(t => s"'$t'").mkString("[", ", ", "]")
  private val bpePieceVocabSql = TextAnalysis.bpePieceVocab().zipWithIndex
    .map { case (p, i) => s"($i, '$p')" }.mkString(", ")

  /** Shared CTE chain computing the exact 3-gram Jaccard pair relation at
    * threshold `tau` — body of the q29/q30 oracle, the pair generator
    * inside the q51 cluster oracle, and (at τ = 0.1) the q94 tuning
    * histogram. The literal interpolates via Double.toString, the same
    * round-trip as the Spark filter's. */
  private def jaccardCtesTau(tau: Double): String =
    s"""toks AS (SELECT doc_id, $toksSql AS w FROM documents),
      |sh AS (SELECT DISTINCT doc_id,
      |         w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
      |       FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)
      |       WHERE len(w) >= 3),
      |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
      |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
      |          FROM sh a JOIN sh b
      |            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2),
      |jpairs AS (SELECT id_a, id_b,
      |             CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) AS jaccard
      |           FROM inter
      |           JOIN sizes sa ON id_a = sa.doc_id
      |           JOIN sizes sb ON id_b = sb.doc_id
      |           WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= ${tau.toString})""".stripMargin

  private val jaccardCtes: String = jaccardCtesTau(0.5)

  /** q29's exact-Jaccard oracle, shared by q30: the MinHash-LSH path
    * verifies every candidate with the same exact jaccard expression, and
    * its banding parameters are recall-1.0-tuned (LlmOpsSpec), so the two
    * queries emit identical relations. */
  private val jaccardOracleSql: String =
    s"""WITH $jaccardCtes
      |SELECT id_a, id_b, jaccard FROM jpairs""".stripMargin

  /** The q51 cluster CTE chain (jaccard pairs → symmetric edges →
    * recursive reachability → min-reachable label), shared by the q51
    * oracle and the q88 best-of-cluster oracle. */
  private val clusterCtes: String =
    s"""$jaccardCtes,
      |edges AS (SELECT id_a AS src, id_b AS dst FROM jpairs
      |          UNION ALL
      |          SELECT id_b AS src, id_a AS dst FROM jpairs),
      |reach AS (SELECT doc_id AS id, doc_id AS r FROM documents
      |          UNION
      |          SELECT e.dst AS id, reach.r AS r
      |          FROM edges e JOIN reach ON e.src = reach.id),
      |clx AS (SELECT id AS doc_id, MIN(r) AS cluster_id
      |        FROM reach GROUP BY id)""".stripMargin

  /** q51's oracle: min reachable doc_id over the jaccard pair graph via a
    * recursive CTE (UNION dedup terminates the fixpoint) — the declarative
    * twin of the hash-min label propagation. */
  private val clusterOracleSql: String =
    s"""WITH RECURSIVE $clusterCtes
      |SELECT doc_id, cluster_id FROM clx""".stripMargin

  /** q36's quality-feature CTE chain (token features → composite score),
    * shared by the q36 oracle and the q88 best-of-cluster oracle. The
    * score is a sum of exact double literals gated by ratio comparisons
    * whose operands are computed with the identical operations on both
    * engines — cross-engine exact, so it can drive an argmax. */
  private val qualityCtes: String =
    s"""qf AS (SELECT doc_id, $toksSql AS w, text FROM documents),
      |qfeat AS (SELECT doc_id,
      |  len(w) AS n_tokens,
      |  CAST(list_aggregate(list_transform(w, x -> length(x)), 'sum') AS DOUBLE)
      |    / GREATEST(len(w), 1) AS mean_token_len,
      |  CAST(length(regexp_replace(text, '[^.,;:!?''"()]', '', 'g')) AS DOUBLE)
      |    / GREATEST(length(text), 1) AS punct_ratio,
      |  CAST(len(list_filter(w, x -> list_contains($stopSql, x))) AS DOUBLE)
      |    / GREATEST(len(w), 1) AS stopword_ratio
      |FROM qf),
      |qsc AS (SELECT doc_id, n_tokens, mean_token_len, punct_ratio,
      |  stopword_ratio,
      |  (CASE WHEN n_tokens BETWEEN 10 AND 1000 THEN 0.4 ELSE 0.0 END
      |   + CASE WHEN stopword_ratio > 0.01 THEN 0.3 ELSE 0.0 END)
      |   + CASE WHEN punct_ratio < 0.2 THEN 0.3 ELSE 0.0 END AS quality_score
      |FROM qfeat)""".stripMargin

  /** q32's brute-force oracle, shared by q33: the LSH table/plane parameters
    * are recall-1.0-tuned (LlmOpsSpec), so approximate top-k equals exact
    * top-k on the probe set. */
  private val knnOracleSql: String =
    """WITH q AS (SELECT vec_id AS query_id, embedding AS qe
      |           FROM embeddings WHERE vec_id < 10),
      |c AS (SELECT vec_id AS neighbor_id, embedding AS ce FROM embeddings),
      |dots AS (SELECT query_id, neighbor_id,
      |           SUM(CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE)) AS dp,
      |           SQRT(SUM(CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE))) AS nq,
      |           SQRT(SUM(CAST(ce[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE))) AS nc
      |         FROM q, c, UNNEST(range(1, len(qe) + 1)) AS t(i)
      |         WHERE query_id <> neighbor_id
      |         GROUP BY query_id, neighbor_id)
      |SELECT query_id, neighbor_id, ROUND(dp / (nq * nc), 6) AS score,
      |       ROW_NUMBER() OVER (PARTITION BY query_id
      |                          ORDER BY dp / (nq * nc) DESC, neighbor_id) AS rnk
      |FROM dots QUALIFY rnk <= 5""".stripMargin

  /** The q98 oracle: the knn CTE chain with the τ exclusion applied
    * BEFORE the rank — near-dup rows (cos ≥ 0.45, the q42 relation) never
    * occupy negative slots, exactly the Spark filter-then-top-k order. */
  private val hardNegOracleSql: String =
    """WITH q AS (SELECT vec_id AS query_id, embedding AS qe
      |           FROM embeddings WHERE vec_id < 10),
      |c AS (SELECT vec_id AS neighbor_id, embedding AS ce FROM embeddings),
      |dots AS (SELECT query_id, neighbor_id,
      |           SUM(CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE)) AS dp,
      |           SQRT(SUM(CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE))) AS nq,
      |           SQRT(SUM(CAST(ce[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE))) AS nc
      |         FROM q, c, UNNEST(range(1, len(qe) + 1)) AS t(i)
      |         WHERE query_id <> neighbor_id
      |         GROUP BY query_id, neighbor_id),
      |neg AS (SELECT query_id, neighbor_id, dp / (nq * nc) AS cos
      |        FROM dots WHERE dp / (nq * nc) < 0.45)
      |SELECT query_id, neighbor_id, ROUND(cos, 6) AS score,
      |       ROW_NUMBER() OVER (PARTITION BY query_id
      |                          ORDER BY cos DESC, neighbor_id) AS rnk
      |FROM neg QUALIFY rnk <= 5""".stripMargin

  /** The q100 oracle: the brute top-20 candidate CTE (rel = 1e-6-rounded
    * cosine, the Spark side's exact operand), the rounded pairwise-sim
    * grid, then the k greedy MMR selection steps UNROLLED as chained CTEs
    * — each step ranks λ·rel − μ·maxsim (μ interpolated from the same
    * `1.0 - λ` double the Spark loop computes, Double.toString
    * round-trip) and picks rnk = 1 with ties to the smaller id. */
  private def mmrOracleSql(k: Int, lambda: Double): String = {
    val lam = lambda.toString
    val mu = (1.0 - lambda).toString
    val base =
      """qm AS (SELECT vec_id AS query_id, embedding AS qe
        |       FROM embeddings WHERE vec_id < 5),
        |cm AS (SELECT vec_id AS neighbor_id, embedding AS ce
        |       FROM embeddings),
        |dotm AS (SELECT query_id, neighbor_id,
        |           SUM(CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE)) AS dp,
        |           SQRT(SUM(CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE))) AS nq,
        |           SQRT(SUM(CAST(ce[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE))) AS nc
        |         FROM qm, cm, UNNEST(range(1, len(qe) + 1)) AS t(i)
        |         WHERE query_id <> neighbor_id
        |         GROUP BY query_id, neighbor_id),
        |candm AS (SELECT query_id, neighbor_id, ROUND(dp / (nq * nc), 6) AS rel
        |          FROM (SELECT query_id, neighbor_id, dp, nq, nc,
        |                  ROW_NUMBER() OVER (PARTITION BY query_id
        |                    ORDER BY dp / (nq * nc) DESC, neighbor_id) AS r
        |                FROM dotm) WHERE r <= 20),
        |cvm AS (SELECT c.query_id, c.neighbor_id, c.rel, e.embedding AS v
        |        FROM candm c JOIN embeddings e ON e.vec_id = c.neighbor_id),
        |simm AS (SELECT a.query_id, a.neighbor_id AS id_a,
        |           b.neighbor_id AS id_b,
        |           ROUND(SUM(CAST(a.v[i] AS DOUBLE) * CAST(b.v[i] AS DOUBLE)) /
        |             (SQRT(SUM(CAST(a.v[i] AS DOUBLE) * CAST(a.v[i] AS DOUBLE))) *
        |              SQRT(SUM(CAST(b.v[i] AS DOUBLE) * CAST(b.v[i] AS DOUBLE)))),
        |             6) AS sim
        |         FROM cvm a JOIN cvm b
        |           ON a.query_id = b.query_id
        |          AND a.neighbor_id <> b.neighbor_id,
        |           UNNEST(range(1, len(a.v) + 1)) AS t(i)
        |         GROUP BY a.query_id, a.neighbor_id, b.neighbor_id),
        |sel1 AS (SELECT query_id, neighbor_id, $LAM * rel AS mmr, 1 AS rnk
        |         FROM (SELECT query_id, neighbor_id, rel,
        |                 ROW_NUMBER() OVER (PARTITION BY query_id
        |                   ORDER BY rel DESC, neighbor_id) AS rr
        |               FROM candm) WHERE rr = 1),
        |rem1 AS (SELECT c.query_id, c.neighbor_id, c.rel FROM candm c
        |         LEFT JOIN sel1 s ON s.query_id = c.query_id
        |           AND s.neighbor_id = c.neighbor_id
        |         WHERE s.neighbor_id IS NULL)""".stripMargin
        .replace("$LAM", lam)
    val steps = (2 to k).map { i =>
      val p = i - 1
      s"""ms$i AS (SELECT r.query_id, r.neighbor_id, r.rel,
        |          MAX(m.sim) AS maxsim
        |        FROM rem$p r JOIN simm m ON m.query_id = r.query_id
        |          AND m.id_a = r.neighbor_id
        |          JOIN sel$p s ON s.query_id = m.query_id
        |          AND s.neighbor_id = m.id_b
        |        GROUP BY r.query_id, r.neighbor_id, r.rel),
        |pick$i AS (SELECT query_id, neighbor_id,
        |            $lam * rel - $mu * maxsim AS mmr, $i AS rnk
        |          FROM (SELECT query_id, neighbor_id, rel, maxsim,
        |                  ROW_NUMBER() OVER (PARTITION BY query_id
        |                    ORDER BY $lam * rel - $mu * maxsim DESC,
        |                      neighbor_id) AS rr
        |                FROM ms$i) WHERE rr = 1),
        |sel$i AS (SELECT * FROM sel$p UNION ALL SELECT * FROM pick$i),
        |rem$i AS (SELECT r.query_id, r.neighbor_id, r.rel FROM rem$p r
        |          LEFT JOIN pick$i p ON p.query_id = r.query_id
        |            AND p.neighbor_id = r.neighbor_id
        |          WHERE p.neighbor_id IS NULL)""".stripMargin
    }.mkString(",\n")
    s"""WITH $base,
      |$steps
      |SELECT query_id, neighbor_id,
      |  FLOOR(mmr * 1000000.0 + 0.5) / 1000000.0 AS mmr_score,
      |  CAST(rnk AS BIGINT) AS rnk
      |FROM sel$k""".stripMargin
  }

  /** q80/q81's BM25 pipeline CTE chain — query terms, k1/b parameters, and
    * the association order of every float operation interpolated from the
    * SAME constants the Spark plan uses (Retrieval.DefaultQueries/K1/B), so
    * plan and oracle cannot drift. Every float op is an IEEE-exact
    * `+ - * /` (odds idf — no libm log), and the per-(query, doc) term sum
    * mirrors Retrieval's ordered fold (sort the (term, contribution)
    * structs, left-fold the sum) — bit-identical without rounding. */
  private val bm25Ctes: String = {
    val qvals = Retrieval.DefaultQueries.flatMap { case (qid, ts) =>
      ts.distinct.map(t => s"($qid, '$t')")
    }.mkString(", ")
    val terms = Retrieval.DefaultQueries.flatMap(_._2).distinct
      .map(t => s"'$t'").mkString(", ")
    // Double.toString round-trips exactly, so DuckDB parses the identical
    // doubles the Spark literals hold (the q70 planes precedent)
    val k1 = Retrieval.DefaultK1.toString
    val k1p1 = (Retrieval.DefaultK1 + 1.0).toString
    val bP = Retrieval.DefaultB.toString
    val oneMb = (1.0 - Retrieval.DefaultB).toString
    s"""qz(query_id, tok) AS (VALUES $qvals),
      |tz AS (SELECT doc_id, $toksSql AS w FROM documents),
      |stz AS (SELECT COUNT(*) AS n_docs,
      |          CAST(SUM(COALESCE(len(w), 0)) AS BIGINT) AS tot FROM tz),
      |occz AS (SELECT doc_id, COALESCE(len(w), 0) AS dl, unnest(w) AS tok
      |         FROM tz),
      |tfz AS (SELECT doc_id, dl, tok, COUNT(*) AS tf FROM occz
      |        WHERE tok IN ($terms) GROUP BY 1, 2, 3),
      |dfz AS (SELECT tok, COUNT(*) AS df FROM tfz GROUP BY 1),
      |scz AS (SELECT query_id, doc_id, tok,
      |          ((CAST(n_docs - df AS DOUBLE) + 0.5) /
      |           (CAST(df AS DOUBLE) + 0.5)) *
      |          ((CAST(tf AS DOUBLE) * $k1p1) /
      |           (CAST(tf AS DOUBLE) + $k1 * ($oneMb + $bP *
      |            (CAST(dl AS DOUBLE) /
      |             (CAST(tot AS DOUBLE) / CAST(n_docs AS DOUBLE)))))) AS contrib
      |        FROM tfz JOIN dfz USING (tok) JOIN qz USING (tok)
      |        CROSS JOIN stz),
      |agz AS (SELECT query_id, doc_id,
      |          list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |            list_transform(
      |              list_sort(list(struct_pack(t := tok, c := contrib))),
      |              s -> s.c)),
      |            (a, b) -> a + b) AS score
      |        FROM scz GROUP BY 1, 2),
      |spz AS (SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, score,
      |          CAST(ROW_NUMBER() OVER (PARTITION BY query_id
      |                 ORDER BY score DESC, doc_id) AS BIGINT) AS rnk
      |        FROM agz QUALIFY rnk <= 10)""".stripMargin
  }

  /** The q80/q83 oracle: the BM25 CTE chain's final top-10 relation. */
  private lazy val bm25OracleSql: String =
    s"""WITH $bm25Ctes
      |SELECT query_id, doc_id, score, rnk FROM spz""".stripMargin

  /** The q81/q86 oracle: BM25 CTEs + exact-cosine dense CTE + full-outer
    * reciprocal-rank fusion. */
  private lazy val rrfOracleSql: String =
    s"""WITH $bm25Ctes,
      |qdz AS (SELECT vec_id AS query_id, embedding AS qe
      |        FROM embeddings WHERE vec_id < 5),
      |cdz AS (SELECT vec_id AS neighbor_id, embedding AS ce
      |        FROM embeddings),
      |dotz AS (SELECT query_id, neighbor_id,
      |           SUM(CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE)) AS dp,
      |           SQRT(SUM(CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)))
      |             AS nq,
      |           SQRT(SUM(CAST(ce[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE)))
      |             AS nc
      |         FROM qdz, cdz, UNNEST(range(1, len(qe) + 1)) AS t(i)
      |         WHERE query_id <> neighbor_id
      |         GROUP BY query_id, neighbor_id),
      |dnz AS (SELECT query_id, neighbor_id AS doc_id,
      |          CAST(ROW_NUMBER() OVER (PARTITION BY query_id
      |                 ORDER BY dp / (nq * nc) DESC, neighbor_id)
      |               AS BIGINT) AS rnk
      |        FROM dotz QUALIFY rnk <= 10),
      |fuz AS (SELECT COALESCE(spz.query_id, dnz.query_id) AS query_id,
      |          COALESCE(spz.doc_id, dnz.doc_id) AS doc_id,
      |          CAST(COALESCE(spz.rnk, 0) AS BIGINT) AS rnk_0,
      |          CAST(COALESCE(dnz.rnk, 0) AS BIGINT) AS rnk_1,
      |          COALESCE(1.0 / (60.0 + CAST(spz.rnk AS DOUBLE)), 0.0) +
      |          COALESCE(1.0 / (60.0 + CAST(dnz.rnk AS DOUBLE)), 0.0)
      |            AS rrf
      |        FROM spz FULL OUTER JOIN dnz
      |          ON spz.query_id = dnz.query_id AND spz.doc_id = dnz.doc_id)
      |SELECT query_id, doc_id, rnk_0, rnk_1, rrf,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id
      |         ORDER BY rrf DESC, doc_id) AS BIGINT) AS rnk
      |FROM fuz QUALIFY rnk <= 10""".stripMargin

  /** Shared 5-gram shingle CTE (q61/q62): w[i..i+4] over the token array,
    * complete shingles only — matches Dedup.shingles(w = 5). */
  private val sh5Ctes: String =
    s"""toks5 AS (SELECT doc_id, $toksSql AS w FROM documents),
      |sh5 AS (SELECT doc_id,
      |    w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] AS shingle
      |  FROM toks5, UNNEST(range(1, len(w) - 3)) AS t(i)
      |  WHERE len(w) >= 5)""".stripMargin

  /** The portable mod-2^57 rolling-hash fold over `input`'s chars — DuckDB
    * twin of TextAnalysis.fingerprint (q37/q55/q61/q63-proven). */
  private[queries] def fpSql(input: String): String =
    s"""list_reduce(
      |    list_prepend(CAST(0 AS BIGINT),
      |                 list_transform(string_split($input, ''),
      |                                ch -> CAST(ascii(ch) AS BIGINT))),
      |    (a, b) -> (a * 31 + b) % 144115188075855872)""".stripMargin

  /** q61/q66's content-hash split CTEs (fingerprint bucket → train/val/test). */
  private val splitCtes: String =
    s"""fp2 AS (SELECT doc_id, ${fpSql("text")} % 100 AS bucket
      |  FROM documents),
      |spl2 AS (SELECT doc_id,
      |  CASE WHEN bucket < 80 THEN 'train'
      |       WHEN bucket < 90 THEN 'val'
      |       ELSE 'test' END AS split FROM fp2)""".stripMargin

  /** The q76 embedding-cluster CTE chain (exact cosine pairs at τ = 0.45 →
    * symmetric edges → recursive reachability → min-reachable label),
    * shared by the q76 oracle and the q95 semantic-retention oracle. */
  private val embClusterCtes: String =
    """v AS (SELECT vec_id, embedding AS e FROM embeddings),
      |dots AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |           SUM(CAST(a.e[i] AS DOUBLE) * CAST(b.e[i] AS DOUBLE)) AS dp,
      |           SQRT(SUM(CAST(a.e[i] AS DOUBLE) * CAST(a.e[i] AS DOUBLE))) AS na,
      |           SQRT(SUM(CAST(b.e[i] AS DOUBLE) * CAST(b.e[i] AS DOUBLE))) AS nb
      |         FROM v a, v b, UNNEST(range(1, len(a.e) + 1)) AS t(i)
      |         WHERE a.vec_id < b.vec_id
      |         GROUP BY a.vec_id, b.vec_id),
      |epairs AS (SELECT id_a, id_b FROM dots WHERE dp / (na * nb) >= 0.45),
      |eedges AS (SELECT id_a AS src, id_b AS dst FROM epairs
      |           UNION ALL
      |           SELECT id_b AS src, id_a AS dst FROM epairs),
      |ereach AS (SELECT vec_id AS id, vec_id AS r FROM embeddings
      |           UNION
      |           SELECT e.dst AS id, ereach.r AS r
      |           FROM eedges e JOIN ereach ON e.src = ereach.id),
      |eclx AS (SELECT id AS vec_id, MIN(r) AS cluster_id
      |         FROM ereach GROUP BY id)""".stripMargin

  /** The q65 unigram-surprisal CTE chain (token occurrences → doc tf →
    * corpus counts → whole-bit surprisal per doc), shared by the q65
    * oracle and the q91 bucket oracle. `xent_bits` is ONE division of
    * exact integers — cross-engine exact. */
  private val surprisalCtes: String =
    s"""occ AS (SELECT doc_id, unnest($toksSql) AS token
      |             FROM documents),
      |tfx AS (SELECT doc_id, token, COUNT(*) AS tf FROM occ GROUP BY 1, 2),
      |cx AS (SELECT token, SUM(tf) AS c FROM tfx GROUP BY 1),
      |nx AS (SELECT SUM(c) AS n_total FROM cx),
      |surx AS (SELECT tfx.doc_id,
      |    CAST(SUM(tfx.tf) AS BIGINT) AS n_tokens,
      |    CAST(SUM(tfx.tf * (length(bin(CAST(n_total // c AS BIGINT))) - 1))
      |      AS BIGINT) AS sum_bits,
      |    CAST(SUM(tfx.tf * (length(bin(CAST(n_total // c AS BIGINT))) - 1))
      |      AS DOUBLE) / SUM(tfx.tf) AS xent_bits
      |  FROM tfx JOIN cx USING (token) CROSS JOIN nx
      |  GROUP BY tfx.doc_id)""".stripMargin

  /** The q90 k-means oracle, generated per round so the CTE chain IS the
    * Spark loop: seeds = raw widened dims of ids 0..k−1; round r ranks
    * each vector's cosine against the round's centroids (unrounded, ties
    * to the larger cid — the max-struct order) and recomputes means
    * ROUND(…, 6); the final select re-ranks under the last centroids and
    * emits the rounded winning score. */
  private def kmeansOracleSql(k: Int, iters: Int): String = {
    val rounds = (0 until iters).map { r =>
      s"""cn$r AS (SELECT cid, SQRT(SUM(mu * mu)) AS nc FROM c$r GROUP BY 1),
        |dp$r AS (SELECT ev.vec_id, c$r.cid, SUM(ev.e * c$r.mu) AS d
        |         FROM ev JOIN c$r USING (i) GROUP BY 1, 2),
        |as$r AS (SELECT vec_id, cid FROM dp$r
        |         JOIN vn USING (vec_id) JOIN cn$r USING (cid)
        |         QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
        |           ORDER BY ROUND(d / (nv * nc), 6) DESC, cid DESC) = 1),
        |c${r + 1} AS (SELECT cid, i, ROUND(SUM(e) / COUNT(*), 6) AS mu
        |         FROM ev JOIN as$r USING (vec_id) GROUP BY cid, i)""".stripMargin
    }.mkString(",\n")
    s"""WITH ev AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS e
      |  FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)),
      |vn AS (SELECT vec_id, SQRT(SUM(e * e)) AS nv FROM ev GROUP BY 1),
      |c0 AS (SELECT vec_id AS cid, i, e AS mu FROM ev WHERE vec_id < $k),
      |$rounds,
      |cnF AS (SELECT cid, SQRT(SUM(mu * mu)) AS nc FROM c$iters GROUP BY 1),
      |dpF AS (SELECT ev.vec_id, c$iters.cid, SUM(ev.e * c$iters.mu) AS d
      |        FROM ev JOIN c$iters USING (i) GROUP BY 1, 2)
      |SELECT vec_id, cid AS cluster_id, ROUND(d / (nv * nc), 6) AS score
      |FROM dpF JOIN vn USING (vec_id) JOIN cnF USING (cid)
      |QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
      |  ORDER BY ROUND(d / (nv * nc), 6) DESC, cid DESC) = 1""".stripMargin
  }

  /** q70's plane constants, interpolated into the oracle as exact decimal
    * round-trips of the float-valued literals the Spark plan uses (printed
    * via Double.toString of the widened float, so DuckDB parses the
    * identical double). */
  private def planesValuesSql: String =
    Similarity.projectionPlanes(16).zipWithIndex.map { case (p, j) =>
      s"($j, [${p.map(v => v.toDouble.toString).mkString(", ")}])"
    }.mkString(",\n|    ")

  /** The q136 interleave, generated from the same bit arithmetic the
    * Spark expression folds (powers of two interpolated as integer
    * literals, so query and oracle cannot drift). */
  private val zorderTermsSql: String = (0 until 8).map { b =>
    s"((xb // ${1L << b}) % 2) * ${1L << (2 * b)} + " +
      s"((yb // ${1L << b}) % 2) * ${1L << (2 * b + 1)}"
  }.mkString(" + ")

  /** q205's CASE ladder, generated from the SAME bucket floors the
    * Spark expression folds over ([[graft.llm.Retrieval.DfBucketFloors]])
    * — edges cannot drift between engines. */
  private def dfBucketCaseSql: String =
    Retrieval.DfBucketFloors.tail.reverse
      .map(f => s"WHEN df >= $f THEN $f")
      .mkString("CASE ", " ", s" ELSE ${Retrieval.DfBucketFloors.head} END")

  // shared by q185 (uncapped) and q224 (capped, cap non-binding at gate
  // scales): one definitional SQL, two Spark plans
  private val containmentOracle: String =
    s"""WITH toks AS (SELECT doc_id, $toksSql AS w FROM documents),
      |sh AS (SELECT DISTINCT doc_id,
      |         w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
      |       FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)
      |       WHERE len(w) >= 3),
      |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
      |dinter AS (SELECT a.doc_id AS id_in, b.doc_id AS id_of,
      |             COUNT(*) AS inter
      |           FROM sh a JOIN sh b
      |             ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
      |           GROUP BY 1, 2)
      |SELECT id_in, id_of, inter, s.sz AS sz_in,
      |  CAST(inter AS DOUBLE) / CAST(s.sz AS DOUBLE) AS containment
      |FROM dinter JOIN sizes s ON id_in = s.doc_id
      |WHERE inter * 10 >= 9 * s.sz""".stripMargin

  val oracles: Map[String, String] = Map(
    // q223: observed-over-independence ratio in exact integer ppm;
    // numerator/denominator in HUGEINT (Spark: DECIMAL(38,0)) so the
    // n_docs·N·10⁶ product cannot wrap on either engine
    "q223_stratum_mix" ->
      """WITH p AS (SELECT lang, source, CAST(COUNT(*) AS BIGINT)
        |    AS n_docs FROM documents GROUP BY 1, 2),
        |l AS (SELECT lang, CAST(SUM(n_docs) AS BIGINT) AS n_lang
        |  FROM p GROUP BY 1),
        |s AS (SELECT source, CAST(SUM(n_docs) AS BIGINT) AS n_source
        |  FROM p GROUP BY 1),
        |t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n FROM p)
        |SELECT lang, source, n_docs, n_lang, n_source,
        |  CAST((CAST(n_docs AS HUGEINT) * n * 1000000)
        |    // (CAST(n_lang AS HUGEINT) * n_source) AS BIGINT) AS ratio_ppm
        |FROM p JOIN l USING (lang) JOIN s USING (source) CROSS JOIN t""".stripMargin,
    // q217: the q75 bigram device; lift stays one double division of
    // exact integers (PMI's log is monotone — same ranking, no libm)
    "q217_collocations" ->
      s"""WITH tb AS (SELECT doc_id, $toksSql AS w FROM documents),
        |uni AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
        |        FROM (SELECT unnest(w) AS tok FROM tb) GROUP BY 1),
        |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_tokens FROM uni),
        |bi AS (SELECT w[i] AS x, w[i + 1] AS y,
        |         w[i] || ' ' || w[i + 1] AS bigram
        |       FROM tb, UNNEST(range(1, len(w))) AS s(i)),
        |cb AS (SELECT bigram, MIN(x) AS x, MIN(y) AS y,
        |         CAST(COUNT(*) AS BIGINT) AS c_xy
        |       FROM bi GROUP BY 1 HAVING COUNT(*) >= 5),
        |sc AS (SELECT bigram, c_xy, ux.c AS c_x, uy.c AS c_y,
        |         CAST(n_tokens * c_xy AS DOUBLE) /
        |           CAST(ux.c * uy.c AS DOUBLE) AS lift
        |       FROM cb JOIN uni ux ON cb.x = ux.tok
        |       JOIN uni uy ON cb.y = uy.tok CROSS JOIN tot)
        |SELECT bigram, c_xy, c_x, c_y, lift FROM sc
        |ORDER BY lift DESC, bigram LIMIT 50""".stripMargin,
    // q215: same one-pass counters, rows via UNION ALL
    "q215_doc_column_profile" ->
      """WITH a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        |    CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS tn,
        |    CAST(SUM(CASE WHEN text IS NOT NULL AND trim(text) = ''
        |      THEN 1 ELSE 0 END) AS BIGINT) AS tb,
        |    CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS ln,
        |    CAST(SUM(CASE WHEN lang IS NOT NULL AND trim(lang) = ''
        |      THEN 1 ELSE 0 END) AS BIGINT) AS lb,
        |    CAST(SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS sn,
        |    CAST(SUM(CASE WHEN source IS NOT NULL AND trim(source) = ''
        |      THEN 1 ELSE 0 END) AS BIGINT) AS sb
        |  FROM documents)
        |SELECT 'text' AS column, n_rows, tn AS n_null, tb AS n_blank,
        |  (tn * 1000000) // NULLIF(n_rows, 0) AS null_ppm FROM a
        |UNION ALL SELECT 'lang', n_rows, ln, lb,
        |  (ln * 1000000) // NULLIF(n_rows, 0) FROM a
        |UNION ALL SELECT 'source', n_rows, sn, sb,
        |  (sn * 1000000) // NULLIF(n_rows, 0) FROM a""".stripMargin,
    // q203: same ceil-div padding model per (doc, bin), integer ppm
    "q203_packing_waste" ->
      s"""WITH t AS (SELECT CAST(len($toksSql) AS BIGINT) AS tok
        |  FROM documents),
        |s AS (SELECT CAST(max_len AS BIGINT) AS max_len, tok,
        |    (tok + max_len - 1) // max_len AS seqs
        |  FROM t CROSS JOIN (VALUES (128), (512), (2048)) AS b(max_len))
        |SELECT max_len, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(seqs) AS BIGINT) AS n_seqs,
        |  CAST(SUM(tok) AS BIGINT) AS total_tokens,
        |  CAST(SUM(seqs * max_len) AS BIGINT) AS padded_tokens,
        |  CAST(((SUM(seqs * max_len) - SUM(tok)) * 1000000) //
        |    NULLIF(SUM(seqs * max_len), 0) AS BIGINT) AS waste_ppm
        |FROM s GROUP BY 1""".stripMargin,
    // q204: distinct (source, text) membership on both parity
    // snapshots, one full outer join, flag arithmetic
    "q204_crawl_delta" ->
      """WITH o AS (SELECT DISTINCT source, text FROM documents
        |  WHERE doc_id % 2 = 0),
        |n AS (SELECT DISTINCT source, text FROM documents
        |  WHERE doc_id % 2 = 1),
        |j AS (SELECT COALESCE(o.source, n.source) AS source,
        |    COALESCE(o.text, n.text) AS text,
        |    CASE WHEN o.text IS NOT NULL THEN 1 ELSE 0 END AS io,
        |    CASE WHEN n.text IS NOT NULL THEN 1 ELSE 0 END AS iw
        |  FROM o FULL OUTER JOIN n
        |    ON o.source = n.source AND o.text = n.text)
        |SELECT source, CAST(SUM(io) AS BIGINT) AS n_old,
        |  CAST(SUM(iw) AS BIGINT) AS n_new,
        |  CAST(SUM(io * iw) AS BIGINT) AS n_retained,
        |  CAST(SUM(io * (1 - iw)) AS BIGINT) AS n_removed,
        |  CAST(SUM((1 - io) * iw) AS BIGINT) AS n_added,
        |  CAST(SUM(io * (1 - iw) * length(text)) AS BIGINT)
        |    AS chars_removed,
        |  CAST(SUM((1 - io) * iw * length(text)) AS BIGINT)
        |    AS chars_added
        |FROM j GROUP BY 1""".stripMargin,
    // q205: distinct postings -> df -> the generated power-of-two CASE
    // ladder (shared floors with the Spark fold)
    "q205_postings_skew" ->
      s"""WITH occ AS (SELECT DISTINCT doc_id, term FROM
        |    (SELECT doc_id, unnest($toksSql) AS term FROM documents)),
        |d AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df
        |  FROM occ GROUP BY 1)
        |SELECT $dfBucketCaseSql AS df_bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n_terms,
        |  CAST(SUM(df) AS BIGINT) AS n_postings
        |FROM d GROUP BY 1""".stripMargin,
    // q206: per-source row_number rank under (n_chars, doc_id), the
    // lower-quantile rank picks, winsorized integer mean
    "q206_winsorized_lengths" ->
      """WITH s AS (SELECT source, n_chars, doc_id FROM documents),
        |c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM s GROUP BY 1),
        |r AS (SELECT source, n_chars, ROW_NUMBER() OVER (
        |    PARTITION BY source ORDER BY n_chars, doc_id) AS rn
        |  FROM s),
        |q AS (SELECT r.source,
        |    MAX(CASE WHEN rn = LEAST(n, GREATEST(1, (5 * (n + 1)) // 100))
        |      THEN n_chars END) AS p05,
        |    MAX(CASE WHEN rn = LEAST(n, GREATEST(1, (50 * (n + 1)) // 100))
        |      THEN n_chars END) AS p50,
        |    MAX(CASE WHEN rn = LEAST(n, GREATEST(1, (95 * (n + 1)) // 100))
        |      THEN n_chars END) AS p95
        |  FROM r JOIN c USING (source) GROUP BY 1)
        |SELECT s.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  p05, p50, p95,
        |  CAST(SUM(GREATEST(p05, LEAST(p95, n_chars))) // COUNT(*)
        |    AS BIGINT) AS wins_mean
        |FROM s JOIN q ON s.source = q.source
        |GROUP BY 1, p05, p50, p95""".stripMargin,
    // q207: global (cnt desc, token) rank + running mass, prefix read
    // at the clamped vocab sizes, integer ppm
    "q207_coverage_curve" ->
      s"""WITH tok AS (SELECT unnest($toksSql) AS token FROM documents),
        |c AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM tok GROUP BY 1),
        |r AS (SELECT token, cnt,
        |    ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS rn,
        |    CAST(SUM(cnt) OVER (ORDER BY cnt DESC, token
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM c),
        |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_types,
        |    CAST(SUM(cnt) AS BIGINT) AS total_tokens FROM c),
        |v AS (SELECT CAST(vs AS BIGINT) AS vocab_size FROM
        |    (VALUES (100), (1000), (10000)) AS x(vs))
        |SELECT vocab_size, n_types, cum AS covered_tokens, total_tokens,
        |  CAST((cum * 1000000) // total_tokens AS BIGINT) AS coverage_ppm
        |FROM v CROSS JOIN t JOIN r ON r.rn = LEAST(vocab_size, n_types)""".stripMargin,
    // q200: same distinct (source, token) relation, token-keyed pair
    // join, exact integer sizes, one double division
    "q200_source_vocab_overlap" ->
      s"""WITH st AS (SELECT DISTINCT source, unnest($toksSql) AS tok
        |  FROM documents),
        |sz AS (SELECT source, COUNT(*) AS n FROM st GROUP BY 1),
        |i AS (SELECT a.source AS source_a, b.source AS source_b,
        |    COUNT(*) AS inter
        |  FROM st a JOIN st b ON a.tok = b.tok AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT source_a, source_b, inter,
        |  za.n + zb.n - inter AS union_sz,
        |  CAST(inter AS DOUBLE) / (za.n + zb.n - inter) AS jaccard
        |FROM i
        |JOIN sz za ON source_a = za.source
        |JOIN sz zb ON source_b = zb.source""".stripMargin,
    // q185: the definitional double-counted DIRECTED shingle join (the
    // Spark plan computes each unordered intersection once and emits
    // both direction tests from it — same relation); keep predicate is
    // exact integer arithmetic, the score one double division
    "q185_containment_pairs" -> containmentOracle,
    // q224: the SAME uncapped definitional oracle checks the
    // maxShingleDf = 64 plan — the cap provably does not bind at gate
    // scales (measured max df 9/7/25), so capped == definitional is
    // exactly the cap's no-false-drop claim
    "q224_containment_capped" -> containmentOracle,
    // q186: the exact q29 pair relation intersected with the ranked
    // 3-row sorted-neighborhood window under the identical
    // (lower 24-char key, doc_id) total order
    "q186_sorted_neighborhood" ->
      s"""WITH $jaccardCtes,
        |rk AS (SELECT doc_id,
        |         ROW_NUMBER() OVER (
        |           ORDER BY lower(substr(text, 1, 24)), doc_id) AS rn
        |       FROM documents),
        |cand AS (SELECT LEAST(a.doc_id, b.doc_id) AS id_a,
        |           GREATEST(a.doc_id, b.doc_id) AS id_b
        |         FROM rk a JOIN rk b
        |           ON b.rn > a.rn AND b.rn <= a.rn + 3)
        |SELECT j.id_a, j.id_b, j.jaccard
        |FROM jpairs j JOIN cand USING (id_a, id_b)""".stripMargin,
    // q135: first-occurrence novelty over the q29 gram CTEs; exact
    // integer counts (HUGEINT sums cast back), one division
    "q135_novelty_score" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS w FROM documents),
        |sh AS (SELECT DISTINCT doc_id,
        |         w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
        |       FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)
        |       WHERE len(w) >= 3),
        |f AS (SELECT shingle, MIN(doc_id) AS fdoc FROM sh GROUP BY 1)
        |SELECT doc_id, COUNT(*) AS n_grams,
        |  CAST(SUM(CASE WHEN doc_id = fdoc THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_novel,
        |  CAST(CAST(SUM(CASE WHEN doc_id = fdoc THEN 1 ELSE 0 END)
        |    AS BIGINT) AS DOUBLE) / COUNT(*) AS novelty
        |FROM sh JOIN f USING (shingle)
        |GROUP BY doc_id""".stripMargin,
    // q136: the Morton interleave in plain integer div/mod arithmetic
    "q136_zorder_key" ->
      s"""WITH base AS (SELECT doc_id,
        |    LEAST(n_chars // 16, 255) AS xb,
        |    LEAST(len($toksSql), 255) AS yb
        |  FROM documents)
        |SELECT doc_id, xb AS x_bucket, yb AS y_bucket,
        |  CAST($zorderTermsSql AS BIGINT) AS zkey
        |FROM base""".stripMargin,
    // q96: the whole curation chain composed — see CurationOracle
    "q96_curation_e2e" -> CurationOracle.sql,
    // q247: the same chain with the Gopher battery as the repetition gate
    "q247_curation_gopher" -> CurationOracle.gopherSql,
    // q82: stride-1 windows (i-1 = 0-based start), duplicate = rn > 1 in
    // (doc, start) order (the q67 canonical rule), removal = any duplicate
    // start covering the position — all-integer arithmetic end to end
    "q82_substring_rewrite" ->
      s"""WITH tb2 AS (SELECT doc_id, $toksSql AS w FROM documents),
        |wn2 AS (SELECT doc_id, i - 1 AS s,
        |          array_to_string(list_slice(w, i, i + 7), ' ') AS win
        |        FROM tb2, UNNEST(range(1, len(w) - 6)) AS t(i)),
        |rx2 AS (SELECT doc_id, s,
        |          ROW_NUMBER() OVER (PARTITION BY win
        |                             ORDER BY doc_id, s) AS rn
        |        FROM wn2),
        |dsx2 AS (SELECT doc_id, list_sort(list(s)) AS ds
        |         FROM rx2 WHERE rn > 1 GROUP BY doc_id),
        |fin2 AS (SELECT tb2.doc_id, COALESCE(len(w), 0) AS n_tokens,
        |           COALESCE(ds, []) AS dsn, COALESCE(w, []) AS wn
        |         FROM tb2 LEFT JOIN dsx2 USING (doc_id)),
        |kp2 AS (SELECT doc_id, n_tokens, wn,
        |          list_filter(range(0, n_tokens), p ->
        |            len(list_filter(dsn, s -> s <= p AND p <= s + 7)) = 0)
        |            AS kept
        |        FROM fin2)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(n_tokens - len(kept) AS BIGINT) AS n_removed,
        |  COALESCE(array_to_string(list_transform(kept, p -> wn[p + 1]),
        |                           ' '), '') AS text
        |FROM kp2""".stripMargin,
    // q85: quantile_cont is the same type-7 linear interpolation as
    // Spark's percentile; both sides round the interpolated value at 1e-6
    "q85_token_percentiles" ->
      s"""WITH ntx AS (SELECT lang, len($toksSql) AS nt FROM documents),
        |qx AS (SELECT lang, quantile_cont(nt, [0.5, 0.9, 0.99]) AS ps
        |       FROM ntx GROUP BY lang)
        |SELECT lang, [0.5, 0.9, 0.99][CAST(i AS INT)] AS p,
        |  ROUND(ps[CAST(i AS INT)], 6) AS n_tokens_p
        |FROM qx, UNNEST(range(1, 4)) AS t(i)""".stripMargin,
    // q84: centroids = the q54 ROUNDED means (cross-engine exact); scores
    // ROUNDED at 1e-6 BEFORE the rank so the argmax operand is itself
    // cross-engine exact (scores within 1e-6 tie → larger label wins,
    // matching the Spark side's max-struct selection)
    "q84_nearest_centroid" ->
      """WITH cx AS (SELECT label AS cand_label, CAST(i - 1 AS BIGINT) AS dim,
        |              ROUND(SUM(CAST(embedding[i] AS DOUBLE)) / COUNT(*), 6)
        |                AS mu
        |            FROM embeddings,
        |                 UNNEST(range(1, len(embedding) + 1)) AS t(i)
        |            GROUP BY label, i),
        |cnx AS (SELECT cand_label, SQRT(SUM(mu * mu)) AS nc
        |        FROM cx GROUP BY 1),
        |evx AS (SELECT vec_id, label, i, CAST(embedding[i] AS DOUBLE) AS e
        |        FROM embeddings,
        |             UNNEST(range(1, len(embedding) + 1)) AS t(i)),
        |vnx AS (SELECT vec_id, SQRT(SUM(e * e)) AS nv FROM evx GROUP BY 1),
        |dpx AS (SELECT evx.vec_id, evx.label, cx.cand_label,
        |          SUM(evx.e * cx.mu) AS d
        |        FROM evx JOIN cx ON cx.dim = evx.i - 1 GROUP BY 1, 2, 3),
        |scx AS (SELECT dpx.vec_id, dpx.label, dpx.cand_label,
        |          ROUND(dpx.d / (vnx.nv * cnx.nc), 6) AS score
        |        FROM dpx JOIN vnx USING (vec_id) JOIN cnx USING (cand_label))
        |SELECT vec_id, label, cand_label AS pred_label, score
        |FROM scx QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
        |       ORDER BY score DESC, cand_label DESC) = 1""".stripMargin,
    // q93: cluster CTEs → per-cluster size → size histogram
    "q93_cluster_sizes" ->
      s"""WITH RECURSIVE $clusterCtes,
        |szx AS (SELECT cluster_id, COUNT(*) AS cluster_size
        |        FROM clx GROUP BY 1)
        |SELECT cluster_size, COUNT(*) AS n_clusters
        |FROM szx GROUP BY 1""".stripMargin,
    // q94: the jaccard CTEs at the τ = 0.1 floor, bucketed by decile —
    // floor(j·10) is the identical double op on both engines
    "q94_pair_histogram" ->
      s"""WITH ${jaccardCtesTau(0.1)}
        |SELECT CAST(FLOOR(jaccard * 10) AS BIGINT) AS bucket,
        |  COUNT(*) AS n_pairs
        |FROM jpairs GROUP BY 1""".stripMargin,
    // q91: the q65 surprisal CTEs + per-lang tercile cutoffs (the same
    // 1e-6-rounded type-7 quantile contract as q85/q89); the tercile
    // probabilities are interpolated from the SAME doubles the Spark plan
    // uses, so the interpolation weights cannot drift
    "q91_quality_buckets" ->
      s"""WITH $surprisalCtes,
        |sjx AS (SELECT d.doc_id, d.lang, surx.xent_bits
        |        FROM documents d JOIN surx USING (doc_id)),
        |cutx AS (SELECT lang,
        |           ROUND(quantile_cont(xent_bits, ${(1.0 / 3).toString}), 6)
        |             AS c1,
        |           ROUND(quantile_cont(xent_bits, ${(2.0 / 3).toString}), 6)
        |             AS c2
        |         FROM sjx GROUP BY lang)
        |SELECT doc_id, lang, xent_bits,
        |  CASE WHEN xent_bits <= c1 THEN 'head'
        |       WHEN xent_bits <= c2 THEN 'middle'
        |       ELSE 'tail' END AS bucket
        |FROM sjx JOIN cutx USING (lang)""".stripMargin,
    // q107: min-id gram ownership over the shared distinct-shingle CTE;
    // novelty is one division of exact integers, zero-gram docs anchored
    "q107_ngram_novelty" ->
      s"""WITH $sh5Ctes,
        |dsh7 AS (SELECT DISTINCT doc_id, shingle FROM sh5),
        |own7 AS (SELECT shingle, MIN(doc_id) AS owner FROM dsh7
        |         GROUP BY 1),
        |pd7 AS (SELECT dsh7.doc_id,
        |    CAST(COUNT(*) AS BIGINT) AS n_grams,
        |    CAST(SUM(CASE WHEN dsh7.doc_id = own7.owner THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_new
        |  FROM dsh7 JOIN own7 USING (shingle)
        |  GROUP BY dsh7.doc_id)
        |SELECT d.doc_id,
        |  COALESCE(n_grams, 0) AS n_grams,
        |  COALESCE(n_new, 0) AS n_new,
        |  CASE WHEN COALESCE(n_grams, 0) > 0
        |       THEN CAST(n_new AS DOUBLE) / n_grams ELSE 0.0 END AS novelty
        |FROM documents d LEFT JOIN pd7 USING (doc_id)""".stripMargin,
    // q109: Gopher battery — every verdict is cross-multiplied integer
    // arithmetic, so the boolean column can't float-drift
    "q109_gopher_rules" ->
      s"""WITH g1 AS (SELECT doc_id, $toksSql AS w,
        |    list_filter(string_split(text, chr(10)), x -> x <> '') AS ls,
        |    text FROM documents),
        |g2 AS (SELECT doc_id,
        |    CAST(len(w) AS BIGINT) AS n_words,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        list_transform(w, x -> CAST(length(x) AS BIGINT))),
        |      (a, b) -> a + b) AS sum_word_len,
        |    CAST(len(list_filter(w, x -> regexp_matches(x, '\\p{L}')))
        |      AS BIGINT) AS n_alpha_words,
        |    CAST(len(regexp_extract_all(text, '#|\\.\\.\\.|…')) AS BIGINT)
        |      AS n_symbolish,
        |    CAST(len(ls) AS BIGINT) AS n_lines,
        |    CAST(len(list_filter(ls,
        |        x -> regexp_matches(x, '^\\s*[-*•]'))) AS BIGINT)
        |      AS n_bullet_lines,
        |    CAST(len(list_filter(ls,
        |        x -> regexp_matches(x, '(\\.\\.\\.|…)\\s*$$'))) AS BIGINT)
        |      AS n_ellipsis_lines,
        |    CAST(len(list_filter($stopSql, s -> list_contains(w, s)))
        |      AS BIGINT) AS n_stop_present
        |  FROM g1)
        |SELECT doc_id, n_words, sum_word_len, n_alpha_words, n_symbolish,
        |  n_lines, n_bullet_lines, n_ellipsis_lines, n_stop_present,
        |  (n_words BETWEEN 10 AND 1000
        |    AND 3 * n_words <= sum_word_len
        |    AND sum_word_len <= 10 * n_words
        |    AND 10 * n_alpha_words >= 8 * n_words
        |    AND 10 * n_symbolish <= n_words
        |    AND 10 * n_bullet_lines <= 9 * n_lines
        |    AND 10 * n_ellipsis_lines <= 3 * n_lines
        |    AND n_stop_present >= 2) AS keep
        |FROM g2""".stripMargin,
    // q110: the crop offsets are the q63/q69 salted content-hash draw mod
    // the span count; slices are 1-based inclusive on both engines
    "q110_crop_pairs" ->
      s"""WITH tcp AS (SELECT doc_id, $toksSql AS w, text FROM documents),
        |fcp AS (SELECT doc_id, w, CAST(len(w) AS BIGINT) AS n_tokens,
        |    ${fpSql("text || '|cropA'")} % (len(w) - 7) AS a_off,
        |    ${fpSql("text || '|cropB'")} % (len(w) - 7) AS b_off
        |  FROM tcp WHERE len(w) >= 8)
        |SELECT doc_id, n_tokens, a_off, b_off,
        |  array_to_string(list_slice(w, a_off + 1, a_off + 8), ' ')
        |    AS anchor,
        |  array_to_string(list_slice(w, b_off + 1, b_off + 8), ' ')
        |    AS positive
        |FROM fcp""".stripMargin,
    // q111: CDC dedup — token fingerprints folded over the 4-gram ending
    // at each position, boundary where the fold ≡ 0 (mod 8); then q67's
    // first-occurrence rule over the content-defined chunks
    "q111_cdc_dedup" ->
      s"""WITH tcd AS (SELECT doc_id, $toksSql AS w FROM documents
        |  WHERE len($toksSql) >= 1),
        |thd AS (SELECT doc_id, w,
        |    list_transform(w, t -> ${fpSql("t")}) AS th FROM tcd),
        |cutd AS (SELECT doc_id, w,
        |    list_transform(range(1, len(w) + 1), i ->
        |      CASE WHEN i >= 4 AND
        |          list_reduce(
        |            list_prepend(CAST(0 AS BIGINT),
        |                         list_slice(th, i - 3, i)),
        |            (a, b) -> (a * 31 + b) % 144115188075855872) % 8 = 0
        |        THEN 1 ELSE 0 END) AS cut
        |  FROM thd),
        |posd AS (SELECT doc_id, i AS p, w[i] AS tok, cut[i] AS c
        |         FROM cutd, UNNEST(range(1, len(w) + 1)) AS t(i)),
        |segd AS (SELECT doc_id, p, tok,
        |    COALESCE(SUM(c) OVER (PARTITION BY doc_id ORDER BY p
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS chunk_idx
        |  FROM posd),
        |ckd AS (SELECT doc_id, chunk_idx,
        |    string_agg(tok, ' ' ORDER BY p) AS chunk
        |  FROM segd GROUP BY 1, 2),
        |rxd AS (SELECT doc_id, chunk_idx,
        |    ROW_NUMBER() OVER (PARTITION BY chunk
        |                       ORDER BY doc_id, chunk_idx) AS rn
        |  FROM ckd)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
        |  CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dup_chunks,
        |  CAST(COUNT(*) - SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / COUNT(*) AS retention
        |FROM rxd GROUP BY doc_id""".stripMargin,
    // q112: winnowing — gram hashes mod 2^36, window argmin encoded as
    // one integer key (h·2^21 + (2^21−1−pos), rightmost-min), decoded by
    // integer division; pair count over the distinct selected hashes
    "q112_winnow_pairs" ->
      s"""WITH tw AS (SELECT doc_id, $toksSql AS w FROM documents
        |  WHERE len($toksSql) >= 7),
        |thw AS (SELECT doc_id, w,
        |    list_transform(w, t -> ${fpSql("t")}) AS th FROM tw),
        |gr AS (SELECT doc_id, g - 1 AS g0, len(w) - 3 AS n,
        |    list_reduce(
        |      list_prepend(CAST(0 AS BIGINT), list_slice(th, g, g + 3)),
        |      (a, b) -> (a * 31 + b) % 68719476736) AS h
        |  FROM thw, UNNEST(range(1, len(w) - 2)) AS t(g)),
        |sel AS (SELECT doc_id, g0, n,
        |    MIN(h * 2097152 + (2097151 - g0))
        |      OVER (PARTITION BY doc_id ORDER BY g0
        |            ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS selkey
        |  FROM gr),
        |fpw AS (SELECT DISTINCT doc_id, selkey // 2097152 AS h
        |        FROM sel WHERE g0 <= n - 4)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(COUNT(*) AS BIGINT) AS n_shared
        |FROM fpw a JOIN fpw b ON a.h = b.h AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING COUNT(*) >= 2""".stripMargin,
    // q113: the frozen merge table (the SAME literal the Spark plan
    // broadcasts) replayed over the distinct vocabulary as a recursive
    // first-occurrence-replace — provably the leftmost single-pass merge
    // (a merged piece is strictly longer than either part, so it is inert
    // for its own pair and a head-restart finds exactly the array pass's
    // occurrences); per-word piece counts then join back to occurrences
    "q113_bpe_segment" ->
      s"""WITH RECURSIVE
        |${bpeSegCtes("13")},
        |pd13 AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |                CAST(SUM(np) AS BIGINT) AS n_pieces
        |         FROM occ13 JOIN p13 USING (w) GROUP BY doc_id)
        |SELECT d.doc_id,
        |  COALESCE(n_tokens, CAST(0 AS BIGINT)) AS n_tokens,
        |  COALESCE(n_pieces, CAST(0 AS BIGINT)) AS n_pieces
        |FROM documents d LEFT JOIN pd13 USING (doc_id)""".stripMargin,
    // q114: the top-K vocabulary is a total order (count desc, term asc),
    // coverage = left-join flag summed per doc, every count exact BIGINT
    "q114_vocab_coverage" ->
      s"""WITH occ14 AS (SELECT doc_id, unnest($toksSql) AS tok
        |               FROM documents),
        |tc14 AS (SELECT tok, COUNT(*) AS cnt FROM occ14 GROUP BY 1),
        |voc14 AS (SELECT tok FROM tc14 ORDER BY cnt DESC, tok LIMIT 20),
        |pd14 AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |           CAST(SUM(CASE WHEN v.tok IS NOT NULL THEN 1 ELSE 0 END)
        |             AS BIGINT) AS n_in_vocab
        |         FROM occ14 LEFT JOIN voc14 v USING (tok)
        |         GROUP BY doc_id)
        |SELECT d.doc_id,
        |  COALESCE(n_tokens, CAST(0 AS BIGINT)) AS n_tokens,
        |  COALESCE(n_in_vocab, CAST(0 AS BIGINT)) AS n_in_vocab,
        |  COALESCE(n_tokens - n_in_vocab, CAST(0 AS BIGINT)) AS n_oov
        |FROM documents d LEFT JOIN pd14 USING (doc_id)""".stripMargin,
    // q115: list literal interpolated from the SAME Seq the Spark
    // expression folds in; density rule hits·10 < n_tokens
    "q115_blocklist_filter" ->
      s"""WITH h15 AS (SELECT doc_id, $toksSql AS w,
        |    list_filter($toksSql,
        |                x -> list_contains($blocklistSql, x)) AS hits
        |  FROM documents)
        |SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
        |  CAST(len(hits) AS BIGINT) AS n_hits,
        |  CAST(len(list_distinct(hits)) AS BIGINT) AS n_distinct_hits,
        |  len(hits) * 10 < len(w) AS is_kept
        |FROM h15""".stripMargin,
    // q117: the q113 recursion over the vocabulary, grouped to strata;
    // n_docs counts every document (zero-token docs included), ratios are
    // single divisions of exact integers
    "q117_bpe_fertility" ->
      s"""WITH RECURSIVE
        |${bpeSegCtes("17", " lang, source,")},
        |g17 AS (SELECT lang, source,
        |          CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |          CAST(SUM(np) AS BIGINT) AS n_pieces,
        |          CAST(SUM(length(w)) AS BIGINT) AS n_chars
        |        FROM occ17 JOIN p17 USING (w) GROUP BY 1, 2),
        |d17 AS (SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs
        |        FROM documents GROUP BY 1, 2)
        |SELECT d17.lang, d17.source, n_docs,
        |  COALESCE(n_tokens, CAST(0 AS BIGINT)) AS n_tokens,
        |  COALESCE(n_pieces, CAST(0 AS BIGINT)) AS n_pieces,
        |  COALESCE(n_chars, CAST(0 AS BIGINT)) AS n_chars,
        |  CASE WHEN COALESCE(n_tokens, 0) > 0
        |       THEN CAST(n_pieces AS DOUBLE) / n_tokens
        |       ELSE 0.0 END AS pieces_per_token,
        |  CASE WHEN COALESCE(n_pieces, 0) > 0
        |       THEN CAST(n_chars AS DOUBLE) / n_pieces
        |       ELSE 0.0 END AS chars_per_piece
        |FROM d17 LEFT JOIN g17 USING (lang, source)""".stripMargin,
    // q118: q56's packing arithmetic with the q113 piece counts as the
    // budget currency — BIGINT cast on the running sum (the q103 lesson)
    "q118_bpe_packing" ->
      s"""WITH RECURSIVE
        |${bpeSegCtes("18")},
        |pd18 AS (SELECT d.doc_id,
        |           COALESCE(nps, CAST(0 AS BIGINT)) AS n_pieces
        |         FROM documents d LEFT JOIN
        |           (SELECT doc_id, CAST(SUM(np) AS BIGINT) AS nps
        |            FROM occ18 JOIN p18 USING (w) GROUP BY 1) s18
        |           USING (doc_id)),
        |c18 AS (SELECT doc_id, n_pieces,
        |          CAST(SUM(n_pieces) OVER (ORDER BY doc_id) AS BIGINT)
        |            AS cum_pieces
        |        FROM pd18)
        |SELECT doc_id, n_pieces, cum_pieces,
        |       (cum_pieces - n_pieces) // 2048 AS bin
        |FROM c18""".stripMargin,
    // q127: q79's audit shape over the embeddings table — every rule one
    // conditional sum; NULL predicate results count as violations
    "q127_embedding_audit" ->
      """WITH t27 AS (SELECT CAST(COUNT(*) AS BIGINT) AS total,
        |  CAST(SUM(CASE WHEN embedding IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS v_null,
        |  CAST(SUM(CASE WHEN COALESCE(len(embedding) <> 64, TRUE) THEN 1
        |           ELSE 0 END) AS BIGINT) AS v_dim,
        |  CAST(SUM(CASE WHEN COALESCE(len(list_filter(embedding,
        |             x -> isnan(x) OR isinf(x))) > 0, TRUE) THEN 1
        |           ELSE 0 END) AS BIGINT) AS v_nonfinite,
        |  CAST(SUM(CASE WHEN COALESCE(len(list_filter(embedding,
        |             x -> x <> 0)) = 0, TRUE) THEN 1
        |           ELSE 0 END) AS BIGINT) AS v_zero,
        |  CAST(SUM(CASE WHEN COALESCE(label < 0, TRUE) THEN 1
        |           ELSE 0 END) AS BIGINT) AS v_label,
        |  CAST(COUNT(*) - COUNT(DISTINCT vec_id) AS BIGINT) AS v_dup
        |  FROM embeddings)
        |SELECT 'duplicate_vec_id' AS rule, v_dup AS violations,
        |       total AS n_rows FROM t27
        |UNION ALL SELECT 'has_nonfinite', v_nonfinite, total FROM t27
        |UNION ALL SELECT 'null_embedding', v_null, total FROM t27
        |UNION ALL SELECT 'unknown_label', v_label, total FROM t27
        |UNION ALL SELECT 'wrong_dim', v_dim, total FROM t27
        |UNION ALL SELECT 'zero_vector', v_zero, total FROM t27""".stripMargin,
    // q122: q118's packing CTEs grouped to bins; the member list is an
    // ordered list() aggregate (the q82 sorted-list device)
    "q122_packed_batches" ->
      s"""WITH RECURSIVE
        |${bpeSegCtes("22")},
        |pd22 AS (SELECT d.doc_id,
        |           COALESCE(nps, CAST(0 AS BIGINT)) AS n_pieces
        |         FROM documents d LEFT JOIN
        |           (SELECT doc_id, CAST(SUM(np) AS BIGINT) AS nps
        |            FROM occ22 JOIN p22 USING (w) GROUP BY 1) s22
        |           USING (doc_id)),
        |c22 AS (SELECT doc_id, n_pieces,
        |          CAST(SUM(n_pieces) OVER (ORDER BY doc_id) AS BIGINT)
        |            AS cum_pieces
        |        FROM pd22),
        |b22 AS (SELECT doc_id, n_pieces,
        |          (cum_pieces - n_pieces) // 2048 AS bin
        |        FROM c22)
        |SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_pieces) AS BIGINT) AS total_pieces,
        |  array_to_string(list(doc_id ORDER BY doc_id), ',') AS doc_ids
        |FROM b22 GROUP BY bin""".stripMargin,
    // q121: the q113 segmentation recursion + word ordinality + a
    // per-doc piece-offset window (doc-partitioned, bounded by doc
    // length) + the closed 66-piece id table as a literal join
    "q121_bpe_encode" ->
      s"""WITH RECURSIVE
        |${bpeSegCtes("21")},
        |wp21 AS (SELECT w, list_filter(split(s, ' '), x -> x <> '') AS pl
        |         FROM seg21 WHERE idx = $bpeNumMerges),
        |tb21 AS (SELECT doc_id, $toksSql AS w FROM documents),
        |wo21 AS (SELECT doc_id, i AS widx, w[i] AS w
        |         FROM tb21, UNNEST(range(1, len(w) + 1)) AS t(i)),
        |wc21 AS (SELECT doc_id, widx, pl, len(pl) AS np
        |         FROM wo21 JOIN wp21 USING (w)),
        |off21 AS (SELECT doc_id, widx, pl,
        |            COALESCE(CAST(SUM(np) OVER (PARTITION BY doc_id
        |              ORDER BY widx ROWS BETWEEN UNBOUNDED PRECEDING
        |              AND 1 PRECEDING) AS BIGINT), 0) AS woff
        |          FROM wc21),
        |pv21(piece_id, piece) AS (VALUES $bpePieceVocabSql),
        |px21 AS (SELECT doc_id, CAST(woff + j AS BIGINT) AS pos,
        |                pl[j] AS piece
        |         FROM off21, UNNEST(range(1, len(pl) + 1)) AS t(j))
        |SELECT doc_id, pos, piece,
        |  CAST(COALESCE(pv21.piece_id, -1) AS BIGINT) AS piece_id
        |FROM px21 LEFT JOIN pv21 USING (piece)""".stripMargin,
    // q120: four per-doc flag relations (q28 dup, q115 blocklist, q36
    // quality at the lattice-safe 0.65 cut, q114 OOV) grouped to sources —
    // every emitted count an exact BIGINT
    "q120_source_health" ->
      s"""WITH $qualityCtes,
        |b20 AS (SELECT doc_id, len($toksSql) AS n_toks,
        |    len(list_filter($toksSql,
        |        x -> list_contains($blocklistSql, x))) AS n_hits
        |  FROM documents),
        |dup20 AS (SELECT doc_id,
        |    CASE WHEN doc_id <> MIN(doc_id) OVER (PARTITION BY text)
        |         THEN 1 ELSE 0 END AS is_dup
        |  FROM documents),
        |occ20 AS (SELECT doc_id, unnest($toksSql) AS tok FROM documents),
        |tc20 AS (SELECT tok, COUNT(*) AS cnt FROM occ20 GROUP BY 1),
        |voc20 AS (SELECT tok FROM tc20 ORDER BY cnt DESC, tok LIMIT 20),
        |pd20 AS (SELECT doc_id,
        |           SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS n_oov
        |         FROM occ20 LEFT JOIN voc20 v USING (tok)
        |         GROUP BY doc_id)
        |SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(b20.n_toks) AS BIGINT) AS n_tokens,
        |  CAST(SUM(dup20.is_dup) AS BIGINT) AS n_exact_dup,
        |  CAST(SUM(CASE WHEN b20.n_hits * 10 >= b20.n_toks
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_blocklist_drop,
        |  CAST(SUM(CASE WHEN qsc.quality_score < 0.65
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_quality_low,
        |  CAST(SUM(COALESCE(pd20.n_oov, 0)) AS BIGINT) AS n_oov
        |FROM documents d
        |JOIN b20 USING (doc_id) JOIN dup20 USING (doc_id)
        |JOIN qsc USING (doc_id) LEFT JOIN pd20 USING (doc_id)
        |GROUP BY d.source""".stripMargin,
    // q119: the q90 assignment wrapped as a CTE, then the q64 cap
    // machinery with the cluster id as the stratum and the id-hash draw
    "q119_cluster_cap" ->
      s"""WITH km19 AS (${kmeansOracleSql(k = 8, iters = 2)}),
        |d19 AS (SELECT vec_id, cluster_id,
        |    ${fpSql("CAST(vec_id AS VARCHAR) || '|ccap'")} % 1000000
        |      AS draw
        |  FROM km19),
        |r19 AS (SELECT vec_id, cluster_id, draw,
        |    ROW_NUMBER() OVER (PARTITION BY cluster_id
        |                       ORDER BY draw, vec_id) AS rn
        |  FROM d19)
        |SELECT vec_id, cluster_id, draw, CAST(rn AS BIGINT) AS src_rank
        |FROM r19 WHERE rn <= 30""".stripMargin,
    // q116: per-stratum rank under the q64/q69 salted draw; the oracle's
    // partitioned window is the semantic spec of the two-phase grouped rank
    "q116_stratified_split" ->
      s"""WITH d16 AS (SELECT doc_id, lang, source,
        |    ${fpSql("text || '|strat'")} % 1000000 AS draw
        |  FROM documents),
        |r16 AS (SELECT doc_id, lang, source, draw,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY lang, source
        |                            ORDER BY draw, doc_id) AS BIGINT)
        |      AS strat_rank,
        |    CAST(COUNT(*) OVER (PARTITION BY lang, source) AS BIGINT)
        |      AS strat_n
        |  FROM d16)
        |SELECT doc_id, lang, source, draw, strat_rank, strat_n,
        |  CASE WHEN strat_rank * 10 <= strat_n THEN 'eval'
        |       ELSE 'train' END AS split
        |FROM r16""".stripMargin,
    // q106: PMI-ratio collocations — exact integer counts, one IEEE
    // division of two exact double products, rank on the monotone ratio
    "q106_phrase_mining" ->
      s"""WITH tb6 AS (SELECT $toksSql AS w FROM documents),
        |up6 AS (SELECT unnest(w) AS tok FROM tb6),
        |c16 AS (SELECT tok, COUNT(*) AS c FROM up6 GROUP BY 1),
        |n6 AS (SELECT SUM(c) AS n FROM c16),
        |bp6 AS (SELECT w[i] AS a, w[i+1] AS b
        |        FROM tb6, UNNEST(range(1, len(w))) AS t(i)
        |        WHERE len(w) >= 2),
        |c26 AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS cab FROM bp6
        |        GROUP BY 1, 2 HAVING COUNT(*) >= 5)
        |SELECT a, b, cab, ca.c AS c_a, cb.c AS c_b,
        |  (CAST(cab AS DOUBLE) * n) / (CAST(ca.c AS DOUBLE) * cb.c)
        |    AS pmi_ratio
        |FROM c26 JOIN c16 ca ON ca.tok = a JOIN c16 cb ON cb.tok = b
        |CROSS JOIN n6
        |ORDER BY pmi_ratio DESC, a, b LIMIT 100""".stripMargin,
    // q105: the q91 tercile CTEs as the major order + the q69 salted draw
    // within each tier; rank over (priority, draw, doc_id)
    "q105_curriculum_order" ->
      s"""WITH $surprisalCtes,
        |sjc AS (SELECT d.doc_id, d.lang, surx.xent_bits
        |        FROM documents d JOIN surx USING (doc_id)),
        |cutc AS (SELECT lang,
        |           ROUND(quantile_cont(xent_bits, ${(1.0 / 3).toString}), 6)
        |             AS c1,
        |           ROUND(quantile_cont(xent_bits, ${(2.0 / 3).toString}), 6)
        |             AS c2
        |         FROM sjc GROUP BY lang),
        |buc AS (SELECT doc_id,
        |          CASE WHEN xent_bits <= c1 THEN 'head'
        |               WHEN xent_bits <= c2 THEN 'middle'
        |               ELSE 'tail' END AS bucket
        |        FROM sjc JOIN cutc USING (lang)),
        |drc AS (SELECT doc_id,
        |          ${fpSql("text || '|curriculum'")} % 1000000 AS draw
        |        FROM documents)
        |SELECT buc.doc_id, buc.bucket,
        |  CAST(CASE buc.bucket WHEN 'head' THEN 0 WHEN 'middle' THEN 1
        |       ELSE 2 END AS BIGINT) AS priority,
        |  drc.draw,
        |  CAST(ROW_NUMBER() OVER (ORDER BY
        |    CASE buc.bucket WHEN 'head' THEN 0 WHEN 'middle' THEN 1
        |         ELSE 2 END, drc.draw, buc.doc_id) AS BIGINT)
        |    AS curriculum_rank
        |FROM buc JOIN drc USING (doc_id)""".stripMargin,
    // q108: the q77 classifier CTEs → cumulative spend in clf-score order
    // (every aggregate cast back to BIGINT — the q103 HUGEINT lesson) →
    // the q105 curriculum CTEs computed over the KEPT subset only (its
    // own surprisal LM and tercile cutoffs); unranked docs carry −1, not
    // NULL, so no reader widens the integer columns to float
    "q108_training_layout" ->
      s"""WITH occ AS (SELECT doc_id, unnest($toksSql) AS tok
        |             FROM documents),
        |vocab AS (SELECT DISTINCT tok FROM occ),
        |wv AS (SELECT tok,
        |         ${classifierWeights.mkString("[", ", ", "]")}
        |           [CAST(${fpSql("tok")} % 64 AS INT) + 1] AS w
        |       FROM vocab),
        |aggq AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |           CAST(SUM(w) AS BIGINT) AS raw_score
        |         FROM occ JOIN wv USING (tok) GROUP BY doc_id),
        |clf8 AS (SELECT d.doc_id,
        |    COALESCE(n_tokens, 0) AS n_tokens,
        |    CASE WHEN COALESCE(n_tokens, 0) > 0
        |         THEN CAST(raw_score AS DOUBLE) / n_tokens
        |         ELSE 0.0 END AS clf_score
        |  FROM documents d LEFT JOIN aggq USING (doc_id)),
        |cum8 AS (SELECT doc_id, n_tokens, clf_score,
        |    CAST(SUM(n_tokens) OVER (ORDER BY clf_score DESC, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum_tokens
        |  FROM clf8),
        |tot8 AS (SELECT SUM(n_tokens) AS total FROM clf8),
        |flag8 AS (SELECT doc_id, n_tokens, clf_score, cum_tokens,
        |    cum_tokens * 5 <= total * 2 AS is_kept
        |  FROM cum8 CROSS JOIN tot8),
        |kd8 AS (SELECT d.* FROM documents d
        |        JOIN flag8 USING (doc_id) WHERE flag8.is_kept),
        |occ8 AS (SELECT doc_id, unnest($toksSql) AS token FROM kd8),
        |tf8 AS (SELECT doc_id, token, COUNT(*) AS tf FROM occ8
        |        GROUP BY 1, 2),
        |c8 AS (SELECT token, SUM(tf) AS c FROM tf8 GROUP BY 1),
        |n8 AS (SELECT SUM(c) AS n_total FROM c8),
        |sur8 AS (SELECT tf8.doc_id,
        |    CAST(SUM(tf8.tf * (length(bin(CAST(n_total // c AS BIGINT)))
        |      - 1)) AS DOUBLE) / SUM(tf8.tf) AS xent_bits
        |  FROM tf8 JOIN c8 USING (token) CROSS JOIN n8
        |  GROUP BY tf8.doc_id),
        |sj8 AS (SELECT kd8.doc_id, kd8.lang, sur8.xent_bits
        |        FROM kd8 JOIN sur8 USING (doc_id)),
        |cut8 AS (SELECT lang,
        |           ROUND(quantile_cont(xent_bits, ${(1.0 / 3).toString}), 6)
        |             AS c1,
        |           ROUND(quantile_cont(xent_bits, ${(2.0 / 3).toString}), 6)
        |             AS c2
        |         FROM sj8 GROUP BY lang),
        |buc8 AS (SELECT doc_id,
        |           CASE WHEN xent_bits <= c1 THEN 0
        |                WHEN xent_bits <= c2 THEN 1
        |                ELSE 2 END AS priority
        |         FROM sj8 JOIN cut8 USING (lang)),
        |dr8 AS (SELECT doc_id,
        |          ${fpSql("text || '|curriculum'")} % 1000000 AS draw
        |        FROM kd8),
        |rk8 AS (SELECT buc8.doc_id, buc8.priority,
        |    CAST(ROW_NUMBER() OVER (ORDER BY buc8.priority, dr8.draw,
        |      buc8.doc_id) AS BIGINT) AS curriculum_rank
        |  FROM buc8 JOIN dr8 USING (doc_id))
        |SELECT f.doc_id, f.n_tokens, f.clf_score, f.cum_tokens, f.is_kept,
        |  CAST(COALESCE(r.priority, -1) AS BIGINT) AS priority,
        |  CAST(COALESCE(r.curriculum_rank, -1) AS BIGINT)
        |    AS curriculum_rank
        |FROM flag8 f LEFT JOIN rk8 r USING (doc_id)""".stripMargin,
    // q92: √ is IEEE-correctly-rounded on both engines (pow is not — the
    // α = 0.5 choice is deliberate); each √ rounds at 1e-6 and sums as
    // DECIMAL, so the normalizer is exact and order-insensitive
    // q97: the q92 weight CTE chained into the q63 sampling predicate —
    // rate = weight / n_tokens (per-token target rate), normalized by the
    // max rate, FLOORed to the integer threshold (unambiguous cross-engine,
    // unlike round-half), then the salted content-hash draw decides
    "q97_mixture_weighted" ->
      s"""WITH tkx AS (SELECT source, $toksSql AS w FROM documents),
        |bx AS (SELECT source,
        |         CAST(SUM(COALESCE(len(w), 0)) AS BIGINT) AS n_tokens
        |       FROM tkx GROUP BY source),
        |sx AS (SELECT source, n_tokens,
        |         CAST(ROUND(SQRT(CAST(n_tokens AS DOUBLE)), 6)
        |              AS DECIMAL(38,6)) AS s6
        |       FROM bx),
        |tx AS (SELECT SUM(s6) AS tt FROM sx),
        |wx AS (SELECT source, n_tokens,
        |         ROUND(CAST(s6 AS DOUBLE) / CAST(tt AS DOUBLE), 6) AS weight
        |       FROM sx CROSS JOIN tx),
        |rx AS (SELECT source,
        |         CASE WHEN n_tokens > 0
        |              THEN weight / CAST(n_tokens AS DOUBLE)
        |              ELSE 0.0 END AS rate
        |       FROM wx),
        |mx AS (SELECT MAX(rate) AS mr FROM rx),
        |thx AS (SELECT source,
        |          CAST(FLOOR(rate / mr * 1000000) AS BIGINT)
        |            AS keep_threshold
        |        FROM rx CROSS JOIN mx),
        |d AS (SELECT doc_id, source,
        |        ${fpSql("text || '|mixture'")} % 1000000 AS draw
        |      FROM documents)
        |SELECT d.doc_id, d.source, d.draw, t.keep_threshold
        |FROM d JOIN thx t USING (source)
        |WHERE d.draw < t.keep_threshold""".stripMargin,
    "q92_mixture_weights" ->
      s"""WITH tkx AS (SELECT source, $toksSql AS w FROM documents),
        |bx AS (SELECT source, COUNT(*) AS n_docs,
        |         CAST(SUM(COALESCE(len(w), 0)) AS BIGINT) AS n_tokens
        |       FROM tkx GROUP BY source),
        |sx AS (SELECT source, n_docs, n_tokens,
        |         CAST(ROUND(SQRT(CAST(n_tokens AS DOUBLE)), 6)
        |              AS DECIMAL(38,6)) AS s6
        |       FROM bx),
        |tx AS (SELECT SUM(s6) AS tt FROM sx)
        |SELECT source, n_docs, n_tokens,
        |  ROUND(CAST(s6 AS DOUBLE) / CAST(tt AS DOUBLE), 6) AS weight
        |FROM sx CROSS JOIN tx""".stripMargin,
    // q90: the Lloyd rounds as generated CTEs — each round re-derives the
    // argmax assignment (score ranked unrounded, ties to the larger cid)
    // and the 1e-6-rounded per-dimension means, exactly the Spark loop
    "q90_kmeans" -> kmeansOracleSql(k = 8, iters = 2),
    // q87: the q29 pair relation + member sources, undirected count/max —
    // MAX(jaccard) is order-insensitive, so no float-sum drift
    "q87_dup_source_matrix" ->
      s"""WITH $jaccardCtes,
        |srcx AS (SELECT doc_id, source FROM documents)
        |SELECT LEAST(a.source, b.source) AS source_lo,
        |  GREATEST(a.source, b.source) AS source_hi,
        |  COUNT(*) AS n_pairs, ROUND(MAX(jaccard), 6) AS max_jaccard
        |FROM jpairs JOIN srcx a ON jpairs.id_a = a.doc_id
        |            JOIN srcx b ON jpairs.id_b = b.doc_id
        |GROUP BY 1, 2""".stripMargin,
    // q88: the q51 cluster CTEs + the q36 quality CTEs, kept member by
    // (quality DESC, doc_id DESC) — the keepBestInCluster max-struct order
    "q88_best_of_cluster" ->
      s"""WITH RECURSIVE $clusterCtes,
        |$qualityCtes,
        |bjx AS (SELECT clx.doc_id, clx.cluster_id, qsc.quality_score
        |        FROM clx JOIN qsc USING (doc_id)),
        |bkx AS (SELECT doc_id, cluster_id,
        |          FIRST_VALUE(doc_id) OVER (PARTITION BY cluster_id
        |            ORDER BY quality_score DESC, doc_id DESC) AS kept_id
        |        FROM bjx)
        |SELECT doc_id, cluster_id, kept_id,
        |  doc_id = kept_id AS is_kept
        |FROM bkx""".stripMargin,
    // q89: quantile_cont = Spark's percentile (type-7), cutoff rounded at
    // 1e-6 on both engines, then an integer-vs-exact-double comparison
    "q89_length_tail_trim" ->
      s"""WITH ntl AS (SELECT doc_id, lang, COALESCE(len($toksSql), 0)
        |               AS n_tokens FROM documents),
        |ctl AS (SELECT lang, ROUND(quantile_cont(n_tokens, 0.99), 6)
        |          AS cutoff FROM ntl GROUP BY lang)
        |SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens, cutoff
        |FROM ntl JOIN ctl USING (lang) WHERE n_tokens <= cutoff""".stripMargin,
    "q80_bm25_topk" -> bm25OracleSql,
    // q83 searches the stored inverted index; search == inline bm25TopK
    // bit-for-bit (LlmOpsSpec pins the equality), so it shares q80's oracle
    "q83_bm25_stored" -> bm25OracleSql,
    // q81: the q80 sparse ranking fused with the q32-shaped exact-cosine
    // dense ranking (vec_id < 5, k = 10) by reciprocal rank — each RRF
    // term is ONE IEEE division on an exact integer rank, summed in fixed
    // (sparse, dense) order. q86 runs the same fusion from the STORED
    // indexes (q83/q72 equality contracts) — same relation, same oracle
    "q81_rrf_fusion" -> rrfOracleSql,
    "q86_hybrid_stored" -> rrfOracleSql,
    // q79: every rule as a conditional sum over ONE scan, unpivoted — the
    // NULL-counts-as-violation rule matches Audit.audit's coalesce(…, true)
    "q79_data_quality" ->
      """WITH t AS (SELECT CAST(COUNT(*) AS BIGINT) AS total,
        |  CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS v_null_text,
        |  CAST(SUM(CASE WHEN COALESCE(length(text) = 0, TRUE) THEN 1
        |           ELSE 0 END) AS BIGINT) AS v_empty_text,
        |  CAST(SUM(CASE WHEN COALESCE(n_chars <> length(text), TRUE) THEN 1
        |           ELSE 0 END) AS BIGINT) AS v_mismatch,
        |  CAST(SUM(CASE WHEN COALESCE(lang NOT IN
        |             ('de', 'en', 'es', 'fr', 'zh'), TRUE) THEN 1
        |           ELSE 0 END) AS BIGINT) AS v_lang,
        |  CAST(COUNT(*) - COUNT(DISTINCT doc_id) AS BIGINT) AS v_dup
        |  FROM documents)
        |SELECT 'duplicate_doc_id' AS rule, v_dup AS violations,
        |       total AS n_rows FROM t
        |UNION ALL SELECT 'empty_text', v_empty_text, total FROM t
        |UNION ALL SELECT 'n_chars_mismatch', v_mismatch, total FROM t
        |UNION ALL SELECT 'null_text', v_null_text, total FROM t
        |UNION ALL SELECT 'unknown_lang', v_lang, total FROM t""".stripMargin,
    // q78: char n-grams of each DISTINCT token, occurrence-weighted by the
    // token's corpus frequency; range(1, len-n+2) is empty when len < n,
    // so DuckDB needs no length guard
    "q78_subword_vocab" ->
      s"""WITH tfv AS (SELECT tok, COUNT(*) AS cnt
        |  FROM (SELECT unnest($toksSql) AS tok FROM documents) GROUP BY 1),
        |gr AS (SELECT tok, cnt, substring(tok, CAST(i AS INT), CAST(n AS INT)) AS gram
        |       FROM tfv, UNNEST(range(2, 5)) AS s(n),
        |            UNNEST(range(1, length(tok) - n + 2)) AS t(i))
        |SELECT gram, CAST(SUM(cnt) AS BIGINT) AS occurrences,
        |       CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_types
        |FROM gr GROUP BY gram
        |ORDER BY occurrences DESC, gram LIMIT 200""".stripMargin,
    // q77: the weight list literal is interpolated from the SAME array the
    // Spark plan looks up; bucket = portable fingerprint mod 64, raw = Σ
    // bucket weights (exact ints), score = one IEEE division per doc
    "q77_quality_classifier" ->
      s"""WITH occ AS (SELECT doc_id, unnest($toksSql) AS tok FROM documents),
        |vocab AS (SELECT DISTINCT tok FROM occ),
        |wv AS (SELECT tok,
        |         ${classifierWeights.mkString("[", ", ", "]")}
        |           [CAST(${fpSql("tok")} % 64 AS INT) + 1] AS w
        |       FROM vocab),
        |aggq AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |           CAST(SUM(w) AS BIGINT) AS raw_score
        |         FROM occ JOIN wv USING (tok) GROUP BY doc_id)
        |SELECT d.doc_id, COALESCE(n_tokens, 0) AS n_tokens,
        |  COALESCE(raw_score, 0) AS raw_score,
        |  CASE WHEN COALESCE(n_tokens, 0) > 0
        |       THEN CAST(raw_score AS DOUBLE) / n_tokens
        |       ELSE 0.0 END AS score
        |FROM documents d LEFT JOIN aggq USING (doc_id)""".stripMargin,
    "q69_corpus_shuffle" ->
      s"""WITH d AS (SELECT doc_id,
        |  ${fpSql("text || '|shuffle'")} % 1000000 AS draw
        |  FROM documents)
        |SELECT doc_id, draw,
        |  CAST(ROW_NUMBER() OVER (ORDER BY draw, doc_id) AS BIGINT)
        |    AS shuffle_rank
        |FROM d""".stripMargin,
    "q70_random_projection" ->
      s"""WITH p(dim, plane) AS (VALUES
        |    $planesValuesSql)
        |SELECT e.vec_id, CAST(p.dim AS BIGINT) AS dim,
        |  ROUND(SUM(CAST(e.embedding[i] AS DOUBLE) * plane[i]), 6) AS proj
        |FROM embeddings e, p,
        |  UNNEST(range(1, len(e.embedding) + 1)) AS t(i)
        |GROUP BY e.vec_id, p.dim""".stripMargin,
    "q71_corpus_cube" ->
      s"""SELECT lang, source,
        |  CAST(GROUPING(lang, source) AS BIGINT) AS gid,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(len($toksSql)) AS BIGINT) AS n_tokens
        |FROM documents GROUP BY CUBE(lang, source)""".stripMargin,
    "q64_source_cap" ->
      s"""WITH d AS (SELECT doc_id, source,
        |  ${fpSql("text || '|srccap'")} % 1000000 AS draw
        |  FROM documents),
        |r AS (SELECT doc_id, source, draw,
        |        ROW_NUMBER() OVER (PARTITION BY source
        |                           ORDER BY draw, doc_id) AS src_rank
        |      FROM d)
        |SELECT doc_id, source, draw, CAST(src_rank AS BIGINT) AS src_rank
        |FROM r WHERE src_rank <= 10""".stripMargin,
    "q65_lm_surprisal" ->
      s"""WITH $surprisalCtes
        |SELECT doc_id, n_tokens, sum_bits, xent_bits FROM surx""".stripMargin,
    // q99: per-source floor-bits KL proxy — the q65 integer-exact bit
    // construction applied twice (corpus model and the source's own model)
    // over the shared (source, token, tf) table; kl_bits is a subtraction
    // of two exact-integer divisions, cross-engine exact.
    "q99_source_divergence" ->
      s"""WITH occ9 AS (SELECT source, unnest($toksSql) AS token
        |              FROM documents),
        |tfs9 AS (SELECT source, token, COUNT(*) AS tf FROM occ9
        |         GROUP BY 1, 2),
        |cx9 AS (SELECT token, SUM(tf) AS c FROM tfs9 GROUP BY 1),
        |nx9 AS (SELECT SUM(c) AS n_total FROM cx9),
        |ns9 AS (SELECT source, SUM(tf) AS n_src FROM tfs9 GROUP BY 1),
        |ag9 AS (SELECT tfs9.source,
        |    CAST(SUM(tf) AS BIGINT) AS n_tokens,
        |    CAST(SUM(tf * (length(bin(CAST(n_total // c AS BIGINT))) - 1))
        |      AS BIGINT) AS sum_corpus_bits,
        |    CAST(SUM(tf * (length(bin(CAST(n_src // tf AS BIGINT))) - 1))
        |      AS BIGINT) AS sum_source_bits
        |  FROM tfs9 JOIN cx9 USING (token) JOIN ns9 USING (source)
        |  CROSS JOIN nx9
        |  GROUP BY tfs9.source)
        |SELECT source, n_tokens, sum_corpus_bits, sum_source_bits,
        |  CAST(sum_corpus_bits AS DOUBLE) / n_tokens AS xent_corpus_bits,
        |  CAST(sum_source_bits AS DOUBLE) / n_tokens AS ent_source_bits,
        |  CAST(sum_corpus_bits AS DOUBLE) / n_tokens -
        |  CAST(sum_source_bits AS DOUBLE) / n_tokens AS kl_bits
        |FROM ag9""".stripMargin,
    "q75_lm_bigram" ->
      s"""WITH tb AS (SELECT doc_id, $toksSql AS w FROM documents),
        |c1b AS (SELECT tok, COUNT(*) AS c1
        |        FROM (SELECT unnest(w) AS tok FROM tb) GROUP BY 1),
        |nb AS (SELECT SUM(c1) AS n_total FROM c1b),
        |bigb AS (SELECT doc_id, w[i] AS w1, w[i] || ' ' || w[i+1] AS bg
        |         FROM tb, UNNEST(range(1, len(w))) AS s(i)),
        |c2b AS (SELECT bg, COUNT(*) AS c2 FROM bigb GROUP BY 1),
        |bsum AS (SELECT bigb.doc_id,
        |           SUM(length(bin(CAST(c1b.c1 // c2b.c2 AS BIGINT))) - 1)
        |             AS bg_bits
        |         FROM bigb JOIN c1b ON bigb.w1 = c1b.tok
        |         JOIN c2b USING (bg)
        |         GROUP BY bigb.doc_id),
        |fstb AS (SELECT doc_id, w[1] AS w1,
        |           CAST(len(w) AS BIGINT) AS n_tokens
        |         FROM tb WHERE len(w) > 0)
        |SELECT fstb.doc_id, fstb.n_tokens,
        |  CAST((length(bin(CAST(n_total // c1b.c1 AS BIGINT))) - 1)
        |    + COALESCE(bsum.bg_bits, 0) AS BIGINT) AS sum_bits,
        |  CAST((length(bin(CAST(n_total // c1b.c1 AS BIGINT))) - 1)
        |    + COALESCE(bsum.bg_bits, 0) AS DOUBLE) / fstb.n_tokens
        |    AS xent_bits
        |FROM fstb JOIN c1b ON fstb.w1 = c1b.tok
        |CROSS JOIN nb LEFT JOIN bsum USING (doc_id)""".stripMargin,
    "q66_incremental_dedup" ->
      s"""WITH $jaccardCtes,
        |$splitCtes
        |SELECT CASE WHEN sa.split = 'train' THEN jp.id_a
        |            WHEN sb.split = 'train' THEN jp.id_b
        |            ELSE jp.id_a END AS corpus_id,
        |       CASE WHEN sa.split = 'train' THEN jp.id_b
        |            WHEN sb.split = 'train' THEN jp.id_a
        |            ELSE jp.id_b END AS new_id,
        |       jp.jaccard AS jaccard
        |FROM jpairs jp
        |JOIN spl2 sa ON jp.id_a = sa.doc_id
        |JOIN spl2 sb ON jp.id_b = sb.doc_id
        |WHERE NOT (sa.split = 'train' AND sb.split = 'train')""".stripMargin,
    "q74_chunk_rewrite" ->
      // left-anchored on documents: a zero-token doc emits no chunk rows
      // (range(0,0) is empty) but the rewrite contract returns every doc
      s"""WITH toksr AS (SELECT doc_id, $toksSql AS w FROM documents),
        |ckr AS (SELECT doc_id, i AS chunk_idx,
        |          array_to_string(list_slice(w, i*16 + 1, i*16 + 16), ' ')
        |            AS chunk
        |        FROM toksr, UNNEST(range(0, (len(w) + 15) // 16)) AS t(i)),
        |rr AS (SELECT doc_id, chunk_idx, chunk,
        |         ROW_NUMBER() OVER (PARTITION BY chunk
        |                            ORDER BY doc_id, chunk_idx) AS rn
        |       FROM ckr),
        |agr AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
        |          CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |            AS kept_chunks,
        |          COALESCE(string_agg(CASE WHEN rn = 1 THEN chunk END, ' '
        |                              ORDER BY chunk_idx), '') AS text
        |        FROM rr GROUP BY doc_id)
        |SELECT d.doc_id, COALESCE(agr.n_chunks, 0) AS n_chunks,
        |  COALESCE(agr.kept_chunks, 0) AS kept_chunks,
        |  COALESCE(agr.text, '') AS text
        |FROM documents d LEFT JOIN agr USING (doc_id)""".stripMargin,
    "q67_chunk_dedup" ->
      s"""WITH toksc AS (SELECT doc_id, $toksSql AS w FROM documents),
        |cks AS (SELECT doc_id, i AS chunk_idx,
        |          array_to_string(list_slice(w, i*16 + 1, i*16 + 16), ' ')
        |            AS chunk
        |        FROM toksc, UNNEST(range(0, (len(w) + 15) // 16)) AS t(i)),
        |rx AS (SELECT doc_id, chunk_idx,
        |         ROW_NUMBER() OVER (PARTITION BY chunk
        |                            ORDER BY doc_id, chunk_idx) AS rn
        |       FROM cks)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
        |  CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dup_chunks,
        |  CAST(COUNT(*) - SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / COUNT(*) AS retention
        |FROM rx GROUP BY doc_id""".stripMargin,
    "q68_knn_pq" -> knnOracleSql,
    "q72_knn_ivfpq" -> knnOracleSql,
    "q73_pair_audit" ->
      // list_dot_product instead of the lateral-unnest + SUM form: same
      // value after ROUND(…,6) (verified element-order equivalent), and
      // the 64×-row blow-up the unnest join needed exhausted DuckDB's
      // temp-disk at sf0.1
      s"""WITH $jaccardCtes
        |SELECT jp.id_a, jp.id_b, ROUND(jp.jaccard, 6) AS jaccard,
        |  ROUND(list_dot_product(CAST(a.embedding AS DOUBLE[]),
        |                         CAST(b.embedding AS DOUBLE[]))
        |    / (SQRT(list_dot_product(CAST(a.embedding AS DOUBLE[]),
        |                             CAST(a.embedding AS DOUBLE[])))
        |       * SQRT(list_dot_product(CAST(b.embedding AS DOUBLE[]),
        |                               CAST(b.embedding AS DOUBLE[])))), 6)
        |    AS cosine
        |FROM jpairs jp
        |JOIN embeddings a ON jp.id_a = a.vec_id
        |JOIN embeddings b ON jp.id_b = b.vec_id""".stripMargin,
    "q63_mixture_sample" ->
      """WITH d AS (SELECT doc_id, lang,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |                 list_transform(string_split(text || '|mixture', ''),
        |                                ch -> CAST(ascii(ch) AS BIGINT))),
        |    (a, b) -> (a * 31 + b) % 144115188075855872) % 1000000 AS draw
        |  FROM documents)
        |SELECT doc_id, lang, draw FROM d
        |WHERE draw < CASE lang WHEN 'en' THEN 300000
        |                       WHEN 'es' THEN 600000
        |                       ELSE 1000000 END""".stripMargin,
    "q240_weighted_sample" ->
      s"""WITH d AS (SELECT doc_id,
        |    CAST(len($toksSql) AS BIGINT) AS weight,
        |    ${fpSql("text || '|wsample'")} AS h
        |  FROM documents),
        |ks AS (SELECT doc_id, weight, h // weight AS key
        |       FROM d WHERE weight > 0)
        |SELECT doc_id, weight, key FROM ks
        |QUALIFY row_number() OVER (ORDER BY key, doc_id) <= 100""".stripMargin,
    "q241_mixture_upsample" ->
      s"""WITH d AS (SELECT doc_id, lang,
        |    ${fpSql("text || '|upsample'")} % 1000000 AS draw
        |  FROM documents),
        |r AS (SELECT doc_id, lang,
        |    CASE lang
        |      WHEN 'zh' THEN 2 + CASE WHEN draw < 500000 THEN 1 ELSE 0 END
        |      WHEN 'fr' THEN 3
        |      ELSE 1 END AS reps
        |  FROM d)
        |SELECT doc_id, lang, CAST(t.rep AS BIGINT) AS rep
        |FROM r, UNNEST(range(0, reps)) AS t(rep)""".stripMargin,
    "q242_perplexity_buckets" ->
      s"""WITH $surprisalCtes,
        |kx AS (SELECT doc_id,
        |         CAST((sum_bits * 1000000) // n_tokens AS BIGINT)
        |           AS mbits_per_token
        |       FROM surx),
        |jx AS (SELECT d.doc_id, d.lang, kx.mbits_per_token
        |       FROM documents d JOIN kx USING (doc_id)),
        |rx AS (SELECT doc_id, lang, mbits_per_token,
        |         CAST(row_number() OVER (PARTITION BY lang
        |           ORDER BY mbits_per_token, doc_id) AS BIGINT) AS rn,
        |         CAST(COUNT(*) OVER (PARTITION BY lang) AS BIGINT) AS n
        |       FROM jx)
        |SELECT doc_id, lang, mbits_per_token,
        |  ((rn - 1) * 3) // n + 1 AS bucket
        |FROM rx""".stripMargin,
    "q243_weighted_sample_grouped" ->
      s"""WITH d AS (SELECT lang, doc_id,
        |    CAST(len($toksSql) AS BIGINT) AS weight,
        |    ${fpSql("text || '|wsample'")} AS h
        |  FROM documents),
        |ks AS (SELECT lang, doc_id, weight, h // weight AS key
        |       FROM d WHERE weight > 0)
        |SELECT lang, doc_id, weight, key FROM ks
        |QUALIFY row_number() OVER (PARTITION BY lang
        |  ORDER BY key, doc_id) <= 20""".stripMargin,
    // q244: the oracle recomputes the CLEAN canonical form straight from
    // the synthesis formulas (scheme/host lowercased, :80/fragment/
    // trailing-slash/tracking params gone, `item` kept) — the Spark side
    // gets only the messy URL and must scrub it back; then the same
    // min-id group rule and the q64 host-cap window (two-phase form
    // proven row-identical to this window in ScaleSpec)
    "q244_url_dedup" ->
      s"""WITH u AS (SELECT doc_id, text,
        |    'http://www.' || source || '.example.com/Page/' ||
        |      CAST(doc_id % 50 AS VARCHAR) || '?item=' ||
        |      CAST(doc_id % 7 AS VARCHAR) AS canonical_url,
        |    'www.' || source || '.example.com' AS host
        |  FROM documents),
        |g AS (SELECT canonical_url, MIN(doc_id) AS canonical_id
        |      FROM u GROUP BY 1),
        |l AS (SELECT u.doc_id, u.canonical_url, u.host, g.canonical_id,
        |        u.doc_id = g.canonical_id AS is_canonical, u.text
        |      FROM u JOIN g USING (canonical_url)),
        |d AS (SELECT doc_id, host,
        |        ${fpSql("text || '|urlcap'")} % 1000000 AS draw
        |      FROM l WHERE is_canonical),
        |r AS (SELECT doc_id,
        |        row_number() OVER (PARTITION BY host
        |          ORDER BY draw, doc_id) AS rk
        |      FROM d)
        |SELECT l.doc_id, l.canonical_url, l.host, l.canonical_id,
        |  l.is_canonical,
        |  l.is_canonical AND COALESCE(r.rk <= 10, FALSE) AS kept
        |FROM l LEFT JOIN r USING (doc_id)""".stripMargin,
    // q246: the Gopher battery re-derived — gram windows per n via list
    // slicing, one (doc, n, gram) count, struct-max argmax (the same
    // (count, len, gram) lexicographic tie-break Spark's max(struct)
    // computes), integer milli fractions and cross-multiplied keep
    "q246_gopher_repetition" -> {
      val ns = Seq(2, 3, 4, 5, 8, 10)
      val gramCtes = ns.map(n =>
        s"""SELECT doc_id, $n AS n,
          |  unnest(list_transform(generate_series(0, len(toks) - $n),
          |    s -> array_to_string(toks[s+1:s+$n], ' '))) AS g
          |FROM b WHERE len(toks) >= $n""".stripMargin)
        .mkString("\n  UNION ALL\n  ")
      val topAggs = Seq(2, 3, 4).map(n =>
        s"max(CASE WHEN n = $n THEN {'c': c, 'l': glen, 'g': g} END) " +
          s"AS t$n").mkString(",\n    ")
      val dupAggs = Seq(5, 8, 10).map(n =>
        s"SUM(CASE WHEN n = $n AND c >= 2 THEN c * glen ELSE 0 END) " +
          s"AS d$n").mkString(",\n    ")
      val chCols = (Seq(2, 3, 4).map(n =>
        s"COALESCE(t$n.c * t$n.l, 0) AS ch_t$n") ++
        Seq(5, 8, 10).map(n => s"COALESCE(d$n, 0) AS ch_d$n"))
        .mkString(",\n    ")
      // CAST: DuckDB sums BIGINT into HUGEINT, which floats through
      // LEAST — pin every milli column back to BIGINT
      val milliCols = (Seq(2, 3, 4).map(n =>
        s"CAST(CASE WHEN total > 0 THEN " +
          s"LEAST(1000, (ch_t$n * 1000) // total) ELSE 0 END AS BIGINT) " +
          s"AS top${n}_milli") ++
        Seq(5, 8, 10).map(n =>
          s"CAST(CASE WHEN total > 0 THEN " +
            s"LEAST(1000, (ch_d$n * 1000) // total) ELSE 0 END AS BIGINT) " +
            s"AS dup${n}_milli")).mkString(",\n  ")
      val thr = Map(2 -> 200, 3 -> 180, 4 -> 160, 5 -> 150, 8 -> 120,
        10 -> 100)
      val keep = (Seq(2, 3, 4).map(n =>
        s"ch_t$n * 1000 <= ${thr(n)} * total") ++
        Seq(5, 8, 10).map(n => s"ch_d$n * 1000 <= ${thr(n)} * total"))
        .mkString(" AND ")
      // length(), NOT strlen: the Spark side counts CHARACTERS
      // (length()), and strlen is bytes — they diverge on any multibyte
      // text (r17 review). COALESCE: a NULL text tokenizes to NULL,
      // which must score as the empty doc the Spark side coalesces to.
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
        |b AS (SELECT doc_id, toks,
        |        COALESCE(length(array_to_string(toks, ' ')), 0)
        |          AS total FROM t),
        |g AS (
        |  $gramCtes
        |),
        |c AS (SELECT doc_id, n, g, COUNT(*) AS c, length(g) AS glen
        |      FROM g GROUP BY 1, 2, 3),
        |s AS (SELECT doc_id,
        |    $topAggs,
        |    $dupAggs
        |  FROM c GROUP BY 1),
        |j AS (SELECT b.doc_id, b.total,
        |    $chCols
        |  FROM b LEFT JOIN s USING (doc_id))
        |SELECT doc_id, CAST(total AS BIGINT) AS n_chars,
        |  $milliCols,
        |  (total = 0 OR ($keep)) AS keep
        |FROM j""".stripMargin
    },
    "q61_contamination" ->
      s"""WITH $sh5Ctes,
        |fp AS (SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |                 list_transform(string_split(text, ''),
        |                                ch -> CAST(ascii(ch) AS BIGINT))),
        |    (a, b) -> (a * 31 + b) % 144115188075855872) % 100 AS bucket
        |  FROM documents),
        |spl AS (SELECT doc_id,
        |  CASE WHEN bucket < 80 THEN 'train'
        |       WHEN bucket < 90 THEN 'val'
        |       ELSE 'test' END AS split FROM fp),
        |dsh AS (SELECT DISTINCT doc_id, shingle FROM sh5),
        |train AS (SELECT DISTINCT shingle
        |          FROM dsh JOIN spl USING (doc_id) WHERE split = 'train'),
        |ev AS (SELECT dsh.doc_id,
        |         CASE WHEN t.shingle IS NOT NULL THEN 1 ELSE 0 END AS hit
        |       FROM dsh JOIN spl USING (doc_id)
        |       LEFT JOIN train t USING (shingle)
        |       WHERE spl.split <> 'train'),
        |agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
        |          CAST(SUM(hit) AS BIGINT) AS n_hit
        |        FROM ev GROUP BY doc_id)
        |SELECT s.doc_id, s.split,
        |  COALESCE(a.n_grams, 0) AS n_grams,
        |  COALESCE(a.n_hit, 0) AS n_hit,
        |  CASE WHEN COALESCE(a.n_grams, 0) > 0
        |       THEN CAST(a.n_hit AS DOUBLE) / a.n_grams
        |       ELSE 0.0 END AS contamination
        |FROM spl s LEFT JOIN agg a USING (doc_id)
        |WHERE s.split <> 'train'""".stripMargin,
    // q102: the q61 construction with the sides swapped — DISTINCT eval
    // grams probe the train shingles; is_kept = zero hits
    "q102_decontaminate" ->
      s"""WITH $sh5Ctes,
        |$splitCtes,
        |dshd AS (SELECT DISTINCT doc_id, shingle FROM sh5),
        |eg AS (SELECT DISTINCT shingle
        |       FROM dshd JOIN spl2 USING (doc_id) WHERE split <> 'train'),
        |tr AS (SELECT dshd.doc_id,
        |         CASE WHEN e.shingle IS NOT NULL THEN 1 ELSE 0 END AS hit
        |       FROM dshd JOIN spl2 USING (doc_id)
        |       LEFT JOIN eg e USING (shingle)
        |       WHERE spl2.split = 'train'),
        |agd AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
        |          CAST(SUM(hit) AS BIGINT) AS n_hit
        |        FROM tr GROUP BY doc_id)
        |SELECT s.doc_id,
        |  COALESCE(a.n_grams, 0) AS n_grams,
        |  COALESCE(a.n_hit, 0) AS n_hit,
        |  COALESCE(a.n_hit, 0) < 1 AS is_kept
        |FROM spl2 s LEFT JOIN agd a USING (doc_id)
        |WHERE s.split = 'train'""".stripMargin,
    "q62_boilerplate" ->
      s"""WITH $sh5Ctes
        |SELECT shingle, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df,
        |       CAST(COUNT(*) AS BIGINT) AS occurrences
        |FROM sh5 GROUP BY shingle
        |HAVING COUNT(DISTINCT doc_id) >= 2
        |ORDER BY df DESC, occurrences DESC, shingle LIMIT 100""".stripMargin,
    "q49_scrub" ->
      s"""SELECT doc_id,
        |  CAST(length(regexp_replace(
        |    regexp_replace(text, '${TextAnalysis.UrlRe}', '<URL>', 'g'),
        |    '${TextAnalysis.EmailRe}', '<EMAIL>', 'g')) AS BIGINT) AS clean_len,
        |  CAST(len(regexp_extract_all(text, '${TextAnalysis.EmailRe}'))
        |    AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(text, '${TextAnalysis.UrlRe}'))
        |    AS BIGINT) AS n_urls
        |FROM documents""".stripMargin,
    "q50_repetition" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS w FROM documents),
        |sh AS (SELECT doc_id,
        |         w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
        |       FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)
        |       WHERE len(w) >= 3),
        |c AS (SELECT doc_id, shingle, COUNT(*) AS n FROM sh GROUP BY 1, 2)
        |SELECT doc_id, CAST(MAX(n) AS DOUBLE) / CAST(SUM(n) AS BIGINT)
        |  AS rep_ratio
        |FROM c GROUP BY doc_id""".stripMargin,
    "q30_minhash_dedup" -> jaccardOracleSql,
    "q33_knn_lsh" -> knnOracleSql,
    "q51_dedup_clusters" -> clusterOracleSql,
    // q101: the q51 cluster CTEs + the q55 fingerprint-bucket split keyed
    // on the CANONICAL member's text — whole clusters share one bucket
    "q101_leakage_safe_split" ->
      s"""WITH RECURSIVE $clusterCtes,
        |cb AS (SELECT DISTINCT cluster_id FROM clx),
        |cbk AS (SELECT cb.cluster_id,
        |          ${fpSql("d.text")} % 100 AS bucket
        |        FROM cb JOIN documents d ON d.doc_id = cb.cluster_id)
        |SELECT clx.doc_id, clx.cluster_id, cbk.bucket,
        |  CASE WHEN bucket < 80 THEN 'train'
        |       WHEN bucket < 90 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM clx JOIN cbk USING (cluster_id)""".stripMargin,
    "q52_knn_ivf" -> knnOracleSql,
    "q58_perceptual_hash" ->
      """WITH chars AS (
        |  SELECT doc_id, i - 1 AS idx, length(text) AS n,
        |         ascii(text[i]) AS code
        |  FROM documents, UNNEST(range(1, length(text) + 1)) AS t(i)),
        |cells AS (
        |  SELECT doc_id, (idx * 64) // n AS c,
        |         SUM(code) // COUNT(*) AS cell
        |  FROM chars GROUP BY doc_id, (idx * 64) // n),
        |tot AS (SELECT doc_id, SUM(cell) AS total FROM cells GROUP BY doc_id),
        |h AS (SELECT cells.doc_id,
        |    CAST(BIT_OR(CASE
        |      WHEN cell * 64 <= total THEN 0
        |      WHEN c = 63 THEN -9223372036854775808
        |      ELSE 1::BIGINT << c END) AS BIGINT) AS phash
        |  FROM cells JOIN tot USING (doc_id)
        |  GROUP BY cells.doc_id)
        |-- empty text emits no char rows but the Scala side hashes it to 0:
        |-- anchor on documents so both relations cover every doc
        |SELECT d.doc_id, COALESCE(h.phash, 0) AS phash
        |FROM documents d LEFT JOIN h USING (doc_id)""".stripMargin,
    "q57_quant_stats" ->
      """WITH g AS (SELECT vec_id,
        |    CAST(list_aggregate(embedding, 'min') AS DOUBLE) AS mn,
        |    CAST(list_aggregate(embedding, 'max') AS DOUBLE) AS mx,
        |    embedding AS e
        |  FROM embeddings),
        |codes AS (SELECT vec_id, mn, mx,
        |    CASE WHEN mx = mn THEN -128
        |         ELSE CAST(ROUND((CAST(e[i] AS DOUBLE) - mn) * 255.0
        |                          / (mx - mn)) AS INT) - 128 END AS q
        |  FROM g, UNNEST(range(1, len(e) + 1)) AS t(i))
        |SELECT vec_id, MIN(mn) AS q_min, MIN(mx) AS q_max,
        |       CAST(SUM(q) AS BIGINT) AS code_sum,
        |       CAST(MIN(q) AS BIGINT) AS code_min,
        |       CAST(MAX(q) AS BIGINT) AS code_max
        |FROM codes GROUP BY vec_id""".stripMargin,
    "q55_data_split" ->
      """WITH fp AS (SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |                 list_transform(string_split(text, ''),
        |                                ch -> CAST(ascii(ch) AS BIGINT))),
        |    (a, b) -> (a * 31 + b) % 144115188075855872) % 100 AS bucket
        |  FROM documents)
        |SELECT doc_id, bucket,
        |  CASE WHEN bucket < 80 THEN 'train'
        |       WHEN bucket < 90 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM fp""".stripMargin,
    "q56_seq_packing" ->
      s"""WITH t AS (SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS n_tokens
        |           FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |        CAST(SUM(n_tokens) OVER (ORDER BY doc_id) AS BIGINT)
        |          AS cum_tokens
        |      FROM t)
        |SELECT doc_id, n_tokens, cum_tokens,
        |       (cum_tokens - n_tokens) // 2048 AS bin
        |FROM c""".stripMargin,
    "q53_top_terms" ->
      s"""WITH toks AS (SELECT doc_id, unnest($toksSql) AS token
        |             FROM documents),
        |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        |dfreq AS (SELECT token, COUNT(DISTINCT doc_id) AS df
        |          FROM toks GROUP BY 1),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |s AS (SELECT doc_id, tf.token AS token,
        |        CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
        |        CAST(tf * n_docs AS DOUBLE) / df AS score
        |      FROM tf JOIN dfreq USING (token) CROSS JOIN n)
        |SELECT doc_id, token, tf, df, score,
        |  ROW_NUMBER() OVER (PARTITION BY doc_id
        |                     ORDER BY score DESC, token) AS rnk
        |FROM s QUALIFY rnk <= 3""".stripMargin,
    "q54_label_centroids" ->
      """SELECT label, CAST(i - 1 AS BIGINT) AS dim,
        |  ROUND(SUM(CAST(embedding[i] AS DOUBLE)) / COUNT(*), 6) AS mu,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
        |GROUP BY label, i""".stripMargin,
    "q44_props_map" ->
      """SELECT 'k' AS map_key, COUNT(*) AS n,
        |  CAST(SUM(CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS BIGINT))
        |       AS BIGINT) AS value_sum
        |FROM events""".stripMargin,
    // q76: the q42 exact-cosine pair CTE feeding the q51 recursive
    // reachability CTE — min vec_id reachable over the cosine-≥0.45 graph.
    // The Spark side runs IVF-pruned pairs + hash-min components; both
    // pieces are recall-1.0/equivalence-pinned (LlmOpsSpec), so the exact
    // declarative composition is the oracle.
    "q76_embedding_clusters" ->
      s"""WITH RECURSIVE $embClusterCtes
        |SELECT vec_id, cluster_id FROM eclx""".stripMargin,
    // q95: the q76 cluster CTEs + the q36 quality CTEs, kept member by
    // (quality DESC, vec_id DESC) — the q88 retention policy on the
    // SEMANTIC cluster relation (doc_id ↔ vec_id, the q73 alignment)
    "q95_semantic_keep" ->
      s"""WITH RECURSIVE $embClusterCtes,
        |$qualityCtes,
        |sbj AS (SELECT eclx.vec_id, eclx.cluster_id, qsc.quality_score
        |        FROM eclx JOIN qsc ON qsc.doc_id = eclx.vec_id),
        |sbk AS (SELECT vec_id, cluster_id,
        |          FIRST_VALUE(vec_id) OVER (PARTITION BY cluster_id
        |            ORDER BY quality_score DESC, vec_id DESC) AS kept_id
        |        FROM sbj)
        |SELECT vec_id, cluster_id, kept_id,
        |  vec_id = kept_id AS is_kept
        |FROM sbk""".stripMargin,
    "q42_embedding_dedup" ->
      """WITH v AS (SELECT vec_id, embedding AS e FROM embeddings),
        |dots AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |           SUM(CAST(a.e[i] AS DOUBLE) * CAST(b.e[i] AS DOUBLE)) AS dp,
        |           SQRT(SUM(CAST(a.e[i] AS DOUBLE) * CAST(a.e[i] AS DOUBLE))) AS na,
        |           SQRT(SUM(CAST(b.e[i] AS DOUBLE) * CAST(b.e[i] AS DOUBLE))) AS nb
        |         FROM v a, v b, UNNEST(range(1, len(a.e) + 1)) AS t(i)
        |         WHERE a.vec_id < b.vec_id
        |         GROUP BY a.vec_id, b.vec_id)
        |SELECT id_a, id_b, ROUND(dp / (na * nb), 6) AS cos
        |FROM dots WHERE dp / (na * nb) >= 0.45""".stripMargin,
    "q28_dedup_exact" ->
      """SELECT doc_id, MIN(doc_id) OVER (PARTITION BY text) AS canonical_id
        |FROM documents""".stripMargin,
    "q29_jaccard_pairs" -> jaccardOracleSql,
    // q152: the SAME oracle as q29 — prefix filtering is exact, and the
    // oracle equality is the no-false-negative lemma checked on data
    "q152_prefix_jaccard" -> jaccardOracleSql,
    "q32_knn_brute" -> knnOracleSql,
    "q98_hard_negatives" -> hardNegOracleSql,
    "q100_mmr_rerank" -> mmrOracleSql(5, 0.7),
    "q34_text_stats" ->
      s"""SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(len($toksSql)) AS BIGINT) AS total_tokens,
        |  CAST(SUM(length(text)) AS BIGINT) AS total_chars,
        |  CAST(SUM(length(regexp_replace(text, '[^.,;:!?''"()]', '', 'g')))
        |       AS BIGINT) AS punct_chars,
        |  CAST(SUM(len(list_filter($toksSql, x -> list_contains($stopSql, x))))
        |       AS BIGINT) AS stopword_tokens
        |FROM documents GROUP BY lang""".stripMargin,
    "q35_lang_id" -> LangIdOracle.sql,
    "q59_heavy_hitters" ->
      s"""WITH toks AS (SELECT unnest($toksSql) AS token FROM documents)
        |SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM toks GROUP BY token
        |ORDER BY cnt DESC, token LIMIT 10""".stripMargin,
    // q31: same hash family as q37 (mod-2^57 rolling hash), applied per
    // token; 64-bit signature = sign-vote per bit; pairs at Hamming ≤ 3.
    // Bits ≥ 57 of the hash are identically 0 (the modulus), so voting over
    // range(0,57) is exactly the Scala side's 64-bit vote — the high bits'
    // votes are always -n ≤ 0 there, never set — and stays clear of the
    // 1<<63 BIGINT overflow DuckDB raises on.
    // q172: same prefix blocks, same hot-block cap, same textbook
    // Levenshtein on candidate pairs only
    "q172_edit_dedup" ->
      """WITH k AS (SELECT doc_id, text, substr(text, 1, 24) AS blk
        |       FROM documents),
        |ok AS (SELECT blk FROM k GROUP BY 1 HAVING COUNT(*) <= 64),
        |b AS (SELECT k.* FROM k JOIN ok USING (blk))
        |SELECT x.doc_id AS id_a, y.doc_id AS id_b,
        |  CAST(levenshtein(x.text, y.text) AS BIGINT) AS dist
        |FROM b x JOIN b y ON x.blk = y.blk AND x.doc_id < y.doc_id
        |WHERE levenshtein(x.text, y.text) <= 16""".stripMargin,
    "q31_simhash_pairs" ->
      s"""WITH toks AS (SELECT doc_id, unnest($toksSql) AS tok FROM documents),
        |h AS (SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |                 list_transform(string_split(tok, ''),
        |                                ch -> CAST(ascii(ch) AS BIGINT))),
        |    (a, b) -> (a * 31 + b) % 144115188075855872) AS th
        |  FROM toks),
        |votes AS (SELECT doc_id, i,
        |    SUM(CASE WHEN (th >> i) & 1 = 1 THEN 1 ELSE -1 END) AS v
        |  FROM h, UNNEST(range(0, 57)) AS t(i) GROUP BY doc_id, i),
        |sig0 AS (SELECT doc_id,
        |    CAST(BIT_OR(CASE WHEN v > 0 THEN 1::BIGINT << i ELSE 0 END)
        |         AS BIGINT) AS sh
        |  FROM votes GROUP BY doc_id),
        |-- zero-token docs emit no vote rows but the Scala side signs them 0
        |sig AS (SELECT d.doc_id, COALESCE(s.sh, 0) AS sh
        |        FROM documents d LEFT JOIN sig0 s USING (doc_id))
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
        |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.sh, b.sh)) <= 3""".stripMargin,
    "q36_quality_score" ->
      s"""WITH $qualityCtes
        |SELECT doc_id, n_tokens, mean_token_len, punct_ratio,
        |  stopword_ratio, quality_score
        |FROM qsc""".stripMargin,
    // q230: the textbook two-window form vs the Spark side's one
    // struct-argmax aggregate — tie-breaks pinned to the smaller doc_id
    // on both ends, margin > 0 so a tied source emits no pair
    "q230_preference_pairs" ->
      s"""WITH $qualityCtes,
        |qsrc AS (SELECT q.doc_id, d.source,
        |           CAST(ROUND(q.quality_score * 10, 0) AS BIGINT) AS q10
        |         FROM qsc q JOIN documents d USING (doc_id)),
        |ranked AS (SELECT source, doc_id, q10,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY q10 DESC, doc_id) AS rc,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY q10 ASC, doc_id) AS rr
        |  FROM qsrc)
        |SELECT c.source, c.doc_id AS chosen_id, c.q10 AS chosen_q10,
        |  r.doc_id AS rejected_id, r.q10 AS rejected_q10,
        |  c.q10 - r.q10 AS margin_q10
        |FROM (SELECT * FROM ranked WHERE rc = 1) c
        |JOIN (SELECT * FROM ranked WHERE rr = 1) r USING (source)
        |WHERE c.q10 > r.q10""".stripMargin,
    // q103: the q36 quality CTEs + a cumulative token spend in quality-desc
    // order; the 40% budget boundary is the exact-integer cum*5 <= total*2.
    // The window SUM MUST be cast back to BIGINT: DuckDB widens SUM(BIGINT)
    // to HUGEINT, which pandas renders as float64 — Spark's int64 column
    // then hash-mismatches in the driver's value canonicalization even
    // though every value is numerically equal (the r8 red cell; the only
    // un-cast aggregate among all 107 oracles)
    "q103_token_budget" ->
      s"""WITH $qualityCtes,
        |sel3 AS (SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |    quality_score,
        |    CAST(SUM(CAST(n_tokens AS BIGINT)) OVER (
        |      ORDER BY quality_score DESC, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum_tokens
        |  FROM qsc),
        |tot3 AS (SELECT SUM(n_tokens) AS total FROM sel3)
        |SELECT doc_id, n_tokens, quality_score, cum_tokens,
        |  cum_tokens * 5 <= total * 2 AS is_kept
        |FROM sel3 CROSS JOIN tot3""".stripMargin,
    // q104: two unigram LMs in the exact whole-bit arithmetic (raw corpus
    // vs the en target subset, OOV at ct = 1), importance = the integer
    // bit difference, keep rank*4 <= n*1
    "q104_dsir_select" ->
      s"""WITH tb4 AS (SELECT doc_id, $toksSql AS w FROM documents),
        |occ4 AS (SELECT doc_id, unnest(w) AS token FROM tb4),
        |tf4 AS (SELECT doc_id, token, COUNT(*) AS tf FROM occ4
        |        GROUP BY 1, 2),
        |cr4 AS (SELECT token, SUM(tf) AS c FROM tf4 GROUP BY 1),
        |nr4 AS (SELECT SUM(c) AS n_total FROM cr4),
        |tg4 AS (SELECT $toksSql AS w FROM documents WHERE lang = 'en'),
        |toc4 AS (SELECT unnest(w) AS token FROM tg4),
        |ct4 AS (SELECT token, COUNT(*) AS ct FROM toc4 GROUP BY 1),
        |nt4 AS (SELECT SUM(ct) AS nt_total FROM ct4),
        |per4 AS (SELECT tf4.doc_id,
        |    CAST(SUM(tf) AS BIGINT) AS n_tokens,
        |    CAST(SUM(tf * (length(bin(CAST(n_total // c AS BIGINT))) - 1))
        |      AS BIGINT) AS raw_bits,
        |    CAST(SUM(tf * (length(bin(CAST(nt_total // COALESCE(ct, 1)
        |      AS BIGINT))) - 1)) AS BIGINT) AS target_bits
        |  FROM tf4 JOIN cr4 USING (token) LEFT JOIN ct4 USING (token)
        |  CROSS JOIN nr4 CROSS JOIN nt4
        |  GROUP BY tf4.doc_id),
        |anc4 AS (SELECT d.doc_id,
        |    COALESCE(n_tokens, 0) AS n_tokens,
        |    COALESCE(raw_bits, 0) AS raw_bits,
        |    COALESCE(target_bits, 0) AS target_bits,
        |    COALESCE(raw_bits, 0) - COALESCE(target_bits, 0) AS logw_bits
        |  FROM documents d LEFT JOIN per4 USING (doc_id)),
        |rk4 AS (SELECT *,
        |    ROW_NUMBER() OVER (ORDER BY logw_bits DESC, doc_id) AS rnk,
        |    COUNT(*) OVER () AS n
        |  FROM anc4)
        |SELECT doc_id, n_tokens, raw_bits, target_bits, logw_bits,
        |  CAST(rnk AS BIGINT) AS rnk, rnk * 4 <= n * 1 AS is_kept
        |FROM rk4""".stripMargin,
    "q37_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |                 list_transform(string_split(text, ''),
        |                                ch -> CAST(ascii(ch) AS BIGINT))),
        |    (a, b) -> (a * 31 + b) % 144115188075855872) AS fp
        |FROM documents""".stripMargin,
    "q38_multimodal_meta" ->
      // the synthesis formulas (format = doc_id % 5, dims from doc_id,
      // wav = 16000 B/s with the text as the data chunk, jpeg header =
      // 33 bytes like the png) re-derived in SQL — the Spark side
      // computes these by PARSING the file headers
      """SELECT doc_id,
        |  CASE CAST(doc_id % 5 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
        |       WHEN 2 THEN 'bmp' WHEN 3 THEN 'wav' ELSE 'jpeg' END
        |    AS codec,
        |  strlen(text) + CASE CAST(doc_id % 5 AS INT)
        |    WHEN 0 THEN 33 WHEN 1 THEN 13 WHEN 2 THEN 54 WHEN 3 THEN 44
        |    ELSE 33 END AS n_bytes,
        |  CASE WHEN doc_id % 5 = 3 THEN 0 ELSE doc_id % 640 + 1 END
        |    AS width,
        |  CASE WHEN doc_id % 5 = 3 THEN 0 ELSE (doc_id * 7) % 480 + 1 END
        |    AS height,
        |  CASE WHEN doc_id % 5 = 3 THEN (strlen(text) * 1000) // 16000
        |       ELSE 0 END AS duration_ms
        |FROM documents""".stripMargin)
}

/** Oracle for the stopword-vote language-ID argmax (first-wins ties). */
object LangIdOracle {
  val sql: String = {
    // keep aligned with TextAnalysis.tokens, see toksSql above
    val toks = "list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')"
    val lists = graft.llm.TextAnalysis.DefaultStoplists
    val scoreCols = lists.map { case (lang, ws) =>
      val arr = ws.map(w => s"'${w}'").mkString("[", ",", "]")
      s"len(list_filter($toks, x -> list_contains($arr, x))) AS s_$lang"
    }.mkString(",\n  ")
    val langs = lists.map(_._1)
    val mx = langs.map(l => s"s_$l").mkString("GREATEST(", ", ", ")")
    val caseChain = langs.map(l => s"WHEN s_$l = mx THEN '$l'").mkString(" ")
    s"""WITH sc AS (SELECT lang, $scoreCols FROM documents),
      |m AS (SELECT lang, $mx AS mx, * FROM sc)
      |SELECT CASE WHEN mx = 0 THEN 'und' $caseChain END AS pred_lang,
      |       lang, COUNT(*) AS n
      |FROM m GROUP BY 1, 2""".stripMargin
  }
}
