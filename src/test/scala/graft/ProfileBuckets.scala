package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.llm.{Dedup, TextAnalysis}

/** Measurement harness: surprisal-bucket distribution at each curation-job
  * stage (the measure-before-wiring protocol).
  *
  * MEASURED CONCLUSION (sf0.001, 2026-08-13): the whole-bit surprisal is
  * KNIFE-EDGE on this synthetic corpus — the vocabulary is near-uniform,
  * so almost every token carries exactly 4 bits (n_total/c ∈ [16, 32))
  * and per-doc xent_bits clusters tightly above 4.0. Removing the ~24
  * near-dup template docs shrinks n_total enough to push the borderline
  * tokens' bits from 5 to 4, collapsing xent to a near-constant
  * (2-5 distinct values per language, c1 = c2 → no 'middle' bucket);
  * the chunk rewrite re-spreads it by varying doc token mixes. Raw-corpus
  * terciles (the q91 gate relation) are healthy at all three scales.
  * Consequence for CurationJob: the carried surprisal_bucket column is
  * mostly 'head' at its pipeline position on THIS data — an honest
  * geometry note, not an operator defect (both engines agree bit-for-bit
  * wherever it is computed; the discriminating behavior is pinned by the
  * LlmOpsSpec thirds test on the raw corpus).
  */
object ProfileBuckets {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = graft.core.Sessions.local("profile-buckets")
    spark.sparkContext.setLogLevel("ERROR")
    def dist(tag: String, docs: org.apache.spark.sql.DataFrame): Unit = {
      val d = TextAnalysis.surprisalBuckets(docs)
        .groupBy("lang", "bucket").count()
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .sortBy(t => (t._1, t._2))
      println(s"[buckets] $tag: ${d.mkString(" ")}")
    }
    val raw = Tables.documents(spark, sfDir)
    dist("raw", raw)
    val docs = raw.withColumn("text", TextAnalysis.scrub(col("text")))
    val exact = Dedup.exactCanonical(docs)
      .filter(col("doc_id") === col("canonical_id")).drop("canonical_id")
    dist("exact", exact)
    val nearPairs = Dedup.minHashDedupPairs(exact, w = 3, tau = 0.8)
      .select("id_a", "id_b")
    val survivors = Dedup.keepBestInCluster(
        Dedup.connectedComponents(exact.select(col("doc_id")), nearPairs,
          "doc_id"),
        TextAnalysis.qualityScore(exact)
          .select(col("doc_id"), col("quality_score")))
      .filter(col("is_kept")).select("doc_id")
    val afterNear = exact.join(survivors, Seq("doc_id"), "left_semi")
    dist("afterNear", afterNear)
    val rewritten = Dedup.chunkDedupRewrite(afterNear, w = 16)
      .filter(length(col("text")) > 0)
      .select("doc_id", "text")
      .join(afterNear.drop("text"), "doc_id")
    dist("afterChunkRewrite", rewritten)
    val unstraddled = Dedup.substringDedupRewrite(rewritten, w = 8)
      .filter(length(col("text")) > 0)
      .select("doc_id", "text")
      .join(rewritten.drop("text"), "doc_id")
      .localCheckpoint()
    dist("afterSubstrRewrite", unstraddled)
    spark.stop()
  }
}
