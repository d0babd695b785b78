package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.llm.Similarity

/** Measurement harness: kNN-graph recall of the IVF cell self-join vs the
  * brute-force all-pairs graph, per (tables, probes), at a given sfDir —
  * the measure-before-wiring protocol (TuneIvf/TunePq precedent).
  *
  * MEASURED CONCLUSION (sf0.01, 2026-08-13): no parameter point both
  * prunes and recalls on this corpus — candidate recall 1.0 for the top-3
  * graph needs ≥0.99 of all pairs as candidates (probes=4 already reads
  * 72%). Uniform random 64-dim vectors put every vector's nearest
  * neighbors inside the cosine bulk, so a symmetric multi-probe self-join
  * loses all cell selectivity — the same geometry boundary measured for
  * q42 at sf0.1, but with no recall-1.0 pruning point even at gate scale.
  * A kNN-graph operator is therefore NOT registered: on this data the
  * honest exact form is the brute self-join (q32 with queries = corpus),
  * and an "IVF graph" that reads 99% of pairs would be a false scale
  * claim. On clustered real embedding spaces the same composition
  * (ivfCandidatePairs → per-query bounded top-k) is the right layout.
  */
object TuneKnnGraph {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val k = 3
    val spark = graft.core.Sessions.local("tune-knn")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfDir)
    val n = emb.count()
    val brute = Similarity.bruteForceTopK(emb, emb, k)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    println(s"[tune-knn] n=$n brute edges=${brute.size}")
    for (tables <- Seq(8, 12); probes <- Seq(4, 8, 16)) {
      graft.core.CacheScope.scoped {
        val cents = Similarity.trainIvfCentroids(emb, 64, tables)
        val asg = graft.core.CacheScope.track(
          Similarity.ivfAssignments(emb, cents, probes).persist())
        asg.count()
        val a = asg.select(col("tbl"), col("centroid"), col("id").as("query_id"))
        val b = asg.select(col("tbl"), col("centroid"), col("id").as("neighbor_id"))
        val cand = a.join(b, Seq("tbl", "centroid"))
          .filter(col("query_id") =!= col("neighbor_id"))
          .select("query_id", "neighbor_id").distinct()
        val nc = cand.count()
        val got = cand.as[(Long, Long)].collect().toSet
        val rec = brute.count(got.contains)
        println(f"[tune-knn] tables=$tables probes=$probes candFrac=${nc.toDouble / (n * (n - 1))}%.3f candRecall=$rec/${brute.size}")
      }
    }
    spark.stop()
  }
}
