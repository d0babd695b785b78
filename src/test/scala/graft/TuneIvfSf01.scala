package graft

import graft.core.Tables
import graft.llm.Similarity

/** Scratch: tune IVF (q42 pairs + q52 topk) for recall 1.0 at sf0.1 too.
  * Run: sbt "Test/runMain graft.TuneIvfSf01"
  */
object TuneIvfSf01 {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local("tune-ivf-sf01")
    import spark.implicits._
    import org.apache.spark.sql.functions.col

    for (sf <- Seq("/root/testdata/sf0.1")) {
      println(s"=== $sf ===")
      val emb = Tables.embeddings(spark, sf)
      val n = emb.count()
      val totalPairs = n * (n - 1) / 2
      val exact = Similarity.embeddingNearDupPairs(emb, tau = 0.45)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      println(s"n=$n exact pairs: ${exact.size}")
      for ((t, k, m) <- Seq((12, 64, 1), (12, 64, 2), (16, 64, 2),
        (12, 32, 2), (16, 32, 2), (12, 64, 3), (20, 64, 2))) {
        val cents = Similarity.trainIvfCentroids(emb, k = k, tables = t)
        val cand = Similarity.ivfCandidatePairs(emb, cents, probes = m)
          .as[(Long, Long)].collect().toSet
        spark.sqlContext.clearCache()
        println(f"pairs T=$t k=$k m=$m -> cand=${cand.size} " +
          f"frac=${cand.size.toDouble / totalPairs}%.4f " +
          s"recall=${(exact & cand).size}/${exact.size}")
      }
      // topk: query probes sweep at corpus probes=1
      val queries = emb.filter(col("vec_id") < 10)
      val brute = Similarity.bruteForceTopK(emb, queries, k = 5)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      for ((t, k, m) <- Seq((12, 64, 6), (12, 64, 10), (12, 64, 16),
        (16, 64, 10), (12, 32, 8))) {
        val ivf = Similarity.ivfTopK(emb, queries, k = 5,
          kCentroids = k, tables = t, probes = m)
          .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
        spark.sqlContext.clearCache()
        println(s"topk T=$t k=$k m=$m recall=${(brute & ivf).size}/${brute.size}")
      }
    }
    spark.stop()
  }
}
