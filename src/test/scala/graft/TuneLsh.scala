package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.llm.{Dedup, Similarity}

/** One-off parameter-tuning harness (test scope, not shipped): prints recall
  * of the LSH paths against their exact ground truths at both gate scales so
  * the registry call-sites can pin parameters with verified recall 1.0.
  * Run: sbt "Test/runMain graft.TuneLsh"
  */
object TuneLsh {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local("tune-lsh")
    import spark.implicits._

    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      println(s"=== $sf ===")
      val docs = Tables.documents(spark, sf)
      val exact = Dedup.ngramJaccardPairs(docs, w = 3, tau = 0.5)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      println(s"exact jaccard tau=0.5 pairs: ${exact.size}")
      for ((b, r) <- Seq((16, 4), (32, 2), (48, 2), (64, 1), (32, 1))) {
        val got = Dedup.minHashDedupPairs(docs, w = 3, tau = 0.5,
            bands = b, rowsPerBand = r)
          .select("id_a", "id_b").as[(Long, Long)].collect().toSet
        println(s"minhash b=$b r=$r -> ${got.size} pairs, " +
          s"missed=${(exact -- got).size}, extra=${(got -- exact).size}")
      }

      val emb = Tables.embeddings(spark, sf)
      val queries = emb.filter(col("vec_id") < 10)
      val brute = Similarity.bruteForceTopK(emb, queries, k = 5)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      for ((np, t) <- Seq((8, 4), (4, 8), (4, 16), (3, 12), (2, 12), (2, 16))) {
        val lsh = Similarity.lshTopK(emb, queries, k = 5,
            nPlanes = np, tables = t)
          .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
        val recall = (brute & lsh).size.toDouble / brute.size
        println(f"ann np=$np t=$t -> recall $recall%.4f " +
          s"missed=${(brute -- lsh).size}")
      }

      val exactNd = Similarity.embeddingNearDupPairs(emb, tau = 0.45)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      println(s"exact near-dup tau=0.45 pairs: ${exactNd.size}")
      for ((np, t) <- Seq((2, 8), (2, 12), (2, 16), (3, 16), (4, 24))) {
        val got = Similarity.embeddingNearDupPairsLsh(emb, tau = 0.45,
            nPlanes = np, tables = t)
          .select("id_a", "id_b").as[(Long, Long)].collect().toSet
        println(s"neardup-lsh np=$np t=$t -> ${got.size} pairs, " +
          s"missed=${(exactNd -- got).size}, extra=${(got -- exactNd).size}")
      }
    }
    spark.stop()
  }
}
