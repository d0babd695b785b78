package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.llm.Similarity

/** PQ parameter-tuning harness (test scope, not shipped): for each
  * (m, kCodes) grid point, prints the minimum `refine` that makes the
  * ADC+refine output equal brute force (recall 1.0) on each local corpus —
  * i.e. the worst ADC rank over all true top-5 neighbors. The registry's
  * refine must sit at or above the sf0.001/sf0.01 numbers (the gate) and
  * the sf0.1 number is the documented bench-scale boundary.
  * Run: sbt "Test/runMain graft.TunePq"
  */
object TunePq {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local("tune-pq")
    import spark.implicits._

    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
      "/root/testdata/sf0.1")) {
      println(s"=== $sf ===")
      val emb = Tables.embeddings(spark, sf)
      val queries = emb.filter(col("vec_id") < 10)
      val n = emb.count()
      val truth = Similarity.bruteForceTopK(emb, queries, k = 5)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      for ((m, kc) <- Seq((8, 16), (8, 32), (16, 16), (16, 32))) {
        // the worst ADC rank over all true top-5 neighbors IS the minimum
        // refine that reaches recall 1.0
        val adcRanks = Similarity.pqAdcRanks(emb, queries, m, kc)
          .as[(Long, Long, Long)].collect()
          .map { case (q, nb, r) => (q, nb) -> r }.toMap
        val worst = truth.toSeq.map(adcRanks).max
        println(s"m=$m k=$kc minRefineForRecall1=$worst / n=$n")
      }
      graft.core.CacheScope.scoped {}
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
