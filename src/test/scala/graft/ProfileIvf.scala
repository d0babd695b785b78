package graft

import graft.core.Tables
import graft.llm.Similarity

/** Scratch: break q42's IVF cost into train / assign / candidates / verify.
  * Run: sbt "Test/runMain graft.ProfileIvf" (SPARK_GRAFT_SF_DIR to change)
  */
object ProfileIvf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local("profile-ivf")
    def time[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ivf] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warmup at the small scale
    Similarity.embeddingNearDupPairsIvf(
      Tables.embeddings(spark, "/root/testdata/sf0.001"), tau = 0.45).count()
    spark.sqlContext.clearCache()

    val emb = Tables.embeddings(spark, sfDir)
    time("full query")(
      Similarity.embeddingNearDupPairsIvf(emb, tau = 0.45).count())
    spark.sqlContext.clearCache()
    val cents = time("train")(Similarity.trainIvfCentroids(emb, 64, 12))
    time("assign")(Similarity.ivfAssignments(emb, cents, 1).count())
    val cand = time("candidates (incl one assign scan)")(
      Similarity.ivfCandidatePairs(emb, cents, 1))
    println(s"[ivf] candidate pairs: ${time("cand count")(cand.count())}")
    spark.stop()
  }
}
