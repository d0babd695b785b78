package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.llm.Dedup

/** Scratch: break q30 minhash-dedup into shingle / signature / banding /
  * verify stages. Run: sbt "Test/runMain graft.ProfileMinhash"
  */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local("profile-minhash")
    def time[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[mh] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = Tables.documents(spark, sfDir)
    Dedup.minHashDedupPairs(Tables.documents(spark, "/root/testdata/sf0.001"),
      w = 3, tau = 0.5, bands = 32, rowsPerBand = 2).count() // warmup
    spark.sqlContext.clearCache()

    time("full q30")(
      Dedup.minHashDedupPairs(docs, w = 3, tau = 0.5,
        bands = 32, rowsPerBand = 2).count())
    spark.sqlContext.clearCache()
    val sh = Dedup.shingles(docs, 3).filter(col("shingle").isNotNull)
    println(s"[mh] shingle rows: ${time("shingles")(sh.count())}")
    time("signatures")(
      Dedup.minHashSignatures(sh, 64).count())
    spark.sqlContext.clearCache()
    val cand = time("candidates (incl sig)")(
      Dedup.minHashLshCandidatesFrom(sh, 32, 2))
    println(s"[mh] candidates: ${time("cand count")(cand.count())}")
    spark.stop()
  }
}
