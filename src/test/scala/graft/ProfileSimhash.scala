package graft

import org.apache.spark.sql.functions._

/** Scratch breakdown of q31: signature aggregate vs band-join verify. */
object ProfileSimhash {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local("profile")
    import graft.llm.{Dedup, TextAnalysis}
    val docs = graft.core.Tables.documents(spark, sfDir)
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm
    Dedup.simHashPairs(graft.core.Tables.documents(spark, "/root/testdata/sf0.001"),
      tokenHash = TextAnalysis.fingerprint, hashDistinctFirst = true).count()
    (1 to 2).foreach { _ =>
      val sigs = Dedup.simHash(docs, tokenHash = TextAnalysis.fingerprint,
        hashDistinctFirst = true)
      time("simHash agg only")(sigs.count())
      val cached = sigs.persist()
      cached.count()
      time("hammingPairs on cached sigs")(
        Dedup.hammingPairs(cached, 3, "doc_id", "simhash").count())
      cached.unpersist()
      time("full q31")(Dedup.simHashPairs(docs,
        tokenHash = TextAnalysis.fingerprint, hashDistinctFirst = true).count())
    }
    spark.stop()
  }
}
