package graft

import graft.core.Tables
import graft.llm.Similarity

/** IVF parameter-tuning harness (test scope, not shipped): for each
  * (tables, k, probes) grid point, prints recall of the IVF candidate set
  * against the exact all-pairs near-dup ground truth at both gate scales,
  * plus the candidate fraction of C(n,2) — the two numbers the registry
  * pins (LlmOpsSpec recall 1.0, ScaleSpec fraction < 0.3).
  * Run: sbt "Test/runMain graft.TuneIvf"
  */
object TuneIvf {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local("tune-ivf")
    import spark.implicits._

    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      println(s"=== $sf ===")
      val emb = Tables.embeddings(spark, sf)
      val n = emb.count()
      val totalPairs = n * (n - 1) / 2
      val exact = Similarity.embeddingNearDupPairs(emb, tau = 0.45)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      println(s"n=$n exact near-dup tau=0.45 pairs: ${exact.size}")
      for ((t, k, m) <- Seq((8, 48, 1), (12, 48, 1), (16, 48, 1),
        (8, 64, 1), (12, 64, 1), (4, 48, 2), (6, 32, 2))) {
        val cents = Similarity.trainIvfCentroids(emb, k = k, tables = t)
        val cand = Similarity.ivfCandidatePairs(emb, cents, probes = m)
          .as[(Long, Long)].collect().toSet
        val missed = exact -- cand
        println(f"ivf T=$t k=$k m=$m -> cand=${cand.size} " +
          f"frac=${cand.size.toDouble / totalPairs}%.4f " +
          s"recall=${(exact & cand).size}/${exact.size} missed=$missed")
      }
    }
    spark.stop()
  }
}

/** Margin check: per qualifying pair, in how many tables does it collide. */
object TuneIvfMargin {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local("tune-ivf-margin")
    import spark.implicits._
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val emb = Tables.embeddings(spark, sf)
      val exact = Similarity.embeddingNearDupPairs(emb, tau = 0.45)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      for ((t, k, m) <- Seq((12, 64, 1), (16, 48, 1), (4, 48, 2))) {
        val cents = Similarity.trainIvfCentroids(emb, k = k, tables = t)
        val asg = Similarity.ivfAssignments(emb, cents, probes = m)
          .as[(Long, Int, Int)].collect()
        val cell = asg.groupBy(r => (r._2, r._3)).values
        val counts = scala.collection.mutable.Map[(Long, Long), Int]()
          .withDefaultValue(0)
        for (mem <- cell; x <- mem; y <- mem
             if x._1 < y._1 && exact.contains((x._1, y._1)))
          counts((x._1, y._1)) += 1
        // distinct tables per pair (m>1 can double-count within a table)
        val perPair = exact.toSeq.map(p => counts(p)).sorted
        println(s"$sf T=$t k=$k m=$m collisions/pair: ${perPair.mkString(",")}")
      }
    }
    spark.stop()
  }
}
