package graft

import org.apache.spark.sql.functions._

/** Measurement main behind the q94 sample-mode scale claim: the decile
  * SHAPE of the pair-similarity histogram must be stable under document
  * sampling (pairs survive at ~f² independently of score, so bucket
  * SHARES are unbiased while counts scale), and the cost must fall
  * superlinearly — that is what makes `sampleFrac` the 100 TB answer to
  * the low-floor quadratic tail instead of a comment.
  *
  * Run: sbt "Test/runMain graft.ProfilePairHist" (sf via
  * SPARK_GRAFT_SF_DIR). Prints, per sampleFrac in {0.25, 0.5, 1.0}:
  * wall seconds, total pairs, and per-decile bucket SHARES, plus the
  * max absolute share deviation of each sampled curve from the exact
  * one. The registry's q94 itself stays the exact sampleFrac = 1 form.
  */
object ProfilePairHist {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local("profile_pairhist")
    val docs = graft.core.Tables.documents(spark, sfDir)
    val fracs = Seq(0.25, 0.5, 1.0)
    // warmup at the toy scale so JIT/codegen is not billed to the first point
    graft.core.CacheScope.scoped {
      graft.llm.Dedup.pairScoreHistogram(
        graft.core.Tables.documents(spark, "/root/testdata/sf0.001"),
        w = 3, tau = 0.1).count()
    }
    val curves = fracs.map { f =>
      graft.core.CacheScope.scoped {
        val t0 = System.nanoTime()
        val rows = graft.llm.Dedup
          .pairScoreHistogram(docs, w = 3, tau = 0.1, sampleFrac = f)
          .select(col("bucket"), col("n_pairs"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val sec = (System.nanoTime() - t0) / 1e9
        val total = rows.values.sum.toDouble
        val shares = (0L to 10L).map(b =>
          b -> (rows.getOrElse(b, 0L) / math.max(total, 1.0))).toMap
        println(f"[pairhist] frac=$f%.2f  $sec%6.2f s  pairs=${total.toLong}%9d  " +
          (1L to 10L).map(b => f"d$b=${shares(b)}%.4f").mkString(" "))
        (f, sec, total.toLong, shares)
      }
    }
    val exact = curves.last._4
    curves.dropRight(1).foreach { case (f, _, _, shares) =>
      val dev = (0L to 10L).map(b => math.abs(shares(b) - exact(b))).max
      println(f"[pairhist] frac=$f%.2f max |share - exact share| = $dev%.4f")
    }
    spark.stop()
  }
}
