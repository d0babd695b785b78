package graft

import graft.core.{CacheScope, Tables}
import graft.llm.Similarity

/** The committed recall-vs-cost curve for the q42 certification path at
  * bench scale (sf0.1, the corpus whose IVF recall boundary r6–r9
  * documented): per probe rung the sampled certificate + full candidate
  * volume, wall-clock for the raw-IVF / certified / exact forms, and the
  * certified == exact equality the sweep rests on.
  * Run: sbt "Test/runMain graft.CertifyIvfSf01"
  */
object CertifyIvfSf01 {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local("certify-ivf-sf01")
    import spark.implicits._
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val emb = Tables.embeddings(spark, sf)
    println(s"=== $sf (n=${emb.count()}) ===")

    CacheScope.scoped {
      Similarity.nearDupCertCurve(emb, tau = 0.45,
          probeLadder = Seq(1, 2, 4, 8, 16))
        .orderBy("rung").collect().foreach(println)
    }

    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (_ <- 1 to 2) {
      val ivf = time("ivf (raw, recall-lossy here)") {
        CacheScope.scoped {
          Similarity.embeddingNearDupPairsIvf(emb, tau = 0.45)
            .as[(Long, Long, Double)].collect().toSet
        }
      }
      val cert = time("certified (escalates to exact here)") {
        CacheScope.scoped {
          Similarity.embeddingNearDupPairsCertified(emb, tau = 0.45)
            .as[(Long, Long, Double)].collect().toSet
        }
      }
      val exact = time("exact") {
        CacheScope.scoped {
          Similarity.embeddingNearDupPairs(emb, tau = 0.45)
            .as[(Long, Long, Double)].collect().toSet
        }
      }
      println(s"ivf recall ${(exact & ivf).size}/${exact.size}; " +
        s"certified==exact: ${cert == exact}")
    }
    spark.stop()
  }
}
