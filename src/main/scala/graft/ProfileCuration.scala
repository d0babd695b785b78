package graft

import org.apache.spark.sql.SparkSession

/** Scratch: per-stage wall-clock of the composed curation chain (q96) at
  * sf0.1. Each stage's count() materializes its persist, so the deltas
  * attribute cost to the stage that actually incurred it. */
object ProfileCuration {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.builder("profile-curation", 32)
      .master("local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = graft.core.Tables.documents(spark, dir)
    val emb = graft.core.Tables.embeddings(spark, dir)
    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      graft.core.CacheScope.scoped {
        val t00 = System.nanoTime()
        val st = graft.jobs.CurationPipeline.stages(docs, emb)
        println(f"construct           ${(System.nanoTime() - t00) / 1e9}%8.2f s")
        st.foreach { case (name, df) =>
          val t0 = System.nanoTime()
          val n = df.count()
          println(f"$name%-20s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
        }
        val t1 = System.nanoTime()
        val vd = graft.jobs.CurationPipeline.verdictOf(docs, st)
        println(f"verdict(build)      ${(System.nanoTime() - t1) / 1e9}%8.2f s")
        val t2 = System.nanoTime()
        val v = vd.count()
        println(f"verdict(count)      ${(System.nanoTime() - t2) / 1e9}%8.2f s  ($v rows)")
        println(f"TOTAL               ${(System.nanoTime() - t00) / 1e9}%8.2f s")
      }
    }
    spark.stop()
  }
}
