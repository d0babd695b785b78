package graft

import org.apache.spark.sql.functions._

/** Scratch: attribute q101's full-run cost — the q51 cluster substrate vs
  * the split tail, and the split tail's raise_error left join (the r8-tail
  * contract fix) vs the prior silent inner join. Each leg timed warm
  * (3 runs, min), substrate checkpointed so the tails are measured alone.
  */
object ProfileQ101 {
  def time[A](label: String)(f: => A): Unit = {
    val ts = (1 to 3).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    println(f"[q101] $label: min ${ts.min}%.2f  runs ${ts.map(t => f"$t%.2f").mkString(",")}")
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.builder("profile-q101", 32)
      .master("local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    graft.core.CacheScope.scoped {
      val docs = graft.core.Tables.documents(spark, dir)
      time("substrate: nearDupClusters (q51)") {
        graft.llm.Dedup.nearDupClusters(docs, w = 3, tau = 0.5).count()
      }
      val cl = graft.llm.Dedup.nearDupClusters(docs, w = 3, tau = 0.5)
        .select(col("id").as("doc_id"), col("comp").as("cluster_id"))
        .localCheckpoint()
      time("tail: leakageSafeSplit (raise_error left join)") {
        graft.llm.TextAnalysis.leakageSafeSplit(docs, cl).count()
      }
      // pre-423ce8f form: silent inner join, no contract check
      time("tail: inner-join variant (no contract check)") {
        val canon = cl.select(col("cluster_id")).distinct()
          .join(docs.select(col("doc_id").as("cluster_id"),
            pmod(graft.llm.TextAnalysis.fingerprint(col("text")), lit(100L))
              .as("bucket")), Seq("cluster_id"))
        cl.join(canon, Seq("cluster_id"))
          .withColumn("split",
            when(col("bucket") < 80, "train")
              .when(col("bucket") < 90, "val").otherwise("test"))
          .count()
      }
      time("whole q101 (uncheckpointed substrate)") {
        graft.llm.TextAnalysis.leakageSafeSplit(docs, cl).count()
      }
    }
    spark.stop()
  }
}
