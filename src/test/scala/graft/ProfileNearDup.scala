package graft

import org.apache.spark.sql.functions._

/** Scratch: sub-stage wall-clock of q96's near_dup stage at sf0.1 —
  * minhash pair generation vs connected components vs best-of-cluster
  * retention, each timed warm on the same exact-dedup survivor frame. */
object ProfileNearDup {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.builder("profile-neardup", 32)
      .master("local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = graft.core.Tables.documents(spark, dir)
    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      graft.core.CacheScope.scoped {
        val scrubbed = docs.withColumn("text",
          graft.llm.TextAnalysis.scrub(col("text")))
        val exact = graft.core.CacheScope.track(
          graft.llm.Dedup.exactCanonical(scrubbed)
            .filter(col("doc_id") === col("canonical_id"))
            .drop("canonical_id").persist())
        exact.count()
        var t0 = System.nanoTime()
        def tick(what: String): Unit = {
          val now = System.nanoTime()
          println(f"$what%-24s ${(now - t0) / 1e9}%7.2f s")
          t0 = now
        }
        val pairs = graft.core.CacheScope.track(
          graft.llm.Dedup.minHashDedupPairs(exact, w = 3, tau = 0.8)
            .select("id_a", "id_b").persist())
        val np = pairs.count()
        tick(s"minhash pairs ($np)")
        val cc = graft.llm.Dedup.connectedComponents(
          exact.select(col("doc_id")), pairs, "doc_id")
        val nc = cc.count()
        tick(s"connected comps ($nc)")
        val keep = graft.llm.Dedup.keepBestInCluster(cc,
            graft.llm.TextAnalysis.qualityScore(exact)
              .select(col("doc_id"), col("quality_score")))
          .filter(col("is_kept")).select("doc_id")
        val nk = keep.count()
        tick(s"keep best ($nk)")
        val afterNear = exact.join(keep, Seq("doc_id"), "left_semi")
        val na = afterNear.count()
        tick(s"semi-join back ($na)")
      }
    }
    spark.stop()
  }
}

/** Scratch: inside minHashDedupPairs — shingle materialization vs LSH
  * candidate generation vs the verify join, timed warm at sf0.1. */
object ProfileMinhashParts {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.builder("profile-mh", 32)
      .master("local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = graft.core.Tables.documents(spark, dir)
    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      graft.core.CacheScope.scoped {
        val scrubbed = docs.withColumn("text",
          graft.llm.TextAnalysis.scrub(col("text")))
        val exact = graft.core.CacheScope.track(
          graft.llm.Dedup.exactCanonical(scrubbed)
            .filter(col("doc_id") === col("canonical_id"))
            .drop("canonical_id").persist())
        exact.count()
        var t0 = System.nanoTime()
        def tick(what: String): Unit = {
          val now = System.nanoTime()
          println(f"$what%-24s ${(now - t0) / 1e9}%7.2f s")
          t0 = now
        }
        val sh = graft.core.CacheScope.track(
          graft.llm.Dedup.shingles(exact, 3).filter(col("shingle").isNotNull)
            .persist())
        val ns = sh.count()
        tick(s"shingles ($ns)")
        val cand = graft.llm.Dedup.minHashLshCandidatesFrom(sh, 16, 4)
        val ncand = cand.count()
        tick(s"lsh candidates ($ncand)")
        val setsById = sh.groupBy(col("doc_id"))
          .agg(collect_set(col("shingle")).as("shset"))
        val verified = cand
          .join(setsById.select(col("doc_id").as("id_a"),
            col("shset").as("set_a")), "id_a")
          .join(setsById.select(col("doc_id").as("id_b"),
            col("shset").as("set_b")), "id_b")
          .withColumn("inter", size(array_intersect(col("set_a"), col("set_b"))))
          .withColumn("jaccard", col("inter").cast("double") /
            (size(col("set_a")) + size(col("set_b")) - col("inter")).cast("double"))
          .filter(col("jaccard") >= 0.8)
        val nv = verified.count()
        tick(s"verify join ($nv)")
      }
    }
    spark.stop()
  }
}
