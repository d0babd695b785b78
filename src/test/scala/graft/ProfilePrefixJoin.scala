package graft

import org.apache.spark.sql.functions._

/** Measurement main behind the q152 prefix-filter claims: candidate-pair
  * counts and wall time for the three exact-τ Jaccard pair paths at the
  * registry parameters (w = 3, τ = 0.5) —
  *  - exhaustive: every shared-shingle pair scored (the q29 plan's
  *    candidate stage);
  *  - prefix-filter: only rarity-prefix shingles join (zero false
  *    negatives by the lemma);
  *  - minhash-LSH 32×2: the probabilistic candidate path (the S-curve
  *    tail can miss).
  * Run: sbt "Test/runMain graft.ProfilePrefixJoin" (sf via
  * SPARK_GRAFT_SF_DIR).
  */
object ProfilePrefixJoin {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local("profile_prefix")
    val docs = graft.core.Tables.documents(spark, sfDir)

    def timed[T](what: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[prefix] $what: ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    graft.core.CacheScope.scoped {
      val sh = graft.core.CacheScope.track(
        graft.llm.Dedup.shingles(docs, 3)
          .filter(col("shingle").isNotNull).persist())
      val nsh = sh.count()
      // exhaustive candidates: distinct pairs sharing >= 1 shingle
      val exhaustive = timed("exhaustive candidates") {
        sh.select(col("doc_id").as("id_a"), col("shingle"))
          .join(sh.select(col("doc_id").as("id_b"), col("shingle")),
            Seq("shingle"))
          .filter(col("id_a") < col("id_b"))
          .select("id_a", "id_b").distinct().count()
      }
      // prefix candidates at tau = 1/2
      val df = sh.groupBy(col("shingle")).agg(count(lit(1)).as("__df"))
      val sz = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("__df"), col("shingle"))
      val prefix = graft.core.CacheScope.track(sh.join(df, "shingle")
        .withColumn("__rn", row_number().over(w)).join(sz, "doc_id")
        .filter(col("__rn") <= col("sz") - expr("(sz + 1) div 2") + 1)
        .select(col("doc_id"), col("shingle")).persist())
      val npref = prefix.count()
      val prefCand = timed("prefix candidates") {
        prefix.select(col("doc_id").as("id_a"), col("shingle"))
          .join(prefix.select(col("doc_id").as("id_b"), col("shingle")),
            Seq("shingle"))
          .filter(col("id_a") < col("id_b"))
          .select("id_a", "id_b").distinct().count()
      }
      // LSH candidates at the registry band layout
      val lshCand = timed("lsh 32x2 candidates") {
        graft.llm.Dedup.minHashLshCandidates(docs, 3, 32, 2).count()
      }
      println(s"[prefix] shingle rows $nsh, prefix rows $npref " +
        f"(${npref.toDouble / nsh}%.3f of full)")
      println(s"[prefix] candidates: exhaustive $exhaustive, " +
        s"prefix $prefCand, lsh $lshCand")
    }
    // end-to-end verified pair timings
    for ((name, fn) <- Seq[(String, () => Long)](
        "q29 exhaustive e2e" -> (() => graft.core.CacheScope.scoped {
          graft.llm.Dedup.ngramJaccardPairs(docs, 3, 0.5).count() }),
        "q152 prefix e2e" -> (() => graft.core.CacheScope.scoped {
          graft.llm.Dedup.prefixFilterJaccardPairs(docs, 3, 1, 2).count() }),
        "q30 lsh e2e" -> (() => graft.core.CacheScope.scoped {
          graft.llm.Dedup.minHashDedupPairs(docs, 3, 0.5).count() })))
      timed(name)(fn())
    spark.stop()
  }
}
