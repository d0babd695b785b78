package graft

import org.apache.spark.sql.functions._

/** Scratch (r19): attribution inside q108 trainingLayout at sf0.1 —
  * classifier scoring vs budget cumsum vs curriculum (surprisal +
  * buckets + rank) vs the final join, timed warm, plus a tf-shared
  * variant A/B (classifier and kept-set surprisal off ONE per-doc tf). */
object ProfileQ108 {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.builder("profile-q108", 32)
      .master("local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = graft.core.Tables.documents(spark, dir)
    val weights = graft.llm.TextAnalysis.hashedWeights(64)
    (1 to args.drop(1).headOption.map(_.toInt).getOrElse(3)).foreach { r =>
      println(s"--- round $r ---")
      graft.core.CacheScope.scoped {
        var t = System.nanoTime()
        def tick(l: String): Unit = {
          val now = System.nanoTime()
          println(f"  $l%-26s ${(now - t) / 1e9}%7.3f s")
          t = now
        }
        val clf = graft.core.CacheScope.track(
          graft.llm.TextAnalysis.classifierScore(docs, weights)
            .select(col("doc_id"), col("n_tokens"),
              col("score").as("clf_score")).persist())
        clf.count()
        tick("classifierScore")
        val budget = graft.core.CacheScope.track(
          graft.llm.TextAnalysis.tokenBudgetSelectBy(clf, "clf_score")
            .persist())
        budget.count()
        tick("tokenBudgetSelectBy")
        val kept = docs.join(budget.filter(col("is_kept"))
          .select(col("doc_id")), Seq("doc_id"), "left_semi")
        val cur = graft.core.CacheScope.track(
          graft.llm.TextAnalysis.curriculumOrder(kept).persist())
        cur.count()
        tick("curriculumOrder(kept)")
        budget.join(cur.select(col("doc_id"), col("priority"),
            col("curriculum_rank")), Seq("doc_id"), "left").count()
        tick("final join")
        // and the one-shot registry query for reference
        graft.llm.TextAnalysis.trainingLayout(docs, weights).count()
        tick("trainingLayout e2e")
      }
      // tf-shared variant: classifier and kept-set surprisal off ONE
      // per-doc (id, token, tf) relation, e2e, same output columns
      graft.core.CacheScope.scoped {
        var t = System.nanoTime()
        def tick(l: String): Unit = {
          val now = System.nanoTime()
          println(f"  $l%-26s ${(now - t) / 1e9}%7.3f s")
          t = now
        }
        import graft.llm.TextAnalysis
        val d = weights.length
        val tfAll = graft.core.CacheScope.track(docs
          .select(col("doc_id"), explode(TextAnalysis.tokens(col("text")))
            .as("token"))
          .groupBy(col("doc_id"), col("token"))
          .agg(count(lit(1)).as("tf")).persist())
        tfAll.count()
        tick("tfAll build")
        val vocab = tfAll.select("token").distinct()
          .withColumn("__w", element_at(lit(weights),
            pmod(TextAnalysis.fingerprint(col("token")), lit(d.toLong))
              .cast("int") + 1))
        val agg = tfAll.join(vocab, "token")
          .groupBy(col("doc_id"))
          .agg(sum(col("tf")).as("n_tokens"),
            sum(col("tf") * col("__w")).as("raw_score"))
        val clf = graft.core.CacheScope.track(docs.select(col("doc_id"))
          .join(agg, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
            when(coalesce(col("n_tokens"), lit(0L)) > 0,
              coalesce(col("raw_score"), lit(0L)).cast("double") /
                col("n_tokens")).otherwise(0.0).as("clf_score"))
          .persist())
        clf.count()
        tick("clf from tf")
        val budget = graft.core.CacheScope.track(
          graft.llm.TextAnalysis.tokenBudgetSelectBy(clf, "clf_score")
            .persist())
        budget.count()
        tick("budget")
        val keptIds = budget.filter(col("is_kept")).select(col("doc_id"))
        val tfKept = tfAll.join(keptIds, Seq("doc_id"), "left_semi")
        val counts = tfKept.groupBy("token").agg(sum("tf").as("c"))
        val total = counts.agg(sum("c").as("n_total"))
        val bits = (length(bin(expr("n_total div c"))) - 1).cast("long")
        val sur0 = tfKept.join(counts, "token")
          .crossJoin(broadcast(total))
          .groupBy(col("doc_id"))
          .agg(sum("tf").as("n_tokens"), sum(col("tf") * bits).as("sum_bits"))
          .withColumn("xent_bits",
            col("sum_bits").cast("double") / col("n_tokens"))
        val kept = docs.join(keptIds, Seq("doc_id"), "left_semi")
        val sur = graft.core.CacheScope.track(
          kept.select(col("doc_id"), col("lang"))
            .join(sur0, "doc_id")
            .select(col("doc_id"), col("lang"), col("xent_bits")).persist())
        sur.count()
        tick("surprisal from tf")
        val buckets = TextAnalysis.bucketJoin(sur,
          TextAnalysis.tercileCutoffs(sur, "lang"), "lang", "doc_id")
          .select(col("doc_id"), col("bucket"))
        val draw = pmod(TextAnalysis.fingerprint(
          concat(col("text"), lit("|curriculum"))), lit(1000000L))
        val keyed = kept.select(col("doc_id"), draw.as("draw"))
          .join(buckets, Seq("doc_id"))
          .withColumn("priority",
            when(col("bucket") === "head", 0L)
              .when(col("bucket") === "middle", 1L).otherwise(2L))
          .withColumn("__one", lit(1L))
        val cur = graft.ops.Scale.globalCumSumOrdered(keyed,
            Seq("priority", "draw", "doc_id"), "__one", "curriculum_rank")
          .select(col("doc_id"), col("priority"), col("curriculum_rank"))
        budget.join(cur, Seq("doc_id"), "left").count()
        tick("curriculum+join (tf-shared)")
      }
    }
    spark.stop()
  }
}
