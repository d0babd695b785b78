package graft

/** Scratch: the measured argument behind CurationJob's split policy —
  * post-retention cross-split 5-gram contamination over the SHIPPED
  * (rewritten) survivor text, per scale. If any eval doc shares a
  * material fraction of its grams with train, plain dataSplit stops
  * sufficing and leakageSafeSplit should be wired over the semantic
  * clusters instead (see the comment at CurationJob's dataSplit call).
  *
  * Measured 2026-08-14 (this round): sf0.001 → 65 eval docs, 2 with any
  * train-gram hit, 0 over 0.2, max 0.017; sf0.01 → 64 eval docs, 2 with
  * any hit, 0 over 0.2, max 0.026. Residual sub-threshold overlap is a
  * couple of boilerplate-ish grams, not near-dup leakage.
  */
object ProfileLeakage {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.builder("profile-leakage", 16)
      .master("local[16]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    graft.core.CacheScope.scoped {
      val docs = graft.core.Tables.documents(spark, dir)
      val emb = graft.core.Tables.embeddings(spark, dir)
      val shipped = graft.jobs.CurationPipeline.stages(docs, emb)
        .last._2.localCheckpoint()
      val rep = graft.llm.TextAnalysis.contamination(shipped)
        .select("doc_id", "split", "n_grams", "n_hit", "contamination")
        .collect()
      val over = rep.count(_.getDouble(4) > 0.2)
      val max = if (rep.isEmpty) 0.0 else rep.map(_.getDouble(4)).max
      val hit = rep.count(_.getLong(3) > 0)
      println(s"[leakage] $dir: ${rep.length} eval docs, " +
        s"$hit with any train-gram hit, $over over 0.2, max=$max")
    }
    spark.stop()
  }
}
