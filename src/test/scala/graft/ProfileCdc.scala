package graft

import org.apache.spark.sql.functions._

/** Scratch: stage attribution for cdcDedup (q111) at bench scale. The
  * inlined stages below keep the ORIGINAL aggregate-over-slice boundary
  * form deliberately — they are the measured A/B against the shipped
  * unrolled element_at chain: at sf0.1 the nested-HOF form spends 12.3 s
  * in the cut array alone (per-position slice allocation + interpreted
  * nested-lambda fold), while the whole shipped operator runs in ~1.5-2.6 s
  * (isolated Bench [1.96, 1.63, 1.51]) computing the identical values —
  * q111 re-verified hash-green at sf0.001/0.01/0.1 after the swap.
  */
object ProfileCdc {
  def time[A](label: String)(f: => A): Unit = {
    val ts = (1 to 3).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    println(f"[cdc] $label: min ${ts.min}%.2f  runs ${ts.map(t => f"$t%.2f").mkString(",")}")
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.builder("profile-cdc", 32)
      .master("local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = graft.core.Tables.documents(spark, dir)
    val mod = lit(graft.llm.TextAnalysis.FingerprintMod)
    val w = 4; val m = 8

    val base = docs
      .select(col("doc_id"), graft.llm.TextAnalysis.tokens(col("text")).as("__w"))
      .filter(coalesce(size(col("__w")), lit(0)) >= 1)
    time("tokens only") { base.select(sum(size(col("__w")))).collect() }

    val th = base.withColumn("__th",
      transform(col("__w"), t => graft.llm.TextAnalysis.fingerprint(t)))
    time("+ per-token fingerprints") {
      th.select(sum(size(col("__th")))).collect()
    }

    val cuts = th.withColumn("__cut",
      transform(sequence(lit(1), size(col("__w"))), i =>
        when(i >= w &&
          pmod(aggregate(slice(col("__th"), i - lit(w - 1), lit(w)),
            lit(0L), (a, x) => pmod(a * lit(31L) + x, mod)),
            lit(m.toLong)) === 0L, lit(1L)).otherwise(lit(0L))))
    time("+ boundary cut array") {
      cuts.select(sum(aggregate(col("__cut"), lit(0L), (a, x) => a + x)))
        .collect()
    }

    val pos = cuts
      .select(col("doc_id"),
        posexplode(arrays_zip(col("__w"), col("__cut"))).as(Seq("__p", "__z")))
      .select(col("doc_id"), col("__p"),
        col("__z.__w").as("__tok"), col("__z.__cut").as("__cut"))
    time("+ explode") { pos.select(count(lit(1))).collect() }

    val segWin = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("__p"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val ch = pos
      .withColumn("chunk_idx", coalesce(sum(col("__cut")).over(segWin), lit(0L)))
      .groupBy(col("doc_id"), col("chunk_idx"))
      .agg(array_join(transform(
        sort_array(collect_list(struct(col("__p"), col("__tok")))),
        s => s.getField("__tok")), " ").as("chunk"))
    time("+ window + chunk reassembly") { ch.select(count(lit(1))).collect() }

    time("whole cdcDedup") {
      graft.llm.Dedup.cdcDedup(docs, w = 4, m = 8).count()
    }
    spark.stop()
  }
}
