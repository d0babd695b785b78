package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch (r19): attribution inside substringDedupRewrite on the chain's
  * own input (the chunk-rewrite survivor text), plus an A/B of the
  * stride-1 window RELATION build:
  *
  *   inrow  — transform(sequence, s -> array_join(slice(__w, s+1, w)))
  *            under posexplode (the shipped shape)
  *   lead   — posexplode(tokens) + lead(tok, j) window concat (the
  *            shingles() shape, keeping the start position)
  *   elem   — transform(sequence, s -> concat_ws(' ', element_at...))
  *            unrolled chain under posexplode
  */
object ProfileSubstr {

  /** The r18 shape, inlined for same-JVM A/B: window strings built (and
    * rebuilt) lazily by every consumer pass; only `base` persisted. */
  def substrOld(docs: DataFrame, w: Int): DataFrame = {
    val idCol = "doc_id"
    val textCol = "text"
    val base = graft.core.CacheScope.track(docs.select(col(idCol),
      graft.llm.TextAnalysis.tokens(col(textCol)).as("__w")).persist())
    base.count()
    val wins = base
      .filter(coalesce(size(col("__w")), lit(0)) >= w)
      .select(col(idCol), posexplode(expr(
        s"transform(sequence(0, size(__w) - $w)," +
          s" s -> array_join(slice(__w, s + 1, $w), ' '))"))
        .as(Seq("s", "win")))
    val winsH = wins.withColumn("__h", xxhash64(col("win")))
    val dupH = winsH.groupBy(col("__h"))
      .agg(count(lit(1)).as("__hc"))
      .filter(col("__hc") > 1)
      .select("__h")
    val winsDup = winsH.join(dupH, Seq("__h"), "left_semi")
    val dupWins = winsDup.groupBy("win").agg(
      min(struct(col(idCol), col("s"))).as("__first"),
      count(lit(1)).as("__cnt"))
      .filter(col("__cnt") > 1)
      .select(col("win"), col("__first"))
    val dupStarts = winsDup.join(dupWins, "win")
      .filter(!(struct(col(idCol), col("s")) === col("__first")))
      .select(col(idCol), col("s"))
    val perDoc = dupStarts.groupBy(col(idCol))
      .agg(sort_array(collect_list(col("s"))).as("__ds"))
    val emptyInts = array().cast("array<int>")
    val nTok = coalesce(size(col("__w")), lit(0))
    base.join(perDoc, Seq(idCol), "left")
      .withColumn("__kept", when(col("__ds").isNull, emptyInts)
        .when(nTok > 0,
          expr(s"filter(sequence(0, size(__w) - 1)," +
            s" p -> NOT exists(__ds, s -> s <= p AND p <= s + ${w - 1}))"))
        .otherwise(emptyInts))
      .select(col(idCol),
        nTok.cast("long").as("n_tokens"),
        when(col("__ds").isNull, lit(0L))
          .otherwise((nTok - size(col("__kept"))).cast("long"))
          .as("n_removed"),
        when(col("__ds").isNull,
          array_join(coalesce(col("__w"), array().cast("array<string>")),
            " "))
          .otherwise(array_join(transform(col("__kept"),
            p => element_at(col("__w"), p + 1)), " "))
          .as(textCol))
  }

  def main(args: Array[String]): Unit = {
    val spark: SparkSession = graft.core.Sessions.builder("profile-substr", 32)
      .master("local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val w = 8
    val docs = graft.core.Tables.documents(spark, dir)

    // the chain's input to stage 4: exact -> near_dup -> chunk_rewrite
    def rewrittenOf(): DataFrame = {
      val scrubbed = docs.withColumn("text",
        graft.llm.TextAnalysis.scrub(col("text")))
      val exact = graft.core.CacheScope.track(
        graft.llm.Dedup.exactCanonical(scrubbed)
          .filter(col("doc_id") === col("canonical_id"))
          .drop("canonical_id").persist())
      val nearPairs = graft.llm.Dedup.minHashDedupPairs(exact, 3, 0.8)
        .select("id_a", "id_b").localCheckpoint(false)
      val members = nearPairs.select(col("id_a").as("doc_id"))
        .unionByName(nearPairs.select(col("id_b").as("doc_id"))).distinct()
      val dropped = graft.llm.Dedup.keepBestInCluster(
          graft.llm.Dedup.connectedComponents(members, nearPairs, "doc_id"),
          graft.llm.TextAnalysis.qualityScore(
              exact.join(members, Seq("doc_id"), "left_semi"))
            .select(col("doc_id"), col("quality_score")))
        .filter(!col("is_kept")).select("doc_id")
      val afterNear = graft.core.CacheScope.track(
        exact.join(dropped, Seq("doc_id"), "left_anti").persist())
      val rw = graft.core.CacheScope.track(
        graft.llm.Dedup.chunkDedupRewrite(afterNear, w = 16)
          .filter(length(col("text")) > 0)
          .select("doc_id", "text")
          .join(afterNear.drop("text"), "doc_id").persist())
      rw.count()
      rw
    }

    def tickUp(label: String, t0: Long): Long = {
      val now = System.nanoTime()
      println(f"  $label%-26s ${(now - t0) / 1e9}%7.3f s")
      now
    }

    (1 to args.drop(1).headOption.map(_.toInt).getOrElse(3)).foreach { r =>
      println(s"--- round $r ---")
      graft.core.CacheScope.scoped {
        val rw = rewrittenOf()
        var t = System.nanoTime()

        // same-JVM alternating: NEW shipped vs OLD inlined, twice each
        graft.llm.Dedup.substringDedupRewrite(rw, w = w)
          .filter(length(col("text")) > 0).count()
        t = tickUp("substr NEW (1)", t)
        substrOld(rw, w).filter(length(col("text")) > 0).count()
        t = tickUp("substr OLD (1)", t)
        graft.llm.Dedup.substringDedupRewrite(rw, w = w)
          .filter(length(col("text")) > 0).count()
        t = tickUp("substr NEW (2)", t)
        substrOld(rw, w).filter(length(col("text")) > 0).count()
        t = tickUp("substr OLD (2)", t)

        // parts: tokenize+persist
        val base = graft.core.CacheScope.track(rw.select(col("doc_id"),
          graft.llm.TextAnalysis.tokens(col("text")).as("__w")).persist())
        base.count()
        t = tickUp("base tokenize", t)

        // wins build A/B (count() forces the full string build)
        val inrow = base
          .filter(coalesce(size(col("__w")), lit(0)) >= w)
          .select(col("doc_id"), posexplode(expr(
            s"transform(sequence(0, size(__w) - $w)," +
              s" s -> array_join(slice(__w, s + 1, $w), ' '))"))
            .as(Seq("s", "win")))
        inrow.select(max(length(col("win")))).count()
        t = tickUp("wins inrow slice/join", t)

        val parts = (0 until w).map(j =>
          if (j == 0) col("__tok") else lead(col("__tok"), j).over(
            Window.partitionBy(col("doc_id")).orderBy(col("s"))))
        val leadWins = base
          .filter(coalesce(size(col("__w")), lit(0)) >= w)
          .select(col("doc_id"), posexplode(col("__w")).as(Seq("s", "__tok")))
          .select(col("doc_id"), col("s"),
            concat_ws(" ", parts: _*).as("win"),
            parts.last.isNotNull.as("__c"))
          .filter(col("__c"))
        leadWins.select(max(length(col("win")))).count()
        t = tickUp("wins lead window", t)

        val elems = (0 until w)
          .map(j => s"element_at(__w, s + ${j + 1})").mkString(", ")
        val elemWins = base
          .filter(coalesce(size(col("__w")), lit(0)) >= w)
          .select(col("doc_id"), posexplode(expr(
            s"transform(sequence(0, size(__w) - $w)," +
              s" s -> concat_ws(' ', $elems))"))
            .as(Seq("s", "win")))
        elemWins.select(max(length(col("win")))).count()
        t = tickUp("wins elem_at chain", t)

        // hash-count prefilter over the in-row wins (the shipped next step)
        val winsH = inrow.withColumn("__h", xxhash64(col("win")))
        winsH.groupBy(col("__h")).agg(count(lit(1)).as("__hc"))
          .filter(col("__hc") > 1).count()
        t = tickUp("dup-hash agg (inrow)", t)

        // hash-only variant: hash the token SLICE array directly — no
        // window string is ever built for the prefilter pass
        val hOnly = base
          .filter(coalesce(size(col("__w")), lit(0)) >= w)
          .select(col("doc_id"), posexplode(expr(
            s"transform(sequence(0, size(__w) - $w)," +
              s" s -> xxhash64(array_join(slice(__w, s + 1, $w), ' ')))"))
            .as(Seq("s", "__h")))
        hOnly.groupBy(col("__h")).agg(count(lit(1)).as("__hc"))
          .filter(col("__hc") > 1).count()
        t = tickUp("dup-hash agg (fused)", t)

        // the operator's tail: exact agg over semi-joined wins, the
        // per-doc dup-start lists, and the rebuild projection
        val dupH2 = winsH.groupBy(col("__h"))
          .agg(count(lit(1)).as("__hc")).filter(col("__hc") > 1)
          .select("__h")
        val winsDup = graft.core.CacheScope.track(
          winsH.join(dupH2, Seq("__h"), "left_semi").persist())
        val nDup = winsDup.count()
        t = tickUp(s"semi-join winsDup ($nDup)", t)
        val dupWins = winsDup.groupBy("win").agg(
          min(struct(col("doc_id"), col("s"))).as("__first"),
          count(lit(1)).as("__cnt"))
          .filter(col("__cnt") > 1)
          .select(col("win"), col("__first"))
        val dupStarts = winsDup.join(dupWins, "win")
          .filter(!(struct(col("doc_id"), col("s")) === col("__first")))
          .select(col("doc_id"), col("s"))
        val perDoc = graft.core.CacheScope.track(dupStarts
          .groupBy(col("doc_id"))
          .agg(sort_array(collect_list(col("s"))).as("__ds")).persist())
        val nMarked = perDoc.count()
        t = tickUp(s"exact agg + perDoc ($nMarked)", t)
        val emptyInts = array().cast("array<int>")
        val nTok = coalesce(size(col("__w")), lit(0))
        val rebuilt = base.join(perDoc, Seq("doc_id"), "left")
          .withColumn("__kept", when(col("__ds").isNull, emptyInts)
            .when(nTok > 0,
              expr(s"filter(sequence(0, size(__w) - 1)," +
                s" p -> NOT exists(__ds, s -> s <= p AND p <= s + ${w - 1}))"))
            .otherwise(emptyInts))
          .select(col("doc_id"),
            when(col("__ds").isNull,
              array_join(coalesce(col("__w"),
                array().cast("array<string>")), " "))
              .otherwise(array_join(transform(col("__kept"),
                p => element_at(col("__w"), p + 1)), " ")).as("text"))
        rebuilt.filter(length(col("text")) > 0).count()
        t = tickUp("rebuild projection", t)
      }
    }
    spark.stop()
  }
}
