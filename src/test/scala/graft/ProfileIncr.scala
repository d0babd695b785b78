package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.llm.{Dedup, TextAnalysis}

/** Scratch profiler for q66's phases at bench scale.
  * Run: sbt "Test/runMain graft.ProfileIncr"
  */
object ProfileIncr {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local("profile-incr")
    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[incr] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = Tables.documents(spark, sfDir)
    docs.count()
    val split = time("dataSplit count") {
      val s = TextAnalysis.dataSplit(docs).select("doc_id", "split")
      s.count(); s
    }
    val newDocs = docs.join(split.filter(col("split") =!= "train")
      .select("doc_id"), "doc_id")
    val oldDocs = docs.join(split.filter(col("split") === "train")
      .select("doc_id"), "doc_id")
    val oldSh = time("old shingles") {
      val x = Dedup.shingles(oldDocs, w = 3)
        .filter(col("shingle").isNotNull).persist()
      x.count(); x
    }
    val store = time("store banded sigs") {
      val x = Dedup.bandedSignatures(oldSh, 32, 2).persist()
      x.count(); x
    }
    val newSh = time("new shingles") {
      val x = Dedup.shingles(newDocs, w = 3)
        .filter(col("shingle").isNotNull).persist()
      x.count(); x
    }
    val newBands = time("new banded sigs") {
      val x = Dedup.bandedSignatures(newSh, 32, 2).persist()
      x.count(); x
    }
    val cand = time("candidates") {
      val vsStore = newBands.join(store
          .select(col("doc_id").as("corpus_id"), col("band"), col("bucket")),
          Seq("band", "bucket"))
        .filter(col("corpus_id") =!= col("doc_id"))
        .select(col("corpus_id"), col("doc_id").as("new_id"))
      val vsSelf = newBands.select(col("band"), col("bucket"),
          col("doc_id").as("corpus_id"))
        .join(newBands.select(col("band"), col("bucket"),
          col("doc_id").as("new_id")), Seq("band", "bucket"))
        .filter(col("corpus_id") < col("new_id"))
        .select("corpus_id", "new_id")
      val c = vsStore.unionByName(vsSelf).distinct().persist()
      println(s"[incr] candidates: ${c.count()} pairs")
      c
    }
    time("verify") {
      val candIds = cand.select(col("corpus_id").as("doc_id"))
        .union(cand.select(col("new_id").as("doc_id"))).distinct()
      val sets = Dedup.shingles(
          docs.join(candIds, Seq("doc_id"), "left_semi"), w = 3)
        .groupBy(col("doc_id"))
        .agg(collect_set(col("shingle")).as("shset")).persist()
      sets.count()
      val out = cand
        .join(sets.select(col("doc_id").as("corpus_id"),
          col("shset").as("set_a")), "corpus_id")
        .join(sets.select(col("doc_id").as("new_id"),
          col("shset").as("set_b")), "new_id")
        .withColumn("inter", size(array_intersect(col("set_a"), col("set_b"))))
        .withColumn("jaccard", col("inter").cast("double") /
          (size(col("set_a")) + size(col("set_b")) - col("inter")).cast("double"))
        .filter(col("jaccard") >= 0.5)
      println(s"[incr] verified: ${out.count()} pairs")
    }
    spark.stop()
  }
}
