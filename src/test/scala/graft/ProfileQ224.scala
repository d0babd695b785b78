package graft

import org.apache.spark.sql.functions._

/** Scratch (r19): the decision measurement for the q224/q185/q29 §2.3
  * hash-key idea — how dense is the inverted-index candidate substrate?
  * If distinct candidate pairs ≈ corpus-dense, a set-verify restructure
  * (ship both docs' full shingle sets per candidate) costs more than the
  * string-keyed join it would replace. */
object ProfileQ224 {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.builder("profile-q224", 32)
      .master("local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = graft.core.Tables.documents(spark, dir)
    graft.core.CacheScope.scoped {
      val sh = graft.core.CacheScope.track(
        graft.llm.Dedup.shingles(docs, 3).filter(col("shingle").isNotNull)
          .persist())
      val nSh = sh.count()
      val nDocs = sh.select("doc_id").distinct().count()
      val a = sh.select(col("doc_id").as("id_a"), col("shingle"))
      val b = sh.select(col("doc_id").as("id_b"), col("shingle"))
      val joined = a.join(b, Seq("shingle")).filter(col("id_a") < col("id_b"))
      val nJoinRows = joined.count()
      val nPairs = joined.select("id_a", "id_b").distinct().count()
      val meanSet = nSh.toDouble / nDocs
      println(f"shingle rows $nSh%d over $nDocs%d docs " +
        f"(mean set $meanSet%.1f)")
      println(s"inverted-index join rows $nJoinRows, " +
        s"distinct candidate pairs $nPairs")
      println(f"set-verify would ship ~${2 * nPairs * meanSet}%.0f " +
        "shingle strings vs the join's " + nJoinRows + " rows")
    }
    spark.stop()
  }
}
