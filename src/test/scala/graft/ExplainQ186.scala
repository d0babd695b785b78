package graft

import org.apache.spark.sql.functions._

/** One-off: execute q186/q29 at sf0.1 and print the FINAL adaptive plan
  * (post-execution), to see which strategy the sizes joins actually got
  * after the round-12 hint removal. */
object ExplainQ186 extends App {
  val spark = graft.core.Sessions.builder("explain186")
    .master("local[32]").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  for (q <- Seq("q186_sorted_neighborhood", "q29_jaccard_pairs",
      "q152_prefix_jaccard")) {
    graft.core.CacheScope.scoped {
      val df = SparkEntry.queries(q)(spark, "/root/testdata/sf0.1")
      val t0 = System.nanoTime()
      df.count()
      println(f"== $q  ${(System.nanoTime() - t0) / 1e9}%.2f s")
      val p = df.queryExecution.executedPlan.toString
      println(p.linesIterator.filter(l =>
        l.contains("Join") || l.contains("Exchange")).mkString("\n"))
    }
  }
  spark.stop()
}
