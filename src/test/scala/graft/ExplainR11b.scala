package graft

/** Round-11 second-batch plan dump: print the formatted physical plans
  * of q153-q162 at sf0.001 for the PLANS.md audit. */
object ExplainR11b {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.core.Sessions.local("explain-r11b")
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- Seq("q153_order_priority", "q156_returned_items",
        "q158_promotable_suppliers", "q159_item_triangles",
        "q160_link_prediction", "q161_grouped_hll", "q162_kcore")) {
      println(s"\n===== $q =====")
      val df = SparkEntry.queries(q)(spark, sfDir)
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode))
    }
    spark.stop()
  }
}
