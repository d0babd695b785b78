package graft

/** Plan dump for the round-11 PLANS.md entries. */
object ExplainR11 {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local("explain")
    val dir = "/root/testdata/sf0.01"
    for (q <- Seq("q141_cheapest_supplier", "q146_sole_fault_supplier",
        "q147_important_parts", "q149_value_quantile_hist",
        "q150_rolling_anomaly")) {
      println(s"===== $q =====")
      SparkEntry.queries(q)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
