package graft

/** Plan-audit main for the round-11 TPC-H silhouettes: dumps the
  * formatted physical plan of each new query so the claimed shapes
  * (broadcasts, co-partitioned agg joins, no single-partition exchanges)
  * are read off the actual plan, not asserted from memory.
  * Run: sbt "Test/runMain graft.ExplainQ14x"
  */
object ExplainQ14x {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local("explain")
    val dir = "/root/testdata/sf0.01"
    for (q <- Seq("q141_cheapest_supplier", "q146_sole_fault_supplier",
        "q147_important_parts", "q148_nation_volume",
        "q145_bracket_revenue", "q142_top_supplier",
        "q143_promo_share", "q144_supplier_part_counts")) {
      println(s"===== $q =====")
      SparkEntry.queries(q)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
