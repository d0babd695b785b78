package graft

/** Scratch profiler: time individual registry queries in one JVM.
  * Run: sbt "Test/runMain graft.ProfileQ q41_offline_metrics_long q14_offline_metrics"
  */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local("profile")
    // warmup
    args.foreach(q => SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").count())
    spark.sqlContext.clearCache()
    args.foreach { q =>
      spark.sqlContext.clearCache()
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, sfDir).count()
      println(f"[profile] $q: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
