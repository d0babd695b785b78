package graft

/** Scratch A/B: partitioned-store relation construction cost vs the
  * parallelPartitionDiscovery threshold. Run: sbt "Test/runMain graft.ProfileListing"
  */
object ProfileListing {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local("profile")
    println("[profile] threshold at session build: " +
      spark.conf.get("spark.sql.sources.parallelPartitionDiscovery.threshold"))
    val densePath = java.nio.file.Files.createTempDirectory("pl_ivfpq")
      .toString + "/index"
    graft.llm.Similarity.writeIvfPqIndex(
      graft.core.Tables.embeddings(spark, sfDir), densePath)
    def time(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (thr <- Seq("32", "8192", "32", "8192", "8192")) {
      spark.conf.set(
        "spark.sql.sources.parallelPartitionDiscovery.threshold", thr)
      time(s"relation construction, threshold=$thr") {
        spark.read.parquet(s"$densePath/postings")
      }
    }
    spark.stop()
  }
}
