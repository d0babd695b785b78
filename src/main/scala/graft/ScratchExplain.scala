package graft
import org.apache.spark.sql.SparkSession
/** Plan dump helper for optimization rounds: prints `.explain("formatted")`
  * for the named registry queries, and when SPARK_GRAFT_PLAN_DIR is set
  * also writes one `<dir>/<query>.txt` per query (the judge-reviewable
  * before/after artifacts under plans/rNN/).
  */
object ScratchExplain {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.builder("explain", 32).master("local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // r19: dump the at-scale (cutover-disabled) plan shape on demand —
    // SPARK_GRAFT_RANK_CUTOVER=0 reproduces the pre-r19 two-phase plans
    sys.env.get("SPARK_GRAFT_RANK_CUTOVER")
      .foreach(v => spark.conf.set("spark.graft.rank.cutoverRows", v))
    val outDir = sys.env.get("SPARK_GRAFT_PLAN_DIR")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "")
    for (name <- args) {
      println(s"===== $name =====")
      graft.core.CacheScope.scoped {
        val df = SparkEntry.queries(name)(spark, dir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        println(plan)
        outDir.foreach { d =>
          java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
          java.nio.file.Files.write(
            java.nio.file.Paths.get(d, s"$name$suffix.txt"),
            plan.getBytes("UTF-8"))
        }
      }
    }
    spark.stop()
  }
}
