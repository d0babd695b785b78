package graft
import org.apache.spark.sql.SparkSession
object ScratchExplain {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.builder("explain", 32).master("local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    for (name <- args) {
      println(s"===== $name =====")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
