package graft.core

import org.apache.spark.sql.SparkSession

/** Table-catalog bridge (SURVEY §3.2): the reference registers DataSets as
  * tables to run Table/SQL code (`OfflineJob.java:261-264`); here every test
  * table becomes a temp view so `spark.sql` can address the whole schema —
  * one IR end-to-end, no bridge penalty.
  */
object Catalog {
  val TableNames: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  /** Register all test tables as temp views named after their files. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    TableNames.foreach { t =>
      val df = if (t == "events") Tables.events(spark, sfDir)
        else Tables.table(spark, sfDir, t)
      df.createOrReplaceTempView(t)
    }
}
