package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * Mirrors the reference's path-template scan-list construction
  * (`flink-statistics/src/main/java/com/wufuqiang/statistics/OfflineJob.java:117-145`,
  * `flink-itemcf/.../ItemIdCfVersion5.java:87-110`) — but where the reference
  * probes HDFS paths in a driver loop and unions per-hour reads, we hand Spark
  * the whole directory and let file-source partition pruning + predicate
  * pushdown do the work. At 100 TB the parquet layout would be
  * `day=/hour=`-partitioned and these loaders would prune on those columns.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Sessions must set `spark.sql.legacy.parquet.nanosAsLong=true`: older
    * generations of the `events` table carry TIMESTAMP(NANOS), which
    * Spark's vectorized reader otherwise rejects; under the flag they read
    * as raw nano longs and [[events]] converts them back to a proper
    * (microsecond) TimestampType column. Newer generations write
    * timestamp[us] directly — [[events]] detects which shape it got and
    * only converts the long form, so both vintages load identically.
    */
  val NanosConf = "spark.sql.legacy.parquet.nanosAsLong"

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // timestamp[us] parquet reads as NTZ; downstream (windows, UTC+8
        // day math) expects TimestampType — identical wall-clock under the
        // UTC session, so the cast is a type change, not a value change
        raw.withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
