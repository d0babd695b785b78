package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** End-to-end streaming drive: replays the `events` test table through a
  * file-source stream (S10) → watermarked 5-min aggregation (T2) →
  * foreachBatch metric-store upsert + multi-resolution rollup (T3/T5) and
  * prints the resulting coarse windows.
  *
  * Usage: runMain graft.streaming.StreamingDemo [sfDir]
  */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val work = Files.createTempDirectory("graft_stream_demo").toString
    // stage the batch table as a file-stream source directory
    graft.core.Tables.events(spark, sfDir)
      .select(col("ts"), col("user_id"),
        col("event_type").as("key"))
      .write.parquet(s"$work/in")
    val schema = spark.read.parquet(s"$work/in").schema
    val stream = spark.readStream.schema(schema).parquet(s"$work/in")

    val q = StreamingDashboard.run(stream, s"$work/store", s"$work/ckpt",
      trigger = Trigger.AvailableNow()).start()
    q.awaitTermination()

    val coarse = spark.read.parquet(s"$work/store/coarse")
    println(s"[demo] coarse rows: ${coarse.count()}")
    coarse.groupBy("granularity")
      .agg(count(lit(1)).as("windows"), sum("pv").as("events"))
      .orderBy("granularity")
      .show(20, truncate = false)
    spark.stop()
  }
}
