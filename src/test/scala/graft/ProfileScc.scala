package graft

import org.apache.spark.sql.functions._

/** Scratch: SCC convergence telemetry + wall-clock on the q227 week-1
  * session graph at sf0.1 — how many trim rounds / peels the real click
  * graph costs, warm-round timing, so a trim-phase overhead regression
  * is attributable (r15: trim first landed at +45% on q227/q232 before
  * the one-aggregate trim round). */
object ProfileScc {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.builder("profile-scc", 32)
      .master("local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val edges = graft.core.Tables.events(spark, dir)
      .filter(col("event_type") === "click" &&
        col("ts") >= lit("2024-01-01").cast("timestamp") &&
        col("ts") < lit("2024-01-08").cast("timestamp"))
      .select(col("user_id"), col("ts"), col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item"))
      .filter(col("item").isNotNull)
      .withColumn("prev", lag(col("item"), 1).over(w))
      .filter(col("prev").isNotNull && col("prev") =!= col("item"))
      .select(col("prev").as("src"), col("item").as("dst"))
    (1 to 2).foreach { round =>
      val t0 = System.nanoTime()
      val n = graft.ops.Graph.stronglyConnectedComponents(edges).count()
      println(f"--- round $round scc: ${(System.nanoTime() - t0) / 1e9}%6.2f" +
        s" s  rows=$n")
      val t1 = System.nanoTime()
      val nc = graft.ops.Graph.sccCondensation(edges).count()
      println(f"--- round $round cond: ${(System.nanoTime() - t1) / 1e9}%6.2f" +
        s" s  rows=$nc")
    }
    spark.stop()
  }
}
