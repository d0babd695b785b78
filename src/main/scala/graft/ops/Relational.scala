package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions._

/** Relational building blocks covering the SURVEY §2 operators that don't
  * warrant a whole job module.
  */
object Relational {

  /** A3: the reference's two-phase count-distinct (`OfflineJob.java:267-272`:
    * `groupBy(k, v).select(k, v)` then `groupBy(k).count`) — kept as an
    * explicit two-phase plan for exactness at scale: the inner distinct
    * shuffles on (k, v) so no single reducer sees all values of a hot key;
    * Spark's `countDistinct` expands to the same two-phase plan, and
    * [[approxCountDistinct]] is the sketch variant for mergeable rollups.
    */
  def countDistinctTwoPhase(df: DataFrame, key: Column, value: Column,
                            as: String = "cnt"): DataFrame =
    df.select(key.as("__k"), value.as("__v")).distinct()
      .groupBy(col("__k")).agg(count(lit(1)).as(as))
      .withColumnRenamed("__k", "key")

  def approxCountDistinct(df: DataFrame, key: Column, value: Column,
                          rsd: Double = 0.05, as: String = "cnt"): DataFrame =
    df.groupBy(key.as("key")).agg(approx_count_distinct(value, rsd).as(as))

  /** J9: coGroup — grouped two-input processing
    * (`flink-itemcf/.../huaban/ShuJuStatSecond.java:68-73`; the reference's
    * body is an empty demo, so this carries the *intended* operator:
    * arbitrary per-key logic over both groups).
    */
  def coGroup[K: Encoder, L: Encoder, R: Encoder, O: Encoder](
      left: Dataset[L], right: Dataset[R])(lk: L => K)(rk: R => K)(
      f: (K, Iterator[L], Iterator[R]) => IterableOnce[O]): Dataset[O] =
    left.groupByKey(lk).cogroup(right.groupByKey(rk))(f)

  /** J10: join against a small prefetched map — the reference captures an
    * HBase-loaded map in closures (`OfflineJob.java:97,289`), a manual
    * broadcast-hash join. Spark-first: turn the map into a broadcast
    * DataFrame and let Catalyst build the hash table once per executor.
    */
  def joinBroadcastMap(df: DataFrame, keyCol: String,
                       m: Map[String, (Long, Long)], spark: SparkSession,
                       c1: String = "click_pv", c2: String = "uv"): DataFrame = {
    import spark.implicits._
    val side = m.toSeq.map { case (k, (a, b)) => (k, a, b) }
      .toDF(keyCol, c1, c2)
    df.join(broadcast(side), Seq(keyCol), "left_outer")
  }

  /** P5: task-index-aware map (`flink-base/.../udf/MyMap.scala:10-20` reads
    * `getIndexOfThisSubtask`) — Spark-first is `spark_partition_id()`.
    */
  def withPartitionIndex(df: DataFrame, as: String = "partition_id"): DataFrame =
    df.withColumn(as, spark_partition_id())

  /** U1-style metric-stream tagging: (key, metric, value) normalized union
    * (`OfflineJob.java:489-496`). */
  def tagMetric(df: DataFrame, key: Column, metric: String, value: Column)
  : DataFrame =
    df.select(key.as("key"), lit(metric).as("metric"),
      value.cast("double").as("value"))
}
