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

  /** One-sided CUSUM statistic `S_t = max(0, S_{t−1} + (value − target))`
    * over an ordered BOUNDED relation (the caller aggregates the fact
    * table down first — the bounded-single-partition device), computed
    * without the sequential recurrence via the prefix identity
    * `S_t = P_t − min(0, min_{j≤t} P_j)` with `P` the running deviation
    * sum: two ordinary cumulative windows, no iteration. Exact whenever
    * value/target are exact integers. Adds a `cusum` column. */
  def cusum(bounded: DataFrame, orderCol: String, valueCol: String,
            targetCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bounded
      .withColumn("__p", sum(col(valueCol) - col(targetCol)).over(w))
      .withColumn("cusum",
        col("__p") - least(min(col("__p")).over(w), lit(0L)))
      .drop("__p")
  }

  /** Per-group 2-D skyline (Pareto frontier): the rows of `df` not
    * DOMINATED within their group, where a row dominates another iff its
    * `minCol` is ≤, its `maxCol` is ≥, and at least one is strict.
    * Ties survive together (neither dominates). Both criterion columns
    * must be exact (integer/long) — float criteria must be converted to
    * exact units (cents) by the caller, or the dominance relation itself
    * becomes rounding-dependent.
    *
    * The definitional form is the quadratic NOT EXISTS self-join (the
    * oracle keeps it); this plan is linear: collapse to one row per
    * (group, minCol) carrying `max(maxCol)` — a map-side-combined
    * aggregate bounded by the criterion's DOMAIN, not the fact table —
    * run ONE lag-style running max over that bounded relation
    * (partitioned by group, so no global single-partition window), keep
    * the price points that strictly improve on every cheaper point, and
    * semi-join the frontier back to the fact rows on
    * (group, minCol, maxCol = the frontier max). A frontier row at value
    * v survives iff no strictly-smaller minCol reaches maxCol ≥ v and no
    * same-minCol row strictly exceeds it — exactly non-domination.
    */
  def skyline2D(df: DataFrame, group: Column, minCol: Column,
                maxCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keyed = df.withColumn("__g", group).withColumn("__lo", minCol)
      .withColumn("__hi", maxCol)
    val perPoint = keyed.groupBy(col("__g"), col("__lo"))
      .agg(max(col("__hi")).as("__best"))
    val w = Window.partitionBy(col("__g")).orderBy(col("__lo"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = perPoint
      .withColumn("__seen", max(col("__best")).over(w))
      .filter(col("__seen").isNull || col("__seen") < col("__best"))
      .select(col("__g"), col("__lo"), col("__best").as("__hi"))
    keyed.join(frontier, Seq("__g", "__lo", "__hi"), "left_semi")
      .drop("__g", "__lo", "__hi")
  }
}
