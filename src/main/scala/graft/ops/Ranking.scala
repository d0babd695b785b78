package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch window/rank operators (SURVEY §2.6).
  *
  * The reference implements every rank pattern manually with
  * `groupBy().sortGroup().reduceGroup()` because Flink 1.6 DataSet had no
  * window functions; here each is one Catalyst window expression, which keeps
  * the whole pipeline in whole-stage codegen and shuffles exactly once per
  * partitioning key.
  */
object Ranking {

  /** Sequential rank 1..n within a partition, ordered by `order`.
    * Reference: `flink-auccalc/.../AucCalcVersion5.java:302-311` (sort by
    * score within (sceneId, channel), assign running index).
    */
  def rowNumber(df: DataFrame, partition: Seq[Column], order: Seq[Column],
                as: String = "rn"): DataFrame =
    df.withColumn(as, row_number().over(
      Window.partitionBy(partition: _*).orderBy(order: _*)))

  /** Fractional (mean) rank over ties — the Mann-Whitney rank statistic.
    * Every row gets `avg(row_number)` across rows with an identical order
    * value, i.e. ranks 3,4,5 sharing one score all become 4.0.
    * Reference: `AucCalcVersion5.java:312-340` (global ranks), `:363-392`
    * (per-user) — a two-pass groupBy/reduceGroup there; two stacked window
    * expressions here (same shuffle: both windows share the partition keys,
    * so Catalyst plans a single exchange).
    */
  def fractionalRank(df: DataFrame, partition: Seq[Column], score: Column,
                     as: String = "frank"): DataFrame = {
    val w = Window.partitionBy(partition: _*).orderBy(score.asc)
    val wTies = Window.partitionBy((partition :+ score): _*)
    df.withColumn("__rn", row_number().over(w))
      .withColumn(as, avg(col("__rn")).over(wTies))
      .drop("__rn")
  }

  /** Partition size broadcast onto every row of the partition.
    * Reference: `AucCalcVersion5.java:343-362` (`show` = group row count
    * attached to each row of (sceneId, channel, userId)).
    */
  def groupSize(df: DataFrame, partition: Seq[Column],
                as: String = "group_size"): DataFrame =
    df.withColumn(as, count(lit(1)).over(Window.partitionBy(partition: _*)))

  /** Keep the top `k` rows per partition by `order` (descending caller passes
    * desc columns). Deterministic only if `order` is a total order — callers
    * must append a unique tie-breaker column.
    * Reference: `ItemIdCfVersion5.java:221-240` (descending-score top lists),
    * truncation contract `flink-process/.../Hdfs2RedisVersion5.java:84-91`.
    */
  def topKPerGroup(df: DataFrame, partition: Seq[Column], order: Seq[Column],
                   k: Int): DataFrame =
    df.withColumn("__rn", row_number().over(
        Window.partitionBy(partition: _*).orderBy(order: _*)))
      .filter(col("__rn") <= k)
      .drop("__rn")

  /** Per-group ordered "id:score,id:score,…" list — the reference's Redis
    * value format (`ItemIdCfVersion5.java:221-240,283`; parsed back at
    * `Hdfs2RedisVersion5.java:77-93`). `cap` bounds the list (reference 400),
    * `minLen` drops short lists (reference 20).
    *
    * Rows are bounded to the top `cap` BEFORE aggregation (row_number window
    * ≤ cap), so no aggregation buffer ever holds more than `cap` elements —
    * a 100×-hot key collects 400 structs, not its whole neighbor set. The
    * kept rank doubles as the sort key inside the group, so the final
    * ordering is a natural (codegen'd) struct sort, not an interpreted
    * comparator lambda. The window and the groupBy share the partition keys,
    * so Catalyst plans a single exchange for both.
    */
  def orderedConcat(df: DataFrame, partition: Seq[Column], sortDesc: Column,
                    tieAsc: Column, payload: Column, cap: Int, minLen: Int,
                    as: String = "toplist"): DataFrame =
    df.withColumn("__rn", row_number().over(
        Window.partitionBy(partition: _*).orderBy(sortDesc.desc, tieAsc.asc)))
      .filter(col("__rn") <= cap)
      .groupBy(partition: _*)
      .agg(transform(
        array_sort(collect_list(struct(col("__rn").as("r"), payload.as("p")))),
        e => e("p")).as("__items"))
      .filter(size(col("__items")) >= minLen)
      .withColumn(as, concat_ws(",", col("__items")))
      .drop("__items")

  /** Labeled size-histogram bucketing then count — the reference's "quDuan"
    * eyeball check (`ItemIdCfVersion5.java:242-278`,
    * `PetalDataSetUtils.java:293-331`): sizes land in "400+", "300+", …,
    * "00+" buckets.
    */
  def sizeHistogram(df: DataFrame, sizeCol: Column,
                    bucketEdges: Seq[Int] = Seq(400, 300, 200, 100, 50, 20, 0))
  : DataFrame = {
    val labeled = bucketEdges.tail.foldLeft(
      when(sizeCol >= bucketEdges.head, s"${bucketEdges.head}+")) {
      case (acc, edge) => acc.when(sizeCol >= edge, s"$edge+")
    }.otherwise("other")
    df.withColumn("bucket", labeled)
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))
  }
}
