package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Ranking

/** Offline AUC / UAUC via the Mann-Whitney rank statistic — the reference's
  * `flink-auccalc/src/main/java/com/wufuqiang/auc/AucCalcVersion5.java`.
  *
  * The reference computes fractional ranks with a two-pass
  * `sortGroup().reduceGroup()` (sequential rank, then per-tie-group mean,
  * `AucCalcVersion5.java:302-340`); here both passes are window expressions
  * over the same partition keys, so the whole rank stage is one exchange +
  * one sort. The AUC fold (`:396-429`) becomes a conditional aggregate.
  */
object Auc {

  /** Dimension explode (`AucCalcVersion5.java:276-299`): each labeled row
    * fans out to one "full" row plus one row per dimension tag
    * (`"channel," + value` style), so AUC computes per (keys, channel)
    * across every slice in one pass. 1→(1+N) via a union of projections —
    * Catalyst folds it into a single scan with N+1 projections.
    */
  def explodeDimensions(df: DataFrame,
                        dims: Seq[(String, org.apache.spark.sql.Column)])
  : DataFrame = {
    val base = df.withColumn("channel", lit("full"))
    dims.foldLeft(base) { case (acc, (name, value)) =>
      acc.unionByName(df.withColumn("channel",
        concat_ws(",", lit(name), value)))
    }
  }

  /** Fractional-rank rows: rank = avg(row_number) over ties of `score`
    * within `keys` (`AucCalcVersion5.java:302-340`). Ordering ties beyond
    * `score` don't matter — tied rows all receive the tie-group mean.
    */
  def withFractionalRank(df: DataFrame, keys: Seq[String]): DataFrame =
    Ranking.fractionalRank(df, keys.map(col), col("score"), as = "frank")

  /** AUC per group (`AucCalcVersion5.java:396-429`):
    * (Σ rank⁺ − n⁺(n⁺+1)/2) / (n⁺ n⁻), emitted only when both classes are
    * present. `label` ∈ {0, 1}.
    */
  def auc(df: DataFrame, keys: Seq[String]): DataFrame =
    withFractionalRank(df, keys)
      .groupBy(keys.map(col): _*)
      .agg(
        sum(when(col("label") === 1, col("frank")).otherwise(lit(0.0))).as("rank_sum"),
        sum(when(col("label") === 1, 1L).otherwise(0L)).as("pos"),
        sum(when(col("label") === 0, 1L).otherwise(0L)).as("neg"))
      .filter(col("pos") =!= 0 && col("neg") =!= 0)
      .withColumn("auc",
        (col("rank_sum") - (col("pos") * (col("pos") + 1) / 2).cast("double")) /
          (col("pos") * col("neg")).cast("double"))
      .select((keys.map(col) :+ col("auc")): _*)

  /** UAUC (`AucCalcVersion5.java:432-489`): per-user AUC within `keys`
    * (user's rank partition is (keys, user)), weighted by the user's row
    * count ("show", `:343-362`), averaged over users that have both classes.
    */
  def uauc(df: DataFrame, keys: Seq[String], userCol: String): DataFrame = {
    val perUserKeys = keys :+ userCol
    val withShow = Ranking.groupSize(df, perUserKeys.map(col), as = "show")
    val perUser = auc(withShow, perUserKeys :+ "show")
    perUser
      .groupBy(keys.map(col): _*)
      .agg((sum(col("show") * col("auc")) / sum(col("show"))).as("uauc"))
  }

  /** Full-outer AUC ⋈ UAUC merge to the reference's `"auc_uauc"` string
    * (`AucCalcVersion5.java:491-514`): missing side contributes 0.0.
    */
  def aucAndUauc(df: DataFrame, keys: Seq[String], userCol: String): DataFrame = {
    val a = auc(df, keys)
    val u = uauc(df, keys, userCol)
    a.join(u, keys, "full_outer")
      .select((keys.map(col) :+
        concat_ws("_",
          coalesce(col("auc"), lit(0.0)).cast("string"),
          coalesce(col("uauc"), lit(0.0)).cast("string")).as("auc_uauc")): _*)
  }
}
