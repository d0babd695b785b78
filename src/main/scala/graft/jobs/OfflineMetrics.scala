package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Offline dashboard metrics — the reference's
  * `flink-statistics/src/main/java/com/wufuqiang/statistics/OfflineJob.java`
  * recast onto the `events` test table: `action='show'` → `event_type='view'`,
  * `'detailPageShow'` → `'click'`, `sceneId` → `pmod(user_id, 5)` cohort,
  * `itemId` → `props.k`.
  *
  * Faithfulness notes (SURVEY §7.3 hard parts):
  *  - The CTR-abnormal filter runs over a FULL OUTER join
  *    (`OfflineJob.java:386-390`), so a user with clicks but no shows has
  *    `showCount = NULL` (not 0) and the reference's `showCount=0 &&
  *    detailCount>0` branch never fires (NULL comparisons are false in both
  *    Calcite and Catalyst). We reproduce the join + predicate verbatim
  *    rather than "fixing" it with coalesce.
  *  - Ratios are single IEEE divisions of two longs → bit-identical across
  *    engines, with the reference's 1e-5 zero-floor
  *    (`OfflineJob.java:415-421`).
  *  - `calcAbnormalUserClickRatio`'s `userIdCount/actionAllUv` is a *long*
  *    division in Java (`OfflineDataSetUtils.java:378-384`) — floor division,
  *    kept faithfully where that code path is mirrored.
  */
object OfflineMetrics {

  val CtrThreshold = 0.2

  /** events → (scene, user_id, item, action, ts) action-log view. */
  def actionLog(events: DataFrame): DataFrame =
    events.select(
      pmod(col("user_id"), lit(5)).cast("long").as("scene"),
      col("user_id"),
      get_json_object(col("props"), "$.k").cast("long").as("item"),
      col("event_type").as("action"),
      col("ts"))

  /** Per-(scene,key) show/detail counts via the reference's two-aggregate
    * full-outer join (`OfflineJob.java:376-387`), keeping NULL counts.
    */
  def showDetailCounts(log: DataFrame, key: String): DataFrame = {
    val show = log.filter(col("action") === "view")
      .groupBy("scene", key).agg(count(lit(1)).as("show_count"))
    val detail = log.filter(col("action") === "click")
      .groupBy("scene", key).agg(count(lit(1)).as("detail_count"))
    show.join(detail, Seq("scene", key), "full_outer")
  }

  /** CTR-abnormal aggregate per scene (`OfflineJob.java:390-392`):
    * HAVING-style arithmetic OR predicate, then count+sum.
    */
  def ctrAbnormal(log: DataFrame, key: String): DataFrame =
    showDetailCounts(log, key)
      .filter((col("show_count") === 0 && col("detail_count") > 0) ||
        col("detail_count").cast("double") / col("show_count") > CtrThreshold)
      .groupBy("scene")
      .agg(count(lit(1)).as("abnormal_count"),
        sum("detail_count").as("detail_sum"))

  /** Scene-level UV / click-PV / item-UV — the reference pulls these from
    * HBase (`OfflineJob.java:97`) and probes the map in closures (a manual
    * broadcast join, SURVEY J10); here they're a tiny aggregate joined with
    * an explicit `broadcast()` hint.
    */
  def sceneTotals(log: DataFrame): DataFrame =
    log.groupBy("scene").agg(
      countDistinct(col("user_id")).as("uv"),
      countDistinct(col("item")).as("item_uv"),
      sum(when(col("action") === "click", 1L).otherwise(0L)).as("click_pv"))

  private def floorTiny(c: org.apache.spark.sql.Column) =
    when(c < 1e-5, 0.0).otherwise(c)

  /** The six per-scene dashboard ratios of `OfflineJob.java:396-523`, wide
    * (one row per scene) instead of the reference's union+pivot-to-string —
    * see [[metricsLong]] for the faithful union shape.
    *
    * transforErrorRatio is recast as error-events / all-events per scene
    * (the reference computes failed-transfer / nginx-requests,
    * `OfflineDataSetUtils.java:320-356` — same algebra, different source).
    */
  def metricsWide(events: DataFrame): DataFrame = {
    val log = graft.core.CacheScope.track(actionLog(events).cache())
    log.count() // eager: five subplans race to populate a lazy cache,
                // re-running the events scan + JSON parse once per branch
    val totals = sceneTotals(log)
    val userAb = ctrAbnormal(log, "user_id")
      .select(col("scene"), col("abnormal_count").as("ab_users"),
        col("detail_sum").as("ab_user_clicks"))
    val itemAb = ctrAbnormal(log, "item")
      .select(col("scene"), col("abnormal_count").as("ab_items"),
        col("detail_sum").as("ab_item_clicks"))
    val errors = log.groupBy("scene").agg(
      sum(when(col("action") === "error", 1L).otherwise(0L)).as("err_pv"),
      count(lit(1)).as("all_pv"))
    val fluct = userFluctuation(log)

    totals
      .join(broadcast(userAb), Seq("scene"), "left_outer")
      .join(broadcast(itemAb), Seq("scene"), "left_outer")
      .join(broadcast(errors), Seq("scene"), "left_outer")
      .join(broadcast(fluct), Seq("scene"), "left_outer")
      .select(
        col("scene"),
        floorTiny(coalesce(col("err_pv").cast("double") / col("all_pv"), lit(0.0)))
          .as("transfor_error_ratio"),
        floorTiny(coalesce(col("ab_users").cast("double") / col("uv"), lit(0.0)))
          .as("abnormal_user_ratio"),
        floorTiny(coalesce(col("ab_user_clicks").cast("double") / col("click_pv"), lit(0.0)))
          .as("abnormal_user_click_ratio"),
        floorTiny(coalesce(col("ab_items").cast("double") / col("item_uv"), lit(0.0)))
          .as("abnormal_item_ratio"),
        floorTiny(coalesce(col("ab_item_clicks").cast("double") / col("click_pv"), lit(0.0)))
          .as("abnormal_item_click_ratio"),
        coalesce(col("user_fluctuate_ratio"), lit(0.0)).as("user_fluctuate_ratio"))
  }

  /** User fluctuation (`OfflineDataSetUtils.java:230-268`): of yesterday's
    * distinct users, the share absent today — left outer join yesterday→today
    * per scene. "Yesterday/today" = the last two calendar days present in the
    * data (the reference reads yesterday's users from its CSV day-cache,
    * SURVEY S9/K2).
    */
  def userFluctuation(log: DataFrame): DataFrame = {
    val byDay = log.select(col("scene"), col("user_id"),
      to_date(col("ts")).as("day")).distinct()
    val days = byDay.agg(max("day").as("today")).withColumn(
      "yesterday", date_sub(col("today"), 1))
    val dated = byDay.join(broadcast(days), byDay("day") === days("today") ||
      byDay("day") === days("yesterday"))
    // explicit aliases: yest/today share the `dated` lineage, so unaliased
    // column refs would resolve to the same attribute (trivially-true join)
    val yest = dated.filter(col("day") === col("yesterday"))
      .select(col("scene").as("y_scene"), col("user_id").as("y_user"))
    val today = dated.filter(col("day") === col("today"))
      .select(col("scene").as("t_scene"), col("user_id").as("t_user"))
    yest.join(today,
        col("y_scene") === col("t_scene") && col("y_user") === col("t_user"),
        "left_outer")
      .groupBy(col("y_scene").as("scene"))
      .agg((sum(when(col("t_user").isNull, 1L).otherwise(0L)).cast("double") /
        count(lit(1))).as("user_fluctuate_ratio"))
  }

  /** Faithful long shape: (scene, metric, value) union of all metric streams
    * (`OfflineJob.java:489-496`), ready for the reference's pivot-to-6-slot
    * row (`:499-523`), which [[metricsWide]] expresses as one wide select.
    */
  def metricsLong(events: DataFrame): DataFrame = {
    val wide = metricsWide(events)
    val names = Seq("transfor_error_ratio", "abnormal_user_ratio",
      "abnormal_user_click_ratio", "abnormal_item_ratio",
      "abnormal_item_click_ratio", "user_fluctuate_ratio")
    wide.select(col("scene"), explode(map(
      names.flatMap(n => Seq(lit(n), col(n))): _*)).as(Seq("metric", "value")))
  }
}
