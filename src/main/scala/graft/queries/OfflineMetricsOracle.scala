package graft.queries

/** DuckDB oracle for [[graft.jobs.OfflineMetrics.metricsWide]] — the same
  * algebra spelled as ANSI SQL (full-outer NULL semantics and the 1e-5
  * zero-floor included).
  */
object OfflineMetricsOracle {
  private val scene = "user_id % 5"
  private val item = "CAST(regexp_extract(props, '\"k\": (-?\\d+)', 1) AS BIGINT)"

  val sql: String =
    s"""WITH log AS (
      |  SELECT $scene AS scene, user_id, $item AS item,
      |         event_type AS action, ts
      |  FROM events),
      |totals AS (
      |  SELECT scene, COUNT(DISTINCT user_id) AS uv,
      |         COUNT(DISTINCT item) AS item_uv,
      |         SUM(CASE WHEN action='click' THEN 1 ELSE 0 END) AS click_pv
      |  FROM log GROUP BY scene),
      |ushow AS (SELECT scene, user_id, COUNT(*) AS c FROM log
      |          WHERE action='view' GROUP BY scene, user_id),
      |uclick AS (SELECT scene, user_id, COUNT(*) AS c FROM log
      |           WHERE action='click' GROUP BY scene, user_id),
      |uab AS (
      |  SELECT COALESCE(ushow.scene, uclick.scene) AS scene,
      |         ushow.c AS show_count, uclick.c AS detail_count
      |  FROM ushow FULL OUTER JOIN uclick
      |    ON ushow.scene = uclick.scene AND ushow.user_id = uclick.user_id),
      |userab AS (
      |  SELECT scene, COUNT(*) AS ab_users, SUM(detail_count) AS ab_user_clicks
      |  FROM uab
      |  WHERE (show_count = 0 AND detail_count > 0)
      |     OR CAST(detail_count AS DOUBLE) / show_count > 0.2
      |  GROUP BY scene),
      |ishow AS (SELECT scene, item, COUNT(*) AS c FROM log
      |          WHERE action='view' GROUP BY scene, item),
      |iclick AS (SELECT scene, item, COUNT(*) AS c FROM log
      |           WHERE action='click' GROUP BY scene, item),
      |iab AS (
      |  SELECT COALESCE(ishow.scene, iclick.scene) AS scene,
      |         ishow.c AS show_count, iclick.c AS detail_count
      |  FROM ishow FULL OUTER JOIN iclick
      |    ON ishow.scene = iclick.scene AND ishow.item = iclick.item),
      |itemab AS (
      |  SELECT scene, COUNT(*) AS ab_items, SUM(detail_count) AS ab_item_clicks
      |  FROM iab
      |  WHERE (show_count = 0 AND detail_count > 0)
      |     OR CAST(detail_count AS DOUBLE) / show_count > 0.2
      |  GROUP BY scene),
      |errors AS (
      |  SELECT scene,
      |         SUM(CASE WHEN action='error' THEN 1 ELSE 0 END) AS err_pv,
      |         COUNT(*) AS all_pv
      |  FROM log GROUP BY scene),
      |byday AS (
      |  SELECT DISTINCT scene, user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      |  FROM log),
      |days AS (SELECT MAX(day) AS today, MAX(day) - 1 AS yesterday FROM byday),
      |yest AS (SELECT scene, user_id FROM byday, days WHERE day = yesterday),
      |today AS (SELECT scene, user_id AS t_user FROM byday, days WHERE day = today),
      |fluct AS (
      |  SELECT yest.scene,
      |         CAST(SUM(CASE WHEN t_user IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
      |           / COUNT(*) AS user_fluctuate_ratio
      |  FROM yest LEFT JOIN today
      |    ON yest.scene = today.scene AND yest.user_id = today.t_user
      |  GROUP BY yest.scene)
      |SELECT t.scene,
      |  CASE WHEN COALESCE(CAST(err_pv AS DOUBLE) / all_pv, 0.0) < 1e-5 THEN 0.0
      |       ELSE COALESCE(CAST(err_pv AS DOUBLE) / all_pv, 0.0) END
      |    AS transfor_error_ratio,
      |  CASE WHEN COALESCE(CAST(ab_users AS DOUBLE) / uv, 0.0) < 1e-5 THEN 0.0
      |       ELSE COALESCE(CAST(ab_users AS DOUBLE) / uv, 0.0) END
      |    AS abnormal_user_ratio,
      |  CASE WHEN COALESCE(CAST(ab_user_clicks AS DOUBLE) / click_pv, 0.0) < 1e-5
      |       THEN 0.0
      |       ELSE COALESCE(CAST(ab_user_clicks AS DOUBLE) / click_pv, 0.0) END
      |    AS abnormal_user_click_ratio,
      |  CASE WHEN COALESCE(CAST(ab_items AS DOUBLE) / item_uv, 0.0) < 1e-5 THEN 0.0
      |       ELSE COALESCE(CAST(ab_items AS DOUBLE) / item_uv, 0.0) END
      |    AS abnormal_item_ratio,
      |  CASE WHEN COALESCE(CAST(ab_item_clicks AS DOUBLE) / click_pv, 0.0) < 1e-5
      |       THEN 0.0
      |       ELSE COALESCE(CAST(ab_item_clicks AS DOUBLE) / click_pv, 0.0) END
      |    AS abnormal_item_click_ratio,
      |  COALESCE(user_fluctuate_ratio, 0.0) AS user_fluctuate_ratio
      |FROM totals t
      |LEFT JOIN userab USING (scene)
      |LEFT JOIN itemab USING (scene)
      |LEFT JOIN errors USING (scene)
      |LEFT JOIN fluct USING (scene)""".stripMargin
}
