package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in `queries` realizes one operator from SURVEY.md §2 (ID in the
  * name's comment), re-expressed over the TPC-H-ish testdata tables.
  * `oracleSql` carries the DuckDB-equivalent SQL; aggregate/computed columns
  * are aliased identically on both sides (the driver sorts columns by name
  * before hashing). Aggregated doubles are rounded on both sides so that
  * accumulation-order FP noise cannot flip the hash.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * A9 top-K revenue (piechart panel, pv_dashboard.json). */
  def entry(spark: SparkSession): DataFrame =
    Analytics.topKByGroup(
      Tables.lineitem(spark, "/root/testdata/sf0.001"),
      col("l_suppkey"), col("l_extendedprice") * (lit(1) - col("l_discount")), 10)

  import Tables._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- Aggregations (SURVEY §2.4) ----
    // A9 top-K by aggregate (Grafana piechart: GROUP BY plant ORDER BY SUM DESC LIMIT 10)
    "q_topk_revenue" -> ((s, d) =>
      Analytics.topKByGroup(lineitem(s, d), col("l_suppkey"),
        col("l_extendedprice") * (lit(1) - col("l_discount")), 10)),
    // A6 sum by group + hourly time bucket (Grafana timeseries panel)
    "q_hourly_by_type" -> ((s, d) =>
      Analytics.sumByTimeBucket(events(s, d), col("ts"), col("event_type"),
        col("value"))),
    // A4 per-key high-watermark (daily_pv_automation.py:79-87)
    "q_watermark" -> ((s, d) =>
      Analytics.highWatermark(events(s, d), Seq(col("user_id").as("grp")),
        col("ts"), col("event_type"))),
    // A5 day-completeness probe (daily_pv_automation.py:52-71)
    "q_day_completeness" -> ((s, d) =>
      Analytics.dayCompleteness(events(s, d), col("ts"), 24)),
    // A1 historical mean on (month,day,hour) (impute_missing.py:101-129)
    "q_hist_mean_mdh" -> ((s, d) =>
      Analytics.historicalMeanByMDH(events(s, d), col("event_type"),
        col("ts"), col("value"))),
    // A2 global stats: mean/stddev/null-count (impute_missing.py:240-257)
    "q_global_stats" -> ((s, d) =>
      events(s, d).agg(
        round(avg("value"), 6).as("mean_v"),
        round(stddev_samp("value"), 6).as("std_v"),
        sum(when(col("value").isNull, 1).otherwise(0)).as("n_null"),
        count(lit(1)).as("n_rows"))),
    // A3 group-by count-distinct (namdong_merge_pv_data.py:95-96)
    "q_countdistinct_by_group" -> ((s, d) =>
      events(s, d).groupBy(col("event_type").as("grp"))
        .agg(countDistinct(col("user_id")).as("n_users"))),
    // A7/P7 global sum over a timestamp range (Grafana stat panel)
    "q_sum_over_range" -> ((s, d) =>
      events(s, d)
        .filter(col("ts") >= lit("2024-01-10 00:00:00") &&
                col("ts") <  lit("2024-01-20 00:00:00"))
        .agg(round(sum("value"), 2).as("total"), count(lit(1)).as("n"))),
    // A8/A11 global count-distinct + distinct values
    "q_distinct_types" -> ((s, d) =>
      events(s, d).select(col("event_type").as("t")).distinct()),

    // ---- Joins (SURVEY §2.3) ----
    // J5 left join with range condition in ON + COALESCE(SUM,0) (geomap panel)
    "q_dim_activity_range" -> ((s, d) => {
      val li = lineitem(s, d)
      Analytics.dimWithRangeActivity(
        supplier(s, d), col("s_suppkey"), li, col("l_suppkey"),
        col("l_shipdate"), col("l_extendedprice"),
        lit("1996-01-01").cast("timestamp"), lit("1996-12-31").cast("timestamp"))
    }),
    // J7 anti-join on generated calendar → missing dates (nambu_bulk_sync.py:24-40)
    "q_missing_dates" -> ((s, d) =>
      Analytics.missingDates(orders(s, d), col("o_orderdate"),
        "2001-06-01", "2001-12-31")),

    // ---- Windows (SURVEY §2.5) ----
    // A10 per-day summary stats as window aggregates (daily_pv_automation.py:176-179)
    "q_daily_stats_window" -> ((s, d) =>
      Analytics.dailyStatsWindow(events(s, d), col("event_type"), col("ts"),
        col("value"))),
    // W7 conditional suffix by group property (namdong_merge_pv_data.py:93-104)
    "q_suffix_multi_unit" -> ((s, d) =>
      Analytics.suffixWhenMultiUnit(
        part(s, d).select(col("p_partkey"), col("p_brand"), col("p_size")),
        col("p_brand"), col("p_size"))
        .select(col("p_partkey"), col("display_name"))),
  )

  /** DuckDB equivalents over the same parquet tables (see Verify). */
  def oracleSql: Map[String, String] = Map(
    "q_topk_revenue" ->
      """SELECT l_suppkey AS grp,
         round(SUM(l_extendedprice * (1 - l_discount)), 2) AS total
         FROM lineitem GROUP BY 1 ORDER BY total DESC, grp LIMIT 10""",
    "q_hourly_by_type" ->
      """SELECT date_trunc('hour', ts) AS bucket, event_type AS grp,
         round(SUM(value), 2) AS total
         FROM events GROUP BY 1, 2""",
    "q_watermark" ->
      """SELECT user_id AS grp, max(ts) AS last_ts, max(event_type) AS carry
         FROM events GROUP BY 1""",
    "q_day_completeness" ->
      """SELECT CAST(ts AS DATE) AS day,
         COUNT(DISTINCT EXTRACT(hour FROM ts)) AS n_hours
         FROM events GROUP BY 1 HAVING COUNT(DISTINCT EXTRACT(hour FROM ts)) >= 24""",
    "q_hist_mean_mdh" ->
      """SELECT event_type AS grp, CAST(EXTRACT(month FROM ts) AS BIGINT) AS m,
         CAST(EXTRACT(day FROM ts) AS BIGINT) AS d, CAST(EXTRACT(hour FROM ts) AS BIGINT) AS h,
         round(AVG(value), 6) AS hist_avg
         FROM events GROUP BY 1, 2, 3, 4""",
    "q_global_stats" ->
      """SELECT round(AVG(value), 6) AS mean_v,
         round(STDDEV_SAMP(value), 6) AS std_v,
         CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         COUNT(*) AS n_rows
         FROM events""",
    "q_countdistinct_by_group" ->
      """SELECT event_type AS grp, COUNT(DISTINCT user_id) AS n_users
         FROM events GROUP BY 1""",
    "q_sum_over_range" ->
      """SELECT round(SUM(value), 2) AS total, COUNT(*) AS n FROM events
         WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
           AND ts <  TIMESTAMP '2024-01-20 00:00:00'""",
    "q_distinct_types" ->
      "SELECT DISTINCT event_type AS t FROM events",
    "q_dim_activity_range" ->
      """SELECT s.s_suppkey AS grp,
         round(COALESCE(SUM(l.l_extendedprice), 0), 2) AS total
         FROM supplier s LEFT JOIN lineitem l
           ON s.s_suppkey = l.l_suppkey
          AND l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate <= TIMESTAMP '1996-12-31'
         GROUP BY 1""",
    "q_missing_dates" ->
      """SELECT cal.day AS day
         FROM (SELECT unnest(generate_series(DATE '2001-06-01', DATE '2001-12-31',
                      INTERVAL 1 DAY))::DATE AS day) cal
         LEFT JOIN (SELECT DISTINCT CAST(o_orderdate AS DATE) AS day FROM orders) o
           USING (day)
         WHERE o.day IS NULL""",
    "q_daily_stats_window" ->
      """SELECT event_type AS grp, ts, value AS v,
         round(SUM(value)  OVER w, 2) AS daily_total,
         round(AVG(value)  OVER w, 6) AS daily_avg,
         round(MAX(value)  OVER w, 6) AS daily_max,
         round(MIN(value)  OVER w, 6) AS daily_min
         FROM events
         WINDOW w AS (PARTITION BY event_type, CAST(ts AS DATE))""",
    "q_suffix_multi_unit" ->
      """SELECT p.p_partkey,
         CASE WHEN b.n_units > 1
              THEN p.p_brand || '_' || CAST(p.p_size AS VARCHAR)
              ELSE p.p_brand END AS display_name
         FROM part p JOIN (SELECT p_brand, COUNT(DISTINCT p_size) AS n_units
                           FROM part GROUP BY 1) b USING (p_brand)""",
  )
}
