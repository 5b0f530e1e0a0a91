package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.8 incremental-resume semantics: the reference's hand-rolled
  * watermarking recomputed as pure DataFrame functions over the sink.
  */
object Watermark {

  /** A4+A5+P6 composite — `get_active_targets`
    * (daily_pv_automation.py:74-126): per key, the high-watermark
    * `MAX(datetime)` and the resume day — the last seen day itself when it is
    * incomplete (< requiredHours distinct hours), else the next day.
    * One shuffle on (key, day), then a thin per-key reduction. */
  def resumePoints(df: DataFrame, key: Column, ts: Column,
                   requiredHours: Int = 24): DataFrame = {
    val perDay = df.groupBy(key.as("grp"), to_date(ts).as("day"))
      .agg(countDistinct(hour(ts)).as("n_hours"), max(ts).as("day_max"))
    val w = Window.partitionBy(col("grp")).orderBy(col("day").desc)
    perDay.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("grp"), col("day_max").as("last_ts"),
        when(col("n_hours") >= requiredHours, date_add(col("day"), 1))
          .otherwise(col("day")).as("resume_day"))
  }

  /** A5 variant used by the backfiller (`_find_incomplete_days`,
    * nambu_backfill.py:161-182): days in [from, to] that exist but have
    * fewer than requiredHours distinct hours. */
  def incompleteDays(df: DataFrame, ts: Column, from: String, to: String,
                     requiredHours: Int = 24): DataFrame =
    df.filter(ts >= lit(from).cast("timestamp") &&
        ts < lit(to).cast("timestamp"))
      .groupBy(to_date(ts).as("day"))
      .agg(countDistinct(hour(ts)).as("n_hours"))
      .filter(col("n_hours") < requiredHours)
}
