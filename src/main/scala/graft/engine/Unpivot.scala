package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** W1/W2 — the signature reshape of the reference: wide per-day rows with 24
  * hour-columns (`qhorgen01..qhorgen24`) melted to long hourly rows, then the
  * hour parsed out of the column NAME into a timestamp offset.
  *
  * Reference evidence: melt used 6× (nambu_merge_pv_data.py:76-81,
  * daily_pv_automation.py:170-171, nambu_backfill.py:188-193,
  * namdong_merge_pv_data.py:117-123, namdong_collect_pv.py:297-303,
  * namdong_wind_collect.py:116-122). Hour-name parsing:
  * fetch_data/common/utils.py:18-24 (0-based) vs nambu_merge_pv_data.py:84-88
  * and namdong_wind_collect.py:127-138 (1-based with 24→next-day-00:00
  * rollover). The two conventions disagree on the same physical cell — both
  * are encoded explicitly here (SURVEY.md §7.4).
  *
  * Scale: `unpivot` is a Catalyst `Generator` (narrow, no shuffle) and the
  * hour parse is pure codegen'd expressions — this pipeline stays inside one
  * WholeStageCodegen span per partition regardless of input size.
  */
object Unpivot {

  /** Hour-column names h01..h24, mirroring qhorgen01..qhorgen24. */
  val hourNames: Seq[String] = (1 to 24).map(n => f"h$n%02d")

  /** Build the reference's wide source shape from a long event stream: one row
    * per (day, group) with 24 hour columns. This is the *input format* the
    * upstream APIs deliver (daily_pv_automation.py:169); we synthesize it from
    * `events` so melt can be exercised and oracled on the testdata. */
  def pivotByHour(df: DataFrame, ts: Column, key: Column, value: Column): DataFrame =
    df.withColumn("_h", format_string("h%02d", hour(ts) + lit(1)))
      .groupBy(to_date(ts).as("ymd"), key.as("grp"))
      .pivot("_h", hourNames)
      .agg(sum(value))

  /** W1: melt hour-named columns into (ids..., hour_col, generation) rows.
    * Maps to the built-in `unpivot` (a Generator — the reference's UDTF role,
    * SURVEY.md §2.9). Nulls are KEPT, as pandas melt does; callers drop them
    * explicitly (P5) just like the reference's `.dropna`. */
  def meltHours(df: DataFrame, ids: Seq[String], hourCols: Seq[String],
                valName: String = "generation"): DataFrame =
    df.unpivot(ids.map(col).toArray, hourCols.map(col).toArray, "hour_col", valName)

  /** W2: digits out of the hour column name (`parse_hour_column`,
    * fetch_data/common/utils.py:18-24; `str.extract(r'(\d+)')`). */
  def hourNumber(hourCol: Column): Column =
    regexp_extract(hourCol, "(\\d+)", 1).cast("int")

  private def plusHours(ts: Column, n: Column): Column =
    ts + make_interval(lit(0), lit(0), lit(0), lit(0), n, lit(0), lit(0))

  /** W2 convention (a), 0-based: `qhorgen01` → 00:00 (`hour0 = n-1`).
    * Reference: utils.py:18-24, daily_pv_automation.py:173-174,
    * namdong_collect_pv.py:305-308. */
  def tsZeroBased(ymd: Column, hourCol: Column): Column =
    plusHours(ymd.cast("timestamp"), hourNumber(hourCol) - lit(1))

  /** W2 convention (b), 1-based: `qhorgen01` → 01:00 and hour 24 rolls over to
    * next-day 00:00. Interval arithmetic gives the rollover for free — the
    * reference needs an explicit `np.where(hour==24, ...)` dance only because
    * it formats strings (namdong_wind_collect.py:127-138,
    * nambu_merge_pv_data.py:84-88). */
  def tsOneBased(ymd: Column, hourCol: Column): Column =
    plusHours(ymd.cast("timestamp"), hourNumber(hourCol))
}
