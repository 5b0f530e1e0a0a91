package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §3 — the reference's three top-level flows composed end-to-end from the
  * operator library. The upstream HTTP fetch is out-of-engine (SURVEY §2.1
  * S6–S9); each flow takes the fetched frame and performs everything the
  * reference does after the network boundary, through to the idempotent sink.
  */
object Flows {

  /** E1 — daily PV collection (daily_pv_automation.py:146-229): wide API
    * payload → melt (W1) → 0-based hour parse (W2a) → numeric coercion with
    * null→0 for generation only (§7.4) → dropna (P5) → idempotent
    * date-partition overwrite (S13). Returns the frame written. */
  def dailyPvFlow(wide: DataFrame, ymd: String, key: String,
                  hourCols: Seq[String], sinkPath: String): DataFrame = {
    val long = Unpivot.meltHours(wide, Seq(ymd, key), hourCols)
      .withColumn("ts", Unpivot.tsZeroBased(col(ymd), col("hour_col")))
      .withColumn("generation",
        coalesce(col("generation").cast("double"), lit(0.0)))
      .na.drop(Seq("ts"))
      .select(col(key).as("plant"), col("ts"), col("generation"))
    Sink.overwriteDatePartitions(long, col("ts"), sinkPath)
    long
  }

  /** E2 — weather collection (prefect_pipeline.py:115-164 →
    * impute_missing.py → merge_to_all.py): full imputation dispatch
    * (W3→W4/W5) → upsert-merge into history keyed by (grp, ts) with the new
    * batch winning (U2/S14). Returns the merged history. Input columns:
    * grp, ts, id, v. */
  def weatherFlow(spark: SparkSession, incoming: DataFrame,
                  historyPath: String): DataFrame = {
    val imputed = Impute.imputeAll(incoming, col("grp"), col("ts"), col("id"),
        col("v"))
      .select(col("grp"), col("ts"), col("id"), col("v_filled").as("v"))
    Sink.upsertParquet(spark, imputed, historyPath, Seq("grp", "ts"),
      Seq(col("id")))
    spark.read.parquet(historyPath)
  }

  /** E3 — monthly backfill (namdong_collect_pv.py / nambu_backfill.py):
    * compute the incomplete/missing days a fetcher must re-request —
    * missing dates in the window (J7) ∪ present-but-incomplete days (A5). */
  def backfillTargets(existing: DataFrame, ts: Column, from: String,
                      to: String, requiredHours: Int = 24): DataFrame = {
    // day-granularity window, INCLUSIVE of `to` (reference date_range
    // semantics) — row filters use the exclusive next-day bound so a
    // partially-present `to` day is still probed
    val endExcl = java.time.LocalDate.parse(to).plusDays(1).toString
    val missing = Analytics.missingDates(
        existing.filter(ts >= lit(from).cast("timestamp") &&
          ts < lit(endExcl).cast("timestamp")),
        ts, from, to)
    val incomplete = Watermark.incompleteDays(existing, ts, from, endExcl,
      requiredHours).select(col("day"))
    missing.unionByName(incomplete).distinct()
  }
}
