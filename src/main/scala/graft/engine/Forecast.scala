package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Forecast backtesting for the reference's historical-mean model.
  *
  * The reference imputes and sanity-checks energy readings against the
  * historical (month, day, hour) mean (fetch_data/common/impute_missing.py
  * :101-129) — implicitly treating that mean as a one-step forecaster. This
  * operator evaluates that model honestly: for every (key, day, hour) cell
  * the prediction uses ONLY strictly earlier days (expanding window — no
  * leakage of the day being predicted), and the error is reported per cell
  * so calibration tables/MAE roll up downstream.
  *
  * Integer contract: values quantize to micro-units before aggregation
  * (the [[Analytics.historicalMeanByMDH]] convention) and both the actual
  * and the prediction are Euclidean floor-division means — BIGINT-exact,
  * cross-engine replayable.
  *
  * 100 TB shape: the raw table collapses to the (key, day, hour) grain in
  * ONE partial-agg shuffle (data-scale → grain-scale, the only pass over
  * the corpus); the expanding window then runs over grain-sized data
  * partitioned by (key, hour) — thousands of rows per partition, never the
  * raw stream. A window straight over raw rows would sort the corpus;
  * aggregating first is the difference.
  */
object Forecast {

  private def floorDiv(num: Column, den: Column): Column =
    ((num - pmod(num, den)) / den).cast("long")

  /** Backtest of the expanding historical-mean forecaster at the
    * (key, day, hour) grain. Returns
    * `(grp, day, h, actual_micro, pred_micro, abs_err_micro)`;
    * `pred_micro`/`abs_err_micro` are NULL for a cell with no prior days
    * at the same (key, hour) — the model has no history to forecast from.
    */
  def backtestHistMean(df: DataFrame, key: Column, ts: Column,
                       value: Column): DataFrame = {
    val vm = floor(value * lit(1000000.0) + lit(0.5)).cast("long")
    val grain = df
      .groupBy(key.as("grp"), to_date(ts).as("day"),
        hour(ts).cast("long").as("h"))
      .agg(sum(vm).as("_s"), count(vm).as("_n"))
    val w = Window.partitionBy("grp", "h").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, -1)
    grain
      .withColumn("_ps", sum("_s").over(w))
      .withColumn("_pn", sum("_n").over(w))
      .select(col("grp"), col("day"), col("h"),
        when(col("_n") > 0, floorDiv(col("_s"), col("_n")))
          .as("actual_micro"),
        when(col("_pn") > 0, floorDiv(col("_ps"), col("_pn")))
          .as("pred_micro"))
      .withColumn("abs_err_micro",
        abs(col("actual_micro") - col("pred_micro")))
  }

  /** Classical additive seasonal decomposition at the hourly grain:
    * `y = trend + seasonal + residual` per key — trend as the ±12 h
    * centered moving mean (RANGE frame over the integer hour index, so
    * series gaps don't shift the window), seasonal as the per-(key,
    * hour-of-day) mean of the detrended series, residual as the
    * remainder. The anomaly/monitoring companion to
    * [[backtestHistMean]] (the reference's (m,d,h) mean IS a seasonal
    * profile; this separates it from level drift).
    *
    * Integer contract: micro-unit quantization before aggregation and
    * Euclidean floor means throughout (negative detrended values floor
    * identically to DuckDB `//`). 100 TB shape: the only corpus pass is
    * the hourly-grain collapse; both windows and the seasonal join run on
    * grain-sized data partitioned by key.
    * Output: `(grp, h, y_micro, trend_micro, seasonal_micro,
    * resid_micro)` for every hour cell holding data.
    */
  def seasonalDecompose(df: DataFrame, key: Column, ts: Column,
                        value: Column): DataFrame = {
    val vm = floor(value * lit(1000000.0) + lit(0.5)).cast("long")
    val grain = df
      .groupBy(key.as("grp"), date_trunc("hour", ts).as("h"))
      .agg(sum(vm).as("_s"), count(vm).as("_n"))
      .filter(col("_n") > 0)
      .withColumn("hidx", expr("unix_timestamp(h) div 3600"))
      .withColumn("y_micro", floorDiv(col("_s"), col("_n")))
    val wt = Window.partitionBy("grp").orderBy("hidx").rangeBetween(-12, 12)
    val trended = grain
      .withColumn("_ws", sum("_s").over(wt))
      .withColumn("_wn", sum("_n").over(wt))
      .withColumn("trend_micro", floorDiv(col("_ws"), col("_wn")))
      .withColumn("_detr", col("y_micro") - col("trend_micro"))
    val seasonal = trended
      .groupBy(col("grp").as("_sg"), pmod(col("hidx"), lit(24L)).as("_hod"))
      .agg(sum("_detr").as("_sd"), count(lit(1)).as("_sn"))
      .select(col("_sg"), col("_hod"),
        floorDiv(col("_sd"), col("_sn")).as("seasonal_micro"))
    trended.join(seasonal,
        trended("grp") === seasonal("_sg") &&
          pmod(trended("hidx"), lit(24L)) === seasonal("_hod"))
      .select(col("grp"), col("h"), col("y_micro"), col("trend_micro"),
        col("seasonal_micro"),
        (col("y_micro") - col("trend_micro") - col("seasonal_micro"))
          .as("resid_micro"))
  }

  /** Per-key model scorecard over a backtest frame: cells scored, mean
    * absolute error (floor micro-units). One grain-sized aggregate.
    */
  def maeByKey(backtest: DataFrame): DataFrame =
    backtest.filter(col("abs_err_micro").isNotNull)
      .groupBy("grp")
      .agg(count(lit(1)).as("n_cells"),
        sum("abs_err_micro").as("_se"))
      .select(col("grp"), col("n_cells"),
        floorDiv(col("_se"), col("n_cells")).as("mae_micro"))
}
