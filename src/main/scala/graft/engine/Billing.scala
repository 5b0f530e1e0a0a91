package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tariff / billing analytics over interval readings — the settlement
  * layer every metering pipeline feeds (the reference's PV/wind collection
  * exists to bill and settle; cf. fetch_data daily collection flows). All
  * money math follows the repo's integer contract so the statements are
  * cross-engine exact: energy floors to cents (`floor(value·100)`), rates
  * are declared integer micro-currency per cent, charges are pure BIGINT
  * products and sums — no float ever touches a charge.
  *
  * 100 TB shape: every operator here is scan → map-side CASE → partial-agg
  * shuffle on a key that only shrinks ((key, month) or (key, hour) then
  * (key, month)). Rates are declared literals, so no dimension join is on
  * the hot path; the statement join is between two already month-grained
  * frames (key-month-sized, negligible next to the scan).
  */
object Billing {

  private def cents(value: Column): Column =
    floor(value * lit(100.0)).cast("long")

  /** Time-of-use energy rollup: per (key, month), interval energy split
    * into peak vs off-peak bands and priced with declared integer rates.
    *
    * Band rule (calendar-correct in the session-UTC wall clock of `ts`):
    * peak = weekday hour in `[peakStartHour, peakEndHour)`; weekends and
    * all other hours are off-peak. Long-safety: exact while a month's band
    * energy in cents stays below ~9·10¹⁸ / rate_micro.
    *
    * Output: (grp, month, peak_cents, off_cents, energy_charge_micro).
    */
  def touEnergyCharges(df: DataFrame, key: Column, ts: Column, value: Column,
                       peakStartHour: Int = 9, peakEndHour: Int = 21,
                       ratePeakMicro: Long = 180L, rateOffMicro: Long = 90L)
      : DataFrame = {
    require(peakStartHour >= 0 && peakEndHour <= 24 &&
      peakStartHour < peakEndHour,
      s"peak band [$peakStartHour, $peakEndHour) must be a non-empty " +
        "sub-day range")
    require(ratePeakMicro >= 0 && rateOffMicro >= 0, "rates must be >= 0")
    val isPeak = hour(ts) >= peakStartHour && hour(ts) < peakEndHour &&
      !dayofweek(ts).isin(1, 7) // Spark: 1=Sunday, 7=Saturday
    df.filter(value.isNotNull)
      .groupBy(key.as("grp"),
        date_trunc("month", ts).cast("date").as("month"))
      .agg(sum(when(isPeak, cents(value)).otherwise(lit(0L)))
          .as("peak_cents"),
        sum(when(isPeak, lit(0L)).otherwise(cents(value))).as("off_cents"))
      .select(col("grp"), col("month"), col("peak_cents"), col("off_cents"),
        (col("peak_cents") * ratePeakMicro + col("off_cents") * rateOffMicro)
          .as("energy_charge_micro"))
  }

  /** Demand charge: per (key, month), the peak HOURLY energy (cents) in
    * the cycle times a declared demand rate — the standard commercial
    * tariff component (billing demand = max interval demand). Two
    * partial-agg shuffles, each onto a strictly smaller key space:
    * (key, hour) then (key, month).
    *
    * Output: (grp, month, peak_hour_cents, demand_charge_micro).
    */
  def demandCharge(df: DataFrame, key: Column, ts: Column, value: Column,
                   rateMicro: Long = 12000L): DataFrame = {
    require(rateMicro >= 0, "rate must be >= 0")
    df.filter(value.isNotNull)
      .groupBy(key.as("grp"), date_trunc("hour", ts).as("_h"))
      .agg(sum(cents(value)).as("h_cents"))
      .groupBy(col("grp"),
        date_trunc("month", col("_h")).cast("date").as("month"))
      .agg(max(col("h_cents")).as("peak_hour_cents"))
      .select(col("grp"), col("month"), col("peak_hour_cents"),
        (col("peak_hour_cents") * rateMicro).as("demand_charge_micro"))
  }

  /** Full monthly statement: TOU energy charges + demand charge + total.
    * Inner join is total by construction — both sides derive from the same
    * non-null readings, so a (key, month) cell exists in either both or
    * neither. Output adds `total_micro`.
    */
  def billingStatement(df: DataFrame, key: Column, ts: Column, value: Column,
                       peakStartHour: Int = 9, peakEndHour: Int = 21,
                       ratePeakMicro: Long = 180L, rateOffMicro: Long = 90L,
                       demandRateMicro: Long = 12000L): DataFrame =
    touEnergyCharges(df, key, ts, value, peakStartHour, peakEndHour,
        ratePeakMicro, rateOffMicro)
      .join(demandCharge(df, key, ts, value, demandRateMicro),
        Seq("grp", "month"))
      .withColumn("total_micro",
        col("energy_charge_micro") + col("demand_charge_micro"))
}
