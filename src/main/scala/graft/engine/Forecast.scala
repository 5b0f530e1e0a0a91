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

  /** Per-key sample autocorrelation of the daily series at the requested
    * lags — the seasonality/persistence probe behind lag-feature selection
    * (is yesterday predictive? is there a weekly cycle?) for the
    * historical-mean forecaster family above.
    *
    * Integer contract, exactly: values floor-quantize to cents per event
    * BEFORE the daily sum (BIGINT); centering multiplies through by n
    * (`c_t = n·x_t − S`) so the mean never becomes a float; cross products
    * accumulate in DECIMAL(38,0) (internal only — c_t can reach n·max|x|,
    * so Σc² would overflow BIGINT on long/high-magnitude series); the
    * result is `sign(N_k) · (10⁶·|N_k|) div D` with
    * `N_k = Σ c_t·c_{t−k}`, `D = Σ c_t²` — |N_k| ≤ D by Cauchy–Schwarz, so
    * the quotient fits ppm in a BIGINT and truncation equals DuckDB `//`
    * on the non-negative operands. The DECIMAL stays internal per the
    * dtype contract (the r5 covariance lesson).
    *
    * Lags are over the OBSERVED day sequence ordered by day (calendar gaps
    * are not filled — resample first via [[Analytics.resampleFill]] if
    * strict-calendar lags matter; declared, like every order-sensitive
    * operator here). A lag ≥ the series length or a constant series
    * (D = 0) yields NULL acf_ppm, not a dropped row.
    *
    * 100 TB shape: the corpus collapses to the (key, day) grain in ONE
    * partial-agg shuffle; every lag column comes from ONE window pass over
    * grain-sized data (the EWMA all-lags-one-Window pattern), and the
    * per-key reduce is a second grain-sized aggregate on the same key
    * partitioning. Output: (grp, lag_days, n, acf_ppm).
    */
  def acfByKey(df: DataFrame, key: Column, ts: Column, value: Column,
               lags: Seq[Int]): DataFrame = {
    require(lags.nonEmpty && lags.forall(_ >= 1) && lags.distinct == lags,
      s"lags must be distinct and >= 1: $lags")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val xc = floor(value * lit(100.0)).cast("long")
    val daily = df.filter(value.isNotNull)
      .groupBy(key.as("grp"), to_date(ts).as("day"))
      .agg(sum(xc).as("x"))
    val wAll = Window.partitionBy(col("grp"))
    val wOrd = Window.partitionBy(col("grp")).orderBy(col("day"))
    val centered = daily
      .withColumn("_n", count(lit(1)).over(wAll))
      .withColumn("_s", sum(col("x")).over(wAll))
      .withColumn("_c", col("_n") * col("x") - col("_s"))
    val lagged = lags.foldLeft(centered) { (d, k) =>
      d.withColumn(s"_c$k", lag(col("_c"), k).over(wOrd))
    }
    val numAggs = lags.map(k =>
      sum(col("_c").cast(dec) * col(s"_c$k").cast(dec)).as(s"_num$k"))
    val byGrp = lagged.groupBy(col("grp")).agg(
      max(col("_n")).as("n"),
      (sum(col("_c").cast(dec) * col("_c").cast(dec)).as("_den") +:
        numAggs): _*)
    val stackArgs = lags.map(k => s"${k}L, _num$k").mkString(", ")
    byGrp
      .selectExpr("grp", "n", "_den",
        s"stack(${lags.length}, $stackArgs) AS (lag_days, _num)")
      .withColumn("_scaled",
        abs(col("_num")) * lit(1000000L).cast(dec))
      .withColumn("acf_ppm",
        when(col("_den") === 0 || col("_num").isNull, lit(null))
          .otherwise(when(col("_num") >= 0, expr("_scaled div _den"))
            .otherwise(-expr("_scaled div _den"))).cast("long"))
      .select(col("grp"), col("lag_days"), col("n"), col("acf_ppm"))
  }

  /** Per-key linear trend of the daily series: exact integer OLS slope in
    * micro-cents per day — the "is this meter drifting, and how fast"
    * scorecard ([[acfByKey]] asks *whether* yesterday predicts today; this
    * fits the direction). The day index is centered per key to its first
    * observed day (slope is shift-invariant, and the raw epoch index would
    * inflate every moment ~650×); moments and the `n·Σt·y − Σt·Σy` /
    * `n·Σt² − (Σt)²` combination run in INTERNAL DECIMAL(38,0) — the ACF
    * convention; `n·Σty` passes Long around a decade of ~$2M/day series,
    * so BIGINT would be a silent cliff. Result is `sign·(10⁶·|Num|) div
    * Den` as BIGINT micro-cents/day (truncation == floor on the
    * non-negative operands, DuckDB-identical). A key with a single
    * day or all-equal day indexes has Den = 0 → NULL slope, row kept.
    *
    * 100 TB shape: corpus → (key, day) grain in one partial-agg shuffle;
    * the min-day window and the moment reduce both reuse the grain's key
    * partitioning. Output: (grp, n, slope_micro).
    */
  def trendSlopeByKey(df: DataFrame, key: Column, ts: Column,
                      value: Column): DataFrame = {
    val xc = floor(value * lit(100.0)).cast("long")
    val daily = df.filter(value.isNotNull)
      .groupBy(key.as("grp"), to_date(ts).as("day"))
      .agg(sum(xc).as("y"))
    val wAll = Window.partitionBy(col("grp"))
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    daily
      .withColumn("_t",
        datediff(col("day"), min(col("day")).over(wAll)).cast("long")
          .cast(dec))
      .withColumn("_y", col("y").cast(dec))
      .groupBy(col("grp")).agg(
        count(lit(1)).cast(dec).as("_n"), sum(col("_t")).as("_st"),
        sum(col("_t") * col("_t")).as("_stt"), sum(col("_y")).as("_sy"),
        sum(col("_t") * col("_y")).as("_sty"))
      .withColumn("_num", col("_n") * col("_sty") - col("_st") * col("_sy"))
      .withColumn("_den", col("_n") * col("_stt") - col("_st") * col("_st"))
      .withColumn("_scaled", abs(col("_num")) * lit(1000000L).cast(dec))
      .withColumn("slope_micro",
        when(col("_den") === 0, lit(null))
          .otherwise(when(col("_num") >= 0, expr("_scaled div _den"))
            .otherwise(-expr("_scaled div _den"))).cast("long"))
      .select(col("grp"), col("_n").cast("long").as("n"), col("slope_micro"))
  }

  /** Degree-day weather sensitivity per key — the simple-regression
    * measurement-and-verification baseline (IPMVP Option C style): regress
    * daily energy on daily heating and cooling degree-days, each as an
    * independent single-variable OLS (the standard first-pass M&V fit;
    * a joint 2-regressor fit needs a 3×3 solve whose integer determinants
    * overflow the exactness contract for no extra decision value here).
    *
    * Grain: daily load cents per key ⋈ (inner, on days BOTH series cover)
    * the daily Euclidean-floor-mean temperature cents of the declared
    * temperature series; `hdd = max(0, base − T̄)`, `cdd = max(0, T̄ −
    * base)`. Slopes in micro-cents per degree-cent via the
    * [[trendSlopeByKey]] integer contract: DECIMAL(38,0) moments kept
    * INTERNAL, sign-split truncating division, BIGINT at the boundary.
    *
    * 100 TB shape: each corpus collapses to its daily grain in one
    * partial-agg pass; the temperature grain is day-sized and broadcasts;
    * the moment reduce reuses the load grain's key partitioning. Output:
    * (grp, n, hdd_slope_micro, cdd_slope_micro) — NULL slope when the
    * regressor is constant (den = 0).
    */
  def degreeDaySensitivity(load: DataFrame, key: Column, ts: Column,
                           value: Column, temp: DataFrame, tempTs: Column,
                           tempValue: Column, baseCents: Long): DataFrame = {
    require(baseCents > 0, s"baseCents > 0: $baseCents")
    val yc = floor(value * lit(100.0)).cast("long")
    val tc = floor(tempValue * lit(100.0)).cast("long")
    val loadDaily = load.filter(value.isNotNull)
      .groupBy(key.as("grp"), to_date(ts).as("day"))
      .agg(sum(yc).as("y"))
    val tempDaily = temp.filter(tempValue.isNotNull)
      .groupBy(to_date(tempTs).as("day"))
      .agg(sum(tc).as("_s"), count(tc).as("_tn"))
      .select(col("day"),
        ((col("_s") - pmod(col("_s"), col("_tn"))) / col("_tn"))
          .cast("long").as("t_cents"))
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    loadDaily.join(broadcast(tempDaily), "day")
      .withColumn("_h",
        greatest(lit(0L), lit(baseCents) - col("t_cents")).cast(dec))
      .withColumn("_c",
        greatest(lit(0L), col("t_cents") - lit(baseCents)).cast(dec))
      .withColumn("_y", col("y").cast(dec))
      .groupBy(col("grp")).agg(
        count(lit(1)).cast(dec).as("_n"),
        sum(col("_h")).as("_sh"), sum(col("_h") * col("_h")).as("_shh"),
        sum(col("_c")).as("_sc"), sum(col("_c") * col("_c")).as("_scc"),
        sum(col("_y")).as("_sy"),
        sum(col("_h") * col("_y")).as("_shy"),
        sum(col("_c") * col("_y")).as("_scy"))
      .withColumn("_numh", col("_n") * col("_shy") - col("_sh") * col("_sy"))
      .withColumn("_denh", col("_n") * col("_shh") - col("_sh") * col("_sh"))
      .withColumn("_numc", col("_n") * col("_scy") - col("_sc") * col("_sy"))
      .withColumn("_denc", col("_n") * col("_scc") - col("_sc") * col("_sc"))
      .withColumn("_absh", abs(col("_numh")) * lit(1000000L).cast(dec))
      .withColumn("_absc", abs(col("_numc")) * lit(1000000L).cast(dec))
      .withColumn("hdd_slope_micro",
        when(col("_denh") === 0, lit(null))
          .otherwise(when(col("_numh") >= 0, expr("_absh div _denh"))
            .otherwise(-expr("_absh div _denh"))).cast("long"))
      .withColumn("cdd_slope_micro",
        when(col("_denc") === 0, lit(null))
          .otherwise(when(col("_numc") >= 0, expr("_absc div _denc"))
            .otherwise(-expr("_absc div _denc"))).cast("long"))
      .select(col("grp"), col("_n").cast("long").as("n"),
        col("hdd_slope_micro"), col("cdd_slope_micro"))
  }

  /** Theil–Sen robust trend per key: the median of all pairwise daily
    * slopes — the estimator that shrugs off the outlier days that drag
    * [[trendSlopeByKey]]'s OLS fit (up to ~29% contamination). Pair
    * slopes quantize to micro-cents/day with round-toward-zero sign-split
    * integer division (`sign(dy)·(10⁶·|dy|) div dt` — dt > 0 by the i<j
    * pairing, so truncation is engine-identical); the median is reported
    * DOUBLED ([[Analytics.rollingMedianDaily]]'s convention) so the
    * even-count midpoint interpolation stays integer.
    *
    * Long-safety bound (the repo's usual validity note): the twice-median
    * is computed as `2.0 * median(double)` and cast back to long; Spark's
    * cast truncates while DuckDB rounds-to-nearest, so cross-engine
    * exactness requires the even-count midpoint pair SUM of micro-slopes
    * to stay under 2^53 — i.e. |slope| below ~2^52 micro-units
    * (~4.5e9 cents/day). Energy series are orders of magnitude inside
    * this; series that are not should pre-scale their unit.
    *
    * 100 TB shape: corpus → (key, day) grain first (the only corpus
    * pass); the pair join is grain²-per-key — bounded by series length
    * (a year of dailies = ~66k pairs/key), never by data volume — and
    * stays key-local (one hash join under AQE). A key with a single day
    * forms no pair and is absent from the output (declared — the OLS twin
    * emits its NULL row instead). Output: (grp, n_pairs,
    * twice_med_slope_micro).
    */
  def theilSenSlopeByKey(df: DataFrame, key: Column, ts: Column,
                         value: Column, maxDays: Int = 4000): DataFrame = {
    require(maxDays >= 2, s"maxDays >= 2: $maxDays")
    // quadratic knob here is PER-KEY series length (pairs-per-key =
    // days²/2), so the loud a-priori bound is on the longest key's
    // distinct-day count — NOT the global union of days, which would
    // reject a wide panel of short series covering different eras (an r7
    // regression, fixed per ADVICE r8). One cheap two-column pre-pass
    // (map-side partial agg, key-sized result reduced to one row); 4000
    // days (~11 years of dailies) caps a key at ~8M pairs
    val nDays = df.filter(value.isNotNull)
      .groupBy(key.as("_g"))
      .agg(countDistinct(to_date(ts)).as("_nd"))
      .agg(coalesce(max(col("_nd")), lit(0L)))
      .first().getLong(0)
    require(nDays <= maxDays,
      s"theilSenSlopeByKey: a key spans $nDays distinct days, exceeding " +
        s"maxDays=$maxDays — the per-key pair join is quadratic in series " +
        "length. Restrict the time range, aggregate to a coarser grain, " +
        "or raise maxDays deliberately (SCALE.md).")
    val xc = floor(value * lit(100.0)).cast("long")
    val daily = df.filter(value.isNotNull)
      .groupBy(key.as("grp"), to_date(ts).as("day"))
      .agg(sum(xc).as("y"))
    val pts = daily
      .withColumn("_t", datediff(col("day"),
        min(col("day")).over(Window.partitionBy(col("grp")))).cast("long"))
      .select(col("grp"), col("_t"), col("y"))
    val a = pts.select(col("grp"), col("_t").as("ti"), col("y").as("yi"))
    val b = pts.select(col("grp"), col("_t").as("tj"), col("y").as("yj"))
    a.join(b, "grp").filter(col("tj") > col("ti"))
      .withColumn("_dy", col("yj") - col("yi"))
      .withColumn("_dt", col("tj") - col("ti"))
      .withColumn("_s", abs(col("_dy")) * lit(1000000L))
      .withColumn("_sm", when(col("_dy") >= 0, expr("_s div _dt"))
        .otherwise(-expr("_s div _dt")))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_pairs"),
        (lit(2.0) * median(col("_sm"))).cast("long")
          .as("twice_med_slope_micro"))
  }

  /** Demand-response "N-of-N" baseline (the CAISO/PJM 10-in-10 method,
    * published settlement practice): for every (key, weekday, hour) cell,
    * the baseline is the mean of the SAME HOUR over the previous N
    * weekday observations — what the meter "would have drawn" absent a
    * curtailment event; the actual-vs-baseline ratio is the settlement
    * quantity. Weekends are excluded from both sides (weekday and weekend
    * load shapes are different populations — mixing them is the classic
    * baseline-gaming bug).
    *
    * "Previous N weekday observations" is a ROWS frame over the
    * weekday-only rows ordered by day — NOT a calendar RANGE (a holiday
    * gap must reach further back, not shrink the sample; the method
    * counts observations). Integer contract: hourly floor-cent sums,
    * Euclidean floor-division mean, `ratio_ppm = floor((10⁶·x) /
    * baseline)` — FLOOR, not truncation, so a negative hourly reading
    * (net-metered export) divides identically cross-engine;
    * a cell with no history gets NULL baseline/ratio, not a dropped row.
    *
    * 100 TB shape: corpus → (key, day, hour) grain in one partial-agg
    * shuffle; the window partitions by (key, hour) over grain-sized rows
    * (the [[backtestHistMean]] layout). Output: (grp, day, h, x_cents,
    * baseline_cents, n_hist, ratio_ppm).
    */
  def drBaseline(df: DataFrame, key: Column, ts: Column, value: Column,
                 nDays: Int = 10): DataFrame = {
    require(nDays >= 1, s"nDays >= 1: $nDays")
    val xc = floor(value * lit(100.0)).cast("long")
    val grain = df.filter(value.isNotNull)
      .groupBy(key.as("grp"), to_date(ts).as("day"),
        hour(ts).cast("long").as("h"))
      .agg(sum(xc).as("x_cents"))
      // ISO weekday 1..5 (dayofweek is 1=Sun..7=Sat)
      .filter(pmod(dayofweek(col("day")) + lit(5), lit(7)) < 5)
    val w = Window.partitionBy(col("grp"), col("h")).orderBy(col("day"))
      .rowsBetween(-nDays.toLong, -1L)
    grain
      .withColumn("_hs", sum(col("x_cents")).over(w))
      .withColumn("n_hist", count(lit(1)).over(w))
      .withColumn("baseline_cents",
        when(col("n_hist") > 0, floorDiv(col("_hs"), col("n_hist"))))
      .withColumn("_x6", col("x_cents") * lit(1000000L))
      .withColumn("ratio_ppm",
        when(col("baseline_cents") > 0,
          floorDiv(col("_x6"), col("baseline_cents"))))
      .select(col("grp"), col("day"), col("h"), col("x_cents"),
        col("baseline_cents"), col("n_hist"), col("ratio_ppm"))
  }

  /** Pairwise Spearman rank correlation between keys' daily series — the
    * "which meters move together" similarity matrix, for anomaly
    * cross-checks (a meter diverging from its usual partners) and feature
    * grouping. Spearman over Pearson deliberately: the rank statistic is
    * ALL-INTEGER (`ρ = 1 − 6Σd²/(n(n²−1))` needs no square root, where a
    * Pearson denominator would reintroduce the float boundary this repo
    * quantizes away everywhere else), and it is robust to the outlier
    * days a raw-value correlation is dragged by.
    *
    * Pairs align on COMMON days only (inner join), and ranks are computed
    * on each pair's own aligned subset — ranks are not portable across
    * pairs. Ties take average ranks, kept integer by DOUBLING
    * (`2·avg-rank = 2·rank() + (peers−1)`), so `Σ(2d)²` is exact BIGINT
    * and `ρ_ppm = 10⁶ − (6·10⁶·Σ(2d)²) div (4n(n²−1))` (floor on the
    * subtracted term — deterministic cross-engine; with heavy ties this
    * is the classic-formula statistic, declared, not Pearson-on-ranks).
    * A pair with n < 2 common days is absent (no rank geometry).
    *
    * 100 TB shape: corpus → (key, day) grain once; the pair join is
    * grain × keys (bounded by key count × series length, never data
    * volume); rank windows partition by the (k1, k2) pair — pair-local
    * sorts over ≤ series-length rows. Key cardinality is the quadratic
    * knob: this is a panel operator (meters-per-feeder, source mixes),
    * not an all-users one — the `maxKeys` guard (default 2000) counts
    * distinct keys in a cheap pre-pass and fails LOUDLY before any
    * quadratic work if exceeded. Output:
    * (k1, k2, n_common, spearman_ppm), k1 < k2.
    */
  def spearmanCrossCorr(df: DataFrame, key: Column, ts: Column,
                        value: Column, maxKeys: Int = 2000): DataFrame = {
    require(maxKeys >= 2, s"maxKeys >= 2: $maxKeys")
    // the declared panel contract, enforced loudly (the heavyHitters-style
    // runtime guarantee): the pair join is QUADRATIC in distinct keys and
    // its join key (day) has only series-length distinct values, so a
    // wide-open key domain concentrates K² intermediate rows per task.
    // One cheap two-column pre-pass (map-side partial distinct) buys the
    // a-priori bound; for genuinely wide panels see SCALE.md
    // "Panel-quadratic operators" for the key-block salting recipe.
    val nKeys = df.filter(value.isNotNull).select(key.as("grp"))
      .distinct().count()
    require(nKeys <= maxKeys,
      s"spearmanCrossCorr: $nKeys distinct keys exceeds maxKeys=$maxKeys — " +
        "the pair matrix is quadratic in keys (panel operator, not an " +
        "all-users one). Pre-select/block keys upstream, raise maxKeys " +
        "deliberately, or salt by key blocks (SCALE.md).")
    val xc = floor(value * lit(100.0)).cast("long")
    val daily = df.filter(value.isNotNull)
      .groupBy(key.as("grp"), to_date(ts).as("day"))
      .agg(sum(xc).as("y"))
    val a = daily.select(col("grp").as("k1"), col("day"), col("y").as("x"))
    val b = daily.select(col("grp").as("k2"), col("day"), col("y").as("yv"))
    val pairs = a.join(b, "day").filter(col("k1") < col("k2"))
    def rank2(v: String) = {
      val w = Window.partitionBy(col("k1"), col("k2")).orderBy(col(v))
      val peers = Window.partitionBy(col("k1"), col("k2"), col(v))
      lit(2L) * rank().over(w) + count(lit(1)).over(peers) - lit(1L)
    }
    pairs
      .withColumn("_rx", rank2("x"))
      .withColumn("_ry", rank2("yv"))
      .withColumn("_d2", (col("_rx") - col("_ry")) * (col("_rx") - col("_ry")))
      .groupBy(col("k1"), col("k2"))
      .agg(count(lit(1)).as("n_common"), sum(col("_d2")).as("_sd2"))
      .filter(col("n_common") >= 2)
      .withColumn("_num", col("_sd2") * lit(6000000L))
      .withColumn("_den",
        lit(4L) * col("n_common") *
          (col("n_common") * col("n_common") - lit(1L)))
      .withColumn("spearman_ppm", lit(1000000L) - expr("_num div _den"))
      .select(col("k1"), col("k2"), col("n_common"), col("spearman_ppm"))
  }

  /** Calendar-correct lag-feature matrix at the (key, day) grain — the
    * training-data export for the forecaster family: yesterday's and
    * last-week's values plus a trailing-week aggregate and day-of-week,
    * ready for a regression/GBM fit downstream.
    *
    * Lags are CALENDAR lags, not observed-sequence lags: a `lag(k)` over
    * row order silently misaligns across series gaps, so each feature is a
    * RANGE frame over the integer day index (`BETWEEN k PRECEDING AND k
    * PRECEDING` — exactly day−k or NULL; the gap-proof idiom from
    * [[Analytics.rollingByKey]]). The trailing week is emitted as exact
    * (sum, n) integers — the consumer chooses its own division. All
    * features ride ONE window family over one (key, dayIdx) sort.
    *
    * 100 TB shape: one corpus collapse to the grain, one grain-sized
    * window shuffle; the output is a feature TABLE (one row per key-day),
    * written once and reused across model fits. Output: (grp, day,
    * y_cents, lag1_cents, lag7_cents, wk_sum_cents, wk_n, dow).
    */
  def lagFeatures(df: DataFrame, key: Column, ts: Column,
                  value: Column): DataFrame = {
    val xc = floor(value * lit(100.0)).cast("long")
    val daily = df.filter(value.isNotNull)
      .groupBy(key.as("grp"), to_date(ts).as("day"))
      .agg(sum(xc).as("y_cents"))
      .withColumn("_d", datediff(col("day"), lit("1970-01-01")).cast("long"))
    def at(k: Int) = Window.partitionBy(col("grp")).orderBy(col("_d"))
      .rangeBetween(-k.toLong, -k.toLong)
    val wk = Window.partitionBy(col("grp")).orderBy(col("_d"))
      .rangeBetween(-6L, 0L)
    daily
      .withColumn("lag1_cents", max(col("y_cents")).over(at(1)))
      .withColumn("lag7_cents", max(col("y_cents")).over(at(7)))
      .withColumn("wk_sum_cents", sum(col("y_cents")).over(wk))
      .withColumn("wk_n", count(lit(1)).over(wk))
      // ISO day-of-week (1=Mon..7=Sun): dayofweek is 1=Sun..7=Sat
      .withColumn("dow", pmod(dayofweek(col("day")) + lit(5), lit(7))
        .cast("long") + lit(1L))
      .select(col("grp"), col("day"), col("y_cents"), col("lag1_cents"),
        col("lag7_cents"), col("wk_sum_cents"), col("wk_n"), col("dow"))
  }

  /** CUSUM level-shift detection on the per-key daily series (Page 1954):
    * the change-point monitor the dashboard family above needs once a
    * meter's LEVEL drifts rather than a single reading spiking
    * ([[Analytics.robustAnomalies]] catches the spike; this catches the
    * regime change a spike detector is blind to, because every post-shift
    * day is individually unremarkable).
    *
    * The textbook recursion `h_t = max(0, h_{t−1} + y_t)` is sequential;
    * here it is computed CLOSED-FORM as `h_t = S_t − min(0, min_{i≤t} S_i)`
    * (prefix sum minus clamped running minimum — provably equal by
    * induction, spec'd against the driver-side recursion), which is two
    * stacked window passes over ONE (key, day) sort. Slack and threshold
    * are self-scaling in units of the series' own mean absolute deviation
    * (one more unordered window over the same partitioning): slack
    * k = mad div 2, alarm h = hMult·mad — the classical k = σ/2, h = 4σ
    * tuning with the integer-exact MAD standing in for σ. ALL arithmetic
    * is BIGINT on floor-quantized cents with Euclidean floor divisions, so
    * flags are bit-identical cross-engine (no float boundary can move an
    * alarm).
    *
    * 100 TB shape: corpus → (key, day) grain in one partial-agg shuffle;
    * all four window passes share the key partitioning (one shuffle, one
    * sort). Output: flagged days only —
    * (grp, day, x_cents, mad_cents, cusum_up_cents, cusum_down_cents,
    * direction ∈ up|down|both).
    */
  def cusumChangepoints(df: DataFrame, key: Column, ts: Column,
                        value: Column, hMult: Int = 3): DataFrame = {
    require(hMult >= 1, s"hMult >= 1: $hMult")
    val xc = floor(value * lit(100.0)).cast("long")
    val daily = df.filter(value.isNotNull)
      .groupBy(key.as("grp"), to_date(ts).as("day"))
      .agg(sum(xc).as("x"))
    val wAll = Window.partitionBy(col("grp"))
    val wCum = Window.partitionBy(col("grp")).orderBy(col("day"))
    val up = col("cusum_up_cents")
    val down = col("cusum_down_cents")
    val h = col("_mad") * lit(hMult.toLong)
    daily
      .withColumn("_n", count(lit(1)).over(wAll))
      .withColumn("_sAll", sum(col("x")).over(wAll))
      .withColumn("_mu", floorDiv(col("_sAll"), col("_n")))
      .withColumn("_sad", sum(abs(col("x") - col("_mu"))).over(wAll))
      .withColumn("_mad", floorDiv(col("_sad"), col("_n")))
      .withColumn("_k", floorDiv(col("_mad"), lit(2L)))
      .withColumn("_su", sum(col("x") - col("_mu") - col("_k")).over(wCum))
      .withColumn("_sd", sum(col("x") - col("_mu") + col("_k")).over(wCum))
      .withColumn("cusum_up_cents",
        col("_su") - least(lit(0L), min(col("_su")).over(wCum)))
      .withColumn("cusum_down_cents",
        greatest(lit(0L), max(col("_sd")).over(wCum)) - col("_sd"))
      .filter(up > h || down > h)
      .select(col("grp"), col("day"), col("x").as("x_cents"),
        col("_mad").as("mad_cents"), up, down,
        when(up > h && down > h, lit("both"))
          .when(up > h, lit("up")).otherwise(lit("down")).as("direction"))
  }
}
