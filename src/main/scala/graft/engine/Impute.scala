package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The imputation pipeline — the reference's one genuinely custom compute
  * (fetch_data/common/impute_missing.py):
  *
  *  - W3 consecutive-missing run detection (`find_consecutive_missing_groups`,
  *    impute_missing.py:14-38) → pure gap-and-islands windows, no kernel.
  *  - W5 historical-average fill for long runs (≥4), fallback chain
  *    hist(m,d,h) → station mean → global mean (impute_missing.py:147-184,
  *    :357-374) → aggregate + join + coalesce, all built-ins.
  *  - W4 cubic-spline fill for short runs (≤3) (impute_missing.py:41-98)
  *    → typed `groupByKey.flatMapGroups` kernel over per-station series
  *    (see [[CubicSpline]]).
  *
  * The reference's per-station Python loop (impute_missing.py:305) disappears:
  * `Window.partitionBy(station)` / `groupByKey(station)` distribute it. At
  * 100 TB the only constraint is that ONE station's series fits in one task
  * for the spline kernel — true by construction for sensor series (years of
  * hourly data per station ≈ 10^5 rows), and the W3/W5 paths are unbounded.
  */
object Impute {

  /** Deterministic synthetic missingness so imputation is exercisable on the
    * gap-free testdata: null out `v` where `id % modulus == 0`. The same
    * predicate is trivially SQL-expressible for the DuckDB oracle. */
  def withMissing(v: Column, id: Column, modulus: Int = 23): Column =
    when(id % modulus === 0, lit(null).cast("double")).otherwise(v)

  /** W3: per-key runs of consecutive missing values → (grp, run_start,
    * run_len). Classic gap-and-islands: the running count of non-nulls is
    * constant across a null run and unique per run. `order` must be a
    * deterministic total order within each key (pass a tiebreak column). */
  def missingRuns(df: DataFrame, key: Column, order: Seq[Column],
                  v: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_isl", sum(when(v.isNotNull, 1).otherwise(0)).over(w))
      .filter(v.isNull)
      .groupBy(key.as("grp"), col("_isl"))
      .agg(min(order.head).as("run_start"), count(lit(1)).as("run_len"))
      .select(col("grp"), col("run_start"), col("run_len"))
  }

  /** W5: fill missing `v` from the (key, month, day, hour) historical mean,
    * falling back to the key mean, then the global mean
    * (impute_missing.py:147-184). One aggregation pass per level; the (m,d,h)
    * lookup joins back on the composite key — at scale this is a shuffle on
    * (key,m,d,h), with the two scalar-ish fallback levels broadcast. */
  def historicalFill(df: DataFrame, key: Column, ts: Column,
                     v: Column): DataFrame =
    histImpl(df.select(key.as("grp"), ts.as("ts"), lit(0L).as("id"),
      v.as("v"))).drop("id")

  /** As [[historicalFill]] but carrying a caller row id through (joinable on
    * non-null keys — needed by [[imputeAll]], since `v` is null exactly where
    * the join must hit). Input columns: grp, ts, id, v. */
  private def histImpl(df: DataFrame): DataFrame = {
    val base = df
      .withColumn("_m", month(col("ts")))
      .withColumn("_d", dayofmonth(col("ts")))
      .withColumn("_h", hour(col("ts")))
    val valid = base.filter(col("v").isNotNull)
    val hist = valid.groupBy(col("grp"), col("_m"), col("_d"), col("_h"))
      .agg(avg(col("v")).as("_hist_avg"))
    val keyMean = valid.groupBy(col("grp")).agg(avg(col("v")).as("_key_mean"))
    val globalMean = valid.agg(avg(col("v")).as("_global_mean"))
    base
      .join(hist, Seq("grp", "_m", "_d", "_h"), "left")
      .join(broadcast(keyMean), Seq("grp"), "left")
      .crossJoin(broadcast(globalMean))
      .select(col("grp"), col("ts"), col("id"), col("v"),
        // round only the IMPUTED values (averages are FP-accumulation-order
        // sensitive); present values pass through bit-exact
        coalesce(col("v"), round(col("_hist_avg"), 6),
          round(col("_key_mean"), 6), round(col("_global_mean"), 6))
          .as("v_filled"))
  }

  /** The full reference dispatcher (`impute_missing_values`,
    * impute_missing.py:191-457): detect missing runs per key; runs <=
    * maxSplineRun get the spline/linear kernel (W4); longer runs get the
    * historical (m,d,h) fallback chain (W5). One pass of each engine, joined
    * by coalesce — run-length routing is what the reference's per-station
    * Python loop did, here it's a window + two column expressions.
    * Output: (grp, ts, id, v, v_filled, fill_src ∈ {present,spline,hist}). */
  def imputeAll(df: DataFrame, key: Column, ts: Column, id: Column, v: Column,
                maxSplineRun: Int = 3): DataFrame = {
    val base = df.select(key.cast("string").as("grp"), ts.as("ts"),
      id.cast("long").as("id"), v.cast("double").as("v"))
    // run length of the null-run each row belongs to (0 for present rows)
    val w = Window.partitionBy(col("grp")).orderBy(col("ts"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withRun = base
      .withColumn("_isl", sum(when(col("v").isNotNull, 1).otherwise(0)).over(w))
    val runLens = withRun.filter(col("v").isNull)
      .groupBy(col("grp"), col("_isl")).agg(count(lit(1)).as("_run_len"))
    val routed = withRun.join(runLens, Seq("grp", "_isl"), "left")
    val spline = splineImpute(base, col("grp"), col("ts"), col("id"), col("v"),
      maxSplineRun)
      .select(col("grp"), col("ts"), col("id"), col("v_filled").as("_sp"))
    val hist = histImpl(base)
      .select(col("grp"), col("ts"), col("id"), col("v_filled").as("_hi"))
    routed
      .join(spline, Seq("grp", "ts", "id"), "left")
      .join(hist, Seq("grp", "ts", "id"), "left")
      .select(col("grp"), col("ts"), col("id"), col("v"),
        when(col("v").isNotNull, col("v"))
          .when(col("_run_len") <= maxSplineRun, coalesce(col("_sp"), col("_hi")))
          .otherwise(col("_hi")).as("v_filled"),
        when(col("v").isNotNull, lit("present"))
          .when(col("_run_len") <= maxSplineRun && col("_sp").isNotNull,
            lit("spline"))
          .otherwise(lit("hist")).as("fill_src"))
  }

  /** W4: cubic-spline fill for short gaps (run length <= maxSplineRun).
    * Per-key series are collected and ordered inside one task
    * (groupByKey.flatMapGroups — the idiomatic Spark home for an imperative
    * per-group kernel, SURVEY.md §2.9). Gaps gather up to `neighbors` valid
    * points on each side: >=4 points → natural cubic spline; >=2 → linear;
    * otherwise left missing. Longer runs are left for [[historicalFill]]
    * (the reference dispatch at impute_missing.py:349-357).
    *
    * Output: (grp, ts, v, v_filled) with v_filled rounded to 6 dp.
    */
  def splineImpute(df: DataFrame, key: Column, ts: Column, id: Column,
                   v: Column, maxSplineRun: Int = 3,
                   neighbors: Int = 4): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // `id` is the deterministic within-key tiebreak — shuffle order must not
    // leak into which points a gap's spline sees (SURVEY.md §7.4 determinism).
    val ds = df.select(key.cast("string").as("g"), ts.cast("timestamp").as("t"),
        id.cast("long").as("id"), v.cast("double").as("v"))
      .as[(String, java.sql.Timestamp, Long, Option[Double])]
    ds.groupByKey(_._1)
      .flatMapGroups { (g, it) =>
        val pts = it.toArray.sortBy(p => (p._2.getTime, p._3))
        val xs = pts.map(_._2.getTime.toDouble / 1000.0)
        val ys = pts.map(_._4)
        val out = ys.clone()
        var i = 0
        while (i < ys.length) {
          if (ys(i).isEmpty) {
            var j = i
            while (j < ys.length && ys(j).isEmpty) j += 1
            if (j - i <= maxSplineRun) {
              val left = Iterator.range(i - 1, -1, -1)
                .filter(k => ys(k).isDefined).take(neighbors).toArray.reverse
              val right = Iterator.range(j, ys.length)
                .filter(k => ys(k).isDefined).take(neighbors).toArray
              val idxs = left ++ right
              val px = idxs.map(xs)
              val py = idxs.map(k => ys(k).get)
              if (idxs.length >= 4) {
                val sp = CubicSpline(px, py)
                var k = i
                while (k < j) { out(k) = Some(sp(xs(k))); k += 1 }
              } else if (idxs.length >= 2) {
                var k = i
                while (k < j) { out(k) = Some(Interp.linear(px, py, xs(k))); k += 1 }
              }
            }
            i = j
          } else i += 1
        }
        pts.indices.iterator.map { k =>
          // round only filled values; present values pass through bit-exact
          val filled =
            if (ys(k).isDefined) ys(k)
            else out(k).map(d =>
              BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
          (g, pts(k)._2, pts(k)._3, pts(k)._4, filled)
        }
      }
      .toDF("grp", "ts", "id", "v", "v_filled")
  }

  /** Bounded forward fill (LOCF with a staleness horizon) at the daily
    * grain: each key's observed days collapse to daily cent sums, a dense
    * calendar spine spans the key's own [min, max] day (the J7
    * sequence-explode idiom), and every spine day carries the most recent
    * OBSERVED value at most `horizonDays` back — beyond the horizon the
    * day stays NULL (a meter silent for a week should read as unknown,
    * not as last Tuesday forever; the bounded-carry rule every
    * sensor-data SLA wants, and the piece [[historicalFill]]'s
    * seasonal-mean chain does not cover).
    *
    * Because the spine is dense BY CONSTRUCTION, a ROWS frame of
    * `horizonDays PRECEDING` IS the calendar horizon — `last(_, ignore
    * nulls)` over it is the carried value and a conditional max of the
    * day index dates it (`fill_age_days` = 0 for observed days). All
    * integer; no recursion, no loop — one window pass over the spine.
    *
    * 100 TB shape: the corpus collapses to the (key, day) grain first;
    * the spine is grain-sized × fill factor (bounded by each key's span,
    * not by data volume) and rides ONE (key, day) sort; the observed→
    * spine join reuses that key partitioning under AQE. Output: (grp,
    * day, y_cents NULL on silent days, filled_cents NULL past the
    * horizon, fill_age_days).
    */
  def locfBounded(df: DataFrame, key: Column, ts: Column, value: Column,
                  horizonDays: Int): DataFrame = {
    require(horizonDays >= 0, s"horizonDays >= 0: $horizonDays")
    val xc = floor(value * lit(100.0)).cast("long")
    val daily = df.filter(value.isNotNull)
      .groupBy(key.as("grp"), to_date(ts).as("day"))
      .agg(sum(xc).as("y_cents"))
    val spine = daily.groupBy(col("grp"))
      .agg(min(col("day")).as("_d0"), max(col("day")).as("_d1"))
      .select(col("grp"),
        explode(sequence(col("_d0"), col("_d1"))).as("day"))
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("_d"))
      .rowsBetween(-horizonDays.toLong, 0L)
    spine.join(daily, Seq("grp", "day"), "left")
      .withColumn("_d", datediff(col("day"), lit("1970-01-01")).cast("long"))
      .withColumn("filled_cents", last(col("y_cents"), true).over(w))
      .withColumn("fill_age_days",
        col("_d") - max(when(col("y_cents").isNotNull, col("_d"))).over(w))
      .select(col("grp"), col("day"), col("y_cents"), col("filled_cents"),
        col("fill_age_days"))
  }
}
