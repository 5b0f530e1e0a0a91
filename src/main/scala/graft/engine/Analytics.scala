package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's analytical query surface (Grafana dashboard SQL + the SQL
  * probes it issues to Postgres), re-expressed as declarative Spark plans.
  *
  * Operator IDs refer to SURVEY.md §2. Reference evidence is cited per
  * function (file:line inside /root/reference).
  *
  * Scale notes: every function here is a pure `groupBy`/`join`/`window` plan —
  * Catalyst handles partial aggregation (map-side combine), and the joins
  * against small dimensions are explicitly `broadcast()` so no shuffle of the
  * fact side is needed. Nothing collects to the driver.
  */
object Analytics {

  /** A9 Top-K by aggregate — piechart panel
    * `SELECT plant_name, SUM(generation) ... GROUP BY 1 ORDER BY 2 DESC LIMIT 10`
    * (reference: pv_test/grafana/dashboards/pv_dashboard.json).
    * Deterministic tiebreak on the group key so the oracle compare is stable.
    * At scale: partial agg then a single-reducer top-K via `limit` — Spark
    * turns sort+limit into TakeOrderedAndProject (no full sort).
    */
  def topKByGroup(df: DataFrame, key: Column, value: Column, k: Int): DataFrame =
    df.groupBy(key.as("grp"))
      .agg(round(sum(value), 2).as("total"))
      .orderBy(desc("total"), asc("grp"))
      .limit(k)

  /** A6 Sum by group + time bucket — timeseries panel
    * `SELECT date_trunc('hour', datetime) t, plant_name, SUM(generation) ...`
    * (reference: docker/grafana/dashboards/pv_dashboard.json).
    */
  def sumByTimeBucket(df: DataFrame, ts: Column, key: Column, value: Column,
                      bucket: String = "hour"): DataFrame =
    df.groupBy(date_trunc(bucket, ts).as("bucket"), key.as("grp"))
      .agg(round(sum(value), 2).as("total"))

  /** A6 in a non-session time zone — every Grafana panel in the reference
    * applies `AT TIME ZONE 'Asia/Seoul'` before bucketing
    * (reference: docker/grafana/dashboards/pv_dashboard.json,
    * wind_dashboard.json; KST helper fetch_data/common/utils.py:5-15).
    * The session time zone never participates, for EITHER timestamp flavor:
    *  - TIMESTAMP (instant/LTZ): the two-arg `convert_timezone(tz, ts)` maps
    *    the instant to `tz` wall time directly — `sourceTz` is ignored (an
    *    instant already pins the clock). The naive
    *    `ts.cast("timestamp_ntz")` route would render the wall clock in the
    *    SESSION zone first and silently double-shift in any non-UTC session.
    *  - TIMESTAMP_NTZ (wall time): the three-arg form re-interprets the wall
    *    clock from `sourceTz` into `tz`.
    * `date_trunc` then buckets on local-time boundaries. Same plan shape as
    * [[sumByTimeBucket]]: one partial-agg shuffle on (bucket, key). */
  def sumByTimeBucketTz(df: DataFrame, ts: Column, key: Column, value: Column,
                        bucket: String = "hour", tz: String = "Asia/Seoul",
                        sourceTz: String = "UTC"): DataFrame = {
    val localTs = df.select(ts).schema.head.dataType match {
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        convert_timezone(lit(sourceTz), lit(tz), ts)
      case _ => convert_timezone(lit(tz), ts)
    }
    df.groupBy(date_trunc(bucket, localTs).as("bucket_local"), key.as("grp"))
      .agg(round(sum(value), 2).as("total"))
  }

  /** A4 per-key high-watermark — incremental resume point
    * `SELECT gencd, hogi, MAX(datetime), MAX(plant_name) ... GROUP BY gencd, hogi`
    * (reference: fetch_data/pv/daily_pv_automation.py:79-87).
    */
  def highWatermark(df: DataFrame, keys: Seq[Column], ts: Column,
                    carry: Column): DataFrame =
    df.groupBy(keys: _*)
      .agg(max(ts).as("last_ts"), max(carry).as("carry"))

  /** A5 day-completeness probe: days having all 24 distinct hours
    * `SELECT COUNT(DISTINCT EXTRACT(HOUR FROM datetime)) ... GROUP BY DATE(datetime)`
    * (reference: fetch_data/pv/daily_pv_automation.py:52-71,
    * fetch_data/pv/nambu_backfill.py:161-182).
    */
  def dayCompleteness(df: DataFrame, ts: Column, requiredHours: Int = 24): DataFrame =
    df.groupBy(to_date(ts).as("day"))
      .agg(countDistinct(hour(ts)).as("n_hours"))
      .filter(col("n_hours") >= requiredHours)

  /** A1 group-by mean on composite (month, day, hour) time key — the
    * historical-average lookup the imputer joins against
    * (reference: fetch_data/common/impute_missing.py:101-129).
    */
  def historicalMeanByMDH(df: DataFrame, key: Column, ts: Column,
                          value: Column): DataFrame = {
    // exact integer micro-unit mean: quantize each value BEFORE aggregating
    // (floor(v*1e6+0.5) is identical on identical doubles in every engine),
    // then long-sum + floor-divide — immune to both FP accumulation order
    // and engine round() boundary semantics (observed 1-ulp flakes at sf0.1)
    val vm = floor(value * lit(1000000.0) + lit(0.5)).cast("long")
    df.groupBy(key.as("grp"), month(ts).cast("long").as("m"),
        dayofmonth(ts).cast("long").as("d"), hour(ts).cast("long").as("h"))
      .agg(sum(vm).as("_s"), count(vm).as("_n"))
      .select(col("grp"), col("m"), col("d"), col("h"),
        ((col("_s") - pmod(col("_s"), col("_n"))) / col("_n")).cast("long")
          .as("hist_avg_micro"))
  }

  /** Equi-width histogram per group over a DECLARED [loCents, hiCents)
    * range — the profiling/monitoring companion to the exact percentiles:
    * one partial-agg shuffle of (group, bucket) pairs, arithmetic entirely
    * in integers (values floor to cents, bucket = clamped multiply-then-
    * floor-divide), so buckets are cross-engine exact. Out-of-range values
    * clamp into the edge buckets (they are signal, not errors — the
    * winsorize convention). A data-driven range would need a prior pass;
    * declaring it keeps this single-pass at 100 TB.
    */
  def histogram(df: DataFrame, key: Column, value: Column, loCents: Long,
                hiCents: Long, nBuckets: Int): DataFrame = {
    require(hiCents > loCents, s"empty range [$loCents, $hiCents)")
    require(nBuckets >= 1, s"nBuckets >= 1: $nBuckets")
    val vc = floor(value * lit(100.0)).cast("long")
    val span = hiCents - loCents
    df.filter(value.isNotNull)
      .select(key.as("grp"),
        least(lit(span - 1), greatest(lit(0L), vc - lit(loCents))).as("_d"))
      // integral `div` (never Column `/`, which is double division — the
      // cross-engine bucketing rule)
      .groupBy(col("grp"), expr(s"(_d * $nBuckets) div $span")
        .cast("long").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Rolling MEDIAN baseline per key at the daily grain — the robust
    * companion to [[rollingByKey]]'s trailing mean (the reference's
    * anomaly checks compare against historical means, which one spike
    * poisons; a median baseline doesn't — the [[robustAnomalies]]
    * rationale, windowed). Integer contract: daily sums in cents; the
    * output is TWICE the median (odd window → 2·mid, even → the sum of
    * the two middle values), which keeps the interpolated .5 exactly in
    * BIGINT. The trailing frame is RANGE over the integer day index, so
    * calendar gaps shrink the window rather than silently widening it.
    * 100 TB shape: the corpus collapses to the daily grain in one
    * partial-agg pass; the windowed sort-and-pick runs on ≤ windowDays
    * values per cell (a grain-sized array, never raw rows).
    */
  def rollingMedianDaily(df: DataFrame, key: Column, ts: Column,
                         value: Column, windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, s"windowDays >= 1: $windowDays")
    val vc = floor(value * lit(100.0)).cast("long")
    val daily = df.groupBy(key.as("grp"), to_date(ts).as("day"))
      .agg(sum(vc).as("s_cents"))
      .withColumn("_didx",
        datediff(col("day"), lit("1970-01-01").cast("date")).cast("long"))
    val w = Window.partitionBy("grp").orderBy("_didx")
      .rangeBetween(-(windowDays - 1), 0)
    daily
      .withColumn("_sorted", array_sort(collect_list("s_cents").over(w)))
      .withColumn("_n", size(col("_sorted")))
      // _sorted is referenced by three element_at consumers — a 2+-use
      // alias stays bound through CollapseProject (the codegen-CSE rule)
      .select(col("grp"), col("day"), col("s_cents"),
        expr("""CASE WHEN _n % 2 = 1
                THEN 2 * element_at(_sorted, CAST((_n + 1) div 2 AS INT))
                ELSE element_at(_sorted, CAST(_n div 2 AS INT)) +
                     element_at(_sorted, CAST(_n div 2 + 1 AS INT)) END""")
          .as("twice_med_cents"))
  }

  /** Per-key load-factor / peak-coincidence scorecard — the two numbers a
    * grid planner reads first: how flat is each meter's profile
    * (`load_factor = mean daily / peak daily`), and how much of its own
    * peak was it drawing on the SYSTEM's peak day (`coincidence` — the
    * diversity-factor input; a meter peaking off-system-peak is free
    * capacity, one peaking on it is the reason the feeder is sized).
    *
    * All integer: daily floor-cent sums; `load_factor_ppm = (10⁶·sum) div
    * (n·peak)`; the system peak day is the argmax of daily totals with a
    * min-day tiebreak made deterministic by lexicographic struct-max
    * ((total, −dayIdx) — no engine-specific argmax tie rule);
    * `coincidence_ppm = (10⁶·value@peakday) div peak`, NULL for a key
    * silent that day. Long-safe while a key's total cents < ~9·10¹²
    * (a century of $2M/day — beyond it, lift the two products to the
    * ACF's internal DECIMAL). Declared for non-negative load values.
    *
    * 100 TB shape: two grain-sized aggregates off one corpus collapse
    * (per-key stats reuse the grain's key partitioning; daily totals are
    * calendar-sized); the one-row peak day broadcasts. Output: (grp,
    * n_days, peak_cents, load_factor_ppm, coincidence_ppm).
    */
  def loadFactors(df: DataFrame, key: Column, ts: Column,
                  value: Column): DataFrame = {
    val vc = floor(value * lit(100.0)).cast("long")
    val daily = df.filter(value.isNotNull)
      .groupBy(key.as("grp"), to_date(ts).as("day"))
      .agg(sum(vc).as("x"))
    val stats = daily.groupBy(col("grp")).agg(
      count(lit(1)).as("n_days"), sum(col("x")).as("_s"),
      max(col("x")).as("peak_cents"))
    val peakDay = daily.groupBy(col("day")).agg(sum(col("x")).as("_t"))
      .withColumn("_nd",
        -datediff(col("day"), lit("1970-01-01")).cast("long"))
      .agg(max(struct(col("_t"), col("_nd"), col("day"))).as("_m"))
      .select(col("_m.day").as("_peak_day"))
    val atPeak = daily.join(broadcast(peakDay),
        daily("day") === peakDay("_peak_day"))
      .select(col("grp"), col("x").as("_xp"))
    stats.join(atPeak, Seq("grp"), "left")
      .withColumn("_s6", col("_s") * lit(1000000L))
      .withColumn("_np", col("n_days") * col("peak_cents"))
      .withColumn("_x6", col("_xp") * lit(1000000L))
      .withColumn("load_factor_ppm",
        when(col("peak_cents") > 0, expr("_s6 div _np")))
      .withColumn("coincidence_ppm",
        when(col("peak_cents") > 0 && col("_xp").isNotNull,
          expr("_x6 div peak_cents")))
      .select(col("grp"), col("n_days"), col("peak_cents"),
        col("load_factor_ppm"), col("coincidence_ppm"))
  }

  /** Per-group feature scaling for ranking/ML prep: percent-rank and
    * min-max normalization of a metric, both as integer ppm (cents in,
    * floor divisions out — no float boundary anywhere). Percent-rank uses
    * `rank()` (ties share a rank — deterministic without an id
    * tie-break); single-row groups and constant groups scale to 0 by
    * convention. One hash shuffle: both window specs share the group
    * partitioning (the ordered spec only adds the in-partition sort).
    * Output: `(id, grp, pr_ppm, mm_ppm)`.
    */
  def featureScaling(df: DataFrame, id: Column, key: Column,
                     value: Column): DataFrame = {
    val wAll = Window.partitionBy("grp")
    val wOrd = Window.partitionBy("grp").orderBy("vc")
    df.filter(value.isNotNull)
      .select(id.as("id"), key.as("grp"),
        floor(value * lit(100.0)).cast("long").as("vc"))
      .withColumn("_rk", rank().over(wOrd).cast("long"))
      .withColumn("_n", count(lit(1)).over(wAll))
      .withColumn("_mn", min("vc").over(wAll))
      .withColumn("_mx", max("vc").over(wAll))
      .select(col("id"), col("grp"),
        when(col("_n") > 1,
          expr("((_rk - 1) * 1000000) div (_n - 1)")).otherwise(0L)
          .as("pr_ppm"),
        when(col("_mx") > col("_mn"),
          expr("((vc - _mn) * 1000000) div (_mx - _mn)")).otherwise(0L)
          .as("mm_ppm"))
  }

  /** Generic per-group top-N ROWS by score — the
    * [[graft.engine.expressions.BoundedTopK]] partial aggregate exposed as
    * a general operator (the ANN rerank path made reusable): each task
    * reduces to ≤ n entries per group BEFORE the shuffle, so no task ever
    * assembles a group's full row set — the window-rerank
    * (`row_number().over`) idiom without its sort hotspot, bit-exact to
    * it (score desc, ties to the lower id; null scores skipped).
    * Output: `(grp, id, score, rn)`.
    */
  def topNRowsPerGroup(df: DataFrame, key: Column, score: Column, id: Column,
                       n: Int): DataFrame =
    df.groupBy(key.as("grp"))
      .agg(Similarity.boundedTopK(score, id, n).as("_tk"))
      .select(col("grp"), posexplode(col("_tk")).as(Seq("_p", "_s")))
      .select(col("grp"), col("_s.id").as("id"), col("_s.score").as("score"),
        (col("_p") + 1).cast("long").as("rn"))

  /** Shannon entropy of a categorical mix per group — the diversity
    * monitor (is one source/type swallowing the corpus? did today's mix
    * collapse?): `-Σ p ln p` over the category shares within each group.
    * One (group, category) partial-agg pass; all division/ln on the
    * group×category aggregate, which is model-sized.
    *
    * Integer contract: shares as ppm floor divisions, each category's ln
    * quantized to micro-nats (the PMI fixed-shape convention), term
    * products exact in BIGINT. Entropy in nats = `entropy_pn / 1e12`;
    * zero-count categories contribute nothing (lim p→0 of p·ln p = 0 —
    * they simply have no row). Output: `(grp, n_cats, n_rows,
    * entropy_pn)`.
    */
  def mixEntropy(df: DataFrame, key: Column, category: Column): DataFrame =
    df.groupBy(key.as("grp"), category.as("_c"))
      .agg(count(lit(1)).as("_n"))
      .withColumn("_tot",
        sum("_n").over(Window.partitionBy("grp")))
      // 1-ppm floor: a category rarer than 1/1e6 of its group would floor
      // to share 0 and ln(0) — the PSI epsilon convention
      .withColumn("_p", expr("greatest(1L, (_n * 1000000) div _tot)"))
      .withColumn("_term", col("_p") *
        round(log(col("_p").cast("double") / lit(1000000.0)) *
          lit(1000000.0)).cast("long"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n_cats"), sum("_n").as("n_rows"),
        (-sum("_term")).as("entropy_pn"))

  /** First-order Markov transition counts over per-key ordered event
    * streams — the path-analysis companion to [[funnel]]/[[sessionize]]
    * (which step follows which, aggregated over all users). One window
    * shuffle on the key under the (ts, tieBreak) total order (the
    * order-sensitivity rule), then a (from, to)-sized aggregate — output
    * is state², never data-sized. Exact counts; normalize to probabilities
    * downstream at whatever precision the consumer wants.
    */
  def transitionCounts(df: DataFrame, key: Column, ts: Column,
                       tieBreak: Column, state: Column): DataFrame = {
    val w = Window.partitionBy("_k").orderBy(col("_t"), col("_tb"))
    df.select(key.as("_k"), ts.as("_t"), tieBreak.as("_tb"), state.as("_s"))
      .withColumn("_next", lead(col("_s"), 1).over(w))
      .filter(col("_next").isNotNull)
      .groupBy(col("_s").as("from_state"), col("_next").as("to_state"))
      .agg(count(lit(1)).as("n"))
  }

  /** Population Stability Index between a REFERENCE and a CURRENT sample
    * of a metric, per group over the [[histogram]]'s declared buckets —
    * the standard distribution-drift monitor (training-serving skew /
    * feature drift: PSI < 0.1 stable, > 0.25 shifted). Two histogram
    * passes (one per sample — each a single partial-agg scan), then all
    * arithmetic on the group×bucket spine, which is model-sized.
    *
    * Integer contract: shares rise as ppm with a 1-ppm epsilon floor (the
    * standard zero-bucket guard, and it keeps ln finite); the ln ratio
    * quantizes per-bucket to integer micro-nats via the fixed-shape
    * `round(ln(p/q)·1e6)` expression (the collocations/PMI convention —
    * cross-engine stable, verified at three SFs there); each bucket's
    * term is then the exact product `(p_ppm − q_ppm) · ln_micro`, summed
    * in BIGINT. PSI in natural units = Σ term / 1e12.
    * Output: one row per (grp, bucket) — `(grp, bucket, p_ppm, q_ppm,
    * term)`; roll up `sum(term)` per group downstream.
    */
  def psiByGroup(ref: DataFrame, cur: DataFrame, key: Column, value: Column,
                 loCents: Long, hiCents: Long, nBuckets: Int): DataFrame = {
    val rh = histogram(ref, key, value, loCents, hiCents, nBuckets)
      .withColumnRenamed("cnt", "_rc")
    val ch = histogram(cur, key, value, loCents, hiCents, nBuckets)
      .withColumnRenamed("cnt", "_cc")
    val groups = rh.select("grp").union(ch.select("grp")).distinct()
    val spine = groups.crossJoin(
      ref.sparkSession.range(nBuckets).select(col("id").as("bucket")))
    val rt = rh.groupBy("grp").agg(sum("_rc").as("_rt"))
    val ct = ch.groupBy("grp").agg(sum("_cc").as("_ct"))
    spine
      .join(rh, Seq("grp", "bucket"), "left")
      .join(ch, Seq("grp", "bucket"), "left")
      .join(rt, Seq("grp")).join(ct, Seq("grp"))
      .select(col("grp"), col("bucket"),
        expr("greatest(1L, (coalesce(_rc, 0L) * 1000000) div _rt)")
          .as("p_ppm"),
        expr("greatest(1L, (coalesce(_cc, 0L) * 1000000) div _ct)")
          .as("q_ppm"))
      .withColumn("term",
        (col("p_ppm") - col("q_ppm")) *
          round(log(col("p_ppm").cast("double") / col("q_ppm")) *
            lit(1000000.0)).cast("long"))
  }

  /** Equi-depth bins (per-group ntile): assign each row its quantile bin
    * under the (value, id) TOTAL order (explicit tie-break — the repo's
    * order-sensitivity rule), partitioned per group so the sort is
    * group-bounded, never a global sort. The ML-feature binning twin of
    * the equi-width histogram: bins carry equal row counts, not equal
    * widths.
    */
  def equiDepthBins(df: DataFrame, key: Column, value: Column, id: Column,
                    n: Int): DataFrame = {
    require(n >= 1, s"n >= 1: $n")
    df.filter(value.isNotNull)
      .select(id.as("id"), key.as("grp"), value.as("v"))
      .withColumn("bin", ntile(n).over(
        Window.partitionBy(col("grp")).orderBy(col("v"), col("id")))
        .cast("long"))
      .select(col("id"), col("grp"), col("bin"))
  }

  /** Gap-filled fixed-step resample — the dense time grid every energy
    * dashboard and model-feature job needs (the reference's Grafana panels
    * render missing intervals as gaps; its imputer fills them: a dense
    * regular series is the contract downstream).
    *
    * Two-stage shape chosen for 100 TB: (1) the corpus collapses to the
    * (key, bucket) grain in ONE partial-agg shuffle — integer floor
    * bucketing on epoch seconds, no calendar functions in the hot path;
    * (2) the DENSE grid (distinct keys × `sequence(from, to, step)`) is
    * grid-sized, not data-sized — built from the already-aggregated key
    * list, exploded, and left-joined against the grain with zeros
    * coalesced in. The grid join shuffles grain-sized tables only.
    * `from`/`to` are ISO instants (inclusive ends, UTC).
    */
  def resampleFill(df: DataFrame, key: Column, ts: Column, value: Column,
                   stepSec: Long, fromIso: String, toIso: String): DataFrame = {
    require(stepSec > 0, s"stepSec must be positive: $stepSec")
    def sec(s: String): Long =
      java.time.LocalDateTime.parse(s.replace(' ', 'T'))
        .toEpochSecond(java.time.ZoneOffset.UTC)
    val (fromS, toS) = (sec(fromIso), sec(toIso))
    require(toS >= fromS, s"empty resample range [$fromIso, $toIso]")
    require((toS - fromS) % stepSec == 0,
      s"[$fromIso, $toIso] must span whole $stepSec-second steps — a ragged " +
        "final bucket would hold data the grid can't address")
    val bucket = timestamp_seconds(
      (unix_timestamp(ts) - pmod(unix_timestamp(ts) - lit(fromS),
        lit(stepSec))).as("b"))
    val grain = df
      // plain ts bounds (scan-pushable); < to+step ⟺ floor-second ≤ the
      // last instant of the final bucket, so the bucket stamped `to` is
      // complete and no bucket beyond the grid can form
      .filter(ts >= timestamp_seconds(lit(fromS)) &&
        ts < timestamp_seconds(lit(toS + stepSec)))
      .groupBy(key.as("grp"), bucket.as("bucket"))
      .agg(round(sum(value), 2).as("total"), count(value).as("n"))
    val buckets = grain.sparkSession.range(0, (toS - fromS) / stepSec + 1)
      .select(timestamp_seconds(lit(fromS) + col("id") * stepSec)
        .as("bucket"))
    val grid = grain.select(col("grp")).distinct().crossJoin(buckets)
    grid.join(grain, Seq("grp", "bucket"), "left")
      .select(col("grp"), col("bucket"),
        coalesce(col("total"), lit(0.0)).as("total"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  /** J5 left join with a range condition in the ON clause, null-sum coalesced
    * to 0 — the geomap panel
    * (reference: docker/grafana/dashboards/pv_dashboard.json).
    * The dimension side stays whole (left outer keeps zero-activity rows).
    */
  def dimWithRangeActivity(dim: DataFrame, dimKey: Column, fact: DataFrame,
                           factKey: Column, factTs: Column, factVal: Column,
                           from: Column, to: Column): DataFrame =
    dimWithRangeActivityAttrs(dim, dimKey, fact, factKey, factTs, factVal,
      from, to, Nil)

  /** J5 full geomap shape: dim attributes (the panel's latitude/longitude)
    * carried through the aggregation alongside the coalesced sum, with the
    * panel's `WHERE p.latitude IS NOT NULL` expressed as a dim-side filter
    * BEFORE the join (equivalent for a left join keyed on the dim, and it
    * shrinks the build side). `attrs` must be functionally dependent on
    * `dimKey` (one row per key in `dim`), so grouping by key+attrs adds no
    * groups — it only projects the attributes through.
    * (reference: docker/grafana/dashboards/pv_dashboard.json geomap panel:
    * SELECT latitude, longitude, plant_name, SUM(...) ... WHERE latitude IS
    * NOT NULL GROUP BY 1,2,3). */
  def dimWithRangeActivityAttrs(dim: DataFrame, dimKey: Column, fact: DataFrame,
                                factKey: Column, factTs: Column, factVal: Column,
                                from: Column, to: Column,
                                attrs: Seq[Column],
                                notNullAttr: Option[Column] = None): DataFrame = {
    val d = notNullAttr.fold(dim)(a => dim.filter(a.isNotNull))
    d.join(fact, dimKey === factKey && factTs >= from && factTs <= to, "left")
      .groupBy(dimKey.as("grp") +: attrs: _*)
      .agg(round(coalesce(sum(factVal), lit(0.0)), 2).as("total"))
  }

  /** J7 anti-join on a generated calendar: expected date range minus dates
    * present — "missing days" discovery
    * (reference: fetch_data/pv/nambu_bulk_sync.py:24-40,
    * nambu_merge_pv_data.py:57-63). `sequence` + `explode` generates the
    * calendar distributedly; `left_anti` avoids materializing the existing set.
    */
  def missingDates(df: DataFrame, ts: Column, from: String, to: String): DataFrame = {
    val spark = df.sparkSession
    val calendar = spark.range(1).select(
      explode(sequence(to_date(lit(from)), to_date(lit(to)))).as("day"))
    calendar.join(df.select(to_date(ts).as("day")).distinct(), Seq("day"), "left_anti")
  }

  /** A10 per-day summary stats as analytic window aggregates: the API's
    * daily_total/avg/max/min repeated on every hourly row
    * (reference: fetch_data/pv/daily_pv_automation.py:176-179). */
  def dailyStatsWindow(df: DataFrame, key: Column, ts: Column,
                       value: Column): DataFrame = {
    val w = Window.partitionBy(key, to_date(ts))
    df.select(
      key.as("grp"), ts.as("ts"), value.as("v"),
      round(sum(value).over(w), 2).as("daily_total"),
      round(avg(value).over(w), 6).as("daily_avg"),
      round(max(value).over(w), 6).as("daily_max"),
      round(min(value).over(w), 6).as("daily_min"))
  }

  /** A8 at scale: approximate distinct counts (HLL++). The reference's exact
    * `COUNT(DISTINCT plant_name)` is fine at dim cardinality; for billions of
    * user-ids a 100 TB dashboard uses the sketch (bounded memory, one pass,
    * mergeable across partitions) — exact stays the oracle-able default. */
  def approxDistinctByGroup(df: DataFrame, key: Column, counted: Column,
                            rsd: Double = 0.02): DataFrame =
    df.groupBy(key.as("grp"))
      .agg(approx_count_distinct(counted, rsd).as("approx_n"))

  /** P11-style sliding window: trailing `days`-day rolling sum/count per key,
    * at day granularity (the dashboard "last N days" series). TWO-LEVEL by
    * design: daily partial aggregation first, then a RANGE frame over day
    * epochs — the frame holds <= days rows. A per-event frame would be
    * O(rows × frame) because Spark re-evaluates bounded sliding frames per
    * row (no aggregate retraction) — measured 17s vs <1s at sf0.1. */
  def rollingByKey(df: DataFrame, key: Column, ts: Column, value: Column,
                   days: Int): DataFrame = {
    val daily = df.groupBy(key.as("grp"), to_date(ts).as("day"))
      .agg(sum(value).as("_dv"), count(lit(1)).as("_dn"))
    // day index via datediff, NOT day.cast(timestamp).cast(long): epoch
    // seconds depend on the session TZ, and in a DST zone day deltas are not
    // always multiples of 86400 s, shifting the RANGE frame boundary
    val w = Window.partitionBy(col("grp")).orderBy(col("_dayIdx"))
      .rangeBetween(-(days.toLong - 1), 0L)
    daily.withColumn("_dayIdx", datediff(col("day"), lit("1970-01-01")).cast("long"))
      .select(col("grp"), col("day"),
        round(sum(col("_dv")).over(w), 2).as("rolling_total"),
        sum(col("_dn")).over(w).as("rolling_n"))
  }

  /** Per-key delta vs the previous event (lag) — the change-over-time
    * derivative every monitoring dashboard wants; explicit (ts, id) total
    * order for determinism. */
  def deltaVsPrev(df: DataFrame, key: Column, ts: Column, id: Column,
                  value: Column): DataFrame = {
    val w = Window.partitionBy(col("grp")).orderBy(col("ts"), col("id"))
    df.select(key.as("grp"), ts.as("ts"), id.as("id"), value.as("v"))
      .select(col("grp"), col("ts"), col("id"),
        round(col("v"), 2).as("v"),
        round(col("v") - lag(col("v"), 1).over(w), 2).as("delta"))
  }

  /** Robust per-key anomaly detection: flag readings more than k MADs from
    * the key's median (median/MAD, not mean/σ — a meter stuck at a spike
    * drags the mean but not the median). Two aggregation passes over the
    * same key partitioning (median, then median absolute deviation) and a
    * broadcast-friendly per-key stats join; the fact stream never shuffles
    * more than once per pass.
    *
    * ALL-INTEGER arithmetic: values are quantized to cents up front
    * (`round(v·100)` — exact in doubles below 2^53), so medians are whole-
    * or half-cents (exact), deviations exact, and the `> k·mad` cut is
    * bit-identical across engines — no float-boundary flake (the measured
    * failure class from round 1; see the verify skill notes). Keys with
    * MAD = 0 (constant series) flag nothing: deviation > 0 = anomaly would
    * fire on ANY noise, which is the caller's call, not a default.
    * Output: (key, event_id, v_cents, dev_cents, mad_cents) for flagged
    * rows. */
  def robustAnomalies(df: DataFrame, key: Column, id: Column, value: Column,
                      k: Int = 3): DataFrame = {
    val cents = df.select(key.as("key"), id.as("event_id"),
      round(value * 100, 0).cast("long").as("v_cents"))
    val med = cents.groupBy(col("key"))
      .agg(median(col("v_cents")).as("med"))
    val dev = cents.join(med, "key")
      .withColumn("dev_cents", abs(col("v_cents") - col("med")))
    val mad = dev.groupBy(col("key"))
      .agg(median(col("dev_cents")).as("mad_c"))
    dev.join(mad, "key")
      .filter(col("mad_c") > 0 && col("dev_cents") > col("mad_c") * k)
      .select(col("key"), col("event_id"), col("v_cents"),
        col("dev_cents").cast("double").as("dev_cents"),
        col("mad_c").cast("double").as("mad_cents"))
  }

  /** Gap-based batch sessionization: per key, a new session starts when the
    * time since the previous event exceeds `gapMinutes` (the batch twin of
    * `streaming.Streams.sessionSumStream`'s `session_window`). Two stacked
    * window passes over one (key, ts) sort — lag for the break flag, running
    * sum for the session index — then the per-session rollup; the groupBy's
    * required clustering on (key, session_ix) is satisfied by the window's
    * hash partitioning on key, so the whole operator is ONE shuffle.
    *
    * Tie-safe: events sharing (key, ts) get gap 0 whichever engine-specific
    * tie order the sort picks, so session membership and the per-session
    * aggregates are deterministic even though row order under ties is not.
    * Output: (key, session_ix, session_start, session_end, n_events,
    * sum_value). */
  def sessionize(events: DataFrame, key: Column, ts: Column, value: Column,
                 gapMinutes: Int = 30): DataFrame = {
    val w = Window.partitionBy(col("key")).orderBy(col("ts"))
    val gapMs = gapMinutes * 60000L
    events.select(key.as("key"), ts.as("ts"), value.as("v"))
      .withColumn("_prev", lag(col("ts"), 1).over(w))
      .withColumn("_brk", when(col("_prev").isNull ||
          unix_millis(col("ts")) - unix_millis(col("_prev")) > gapMs, 1L)
        .otherwise(0L))
      .withColumn("session_ix", sum(col("_brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("key"), col("session_ix"))
      .agg(min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col("v")), 2).as("sum_value"))
  }

  /** Exact per-group percentiles (p50/p95/p99) — the dashboard latency/
    * value-distribution panel family. Exact `percentile` sorts within the
    * aggregation buffer — right for grouped dashboards (bounded group
    * cardinality); at corpus scale with huge groups use
    * [[percentilesApproxByGroup]]. */
  def percentilesByGroup(df: DataFrame, key: Column, value: Column): DataFrame =
    df.groupBy(key.as("grp")).agg(
      round(percentile(value, lit(0.5)), 6).as("p50"),
      round(percentile(value, lit(0.95)), 6).as("p95"),
      round(percentile(value, lit(0.99)), 6).as("p99"))

  /** Sketch twin of [[percentilesByGroup]]: `percentile_approx`
    * (KLL-family, mergeable partial buffers, bounded memory — the single-
    * pass 100 TB path; rank error ≈ 1/accuracy). Spec'd against the exact
    * aggregate in AnalyticsSpec. */
  def percentilesApproxByGroup(df: DataFrame, key: Column, value: Column,
                               accuracy: Int = 10000): DataFrame =
    df.groupBy(key.as("grp")).agg(
      percentile_approx(value,
        array(lit(0.5), lit(0.95), lit(0.99)), lit(accuracy)).as("ps"))

  /** Ordered funnel: how many users progress through `stages` IN ORDER
    * (stage i+1 counts only at-or-after that user's stage-i time — the
    * product-analytics conversion table). Per user, stage times chain as
    * conditional minima over ONE user-partitioned window (no ORDER BY →
    * no per-partition sort; all stage columns share the single hash
    * shuffle), then one aggregate counts users per reached stage.
    * `conv_ppm` = floor(n_i·10⁶ / n_{i−1}) — integer, cross-engine exact.
    * Output: (stage_ix, stage, n_users, conv_ppm), stage 0's conv vs the
    * total user count. */
  def funnel(df: DataFrame, user: Column, ts: Column, stage: Column,
             stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty && stages.distinct.size == stages.size,
      s"stages must be distinct and nonempty: $stages")
    val w = Window.partitionBy(user)
    val staged = stages.zipWithIndex.foldLeft(df) { case (acc, (s, i)) =>
      val cond =
        if (i == 0) stage === s
        else stage === s && ts >= col(s"_t${i - 1}")
      acc.withColumn(s"_t$i", min(when(cond, ts)).over(w))
    }
    val perUser = staged.groupBy(user.as("_u"))
      .agg(first(col("_t0")).as("_t0"),
        stages.indices.drop(1).map(i => first(col(s"_t$i")).as(s"_t$i")): _*)
    val counts = perUser.agg(
      count(lit(1)).as("_n_total"),
      stages.indices.map(i =>
        count(when(col(s"_t$i").isNotNull, 1)).as(s"_n$i")): _*)
    counts.select(explode(array(stages.zipWithIndex.map { case (s, i) =>
        val prev = if (i == 0) col("_n_total") else col(s"_n${i - 1}")
        struct(lit(i.toLong).as("stage_ix"), lit(s).as("stage"),
          col(s"_n$i").as("n_users"),
          when(prev > 0, floor(col(s"_n$i") * lit(1000000L) / prev))
            .otherwise(lit(0L)).cast("long").as("conv_ppm"))
      }: _*)).as("_f"))
      .select(col("_f.stage_ix"), col("_f.stage"), col("_f.n_users"),
        col("_f.conv_ppm"))
  }

  /** Retention cohorts: users grouped by their FIRST-activity day, counted
    * per whole-week offset of later activity — the cohort retention matrix.
    * Two shuffles: the per-user first-activity aggregate, then the
    * (cohort, offset) distinct-count; the user→cohort join reuses the same
    * user-hash partitioning. Offsets are integer floor(day-diff / 7) — no
    * calendar-week-convention ambiguity across engines. Output:
    * (cohort_day DATE, offset_weeks, n_active). */
  def retentionCohorts(df: DataFrame, user: Column, ts: Column): DataFrame = {
    val firsts = df.groupBy(user.as("_u"))
      .agg(to_date(min(ts)).as("cohort_day"))
    df.select(user.as("_au"), to_date(ts).as("_day"))
      .join(firsts, col("_au") === col("_u"))
      .withColumn("offset_weeks",
        floor(datediff(col("_day"), col("cohort_day")) / 7).cast("long"))
      .groupBy(col("cohort_day"), col("offset_weeks"))
      .agg(countDistinct(col("_au")).as("n_active"))
  }

  /** Winsorization: clamp a metric at its per-group exact [pLo, pHi]
    * percentiles — the robust-cleaning step before training on heavy-tailed
    * metrics (a handful of sensor spikes otherwise set the feature scale).
    * The clamp decision is integer: bounds and values floor-quantize to
    * cents before comparing, so a sub-cent cross-engine difference in the
    * interpolated percentile cannot flip a row (the float-boundary policy).
    * One exact-percentile aggregate (group-cardinality output, broadcast by
    * AQE) + a map-only clamp; huge-group corpora swap in the
    * [[percentilesApproxByGroup]] sketch for the bounds. Output: the input
    * columns + `v_cents` (clamped metric in cents, BIGINT). */
  def winsorizeByGroup(df: DataFrame, grp: Column, value: Column,
                       pLo: Double, pHi: Double): DataFrame = {
    require(pLo >= 0.0 && pHi <= 1.0 && pLo < pHi,
      s"bad percentile band [$pLo, $pHi]")
    val bounds = df.groupBy(grp.as("_bg")).agg(
      floor(percentile(value, lit(pLo)) * 100).cast("long").as("_lo"),
      floor(percentile(value, lit(pHi)) * 100).cast("long").as("_hi"))
    df.join(bounds, grp === col("_bg"))
      .withColumn("v_cents",
        least(greatest(floor(value * 100).cast("long"), col("_lo")),
          col("_hi")))
      .drop("_bg", "_lo", "_hi")
  }

  /** One-pass dataset profile: per column, row count, null count, distinct
    * count, and (numeric columns) exact min/max — the data-quality summary a
    * pipeline publishes next to every delivered table.
    *
    * ONE scan computes every column's stats in a single aggregate; the
    * 1-row wide result is reshaped to long form inside the plan (explode of
    * a literal-built struct array — no collect, no second scan). Exact
    * multi-column distinct counts make Catalyst plan an Expand (input ×
    * #distinct-aggs before the shuffle) — the honest cost of exactness, and
    * the reason [[profileApprox]] (HLL++ sketches, no Expand, one ordinary
    * partial agg) is the default at corpus scale; this exact form is its
    * oracle twin. min/max are order-independent (no FP rounding needed).
    */
  def profile(df: DataFrame, numericCols: Seq[String],
              otherCols: Seq[String]): DataFrame =
    profileWith(df, numericCols, otherCols, c => countDistinct(col(c)))

  /** Sketch twin of [[profile]]: `approx_count_distinct` (HLL++, mergeable,
    * relative error ~`rsd`) — a single partial-final aggregate with NO
    * Expand, so profiling costs one map-side pass regardless of how many
    * columns are profiled. Spec'd against the exact form. */
  def profileApprox(df: DataFrame, numericCols: Seq[String],
                    otherCols: Seq[String], rsd: Double = 0.02): DataFrame =
    profileWith(df, numericCols, otherCols,
      c => approx_count_distinct(col(c), rsd))

  private def profileWith(df: DataFrame, numericCols: Seq[String],
                          otherCols: Seq[String],
                          distinct: String => Column): DataFrame = {
    val all = numericCols ++ otherCols
    require(all.nonEmpty, "profile of zero columns")
    val aggs =
      count(lit(1)).as("_n") +:
        all.flatMap { c =>
          Seq(count(col(c)).as(s"_nn_$c"), distinct(c).as(s"_nd_$c"))
        } ++: numericCols.flatMap { c =>
          Seq(min(col(c)).cast("double").as(s"_min_$c"),
            max(col(c)).cast("double").as(s"_max_$c"))
        }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val entries = all.map { c =>
      struct(lit(c).as("col_name"),
        col("_n").as("n_rows"),
        (col("_n") - col(s"_nn_$c")).as("n_null"),
        col(s"_nd_$c").as("n_distinct"),
        (if (numericCols.contains(c)) col(s"_min_$c")
         else lit(null).cast("double")).as("min_v"),
        (if (numericCols.contains(c)) col(s"_max_$c")
         else lit(null).cast("double")).as("max_v"))
    }
    wide.select(explode(array(entries: _*)).as("e")).select(col("e.*"))
  }

  /** Exact distributed heavy hitters: every key whose frequency is at least
    * `sharePpm` parts-per-million of the non-null rows, with its EXACT count.
    *
    * The naive form — `groupBy(key).count().filter(...)` — shuffles one row
    * per DISTINCT key, which on a 100 TB corpus keyed by token or URL domain
    * is a shuffle the size of the vocabulary. This is the sketch-then-recount
    * pattern instead:
    *
    *  1. Pass 1 reduces each task to a fixed `capacity`-counter Misra–Gries
    *     summary ([[graft.engine.expressions.FrequentKeys]]); the merged
    *     sketch is model-sized (≤ capacity entries) and its key set is a
    *     guaranteed SUPERSET of every qualifying key as long as the sketch's
    *     eviction mass stays under the count threshold — asserted loudly at
    *     runtime, and guaranteed a priori by `capacity > 2·10⁶/sharePpm`
    *     (eviction mass ≤ n/(capacity+1) < n·sharePpm/10⁶).
    *  2. Pass 2 recounts ONLY the ≤ capacity candidate keys: the `isin`
    *     prefilter is map-side, and the recount groupBy shuffles at most
    *     capacity × tasks rows. Output is therefore EXACT — independent of
    *     sketch internals and merge order — and SQL-oracle-checkable.
    *
    * Two scans of the input versus one, but each is map-only + model-sized
    * shuffle; that trade is the whole point at vocabulary scale. Threshold
    * compare is integer (cnt·10⁶ ≥ n·sharePpm — no float boundary).
    * Output: (key, cnt), the exact counts of qualifying keys.
    */
  def heavyHitters(df: DataFrame, key: Column, sharePpm: Long,
                   capacity: Int = 0): DataFrame = {
    require(sharePpm > 0 && sharePpm <= 1000000L, s"sharePpm in (0,1e6]: $sharePpm")
    val cap = if (capacity > 0) capacity else (2L * 1000000L / sharePpm + 1L).toInt
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val keyed = df.select(key.cast("string").as("key"))
    val mg = ColumnBridge.column(graft.engine.expressions
      .FrequentKeys(ColumnBridge.expression(col("key")), cap)
      .toAggregateExpression())
    // Model-sized collect: ≤ capacity candidate keys + two longs.
    val s = keyed.agg(mg.as("s"), count(col("key")).as("n"))
      .select(col("s.entries.key").as("cands"), col("s.dec").as("dec"), col("n"))
      .head()
    val (cands, dec, n) = (s.getSeq[String](0), s.getLong(1), s.getLong(2))
    require(dec * 1000000L < math.max(1L, n * sharePpm),
      s"MG sketch too small for share=${sharePpm}ppm: eviction mass $dec of $n rows " +
        s"exceeds the threshold — raise capacity (was $cap)")
    keyed.where(col("key").isin(cands: _*))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * lit(1000000L) >= lit(n) * lit(sharePpm))
  }

  /** Exponentially-weighted moving value per key (sensor smoothing /
    * trend-following over the reading stream) — integer-exact, so unlike
    * textbook float EWMA it is bit-identical across engines and
    * partitionings (the float-boundary policy). Decay is fixed at 1/2 per
    * step and truncated at `depth` lags: weights are powers of two, values
    * quantize to integer cents (floor — no .5 ties), and the weighted sum
    * stays in BIGINT:
    * `ewma_scaled(t) = Σ_{k=0..depth} floor(100·v_{t−k}) · 2^(depth−k)`
    * (missing history contributes 0; normalize by 100·(2^(depth+1)−1) for
    * the smoothed value). At depth 20 the dropped tail weighs < 10⁻⁶ of the
    * total. One window shuffle on the key; the `depth+1` lag expressions
    * share a single Window operator. (ts, tieBreak) must totally order each
    * key — the order-sensitivity rule. */
  def ewmaScaledByKey(df: DataFrame, key: Column, ts: Column, tieBreak: Column,
                      value: Column, depth: Int = 20): DataFrame = {
    require(depth >= 0 && depth < 40, s"depth out of range: $depth")
    val w = Window.partitionBy(key).orderBy(ts.asc, tieBreak.asc)
    val cents = floor(value * 100).cast("long")
    df.withColumn("ewma_scaled",
      (0 to depth).map(k =>
        coalesce(lag(cents, k).over(w), lit(0L)) * lit(1L << (depth - k)))
        .reduce(_ + _))
  }

  /** Multi-level rollup report in ONE pass: every prefix of `dims` (total,
    * per-dim1, per-(dim1,dim2), …) aggregated together via `ROLLUP` — the
    * report the reference builds with one pandas groupby per level. Spark
    * plans a single Expand (×(dims+1) rows map-side) feeding ONE partial +
    * final hash aggregate: one shuffle total vs one per level, and the
    * expanded rows are pre-aggregated map-side so the shuffle carries group
    * counts, not data. Subtotal rows' null dims are coalesced to `sentinel`
    * so the output needs no GROUPING_ID (whose bit order differs across
    * engines) — dims must therefore be non-null (caller pre-coalesces real
    * nulls). `dims` are (expression, output name); `aggs` must alias every
    * aggregate column.
    */
  def rollupReport(df: DataFrame, dims: Seq[(Column, String)], sentinel: String,
                   aggs: Seq[Column]): DataFrame = {
    val dimNames = dims.map(_._2)
    val rolled = df
      .rollup(dims.map { case (d, nm) => d.as(nm) }: _*)
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
    val isDim = dimNames.toSet
    rolled.select(rolled.columns.map { c =>
      if (isDim(c)) coalesce(col(c).cast("string"), lit(sentinel)).as(c)
      else col(c)
    }: _*)
  }

  /** Cumulative-meter → interval-consumption conversion — the core
    * meter-data transform of an energy pipeline (the reference ingests
    * cumulative plant counters and charts usage; cf.
    * fetch_data/pv/namdong_collect_pv.py's cumulative-generation columns).
    * Per key under the (ts, id) total order:
    *
    *   - `delta = reading − prev_reading ≥ 0` → `used = delta` (normal tick)
    *   - `delta < 0`, `wrapModulus = Some(m)` → `used = delta + m`
    *     (mechanical rollover: the register wrapped past its max; valid when
    *     true consumption per interval is < m)
    *   - `delta < 0`, `wrapModulus = None` → `used = reading` (counter
    *     replaced / reset to zero; usage restarts from the new register)
    *
    * First reading per key has no covered interval → `used` NULL.
    * ALL-INTEGER (readings pre-quantized to cents by the caller), so the
    * branch cut and outputs are bit-identical cross-engine. ONE window
    * shuffle on the key; at 100 TB the key partitioning is the natural
    * meter-id distribution and each key's series sorts within its
    * partition. `is_discontinuity` flags EVERY negative delta — a healed
    * mechanical rollover under `wrapModulus` and a counter reset alike
    * (how the register discontinuity was interpreted is the caller's
    * `wrapModulus` policy, already reflected in `used_cents`; the flag
    * deliberately does not pretend to distinguish them).
    * Output: (key, ts, id, reading_cents, used_cents, is_discontinuity).
    */
  def meterIntervals(df: DataFrame, key: Column, ts: Column, id: Column,
                     readingCents: Column,
                     wrapModulus: Option[Long] = None): DataFrame = {
    wrapModulus.foreach(m => require(m > 0, s"wrapModulus must be > 0: $m"))
    val w = Window.partitionBy(col("key")).orderBy(col("ts"), col("id"))
    val base = df.select(key.as("key"), ts.as("ts"), id.as("id"),
        readingCents.cast("long").as("reading_cents"))
      .withColumn("_prev", lag(col("reading_cents"), 1).over(w))
    val delta = col("reading_cents") - col("_prev")
    val onNegative = wrapModulus match {
      case Some(m) => delta + lit(m)
      case None    => col("reading_cents")
    }
    base.select(col("key"), col("ts"), col("id"), col("reading_cents"),
      when(col("_prev").isNull, lit(null).cast("long"))
        .when(delta >= 0, delta)
        .otherwise(onNegative).as("used_cents"),
      coalesce(delta < 0, lit(false)).as("is_discontinuity"))
  }

  /** Step-hold time-weighted mean per key per UTC day — the honest average
    * for IRREGULARLY sampled sensors (a plain `avg` over-weights bursts;
    * the reference's panels average sensor series sampled on uneven cron
    * ticks). Each sample's value holds from its `ts` until the next sample
    * of the same key or the end of its day, whichever is earlier (step
    * interpolation, truncated at the day boundary — the uncovered head of a
    * day and any carry past midnight are excluded rather than invented).
    * NULL-valued samples are dropped BEFORE the hold window (the sibling
    * operators' `value IS NOT NULL` convention), so the prior sample's hold
    * spans them LOCF-style — a null tick neither dilutes the mean toward
    * zero nor counts in `n_samples`/`covered_ms`.
    *
    * ALL-INTEGER: per-row weight is the hold in whole milliseconds,
    * `Σ cents·hold_ms` stays well inside BIGINT (1e4 cents × 8.64e7 ms ≈
    * 1e12/row), and the mean is Euclidean-floor-divided (`pmod`) so
    * negative readings floor identically cross-engine. ONE window shuffle
    * on the key (the lead), then a (key, day) partial-agg pass clustered by
    * the same key partitioning. Output: (key, day, n_samples, covered_ms,
    * twa_cents = floor(Σ cents·hold / Σ hold), NULL when nothing is
    * covered — e.g. a key whose only sample is the day's last instant). */
  def timeWeightedMeanDaily(df: DataFrame, key: Column, ts: Column,
                            id: Column, value: Column): DataFrame = {
    val w = Window.partitionBy(col("key")).orderBy(col("ts"), col("id"))
    val base = df.filter(value.isNotNull)
      .select(key.as("key"), ts.as("ts"), id.as("id"),
        round(value * 100, 0).cast("long").as("cents"))
      .withColumn("day", to_date(col("ts")))
      .withColumn("_next_ms", lead(unix_millis(col("ts")), 1).over(w))
    // day end in epoch ms via datediff — never day.cast(long), which is
    // session-TZ-dependent (same rule as rollingByKey)
    val dayEndMs = (datediff(col("day"), lit("1970-01-01")).cast("long")
      + lit(1L)) * lit(86400000L)
    val hold = least(coalesce(col("_next_ms"), dayEndMs), dayEndMs) -
      unix_millis(col("ts"))
    val daily = base
      .withColumn("_hold_ms", hold)
      .groupBy(col("key"), col("day"))
      .agg(count(lit(1)).as("n_samples"),
        sum(col("_hold_ms")).as("covered_ms"),
        sum(col("cents") * col("_hold_ms")).as("_wsum"))
    daily.select(col("key"), col("day"), col("n_samples"), col("covered_ms"),
      when(col("covered_ms") > 0,
        ((col("_wsum") - pmod(col("_wsum"), col("covered_ms")))
          / col("covered_ms")).cast("long")).as("twa_cents"))
  }

  /** W7 conditional suffixing by a group property: plants with >1 distinct
    * unit get a `name_unit` suffix (reference:
    * fetch_data/pv/namdong_merge_pv_data.py:93-104, namdong_collect_pv.py:283-288).
    * Uses a window countDistinct-equivalent (size of collect_set) to avoid a
    * second join against the A3 aggregate. */
  def suffixWhenMultiUnit(df: DataFrame, name: Column, unit: Column): DataFrame = {
    val w = Window.partitionBy(name)
    df.withColumn("n_units", size(collect_set(unit).over(w)))
      .withColumn("display_name",
        when(col("n_units") > 1, concat_ws("_", name, unit)).otherwise(name))
      .drop("n_units")
  }

  /** Stuck-meter detection (the VEE "stale register" check every metering
    * pipeline runs before settlement): maximal runs of consecutive ticks
    * whose reading sits in the SAME declared quantization bucket, per key
    * under the explicit (ts, id) total order. A healthy interval meter's
    * reading moves; a run of `minLen`+ unchanged (bucketed) readings means
    * a stale register, a frozen gateway cache, or a flatlined sensor.
    *
    * Gaps-and-islands, all integer: bucket = floorDiv(floor(value·100),
    * quantCents) — floorDiv, not truncation, so negative (net-metered)
    * readings bucket identically cross-engine; island id = running count
    * of bucket CHANGES; one window shuffle on the key, then a (key,
    * island) partial agg clustered on the same partitioning. NULL-valued
    * ticks are dropped first (a null is a gap, not a stuck reading).
    * Output: (key, bucket, n_ticks, run_start, run_end) for runs with
    * n_ticks >= minLen.
    */
  def stuckRuns(df: DataFrame, key: Column, ts: Column, id: Column,
                value: Column, quantCents: Long, minLen: Int): DataFrame = {
    require(quantCents >= 1, s"quantCents >= 1: $quantCents")
    require(minLen >= 2, s"minLen >= 2 (a single tick is never stuck): $minLen")
    val w = Window.partitionBy(col("key")).orderBy(col("ts"), col("id"))
    df.filter(value.isNotNull)
      .select(key.as("key"), ts.as("ts"), id.as("id"),
        floor(value * lit(100.0)).cast("long").as("_vc"))
      .withColumn("_q", ((col("_vc") - pmod(col("_vc"), lit(quantCents)))
        / lit(quantCents)).cast("long"))
      .withColumn("_chg",
        when(lag(col("_q"), 1).over(w).isNull ||
          lag(col("_q"), 1).over(w) =!= col("_q"), lit(1L)).otherwise(lit(0L)))
      .withColumn("_island", sum(col("_chg")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("key"), col("_island"))
      // _q is constant within an island; min is the order-free way to say so
      .agg(min(col("_q")).as("bucket"), count(lit(1)).as("n_ticks"),
        min(col("ts")).as("run_start"), max(col("ts")).as("run_end"))
      .filter(col("n_ticks") >= minLen)
      .select(col("key"), col("bucket"), col("n_ticks"),
        col("run_start"), col("run_end"))
  }

  /** Meter cadence profile — the reporting-regularity check (a feed whose
    * inter-arrival gaps drift or spread is a failing gateway long before
    * values go bad): per key, exact integer statistics of the millisecond
    * gaps between consecutive ticks under the (ts, id) total order.
    *
    * Exact rank selection, no arrays and no approximation: gaps are ranked
    * per key (gap asc, then (ts, id) — a total order, so ranks are
    * deterministic); the median is reported DOUBLED (the
    * [[rollingMedianDaily]] convention: odd n → 2·mid, even n → the two
    * middle gaps summed — interpolation stays in BIGINT) and p95 is the
    * gap at rank ceil(0.95·n). One raw-row window shuffle on the key (the
    * [[meterIntervals]] shape) + a key-sized aggregate on the same
    * partitioning. Output: (grp, n_gaps, twice_median_gap_ms, p95_gap_ms,
    * max_gap_ms); keys with a single tick have no gaps and no row.
    */
  def cadenceProfile(df: DataFrame, key: Column, ts: Column,
                     id: Column): DataFrame = {
    val w = Window.partitionBy(col("key")).orderBy(col("ts"), col("id"))
    val gaps = df.select(key.as("key"), ts.as("ts"), id.as("id"))
      .withColumn("_ms", unix_millis(col("ts")))
      .withColumn("_prev", lag(col("_ms"), 1).over(w))
      .filter(col("_prev").isNotNull)
      .withColumn("gap_ms", col("_ms") - col("_prev"))
    val wg = Window.partitionBy(col("key"))
      .orderBy(col("gap_ms"), col("ts"), col("id"))
    gaps
      .withColumn("_rn", row_number().over(wg).cast("long"))
      .withColumn("_n",
        count(lit(1)).over(Window.partitionBy(col("key"))).cast("long"))
      .withColumn("_mid1", expr("(_n + 1) div 2"))
      .withColumn("_mid2", expr("_n div 2 + 1"))
      .withColumn("_p95", expr("(95 * _n + 99) div 100"))
      .groupBy(col("key").as("grp"))
      .agg(max(col("_n")).as("n_gaps"),
        sum(when(expr("_n % 2 = 1") && col("_rn") === col("_mid1"),
            col("gap_ms") * 2)
          .when(expr("_n % 2 = 0") &&
            (col("_rn") === expr("_n div 2") ||
              col("_rn") === col("_mid2")), col("gap_ms"))
          .otherwise(lit(0L))).as("twice_median_gap_ms"),
        sum(when(col("_rn") === col("_p95"), col("gap_ms"))
          .otherwise(lit(0L))).as("p95_gap_ms"),
        max(col("gap_ms")).as("max_gap_ms"))
  }

  /** Fleet-level rollup of the [[veeScorecard]] — the one-row summary an
    * ops dashboard reads before trusting a day's feed: meter counts by
    * failure class, against a declared completeness floor (ppm). A meter
    * counts once per class it fails; classes overlap. One keyless
    * aggregate over the key-sized scorecard — nothing row-scale moves.
    * Output: (n_meters, n_incomplete, n_spiky, n_stuck, n_with_nulls).
    */
  def veeFleetRollup(scorecard: DataFrame,
                     completenessFloorPpm: Long = 900000L): DataFrame = {
    require(completenessFloorPpm >= 0 && completenessFloorPpm <= 1000000L,
      s"completeness floor is a ppm in [0, 1e6]: $completenessFloorPpm")
    scorecard.agg(
      count(lit(1)).as("n_meters"),
      sum(when(col("completeness_ppm") < completenessFloorPpm, 1L)
        .otherwise(0L)).as("n_incomplete"),
      sum(when(col("n_spikes") > 0, 1L).otherwise(0L)).as("n_spiky"),
      sum(when(col("longest_stuck") > 0, 1L).otherwise(0L)).as("n_stuck"),
      sum(when(col("n_nulls") > 0, 1L).otherwise(0L)).as("n_with_nulls"))
  }

  /** Per-meter VEE quality scorecard — the validation summary a metering
    * ops team reads before trusting a feed: row/null counts, calendar
    * completeness, spike count and longest stuck run, one row per key.
    *
    * All integer: completeness_ppm = floor(10⁶ · days_present /
    * span_days) with span = [min day, max day] of the key itself (a key
    * is graded against its own service window, not the fleet's); a spike
    * is |Δcents| > spikeCents between consecutive non-null ticks under
    * the (ts, id) total order; longest_stuck reuses [[stuckRuns]]'s
    * bucketed-run definition (0 when no run reaches minLen).
    *
    * 100 TB shape: one window shuffle on the key + grain-sized follow-up
    * aggregates on the same partitioning; the stuck-run join adds a
    * key-sized (not row-sized) aggregate. Output: (key, n_rows, n_nulls,
    * days_present, span_days, completeness_ppm, n_spikes, longest_stuck).
    */
  def veeScorecard(df: DataFrame, key: Column, ts: Column, id: Column,
                   value: Column, spikeCents: Long = 20000L,
                   quantCents: Long = 5000L, minLen: Int = 3): DataFrame = {
    require(spikeCents >= 1, s"spikeCents >= 1: $spikeCents")
    val w = Window.partitionBy(col("key")).orderBy(col("ts"), col("id"))
    val base = df.select(key.as("key"), ts.as("ts"), id.as("id"),
      value.as("value"))
    val ticks = base.filter(col("value").isNotNull)
      .withColumn("_vc", floor(col("value") * lit(100.0)).cast("long"))
      .withColumn("_prev", lag(col("_vc"), 1).over(w))
    val perKey = ticks
      .groupBy(col("key"))
      .agg(count(lit(1)).as("_n_ticks"),
        countDistinct(to_date(col("ts"))).as("days_present"),
        (datediff(max(to_date(col("ts"))), min(to_date(col("ts")))) + 1)
          .cast("long").as("span_days"),
        sum(when(col("_prev").isNotNull &&
          abs(col("_vc") - col("_prev")) > spikeCents, 1L).otherwise(0L))
          .as("n_spikes"))
    val nulls = base.groupBy(col("key"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("value").isNull, 1L).otherwise(0L)).as("n_nulls"))
    val stuck = stuckRuns(base, col("key"), col("ts"), col("id"),
        col("value"), quantCents, minLen)
      .groupBy(col("key")).agg(max(col("n_ticks")).as("longest_stuck"))
    nulls.join(perKey, Seq("key"), "left")
      .join(stuck, Seq("key"), "left")
      .select(col("key"), col("n_rows"), col("n_nulls"),
        coalesce(col("days_present"), lit(0L)).as("days_present"),
        coalesce(col("span_days"), lit(0L)).as("span_days"),
        when(col("span_days") > 0,
          expr("(1000000 * days_present) div span_days"))
          .otherwise(lit(0L)).as("completeness_ppm"),
        coalesce(col("n_spikes"), lit(0L)).as("n_spikes"),
        coalesce(col("longest_stuck"), lit(0L)).as("longest_stuck"))
  }
}
