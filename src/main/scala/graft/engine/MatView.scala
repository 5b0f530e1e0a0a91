package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance (materialized-view delta merge).
  *
  * The reference's nightly jobs re-derive dashboard rollups from the raw
  * table each run (fetch_data/pv/daily_pv_automation.py re-aggregates the
  * day it fetched); at 100 TB a rollup must instead be maintained as
  * mergeable partial-aggregate STATE: a keyed table of (sum, count, min,
  * max) that yesterday's state and today's delta combine into without ever
  * re-reading the corpus. That is exactly Spark's own partial-aggregation
  * contract (map-side combine emits the same shape), lifted to a persisted
  * table boundary.
  *
  * Integer contract: values quantize to micro-units (`floor(v·1e6 + 0.5)`,
  * the [[Analytics.historicalMeanByMDH]] convention) BEFORE any
  * aggregation, so state sums are BIGINT-exact, merge is associative and
  * commutative bit-for-bit, and derived means use Euclidean floor division
  * — no FP accumulation order anywhere, cross-engine replayable.
  *
  * 100 TB shape: `aggState` over a day's delta is one partial-agg shuffle
  * of the delta only; `mergeStates` shuffles state-sized tables (group
  * cardinality, not row cardinality). The full-history rebuild and the
  * day-by-day fold produce bit-identical state (spec'd), which is the
  * property that makes backfills and replays safe.
  */
object MatView {

  private def vMicro(value: Column): Column =
    floor(value * lit(1000000.0) + lit(0.5)).cast("long")

  /** Build partial-aggregate state for `value` grouped by `keys`:
    * `(keys..., sum_micro, cnt, min_micro, max_micro)`. Null values are
    * excluded from all four (an all-null group carries NULL min/max and
    * sum with cnt = 0).
    */
  def aggState(df: DataFrame, keys: Seq[Column], value: Column): DataFrame = {
    val vm = vMicro(value)
    df.groupBy(keys: _*)
      .agg(sum(vm).as("sum_micro"), count(vm).as("cnt"),
        min(vm).as("min_micro"), max(vm).as("max_micro"))
  }

  /** Merge any number of state tables (prev ∪ deltas) into one state table.
    * Associative + commutative: sums add, counts add, min/max fold —
    * nulls (all-null groups) are absorbed exactly as in a direct rebuild.
    */
  def mergeStates(states: Seq[DataFrame], keyNames: Seq[String]): DataFrame = {
    require(states.nonEmpty, "mergeStates needs at least one state table")
    states.reduce(_ unionByName _)
      .groupBy(keyNames.map(col): _*)
      .agg(sum("sum_micro").as("sum_micro"), sum("cnt").as("cnt"),
        min("min_micro").as("min_micro"), max("max_micro").as("max_micro"))
  }

  /** Mergeable distinct-count state — the non-additive companion to
    * [[aggState]]. COUNT(DISTINCT) cannot be maintained from (sum, cnt)
    * partials, so the state is a Datasketches HLL sketch per key
    * (`hll_sketch_agg`): a few KB however many rows fold in, register-max
    * merge is lossless and order-independent, so daily sketch tables union
    * into monthly estimates without re-reading the corpus — the same
    * pattern as the additive state, at sketch precision (~2% default rsd).
    * The sketch column is STATE, not a query output (binary breaks the
    * dtype contract): finish with [[sketchEstimate]] at the read boundary.
    */
  def distinctSketchState(df: DataFrame, keys: Seq[Column],
                          counted: Column): DataFrame =
    df.groupBy(keys: _*).agg(hll_sketch_agg(counted).as("hll"))

  /** Merge sketch-state tables (prev ∪ deltas) — associative, commutative,
    * and LOSSLESS w.r.t. building one sketch over the union of the inputs
    * (register-wise max), so fold order can never change the estimate. */
  def mergeDistinctSketches(states: Seq[DataFrame],
                            keyNames: Seq[String]): DataFrame = {
    require(states.nonEmpty, "mergeDistinctSketches needs at least one state")
    states.reduce(_ unionByName _)
      .groupBy(keyNames.map(col): _*)
      .agg(hll_union_agg(col("hll")).as("hll"))
  }

  /** Read boundary for sketch state: distinct estimate as BIGINT, sketch
    * bytes dropped. */
  def sketchEstimate(state: DataFrame): DataFrame =
    state.withColumn("n_distinct_est", hll_sketch_estimate(col("hll")))
      .drop("hll")

  /** Mergeable HISTOGRAM state — percentiles made incrementally
    * maintainable. Exact percentiles cannot be maintained from (sum, cnt)
    * partials; the state here is the [[Analytics.histogram]] binning
    * (DECLARED [loCents, hiCents) range, integer clamp + multiply-then-
    * floor-divide buckets) lifted to a persisted table: `(keys..., bucket,
    * cnt)`, at most nBuckets rows per key however many rows fold in. Count
    * addition is associative/commutative and BIGINT-exact, so daily states
    * merge into monthly quantiles without re-reading the corpus — the HLL
    * pattern at bucket resolution (error ≤ one bucket width, chosen by the
    * caller, vs the sketch's probabilistic rsd). Nulls excluded;
    * out-of-range values clamp into the edge buckets (the winsorize
    * convention — they move the tail quantile at most one bucket). */
  def histState(df: DataFrame, keys: Seq[Column], value: Column,
                loCents: Long, hiCents: Long, nBuckets: Int): DataFrame = {
    require(hiCents > loCents, s"empty range [$loCents, $hiCents)")
    require(nBuckets >= 1, s"nBuckets >= 1: $nBuckets")
    val vc = floor(value * lit(100.0)).cast("long")
    val span = hiCents - loCents
    df.filter(value.isNotNull)
      .withColumn("_d",
        least(lit(span - 1), greatest(lit(0L), vc - lit(loCents))))
      // integral `div` (never Column `/` — the cross-engine bucketing rule)
      .groupBy(keys :+ expr(s"(_d * $nBuckets) div $span")
        .cast("long").as("bucket"): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge histogram-state tables (prev ∪ deltas): counts add per
    * (keys, bucket). Associative, commutative, bit-identical to a one-shot
    * [[histState]] over the unioned inputs (spec'd) — backfill/replay-safe
    * like [[mergeStates]]. State-sized shuffle only. */
  def mergeHistStates(states: Seq[DataFrame],
                      keyNames: Seq[String]): DataFrame = {
    require(states.nonEmpty, "mergeHistStates needs at least one state")
    states.reduce(_ unionByName _)
      .groupBy((keyNames :+ "bucket").map(col): _*)
      .agg(sum("cnt").as("cnt"))
  }

  /** Read boundary for histogram state: per key and requested q (in ppm),
    * the smallest bucket whose cumulative count reaches
    * `rank = max(1, ceil(q·n/10⁶))` and its lower edge in cents — the
    * lower-edge quantile estimate, exact to one bucket width. ALL-INTEGER
    * (ceil by add-and-floor-divide, edge by `(bucket·span + nBuckets−1)
    * div nBuckets`), so the result replays bit-for-bit in any engine. Both
    * window specs share the key partitioning — ONE state-sized shuffle;
    * the q fan-out is a generator over a literal array, not a join.
    * Output: (keys..., q_ppm, n, bucket, est_cents). */
  def quantilesFromHistState(state: DataFrame, keyNames: Seq[String],
                             qsPpm: Seq[Long], loCents: Long, hiCents: Long,
                             nBuckets: Int): DataFrame = {
    require(qsPpm.nonEmpty && qsPpm.forall(q => q >= 0L && q <= 1000000L),
      s"quantiles must be in [0, 1000000] ppm: $qsPpm")
    val span = hiCents - loCents
    val keys = keyNames.map(col)
    val wAll = Window.partitionBy(keys: _*)
    val wCum = Window.partitionBy(keys: _*).orderBy(col("bucket"))
    state
      .withColumn("n", sum(col("cnt")).over(wAll))
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("q_ppm", explode(array(qsPpm.map(lit): _*)))
      .withColumn("_rank",
        greatest(lit(1L), expr("(q_ppm * n + 999999) div 1000000")))
      .filter(col("cum") >= col("_rank"))
      .groupBy(keys :+ col("q_ppm") :+ col("n"): _*)
      .agg(min(col("bucket")).as("bucket"))
      .withColumn("est_cents",
        lit(loCents) + expr(s"(bucket * $span + ${nBuckets - 1}) div $nBuckets"))
  }

  /** Read-time derived metric: exact floor mean in micro-units
    * (Euclidean `pmod` division so negative sums floor identically to
    * DuckDB's `//`); NULL where the group holds no non-null values.
    */
  def withMean(state: DataFrame): DataFrame =
    state.withColumn("avg_micro",
      when(col("cnt") > 0,
        ((col("sum_micro") - pmod(col("sum_micro"), col("cnt"))) / col("cnt"))
          .cast("long")))
}
