package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
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
