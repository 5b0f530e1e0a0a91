package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed change-data capture over snapshot tables — the warehouse layer the
  * reference approximates with per-row psycopg2 upserts
  * (fetch_data/pv/database.py:116-160): given yesterday's and today's
  * snapshot of a keyed table, emit the delta (insert/update/delete), and
  * turn an append-only change log into a Type-2 slowly-changing dimension
  * (the table [[Joins.pointInTimeJoin]]/[[Joins.asofJoin]] consume).
  *
  * Scale notes: [[snapshotDiff]] is ONE full-outer shuffle join on the key —
  * with both snapshots written via [[Sink.writeBucketed]] on the key it runs
  * exchange-free; output is delta-sized, never snapshot-sized. [[scd2]] is
  * one hash shuffle on the entity key reused by both window passes (the
  * second window runs on the already-collapsed version starts with the same
  * partitioning, so Catalyst plans no second exchange — asserted in
  * CdcSpec).
  */
object Cdc {

  /** Classify every key as `insert` / `update` / `delete` between two keyed
    * snapshots, dropping unchanged keys. Comparison is null-safe (`<=>`)
    * per compare column; both snapshots must be unique per key (the caller's
    * contract — e.g. the output of [[Dedup.keepLast]]). Output: the key
    * columns (coalesced across sides), `change_type`, then
    * `old_<c>`/`new_<c>` for each compare column.
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame, keys: Seq[String],
                   compare: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "snapshotDiff needs at least one key column")
    val o = oldSnap.select(
      keys.map(col) ++ compare.map(c => col(c).as(s"old_$c")) :+
        lit(1).as("_o"): _*)
    val n = newSnap.select(
      keys.map(col) ++ compare.map(c => col(c).as(s"new_$c")) :+
        lit(1).as("_n"): _*)
    val changed = compare.map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    o.join(n, keys, "full_outer")
      .withColumn("change_type",
        when(col("_o").isNull, lit("insert"))
          .when(col("_n").isNull, lit("delete"))
          .when(changed, lit("update")))
      .filter(col("change_type").isNotNull)
      .drop("_o", "_n")
  }

  /** Apply a [[snapshotDiff]]-shaped delta onto a base snapshot — the MERGE
    * half of the CDC round trip: inserts add rows, updates replace the
    * compared columns, deletes drop the key. The algebraic contract
    * (spec'd AND oracled): `applyDelta(A, snapshotDiff(A, B)) == B`
    * bit-for-bit, which is what makes replicating a table by shipping
    * deltas sound. One shuffle join on the key (delta-sized right side —
    * AQE broadcasts a small delta); the base flows through map-only
    * otherwise. Base must be unique per key (the [[snapshotDiff]]
    * contract).
    */
  def applyDelta(base: DataFrame, delta: DataFrame, keys: Seq[String],
                 compare: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "applyDelta needs at least one key column")
    val d = delta.select(
      keys.map(col) ++ compare.map(c => col(s"new_$c")) :+
        col("change_type"): _*)
    val joined = base.join(d, keys, "full_outer")
    // delete → drop; update/insert → new values; untouched key → base row
    joined
      .filter(coalesce(col("change_type"), lit("")) =!= "delete")
      .select(keys.map(col) ++ compare.map(c =>
        when(col("change_type").isin("insert", "update"), col(s"new_$c"))
          .otherwise(col(c)).as(c)): _*)
  }

  /** Type-2 slowly-changing dimension from an append-only change log:
    * consecutive rows per key whose tracked attributes are unchanged
    * collapse into one version; each version carries
    * `valid_from` (its first log timestamp), `valid_to` (the next
    * version's `valid_from`, null while current) and `is_current` (1/0 as
    * BIGINT — boolean output columns round-trip poorly through parquet
    * partition layers, see the verify skill's gotcha list).
    *
    * `tieBreak` must make (ts, tieBreak) a total order per key — the
    * repo-wide rule for order-sensitive operators. Attribute comparison is
    * null-safe struct equality, so a null attribute value is a real state
    * (not a wildcard). Output: all log columns plus the three version
    * columns; the version's row is the FIRST log row of its run.
    */
  def scd2(log: DataFrame, key: Column, ts: Column, tieBreak: Column,
           attrs: Seq[String]): DataFrame = {
    require(attrs.nonEmpty, "scd2 needs at least one tracked attribute")
    val ord = Window.partitionBy(key).orderBy(ts.asc, tieBreak.asc)
    // one struct per row; lag compares whole-state null-safely so a change
    // in ANY tracked attribute (including to/from null) opens a new version
    val state = struct(attrs.map(col): _*)
    log
      .withColumn("_prev", lag(state, 1).over(ord))
      .filter(col("_prev").isNull || !(col("_prev") <=> state))
      .withColumn("valid_from", ts)
      .withColumn("valid_to", lead(ts, 1).over(ord))
      .withColumn("is_current",
        when(col("valid_to").isNull, 1L).otherwise(0L))
      .drop("_prev")
  }
}
