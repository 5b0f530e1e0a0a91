package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** U2/U3 — keyed dedup with explicit win-order.
  *
  * Reference: `drop_duplicates(subset=keys, keep="last")` after unioning old +
  * new frames (prefect_flows/merge_to_all.py:56-79) and `keep='first'`
  * (initial_db_ingestion.py:99,:137,:171). pandas `keep=` depends on physical
  * row order — nondeterministic under Spark parallelism — so the order column
  * is REQUIRED here (SURVEY.md §7.4): callers thread a source-sequence or
  * timestamp column through the union.
  *
  * Scale: one shuffle on the dedup keys (the same shuffle any keyed dedup
  * needs); `row_number` + filter(rn=1) lets the sort stay within each key
  * group. For the unordered case Spark's `dropDuplicates` would avoid the
  * sort but loses determinism — not offered.
  */
object Dedup {

  private def pick(df: DataFrame, keys: Seq[Column], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** U2: newest row per key wins (ties broken by the caller's order columns —
    * pass more than one for full determinism). */
  def keepLast(df: DataFrame, keys: Seq[Column], order: Seq[Column]): DataFrame =
    pick(df, keys, order.map(_.desc))

  /** U3: first row per key wins. */
  def keepFirst(df: DataFrame, keys: Seq[Column], order: Seq[Column]): DataFrame =
    pick(df, keys, order.map(_.asc))

  /** Upsert-as-dataflow (S14): `INSERT ... ON CONFLICT DO UPDATE` re-expressed
    * as union + keep-last with the new side winning
    * (namdong_wind_collect.py:191-225). Both sides must share the schema. */
  def upsert(existing: DataFrame, incoming: DataFrame, keys: Seq[String],
             tieBreak: Seq[Column]): DataFrame = {
    val tagged = existing.withColumn("_src_order", lit(0))
      .unionByName(incoming.withColumn("_src_order", lit(1)))
    keepLast(tagged, keys.map(col), col("_src_order") +: tieBreak)
      .drop("_src_order")
  }
}
