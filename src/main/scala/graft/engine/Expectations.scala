package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectation suite (the dbt-test / Great
  * Expectations shape, engine-side).
  *
  * The reference validates fetched batches imperatively before loading
  * (fetch_data/pv/daily_pv_automation.py checks row counts and hour
  * completeness inline); this generalizes that into a rule table the
  * pipeline can gate on: every rule yields `(rule, n_violations, n_rows,
  * pass)` and a release proceeds only when all `pass` = 1.
  *
  * Scale shape: all ROW rules (not-null / set membership / range / custom
  * predicate) fold into ONE full-scan aggregate — a single job, no shuffle
  * beyond the one-row final agg, however many rules there are (conditional
  * sums ride the same pass; the reshape to long is a width-of-rules stack
  * on a ONE-ROW frame). Each UNIQUENESS rule is necessarily its own
  * hash shuffle on its key set (count-surplus via groupBy — null keys
  * group together, identical in DuckDB, so no COUNT DISTINCT null
  * ambiguity); violations = n_rows − n_distinct_key_groups.
  */
object Expectations {

  /** Row rules: (name, violationCond) — `violationCond` true marks a bad
    * row; NULL counts as not-a-violation (wrap with `coalesce` to change).
    * Unique rules: (name, key column names).
    */
  def check(df: DataFrame, rowRules: Seq[(String, Column)],
            uniqueRules: Seq[(String, Seq[String])] = Nil): DataFrame = {
    require(rowRules.nonEmpty || uniqueRules.nonEmpty, "no rules given")
    val rowFrames: Seq[DataFrame] =
      if (rowRules.isEmpty) Nil
      else {
        val aggs = count(lit(1)).as("_n") +:
          rowRules.zipWithIndex.map { case ((_, cond), i) =>
            // sum is NULL on an empty batch — an empty batch has 0 violations
            coalesce(sum(when(cond, 1L).otherwise(0L)), lit(0L)).as(s"_v$i")
          }
        val one = df.agg(aggs.head, aggs.tail: _*)
        val stackArgs = rowRules.zipWithIndex
          .map { case ((name, _), i) =>
            s"'${name.replace("'", "''")}', _v$i"
          }.mkString(", ")
        Seq(one.select(
          expr(s"stack(${rowRules.size}, $stackArgs) AS (rule, n_violations)"),
          col("_n").as("n_rows")))
      }
    val uniqueFrames = uniqueRules.map { case (name, keys) =>
      df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("_c"))
        .agg(sum("_c").as("_n"), count(lit(1)).as("_g"))
        .select(lit(name).as("rule"),
          (coalesce(col("_n"), lit(0L)) - col("_g")).as("n_violations"),
          coalesce(col("_n"), lit(0L)).as("n_rows"))
    }
    (rowFrames ++ uniqueFrames).reduce(_ unionByName _)
      .select(col("rule"), col("n_violations"), col("n_rows"),
        when(col("n_violations") === 0, 1L).otherwise(0L).as("pass"))
  }

  /** Referential-integrity rule (dbt's `relationships` test): a violation
    * is a fact row whose non-NULL key has no match in the dimension (NULL
    * keys are a not-null rule's business, not this one's). One row out,
    * same shape as [[check]] so gates union them. Plan: dim keys distinct
    * (so the left join can never fan out) then ONE key-shuffle join —
    * AQE broadcasts a small dim — feeding a one-row aggregate; the fact
    * is never collected or scanned twice.
    */
  def checkFk(fact: DataFrame, factKey: Column, dim: DataFrame,
              dimKey: Column, name: String): DataFrame = {
    val dimKeys = dim.select(dimKey.as("_dk")).na.drop().distinct()
    fact.select(factKey.as("_fk"))
      .join(dimKeys, col("_fk") === col("_dk"), "left")
      .agg(count(lit(1)).as("n_rows"),
        coalesce(sum(when(col("_fk").isNotNull && col("_dk").isNull, 1L)
          .otherwise(0L)), lit(0L)).as("n_violations"))
      .select(lit(name).as("rule"), col("n_violations"), col("n_rows"),
        when(col("n_violations") === 0, 1L).otherwise(0L).as("pass"))
  }
}
