package graft.engine

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deterministic global ordering — the corpus-shuffle / curriculum
  * primitive of a training-data delivery pipeline: every row gets its
  * exact 0-based position under a caller-supplied TOTAL order, plus a
  * round-robin shard id for data-loader consumption. The reference
  * pipeline delivers ordered tables to consumers (e.g. dashboard-ordered
  * extracts); at training scale the same need is "shuffle the corpus
  * once, reproducibly, and tell every row where it landed".
  *
  * Scale shape: a global `row_number()` window would funnel the corpus
  * through ONE task. Instead: range-repartition on the order key, sort
  * within partitions, then `zipWithIndex` — whose internal count job and
  * the final pass both read the SAME sort-shuffle files (Spark skips the
  * map stages on the second job), so the corpus is scanned once and
  * sorted once, and no single task ever sees more than a partition. The
  * per-partition index append is genuine imperative per-partition logic —
  * the one place the RDD escape hatch earns its keep.
  */
object Order {

  /** Exact 0-based global position of every row under `order`, appended
    * as `posCol`. `order` MUST be a total order (append a unique id as
    * the last key); equal rows would otherwise land in
    * partition-placement-dependent positions. Positions are independent
    * of `numParts` (spec-pinned) — partitioning changes the split, never
    * the order. */
  def globalOrderIndex(df: DataFrame, order: Seq[Column], numParts: Int,
                       posCol: String = "pos"): DataFrame = {
    require(numParts > 0, s"numParts must be positive: $numParts")
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(numParts, order: _*)
      .sortWithinPartitions(order: _*)
    val indexed = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ i)
    }
    spark.createDataFrame(indexed,
      sorted.schema.add(posCol, LongType, nullable = false))
  }

  /** Seeded deterministic corpus shuffle: order by the cross-engine md5
    * of `id:seed` (id appended as tie-break → total order even under the
    * astronomically-unlikely hash collision), emit the global `pos` and a
    * round-robin `shard ∈ [0, numShards)`. Reproducible bit-for-bit in
    * any engine with md5 — same recipe as [[Sampling]]'s ppm buckets. */
  def seededShuffle(df: DataFrame, id: Column, seed: Long, numShards: Int,
                    numParts: Int): DataFrame = {
    require(numShards > 0, s"numShards must be positive: $numShards")
    val keyed = df.withColumn("_shuffle_key",
      concat(md5(concat(id.cast("string"), lit(":" + seed))),
        id.cast("string")))
    globalOrderIndex(keyed, Seq(col("_shuffle_key")), numParts)
      .withColumn("shard", col("pos") % numShards)
      .drop("_shuffle_key")
  }
}
