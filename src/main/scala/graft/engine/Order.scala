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

  /** Morton (Z-order) index over integer columns — the multi-dimensional
    * clustering key behind file-skipping layouts: sorting by `zValue` and
    * writing size-bounded files gives every file a TIGHT min/max envelope
    * on EVERY interleaved column, so a predicate on any one of them prunes
    * files/row-groups via parquet stats (a single-column sort gives that
    * only for the leading column; each file spans the full range of the
    * rest). [[SinkSpec]]-measured on the prunability metric below.
    *
    * All-integer and shift-only, hence cross-engine exact: per column,
    * `bucket = clamp((x − min) >> shift, 0, 2^bits − 1)` with
    * `shift = ceilLog2(max − min + 1) − bits` (integer bit ops, no float
    * log2 — `ceil(log2(s))` in doubles misrounds near powers of two), then
    * buckets interleave bit-by-bit, column 0 taking the most significant
    * position of each bit group. Nulls bucket to 0 (nulls-first). Ranges
    * are CALLER-DECLARED so the mapping is stable across days/appends —
    * a layout key must not move when tomorrow's data shifts min/max;
    * out-of-range values clamp into the edge buckets. */
  def zValue(cols: Seq[Column], ranges: Seq[(Long, Long)],
             bits: Int = 8): Column = {
    require(cols.nonEmpty && cols.size == ranges.size,
      s"need one (min,max) range per column: ${cols.size} vs ${ranges.size}")
    require(bits >= 1 && bits * cols.size <= 62,
      s"bits*cols must fit a positive long: $bits*${cols.size}")
    val n = cols.size
    val top = (1L << bits) - 1
    val buckets = cols.zip(ranges).map { case (c, (mn, mx)) =>
      require(mx >= mn, s"empty range [$mn,$mx]")
      val span = mx - mn + 1 // span <= 0 iff the full-long range: unsupported
      require(span > 0, s"range [$mn,$mx] too wide")
      val shift = math.max(0, ceilLog2(span) - bits)
      least(lit(top), greatest(lit(0L),
        shiftright(coalesce(c.cast("long"), lit(mn)) - lit(mn), shift)))
    }
    val terms = for {
      bit <- 0 until bits
      (bk, i) <- buckets.zipWithIndex
    } yield shiftleft(shiftright(bk, bit).bitwiseAND(lit(1L)),
      bit * n + (n - 1 - i))
    terms.reduce(_ bitwiseOR _)
  }

  /** Smallest k with 2^k >= span (span >= 1). Integer bit math. */
  private[graft] def ceilLog2(span: Long): Int =
    if (span <= 1L) 0 else 64 - java.lang.Long.numberOfLeadingZeros(span - 1L)

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
