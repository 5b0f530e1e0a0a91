package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.3 join surface beyond plain equi-joins (those need no wrapper).
  *
  * Every dimension here is a small master table (plant metadata ≈ dozens of
  * rows in the reference; ≤ thousands in testdata) — all joins are explicit
  * `broadcast()` so the fact side never shuffles.
  */
object Joins {

  /** J2/J3: broadcast-dict lookup with a default — the `plant.json`
    * `gencd → name` map applied where the name is missing
    * (daily_pv_automation.py:22-27, :182-184; initial_db_ingestion.py:38-54).
    * Output carries all fact columns + `looked_up`. */
  def lookupWithDefault(fact: DataFrame, factKey: Column, dim: DataFrame,
                        dimKey: Column, dimVal: Column,
                        default: Column): DataFrame =
    fact.join(broadcast(dim), factKey === dimKey, "left")
      .withColumn("looked_up", coalesce(dimVal, default))
      .drop(dim.columns: _*)

  /** J1: equi-join on a regex-normalized key — both sides normalized with the
    * same expression before joining (nambu_merge_pv_data.py:42, :66-67). */
  def normalizedKeyJoin(left: DataFrame, leftKey: Column, right: DataFrame,
                        rightKey: Column, patterns: Seq[String],
                        how: String = "left"): DataFrame = {
    val l = left.withColumn("_nk", Normalize.normalizeName(leftKey, patterns))
    val r = right.withColumn("_nk", Normalize.normalizeName(rightKey, patterns))
    l.join(broadcast(r), Seq("_nk"), how).drop("_nk")
  }

  /** Point-in-time (feature-store) join: enrich each fact row with the
    * LATEST row of EVERY feature table as of the fact timestamp — the
    * no-future-leakage join a training-set builder needs when features are
    * periodic rollups published after their window closes.
    *
    * All feature tables share the fact's entity key, so instead of folding
    * N [[asofJoin]]s (N shuffles of the ever-wider fact), everything unions
    * into ONE frame — each feature row carrying its values as one struct
    * column, null elsewhere — and a single per-key ordered window runs one
    * `last(struct, ignoreNulls)` per feature. One shuffle and one sort
    * total, independent of feature-table count; each feature's match is a
    * whole row carried as a struct (never per-column `last`, which would
    * stitch fields from different feature rows across genuine nulls).
    *
    * At equal timestamps the feature row sorts BEFORE the fact row (a
    * value published exactly at the fact instant is visible — same
    * convention as [[asofJoin]] and DuckDB/pandas ASOF `>=`). Each feature
    * table must be unique per (key, ts). Output: all fact columns, then
    * `<prefix>_<col>` for each feature's carried columns (null when no
    * feature row precedes the fact).
    *
    * `features`: (prefix, table, key, ts, carried value columns). */
  def pointInTimeJoin(fact: DataFrame, key: Column, ts: Column,
                      features: Seq[(String, DataFrame, Column, Column, Seq[String])]): DataFrame = {
    require(features.nonEmpty, "no feature tables")
    val prefixes = features.map(_._1)
    require(prefixes.distinct.size == prefixes.size,
      s"duplicate feature prefixes: $prefixes")
    val factCols = fact.columns
    val structTypes = features.map { case (_, fdf, _, _, vals) =>
      org.apache.spark.sql.types.StructType(vals.map(c => fdf.schema(c)))
    }
    def nullStructsExcept(live: Int): Seq[Column] =
      features.indices.map { i =>
        if (i == live) {
          val (_, _, _, _, vals) = features(i)
          struct(vals.map(c => col(c).as(c)): _*).as(s"_f$i")
        } else lit(null).cast(structTypes(i)).as(s"_f$i")
      }
    val factSide = fact.select(
      (key.as("_k") +: ts.as("_ts") +: lit(1).as("_side") +:
        features.indices.map(i => lit(null).cast(structTypes(i)).as(s"_f$i"))) ++:
        factCols.map(c => col(c)): _*)
    val featureSides = features.zipWithIndex.map {
      case ((_, fdf, fKey, fTs, _), i) =>
        fdf.select(
          (fKey.as("_k") +: fTs.as("_ts") +: lit(0).as("_side") +:
            nullStructsExcept(i)) ++:
            factCols.map(c => lit(null).cast(fact.schema(c).dataType).as(c)): _*)
    }
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = featureSides.foldLeft(factSide)(_ unionByName _)
    val withLasts = features.indices.foldLeft(carried) { (df, i) =>
      df.withColumn(s"_f$i", last(col(s"_f$i"), ignoreNulls = true).over(w))
    }
    withLasts.filter(col("_side") === 1)
      .select(factCols.map(col) ++
        features.zipWithIndex.flatMap { case ((prefix, _, _, _, vals), i) =>
          vals.map(c => col(s"_f$i.$c").as(s"${prefix}_$c"))
        }: _*)
  }

  /** AS-OF join: for each left row, the LATEST right row with
    * rTs <= left ts, per key — without a range join (which explodes
    * quadratically per key) and without a per-key collect.
    *
    * Merge-style composition: union both sides tagged (right sorts before
    * left at equal ts), then `last(right value, ignoreNulls)` over an
    * ordered per-key window carries the most recent right values forward
    * onto each left row. One shuffle on the key, O(n log n) per-key sort,
    * linear output — the plan a native as-of operator would produce.
    *
    * `rightVals` are the right-side value columns to carry (left columns all
    * pass through; carried columns get an `asof_` prefix). */
  def asofJoin(left: DataFrame, lKey: Column, lTs: Column, right: DataFrame,
               rKey: Column, rTs: Column, rightVals: Seq[String]): DataFrame = {
    val lCols = left.columns
    // carry the matched right ROW as one struct — per-column last(ignoreNulls)
    // would look past a genuinely-NULL right value to an older row, stitching
    // fields from different right rows together
    val rStructType = org.apache.spark.sql.types.StructType(
      rightVals.map(c => right.schema(c)))
    val l = left.select(
      (lKey.as("_k") +: lTs.as("_ts") +: lit(1).as("_side") +:
        lit(null).cast(rStructType).as("_rrow") +:
        lCols.map(c => col(c))): _*)
    val r = right.select(
      (rKey.as("_k") +: rTs.as("_ts") +: lit(0).as("_side") +:
        struct(rightVals.map(c => col(c).as(c)): _*).as("_rrow") +:
        lCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("_rrow", last(col("_rrow"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(lCols.map(col) ++
        rightVals.map(c => col(s"_rrow.$c").as(s"asof_$c")): _*)
  }

  /** Interval-overlap join WITHOUT a nested-loop plan: pairs of rows whose
    * closed time intervals [lStart,lEnd] and [rStart,rEnd] intersect.
    * A plain `ON ls <= re AND rs <= le` is a pure theta join — Spark plans
    * BroadcastNestedLoopJoin/Cartesian, O(n·m) compared at any scale.
    * Instead both sides explode onto an integer time grid (`gridSeconds`):
    * each interval emits one row per grid cell it covers, the join becomes
    * an EQUI hash join on the cell, and a pair is kept only in the single
    * cell containing the overlap start (`floor(max(ls,rs)/g)`) — so every
    * overlapping pair is emitted exactly once with NO distinct/dedup pass.
    *
    * Cost: rows_per_side × (interval_len/grid + 1) shuffled, hash-joined on
    * the cell — pick `gridSeconds` near the typical interval length so the
    * blow-up stays ≤ ~2×. Timestamps are compared at microsecond precision
    * (exact integers — testdata ts carries micros); touching endpoints
    * overlap with `overlap_us = 0`. Column names of the two inputs must be
    * disjoint (caller pre-aliases); output is all left columns, all right
    * columns, and `overlap_us` (BIGINT).
    */
  def intervalOverlapJoin(left: DataFrame, lStart: Column, lEnd: Column,
                          right: DataFrame, rStart: Column, rEnd: Column,
                          gridSeconds: Long): DataFrame = {
    require(gridSeconds > 0, s"gridSeconds must be positive: $gridSeconds")
    val dup = left.columns.toSet.intersect(right.columns.toSet)
    require(dup.isEmpty, s"overlapping column names: $dup")
    val g = gridSeconds * 1000000L
    // floor division valid for any sign: (x - pmod(x,g)) is g-divisible and
    // < 2^53, so the double division is exact
    def cellOf(c: Column): Column = ((c - pmod(c, lit(g))) / lit(g)).cast("long")
    val l = left
      .withColumn("_ls", unix_micros(lStart))
      .withColumn("_le", unix_micros(lEnd))
      .withColumn("_cell", explode(sequence(cellOf(col("_ls")), cellOf(col("_le")))))
    val r = right
      .withColumn("_rs", unix_micros(rStart))
      .withColumn("_re", unix_micros(rEnd))
      .withColumn("_rcell", explode(sequence(cellOf(col("_rs")), cellOf(col("_re")))))
    l.join(r,
        col("_cell") === col("_rcell") &&
          col("_ls") <= col("_re") && col("_rs") <= col("_le") &&
          col("_cell") === cellOf(greatest(col("_ls"), col("_rs"))))
      .withColumn("overlap_us",
        least(col("_le"), col("_re")) - greatest(col("_ls"), col("_rs")))
      .drop("_ls", "_le", "_cell", "_rs", "_re", "_rcell")
  }

  /** Skew-mitigating equi-join (the manual fallback when AQE's skew-join
    * split isn't available or the skew is in a single key): the left (fact)
    * side salts its key into `salts` sub-keys using a deterministic hash of
    * `saltSrc` (any well-distributed fact column, e.g. the row id); the right
    * side is exploded across all salt values. The hot key's rows spread over
    * `salts` reducers instead of one. Result == plain equi-join, bit-exact
    * for inner/left ONLY (enforced): a right/full join would emit each
    * unmatched right row once per salt value.
    * Right side grows ×salts — use for dim-sized right sides only. */
  def saltedJoin(left: DataFrame, leftKey: Column, saltSrc: Column,
                 right: DataFrame, rightKey: Column, salts: Int,
                 how: String = "inner"): DataFrame = {
    require(how == "inner" || how == "left" || how == "left_outer" ||
      how == "leftouter",
      s"saltedJoin supports inner/left only (got '$how'): right/full would " +
        "duplicate unmatched right rows once per salt")
    val l = left.withColumn("_salt",
      pmod(xxhash64(saltSrc), lit(salts)).cast("int"))
    val r = right.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    l.join(r, leftKey === rightKey && l("_salt") === r("_salt"), how)
      .drop("_salt")
  }

  /** Blocked fuzzy record linkage — the entity-resolution step between
    * exact dedup and human review (the reference hand-maintains plant-name
    * alias tables; this finds the aliases). Scale shape, in order:
    * (1) collapse records to the DISTINCT-name dictionary (exact
    * duplicates are [[graft.engine.Dedup]]'s job and would otherwise
    * square the output: measured 3.1M pairs on raw sf0.1 parts vs
    * dictionary-sized afterwards); (2) equi-join the dictionary to itself
    * on the caller's BLOCK key — fuzzy comparison is quadratic only
    * within a block, never across the corpus; (3) cheap length-band
    * prefilter (edit distance ≥ length difference, so |Δlen| > maxDist
    * can't match); (4) exact Levenshtein cut. Canonical ids are the
    * minimum record id per name — deterministic.
    * Output: `(l_id, r_id, l_name, r_name, dist)`, `l_id < r_id`.
    */
  def blockedLinkage(records: DataFrame, id: Column, name: Column,
                     block: Column => Column, maxDist: Int): DataFrame = {
    require(maxDist >= 1, s"maxDist >= 1: $maxDist")
    val dict = records.groupBy(name.as("_nm"))
      .agg(min(id).as("_cid"))
      .select(col("_cid"), col("_nm"), block(col("_nm")).as("_b"))
    val l = dict.select(col("_cid").as("l_id"), col("_nm").as("l_name"),
      col("_b"))
    val r = dict.select(col("_cid").as("r_id"), col("_nm").as("r_name"),
      col("_b"))
    l.join(r, "_b")
      .filter(col("l_id") < col("r_id"))
      .filter(abs(length(col("l_name")) - length(col("r_name"))) <= maxDist)
      .withColumn("dist",
        levenshtein(col("l_name"), col("r_name")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("l_id"), col("r_id"), col("l_name"), col("r_name"),
        col("dist"))
  }

  /** Runtime-filter (Bloom-prefiltered) selective join — the 100 TB shape
    * for "join a huge fact against a dim that touches a SLIVER of it":
    * one distributed aggregate condenses the dim's join keys into a few-MB
    * Bloom filter (driver holds only the bits — the IVF-centroid
    * model-state pattern); a codegen'd
    * [[graft.engine.expressions.BloomMightContain]] probe then rides the
    * fact SCAN as a map-only prefilter, so only might-matching rows enter
    * the join's shuffle. False positives (rate `fpp`) survive the
    * prefilter and die in the exact join — the result is bit-identical to
    * the plain join; false negatives are impossible. Spark's own runtime
    * bloom rewrite (spark.sql.optimizer.runtime.bloomFilter) makes the
    * same move opportunistically; this operator GUARANTEES it for joins
    * the pipeline knows are selective. Keys must be BIGINT (the probe is
    * putLong/mightContainLong on both sides).
    *
    * `expectedDistinct` sizes the filter (overestimating costs bits,
    * underestimating costs fpp); an empty dim yields an empty result
    * without scanning the fact into the shuffle. */
  def bloomPrefilteredJoin(fact: DataFrame, factKey: Column,
                           dim: DataFrame, dimKey: Column,
                           expectedDistinct: Long = 1000000L,
                           fpp: Double = 0.01): DataFrame = {
    val keyed = dim.select(dimKey.cast("long").as("_bk")).na.drop()
    // stat.bloomFilter NPEs on an empty input (its aggregate yields null);
    // the emptiness probe is one action on the DIM side — small by this
    // operator's contract
    if (keyed.isEmpty)
      return fact.filter(lit(false)).join(dim, factKey === dimKey)
    val bloom = keyed.stat.bloomFilter("_bk", math.max(1L, expectedDistinct),
      fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    val probe = org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.engine.expressions.BloomMightContain(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(
          factKey.cast("long")), bos.toByteArray))
    fact.filter(probe).join(dim, factKey === dimKey)
  }

  /** J4: fuzzy lookup — exact key match, else substring containment in either
    * direction, else a default (fetch_data/pv/database.py:211-223,
    * pv_test/init_db.py:145-177, default-Seoul fallback).
    *
    * Deterministic best-match ranking: exact < containment, then longest dim
    * key, then lexicographic. `id` must uniquely identify fact rows (the
    * window dedups multi-matches per row). Dim is broadcast; the theta-join
    * (contains) is a broadcast nested loop — fine because dims are tiny,
    * by construction of this operator. */
  def fuzzyLookup(fact: DataFrame, id: Column, factKey: Column, dim: DataFrame,
                  dimKey: Column, dimVal: Column, default: String): DataFrame = {
    val joined = fact.join(broadcast(dim),
        factKey === dimKey || factKey.contains(dimKey) || dimKey.contains(factKey),
        "left")
      .withColumn("_pri", when(factKey === dimKey, 0).otherwise(1))
    val w = Window.partitionBy(id)
      .orderBy(col("_pri").asc, length(dimKey).desc, dimKey.asc)
    joined.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .withColumn("matched", coalesce(dimVal, lit(default)))
      .drop("_pri", "_rn")
      .drop(dim.columns: _*)
  }
}
