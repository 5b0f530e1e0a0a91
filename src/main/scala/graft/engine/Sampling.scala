package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data mixing: choose per-stratum
  * fractions (by source, language, quality band, …) and keep a stable,
  * reproducible subset — the "40% web / 30% code / 30% books" step of a
  * corpus build.
  *
  * Unlike `df.sample`/`sampleBy` (per-partition RNG streams — the kept set
  * changes with partitioning, task retries and cluster size), the keep
  * decision here is a PURE FUNCTION of (id, salt): stable across runs and
  * re-layouts, safe to recompute after an executor loss, and monotone —
  * raising a stratum's fraction only ADDs rows, so sample growth between
  * pipeline versions is incremental, never a reshuffle of survivors. One
  * map-side filter; no shuffle, no RNG state, nothing to broadcast but the
  * literal fraction map.
  */
object Sampling {

  private val Buckets = 1000000L

  /** Uniform ppm bucket from the cross-engine md5 hash of `salt:id` —
    * first 32 md5 bits mod 10⁶, reproducible bit-for-bit in any engine
    * with md5 (DuckDB: `('0x'||substr(md5(s),1,8))::UBIGINT % 1000000`). */
  private def md5Ppm(id: Column, salt: Long): Column =
    conv(substring(md5(concat(id.cast("string"), lit(":" + salt))), 1, 8),
      16, 10).cast("long") % lit(Buckets)

  /** Keep a row iff `md5ppm(id, salt) < floor(10^6 × f(stratum))` — the
    * fraction is floor-quantized to integer ppm so the keep decision is an
    * integer comparison, bit-identical cross-engine (md5 is the hash every
    * engine shares; see assignSplit). Strata absent from `fractions` (and
    * null strata) get `defaultFraction` (0 = drop — the
    * decontamination-friendly default). Fractions are honored to ±binomial
    * noise (hash buckets are uniform; the realized count concentrates
    * around f·n like any Bernoulli sample). */
  def stratifiedSample(df: DataFrame, id: Column, stratum: Column,
                       fractions: Map[String, Double], salt: Long = 0L,
                       defaultFraction: Double = 0.0): DataFrame = {
    require((fractions.values ++ Seq(defaultFraction))
      .forall(f => f >= 0.0 && f <= 1.0), "fractions must be in [0, 1]")
    // stratum is cast to string so non-string stratum columns (int source
    // ids, bucketed doubles) work against the string-keyed fraction map
    val frac = coalesce(
      element_at(typedlit(fractions), stratum.cast("string")),
      lit(defaultFraction))
    df.filter(md5Ppm(id, salt) <
      floor(frac * lit(Buckets.toDouble)).cast("long"))
  }

  /** Per-stratum fractions that realize target mix `shares` (relative
    * weights) at the LARGEST total the corpus supports: the binding stratum
    * (smallest count/weight) is taken whole; every other stratum is
    * down-sampled to match. Pure arithmetic — unit-testable without Spark. */
  private[graft] def mixFractions(counts: Map[String, Long],
                                  shares: Map[String, Double]): Map[String, Double] = {
    require(shares.values.forall(_ >= 0.0), "shares must be >= 0")
    val active = shares.filter { case (s, w) => w > 0 && counts.getOrElse(s, 0L) > 0 }
    require(active.nonEmpty, "no stratum has both weight > 0 and rows > 0")
    val total = active.map { case (s, w) => counts(s) / w }.min
    shares.map { case (s, w) =>
      val n = counts.getOrElse(s, 0L)
      s -> (if (n == 0 || w == 0) 0.0 else math.min(1.0, w * total / n))
    }
  }

  /** Mix the corpus to target proportions: count each stratum (ONE
    * aggregate; the driver holds only the #strata-sized count map — a model,
    * not data), derive fractions via [[mixFractions]], then
    * [[stratifiedSample]]. Realized proportions carry the same binomial
    * noise as the underlying hash sample. */
  def mixToShares(df: DataFrame, id: Column, stratum: Column,
                  shares: Map[String, Double], salt: Long = 0L): DataFrame = {
    val counts = df.groupBy(stratum.cast("string").as("_s")).count().collect()
      .collect { case r if !r.isNullAt(0) => r.getString(0) -> r.getLong(1) }
      .toMap
    stratifiedSample(df, id, stratum, mixFractions(counts, shares), salt)
  }

  /** Deterministic EXACT-k sample per stratum (eval-set construction: "pick
    * exactly 100 docs per source"): rank rows by the first 32 md5 bits of
    * `salt:id` within the stratum (ties → lower id) and keep the k
    * smallest — a pure function of (id, salt) like [[stratifiedSample]],
    * but with exact counts instead of binomial noise. md5 (not xxhash64)
    * keeps the ranking reproducible in any engine, so the selection is
    * oracle-checkable as `row_number() OVER (PARTITION BY stratum ORDER BY
    * md5rank, id) <= k`. Runs as the bounded top-k partial aggregation
    * ([[graft.engine.Similarity.boundedTopK]]): every task reduces to ≤ k
    * candidates per stratum before the shuffle — no per-stratum sort, no
    * single-task funnel, unlike the row_number window this replaces.
    * Output: the selected (stratum, id) pairs. */
  def exactKPerStratum(df: DataFrame, id: Column, stratum: Column,
                       k: Int, salt: Long = 0L): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val rank = conv(substring(
      md5(concat(col("_id").cast("string"), lit(":" + salt))), 1, 8), 16, 10)
      .cast("long").cast("double")
    df.select(stratum.cast("string").as("stratum"), id.as("_id"))
      .groupBy(col("stratum"))
      .agg(Similarity.boundedTopK(-rank, col("_id"), k).as("_tk"))
      .select(col("stratum"), explode(col("_tk.id")).as("id"))
  }

  /** Per-key frequency cap (the web-pipeline domain cap: at most k docs per
    * registrable domain): rank rows by the cross-engine md5 hash of the id
    * (uniform — independent of crawl order) and keep the k smallest per key
    * via the bounded top-k partial aggregation
    * ([[graft.engine.Similarity.boundedTopK]]) — every task reduces to ≤ k
    * candidates per key BEFORE the shuffle, so a giant domain never funnels
    * into one task the way a `row_number` window would. The kept-id set is
    * ≤ k × #keys — DATA-cardinality-dependent (for the domain-cap use,
    * #keys = #registrable domains: tens of millions at web scale), so no
    * broadcast hint is forced: AQE picks broadcast when the kept set turns
    * out small and degrades to a shuffled semi join when it doesn't — a
    * forced broadcast of k × 10⁷ ids would ship GBs to every executor
    * (and OOM the driver) regardless of AQE thresholds. Ids must be
    * unique (they key the semi join). */
  def capPerKey(df: DataFrame, id: Column, key: Column, k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val rank = conv(substring(md5(col("_id").cast("string")), 1, 8), 16, 10)
      .cast("long").cast("double")
    val kept = df.select(id.cast("long").as("_id"), key.as("_key"))
      .groupBy(col("_key"))
      .agg(Similarity.boundedTopK(-rank, col("_id"), k).as("_tk"))
      .select(explode(col("_tk.id")).as("_id"))
    df.join(kept, id.cast("long") === col("_id"), "left_semi")
  }

  /** Temperature-flattened source resampling (α = 1/2): per-stratum keep
    * rate r = min(1, c·n^(α−1)) = min(1, c/√n), the multilingual/multi-
    * corpus rebalancing rule (XLM-R's temperature sampling; the Pile's
    * source weighting) that shrinks large sources toward the flattened
    * distribution while keeping small ones whole. α is fixed at 1/2: √ is
    * the one non-integer power IEEE 754 evaluates correctly-rounded, so the
    * rate — floor-quantized to integer ppm — is bit-identical in any
    * engine and the operator stays oracle-checkable (general powers via
    * exp/ln are not). Keep decision = md5-uniform(salt:id) < rate_ppm:
    * deterministic, partition-free, monotone in c (raising c only ADDS
    * rows). One model-scale count aggregate broadcasts back; data rows
    * never shuffle. Output: input columns + `rate_ppm`. */
  def temperatureMix(df: DataFrame, id: Column, stratum: Column,
                     c: Double, salt: String = "tmix"): DataFrame = {
    require(c > 0, s"c must be positive: $c")
    val rates = df.groupBy(stratum.as("_s"))
      .agg(count(lit(1)).as("_n"))
      .select(col("_s"),
        floor(least(lit(1.0), lit(c) / sqrt(col("_n"))) * lit(1000000.0))
          .cast("long").as("rate_ppm"))
    val u = conv(substring(
      md5(concat(lit(salt + ":"), id.cast("string"))), 1, 8), 16, 10)
      .cast("long") % lit(1000000L)
    df.join(broadcast(rates), stratum === col("_s"))
      .filter(u < col("rate_ppm"))
      .drop("_s")
  }

  /** Contrastive negative sampling: for each row, `k` pseudo-random OTHER
    * rows of the corpus as negatives — deterministic, self-pair-free,
    * exactly uniform over the n−1 other rows. A contrastive training set
    * (anchor, positive, negatives…) needs this at corpus scale without a
    * cartesian "sample others per anchor" scan.
    *
    * Mechanism: a seeded global position index ([[Order.seededShuffle]]'s
    * md5 total order) makes rows addressable by integer position; each
    * (anchor, t ∈ 1..k) draws `j0 = md5₃₂(id:t:seed) mod (n−1)` and skips
    * its own slot (`j = j0 + 1` when `j0 >= pos`) — a bijection from
    * [0, n−2] onto the other positions, so uniformity needs no rejection
    * loop; ONE hash join on the drawn position resolves negative ids.
    * Cost: the index build (one range-shuffle sort, reused for anchors and
    * lookups via localCheckpoint — at 100 TB sink the (id, pos) index to
    * parquet once instead) + a k·n ⋈ n equi join. All integer/md5
    * arithmetic → cross-engine exact, oracle-checkable.
    * Output: (anchor_id, t, neg_id). */
  def negativeSamples(df: DataFrame, id: Column, k: Int, seed: Long,
                      numParts: Int = 32): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val indexed = Order.seededShuffle(df.select(id.as("anchor_id")),
        col("anchor_id"), seed, numShards = 1, numParts = numParts)
      .select(col("anchor_id"), col("pos"))
      .localCheckpoint() // materialize once: count + anchors + lookup side
    val n = indexed.count()
    require(n > 1, s"need at least 2 rows to draw negatives (got $n)")
    val drawn = indexed
      .withColumn("t", explode(array((1 to k).map(t => lit(t.toLong)): _*)))
      .withColumn("_j0",
        conv(substring(md5(concat(col("anchor_id").cast("string"), lit(":"),
          col("t").cast("string"), lit(":" + seed))), 1, 8), 16, 10)
          .cast("long") % lit(n - 1))
      .withColumn("_j",
        when(col("_j0") >= col("pos"), col("_j0") + 1).otherwise(col("_j0")))
    drawn.join(indexed.select(col("pos").as("_j"),
        col("anchor_id").as("neg_id")), "_j")
      .select(col("anchor_id"), col("t"), col("neg_id"))
  }

  /** Deterministic train/val/test split assignment: bucket =
    * first-32-bits-of-md5(id) / 2³², assigned to the first split whose
    * cumulative fraction exceeds it. A pure function of the id — stable
    * across runs, partitionings and engines (md5 is cross-engine, unlike
    * xxhash64, so the assignment is DuckDB-oracle-checkable), disjoint and
    * exhaustive by construction, and a doc never migrates between splits
    * when fractions are only appended to. Map-side only: no shuffle, no RNG.
    * `splits` = ordered (name, fraction) with fractions summing to 1. */
  def assignSplit(df: DataFrame, id: Column,
                  splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0.0),
      "split fractions must be positive")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1: ${splits.map(_._2).sum}")
    val bucket = conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
      .cast("long").cast("double") / 4294967296.0
    val cuts = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    val assigned = splits.init.zip(cuts.init)
      .foldRight(lit(splits.last._1): Column) { case (((name, _), cut), acc) =>
        when(bucket < cut, lit(name)).otherwise(acc)
      }
    df.withColumn("split", assigned)
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-Res,
    * determinized): draw k rows with inclusion driven by a positive
    * integer weight, as one distributed top-k — no rejection loop, no
    * sequential pass, no RNG state. Each row's E-S key u^(1/w) is taken
    * in rank-equivalent integer form:
    * {{{
    *   u         = (md5₃₂(id:salt) + 1) / 2³²          ∈ (0, 1]
    *   lnq_micro = floor(10⁶ · ln u)                   [per-item quantize]
    *   key_micro = floorDiv(lnq_micro, w)              [integer, w ≥ 1]
    * }}}
    * ln is the one transcendental and is quantized to integer micro-nats
    * BEFORE any further arithmetic (the repo's micro-nat rule, same as
    * the LM scores); floorDiv (not truncation — lnq is negative) keeps
    * the division floor-exact in both engines, and key_micro is monotone
    * in ln(u)/w for integer w ≥ 1, so top-k by (key desc, id) is the E-S
    * sample. Weights below 1 fail loudly per row (counted, not assumed).
    *
    * 100 TB shape: map-side key computation + TakeOrderedAndProject —
    * every task reduces to its local k before anything moves, so only
    * k·partitions rows ever reach the driver-side merge.
    * Output: (id, w, key_micro), best key first.
    */
  def weightedSample(df: DataFrame, id: Column, weight: Column, k: Int,
                     salt: Long = 7L): DataFrame = {
    require(k >= 1, s"k >= 1: $k")
    val w = when(weight.cast("long") >= 1L, weight.cast("long"))
      .otherwise(raise_error(concat(lit("weightedSample: weight < 1 for id="),
        id.cast("string"))))
    val u = (conv(substring(md5(concat(id.cast("string"), lit(":" + salt))),
      1, 8), 16, 10).cast("long") + lit(1L)) / lit(4294967296.0)
    val scored = df.select(id.as("id"), w.as("w"),
        floor(log(u) * lit(1000000.0)).cast("long").as("_lnq"))
      .select(col("id"), col("w"),
        ((col("_lnq") - pmod(col("_lnq"), col("w"))) / col("w"))
          .cast("long").as("key_micro"))
    scored.orderBy(col("key_micro").desc, col("id")).limit(k)
  }

  /** Group-aware k-fold assignment: every row of a group lands in the
    * same fold (`fold = md5₃₂(group:salt) mod k`), so no group ever
    * straddles a train/eval boundary — the leakage-safe CV split for
    * grouped corpora (all pages of a domain, all readings of a meter).
    * Pure map-side expression: no shuffle, deterministic across runs,
    * partitionings and engines (md5, not xxhash64 — oracle-checkable).
    */
  def groupKFold(df: DataFrame, group: Column, k: Int,
                 salt: Long = 7L): DataFrame = {
    require(k >= 1, s"k >= 1: $k")
    df.withColumn("fold",
      pmod(conv(substring(md5(concat(group.cast("string"),
        lit(":" + salt))), 1, 8), 16, 10).cast("long"), lit(k.toLong)))
  }
}
