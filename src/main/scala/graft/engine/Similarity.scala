package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`embeddings.embedding: array<float>`).
  *
  *  - [[cosineTopK]] — brute-force exact baseline: broadcast the (small)
  *    query set against the corpus; cosine via `zip_with` + `aggregate`
  *    (codegen'd higher-order functions, no UDF). Linear in corpus size —
  *    correct at any scale when the query set is small.
  *  - [[lshCosineTopK]] — the scale path: random-hyperplane LSH. Each vector
  *    gets a `bits`-bit sign signature against deterministic pseudo-random
  *    hyperplanes; candidates share a signature band; exact cosine reranks
  *    within buckets. Corpus is touched once to sign, then only bucket
  *    collisions are scored — no corpus×query cross join.
  */
object Similarity {

  /** array<float> → array<double> once, up front. */
  def asDouble(vec: Column): Column = transform(vec, _.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))

  /** Cosine via higher-order functions — kept as the reference formulation
    * (and for engines without the extension); HOFs evaluate interpreted. */
  def cosineHof(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine via the native codegen'd expression
    * ([[graft.engine.expressions.CosineSimilarity]]) — identical semantics,
    * one fused Java loop inside whole-stage codegen. */
  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.engine.expressions.CosineSimilarity(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** Per-group bounded top-k aggregate column: the k best (id, score) pairs,
    * best first (score desc, ties to the lower id) — the partial-aggregation
    * replacement for the `row_number().over(partitionBy(g))` rerank idiom;
    * see [[graft.engine.expressions.BoundedTopK]]. */
  def boundedTopK(score: Column, id: Column, k: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.engine.expressions.BoundedTopK(
      ColumnBridge.expression(score), ColumnBridge.expression(id), k)
      .toAggregateExpression())
  }

  /** (qid, cid, cos) candidates → per-query top-k as (qid, cid, cos, rn).
    * Bounded partial aggregation: each task reduces to ≤ k entries per query
    * BEFORE the shuffle, so no single task ever assembles a query's full
    * candidate set (the window-rerank hotspot at corpus scale). Bit-exact vs
    * `row_number().over(orderBy(cos.desc, cid.asc))` — same tie-breaks. */
  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy(col("qid"))
      .agg(boundedTopK(col("cos"), col("cid"), k).as("_tk"))
      .select(col("qid"), posexplode(col("_tk")).as(Seq("_p", "_s")))
      .select(col("qid"), col("_s.id").as("cid"), col("_s.score").as("cos"),
        (col("_p") + 1).cast("long").as("rn"))

  /** Exact top-k by cosine for each query vector (query ids from the same
    * table). Queries are broadcast; one pass over the corpus. */
  def cosineTopK(emb: DataFrame, id: Column, vec: Column,
                 queryIds: Seq[Long], k: Int): DataFrame = {
    val corpus = emb.select(id.as("cid"), asDouble(vec).as("cv"))
    val queries = corpus.filter(col("cid").isin(queryIds: _*))
      .select(col("cid").as("qid"), col("cv").as("qv"))
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"),
        round(cosine(col("cv"), col("qv")), 6).as("cos"))
    topKPerQuery(scored, k)
  }

  /** Embedding-cosine near-dup pairs, exact: every (id1 < id2) pair with
    * cosine >= tau. Quadratic — the small-scale baseline/oracle; the corpus
    * path is [[lshCosinePairs]]. The right side is broadcast (nested-loop
    * join on the inequality), so use only when one side fits in memory. */
  def cosinePairs(emb: DataFrame, id: Column, vec: Column,
                  tau: Double): DataFrame = {
    // spread the probe side: a small single-file scan otherwise feeds the
    // nested-loop join as ONE partition and the whole n²/2 cosine pass
    // runs on one core (r13 StageProfile: 2.4 s wall = one 2.4 s task) —
    // no-op at real corpus scale (spreadForCpu's stats cutoff)
    val a = TextOps.spreadForCpu(emb.select(id.as("id1"),
      asDouble(vec).as("v1")))
    val b = emb.select(id.as("id2"), asDouble(vec).as("v2"))
    a.join(broadcast(b), col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        round(cosine(col("v1"), col("v2")), 6).as("cos"))
      .filter(col("cos") >= tau)
  }

  /** Cross-corpus embedding decontamination, exact: every (corpus, bench)
    * pair with cosine >= tau — the embedding-space twin of
    * [[graft.engine.NearDup.contaminationPairs]] (catches paraphrased eval
    * items that shingle overlap misses). The bench side broadcasts (it is
    * orders of magnitude smaller than the corpus; the corpus never
    * shuffles). At corpus scale with a LARGE bench side, tag both frames
    * and run [[lshCosinePairs]] over the union instead — banded, never
    * quadratic. Output: (corpus_id, bench_id, cos). */
  def crossCosinePairs(corpus: DataFrame, corpusId: Column, corpusVec: Column,
                       bench: DataFrame, benchId: Column, benchVec: Column,
                       tau: Double): DataFrame = {
    // deliberately NOT spread (r13 measured 0.24 → 0.38 s with it): unlike
    // [[cosinePairs]], the per-row work here is one cosine against a SMALL
    // broadcast bench set — cheaper than the shuffle a spread adds
    val c = corpus.select(corpusId.as("corpus_id"),
      asDouble(corpusVec).as("cv"))
    val b = bench.select(benchId.as("bench_id"), asDouble(benchVec).as("bv"))
    c.crossJoin(broadcast(b))
      .select(col("corpus_id"), col("bench_id"),
        round(cosine(col("cv"), col("bv")), 6).as("cos"))
      .filter(col("cos") >= tau)
  }

  /** Packed SRP signature (ceil(bits/64) longs) via the native codegen'd
    * expression [[graft.engine.expressions.SrpSignature]] — one fused
    * bits×dim loop, computed ONCE per corpus vector. */
  def srpSignature(vec: Column, bits: Int, dim: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.engine.expressions.SrpSignature(
      ColumnBridge.expression(vec), bits, dim))
  }

  /** Hamming distance between packed signatures — native codegen'd
    * xor+popcount ([[graft.engine.expressions.HammingDistance]]); this is the
    * LSH join's post-match filter, evaluated once per bucket collision. */
  def hamming(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.engine.expressions.HammingDistance(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** SRP-LSH banding geometry: `bands` chunks of `rowsPerBand` signature
    * bits each over a `bits`-bit signature (bits >= bands*rowsPerBand; the
    * surplus sharpens the Hamming prefilter). Derive from corpus size with
    * [[srpGeometry]]. */
  final case class SrpGeometry(bits: Int, bands: Int, rowsPerBand: Int)

  /** Derive SRP-LSH geometry from corpus size — the measured scale rule
    * (SCALE.md "ScaleCurve"): a FIXED geometry has a fixed bucket count per
    * band (2^rowsPerBand), so per-bucket occupancy grows with n and
    * candidate pairs with n² — ScaleCurve measured exponent 1.21 at a 10×
    * step under the old bands=24 × rowsPerBand=4 defaults, vs sub-linear
    * once rows-per-band scales with log n.
    *
    *  - `rowsPerBand` r: smallest r with 2^r >= n / rowsPerBucket (floor 4)
    *    — bucket count tracks n so expected occupancy stays ~rowsPerBucket
    *    and background collision mass per band stays ~linear in n.
    *  - `bands`: enough band-OR draws to reach `targetRecall` for a pair AT
    *    the threshold: per-bit agreement p = 1 − acos(tau)/π, band collision
    *    p^r, so bands = ceil(ln(1/(1−recall)) / p^r). This is the n^ρ
    *    (ρ = ln p / ln(bucket growth) ≈ 0.65 at tau 0.4) term LSH theory
    *    charges for a weak threshold — it grows polynomially, not by
    *    hand-tuning.
    *  - `bits`: bands·r rounded up to a word, floored at 256 so the
    *    full-signature Hamming prefilter keeps discriminating (at 64 bits
    *    the tau-0.4 cut admits the background mean).
    *
    * Fails loudly (rather than silently exploding the banded shuffle) when
    * the derived bands exceed 4096 — at that point SRP at this tau/recall
    * costs more than the IVF/PQ path ([[ivfCosineTopKWith]] /
    * [[pqAdcTopKWith]]); raise tau or lower targetRecall deliberately. */
  def srpGeometry(n: Long, tau: Double = 0.4, targetRecall: Double = 0.92,
                  rowsPerBucket: Int = 128): SrpGeometry = {
    require(n > 0, s"srpGeometry: corpus size must be positive: $n")
    require(tau > 0 && tau < 1, s"srpGeometry: tau in (0,1): $tau")
    require(targetRecall > 0 && targetRecall < 1,
      s"srpGeometry: targetRecall in (0,1): $targetRecall")
    require(rowsPerBucket >= 1)
    val p = 1.0 - math.acos(tau) / math.Pi
    val r = math.max(4,
      math.ceil(math.log(n.toDouble / rowsPerBucket) / math.log(2.0)).toInt)
    require(r <= 62, s"srpGeometry: corpus size $n out of range")
    val bands = math.ceil(
      math.log(1.0 / (1.0 - targetRecall)) / math.pow(p, r)).toInt
    require(bands <= 4096,
      s"srpGeometry: n=$n at tau=$tau needs $bands bands (> 4096) for " +
        s"recall $targetRecall — SRP-LSH banding would cost more than the " +
        "IVF/PQ ANN path at this scale; raise tau, lower targetRecall, or " +
        "use ivfCosineTopKWith/pqAdcTopKWith (SCALE.md).")
    SrpGeometry(math.max(256, ((bands * r + 63) / 64) * 64), bands, r)
  }

  /** Hamming cut for "cosine >= tau" on a bits-bit SRP signature: expected
    * Hamming fraction of a pair AT the threshold is acos(tau)/π; allow
    * `zSlack` standard deviations above it so threshold-grazing true pairs
    * still pass (z=2.5 → ~0.6% per-pair miss), while background pairs
    * (fraction ≈ 0.5) are overwhelmingly cut. */
  private[graft] def hammingCut(tau: Double, bits: Int,
                                zSlack: Double = 2.5): Int = {
    val p = math.acos(tau) / math.Pi
    math.ceil(bits * p + zSlack * math.sqrt(bits * p * (1 - p))).toInt
  }

  /** Hamming-prefilter width: the prefilter rides the banded shuffle as a
    * PREFIX of the signature capped at 256 bits (4 words, 32 bytes), so the
    * per-row shuffle payload stays O(1) as [[srpGeometry]] grows the banding
    * with corpus size (an 832-bit derived signature would otherwise ship 13
    * words per banded row — the banding bits beyond the prefix exist to
    * DEFINE buckets, not to be re-shipped). 512 is the measured knee: at
    * 256 the z=2.5 cut sits only ~1.75 background sd below the mean and
    * ~4% of background candidates leak into the rerank joins (measured
    * +20% wall on the 10× corpus); at 512 leakage is ~2e-4 while the
    * payload stays 64 B/row. For bits <= 512 the prefix is the full
    * signature and behavior is unchanged (the 64-bit `q_srp_fixed` oracle
    * and both 256-bit default paths). */
  private def prefilterBits(bits: Int): Int = math.min(bits, 512)

  /** Shared signing+banding stage: (vectors as (cid, cv, sig), banded rows as
    * (cid, sig, band, chunk)) — `sig` in the banded frame is the
    * [[prefilterBits]] PREFIX of the signature (see above). The first
    * bands×rowsPerBand signature bits are the band chunks (a chunk
    * straddling a word boundary is stitched from both words — any
    * rowsPerBand in [1, 62] works, so [[srpGeometry]] can grow it smoothly
    * with log n). For rowsPerBand dividing 64 the chunk values are
    * bit-identical to the historical word-aligned extraction (the
    * `q_srp_fixed` oracle pins the 8×8/64 layout cross-engine). */
  private[graft] def bandedSignatures(emb: DataFrame, id: Column, vec: Column,
                                      bits: Int, bands: Int, rowsPerBand: Int,
                                      dim: Int): (DataFrame, DataFrame) = {
    require(bands * rowsPerBand <= bits, "bands*rowsPerBand must fit in bits")
    require(rowsPerBand >= 1 && rowsPerBand <= 62,
      s"rowsPerBand in [1, 62]: $rowsPerBand")
    val vecs = emb.select(id.as("cid"), asDouble(vec).as("cv"))
      .withColumn("sig", srpSignature(col("cv"), bits, dim))
    val banded = bandSignatureFrame(vecs, bits, bands, rowsPerBand)
    (vecs.drop("sig"), banded)
  }

  /** Banding as a VIEW over a signature column: (…, sig) → (…, sig-prefix,
    * band, chunk) — the bit-slicing half of [[bandedSignatures]], shared
    * with the presigned incremental path (a persisted signature table
    * re-bands under any geometry whose bands×rowsPerBand fit its width —
    * no recompute on a geometry step). Chunk extraction is the native
    * [[graft.engine.expressions.BandChunks]] loop: the unrolled Column
    * form generated O(bands) code in one method and blew Janino's 64 KB
    * limit (silent interpreted fallback) at derived geometries past ~150
    * bands — measured r13 at 401 bands / n=200k. */
  private def bandSignatureFrame(sigs: DataFrame, bits: Int, bands: Int,
                                 rowsPerBand: Int): DataFrame = {
    require(bands * rowsPerBand <= bits, "bands*rowsPerBand must fit in bits")
    require(rowsPerBand >= 1 && rowsPerBand <= 62,
      s"rowsPerBand in [1, 62]: $rowsPerBand")
    val pWords = (prefilterBits(bits) + 63) / 64
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val chunks = ColumnBridge.column(graft.engine.expressions.BandChunks(
      ColumnBridge.expression(col("sig")), bands, rowsPerBand))
    sigs.select(col("cid"), slice(col("sig"), 1, pWords).as("sig"),
      posexplode(chunks).as(Seq("band", "chunk")))
  }

  /** Embedding-cosine near-dup pairs at scale — three stages, none quadratic
    * in materialized rows:
    *  1. BLOCK: candidates share >= 1 LSH band chunk (shuffle on
    *     (band, chunk) buckets, ids+signature only — never the vectors).
    *  2. PREFILTER: Hamming distance over the full bits-bit signature,
    *     evaluated INSIDE the join as a post-match filter (native
    *     xor+popcount) — bucket collisions stream through it without
    *     materializing; survivors are the only rows that ever carry ids
    *     downstream.
    *  3. RERANK: exact cosine on the deduped survivors (vectors re-attached;
    *     at this corpus size Catalyst picks broadcast joins), threshold tau.
    *
    * Defaults (bits=256, 24 bands × 4 rows) are tuned for recall >= 0.9 at
    * tau=0.4 — a HARD threshold for SRP (pairs at 66°, background at 90°):
    * band-OR recall ≈ 0.98, Hamming-cut recall ≈ 0.99 at the threshold —
    * AND for corpora up to ~10^4 vectors only: a fixed geometry has a fixed
    * bucket count (2^rowsPerBand per band), so occupancy grows with n and
    * candidate pairs with n² (ScaleCurve measured exp 1.21 at a 10× step).
    * Beyond `maxRowsPerBucket` expected rows per bucket the call fails
    * loudly (stats-estimated corpus size — the theilSenSlopeByKey maxDays
    * pattern): switch to [[lshCosinePairsAuto]], which derives the geometry
    * from the corpus size via [[srpGeometry]], or raise `maxRowsPerBucket`
    * deliberately. Recall < 1 by design; floor asserted against
    * [[cosinePairs]] in SimilaritySpec. */
  def lshCosinePairs(emb: DataFrame, id: Column, vec: Column, tau: Double,
                     bits: Int = 256, bands: Int = 24, rowsPerBand: Int = 4,
                     dim: Int = 64, maxRowsPerBucket: Int = 1024): DataFrame = {
    val nEst = estimatedRows(emb, dim)
    require(nEst <= (1L << rowsPerBand) * maxRowsPerBucket,
      s"lshCosinePairs: ~$nEst corpus rows over ${1 << rowsPerBand} " +
        s"buckets/band (rowsPerBand=$rowsPerBand) exceeds " +
        s"$maxRowsPerBucket rows/bucket — a fixed geometry goes quadratic " +
        "here (measured, SCALE.md). Use lshCosinePairsAuto(corpusSize) to " +
        "derive the geometry, or raise maxRowsPerBucket deliberately.")
    lshCosinePairsCore(emb, id, vec, tau, bits, bands, rowsPerBand, dim)
  }

  /** [[lshCosinePairs]] with geometry DERIVED from the (caller-known)
    * corpus size via [[srpGeometry]] — the default entry point at scale:
    * rows-per-band grows with log n so bucket occupancy (and with it the
    * candidate-pair mass) stays ~linear, at `targetRecall` for pairs at the
    * threshold. */
  def lshCosinePairsAuto(emb: DataFrame, id: Column, vec: Column, tau: Double,
                         corpusSize: Long, dim: Int = 64,
                         targetRecall: Double = 0.92): DataFrame = {
    val g = srpGeometry(corpusSize, tau, targetRecall)
    lshCosinePairsCore(emb, id, vec, tau, g.bits, g.bands, g.rowsPerBand, dim)
  }

  private def lshCosinePairsCore(emb: DataFrame, id: Column, vec: Column,
                                 tau: Double, bits: Int, bands: Int,
                                 rowsPerBand: Int, dim: Int): DataFrame = {
    val (vecs, banded) = bandedSignatures(emb, id, vec, bits, bands,
      rowsPerBand, dim)
    val maxHam = hammingCut(tau, prefilterBits(bits))
    val l = banded.select(col("band"), col("chunk"), col("cid").as("id1"),
      col("sig").as("sig1"))
    val r = banded.select(col("band"), col("chunk"), col("cid").as("id2"),
      col("sig").as("sig2"))
    // bucket keys are few (bands × 2^rowsPerBand) and duplicate-heavy —
    // a sort-merge join buffers every many-to-many key group; hash join
    // streams the probe side through it instead (measured at the 10× step)
    l.join(r.hint("shuffle_hash"), Seq("band", "chunk"))
      .filter(col("id1") < col("id2") &&
        hamming(col("sig1"), col("sig2")) <= maxHam)
      .select(col("id1"), col("id2"))
      .dropDuplicates("id1", "id2")
      .join(vecs.select(col("cid").as("id1"), col("cv").as("v1")), "id1")
      .join(vecs.select(col("cid").as("id2"), col("cv").as("v2")), "id2")
      .select(col("id1"), col("id2"),
        round(cosine(col("v1"), col("v2")), 6).as("cos"))
      .filter(col("cos") >= tau)
  }

  /** Incremental twin of [[lshCosinePairs]] for the daily-batch regime:
    * only the INCOMING batch's banded signatures PROBE the union buckets —
    * existing↔existing pairs never re-form, so a daily embedding-dedup run
    * costs O(batch × bucket occupancy), not a full-corpus self-join
    * re-formed every day (the
    * [[graft.engine.NearDup.minhashLshPairsIncremental]] shape on the
    * banded SRP join). Because the SRP signature, the Hamming prefilter,
    * and the exact-cosine rerank are all pure per-row / per-pair
    * functions, the result EQUALS the full [[lshCosinePairs]] run over
    * (existing ∪ incoming) restricted to pairs touching the batch —
    * SimilaritySpec asserts that law at both geometries, and the
    * fixed-geometry oracle twin (`q_srp_incr_fixed`) replays it in SQL as
    * the full-twin query plus a batch-membership predicate. Same loud
    * fixed-geometry guard as the full run, fed by the UNION's estimated
    * size; at real scale prefer [[lshCosinePairsIncrementalAuto]]. */
  def lshCosinePairsIncremental(existing: DataFrame, incoming: DataFrame,
                                id: Column, vec: Column, tau: Double,
                                bits: Int = 256, bands: Int = 24,
                                rowsPerBand: Int = 4, dim: Int = 64,
                                maxRowsPerBucket: Int = 1024): DataFrame = {
    val nEst = estimatedRows(existing, dim) + estimatedRows(incoming, dim)
    require(nEst <= (1L << rowsPerBand) * maxRowsPerBucket,
      s"lshCosinePairsIncremental: ~$nEst union rows over " +
        s"${1 << rowsPerBand} buckets/band (rowsPerBand=$rowsPerBand) " +
        s"exceeds $maxRowsPerBucket rows/bucket — a fixed geometry goes " +
        "quadratic here (measured, SCALE.md). Use " +
        "lshCosinePairsIncrementalAuto(corpusSize) to derive the " +
        "geometry, or raise maxRowsPerBucket deliberately.")
    lshCosinePairsIncrementalCore(existing, incoming, id, vec, tau, bits,
      bands, rowsPerBand, dim)
  }

  /** [[lshCosinePairsIncremental]] with geometry DERIVED from the
    * caller-known (existing + incoming) corpus size via [[srpGeometry]] —
    * the default daily-batch entry point at scale. The geometry must come
    * from the UNION size: a growing corpus eventually crosses a
    * rows-per-band step, and when it does the existing side simply
    * re-bands under the new chunk width (signatures themselves are
    * geometry-independent up to `bits`, so nothing is invalidated). */
  def lshCosinePairsIncrementalAuto(existing: DataFrame, incoming: DataFrame,
                                    id: Column, vec: Column, tau: Double,
                                    corpusSize: Long, dim: Int = 64,
                                    targetRecall: Double = 0.92)
      : DataFrame = {
    val g = srpGeometry(corpusSize, tau, targetRecall)
    lshCosinePairsIncrementalCore(existing, incoming, id, vec, tau, g.bits,
      g.bands, g.rowsPerBand, dim)
  }

  /** Map-side bucket pruning for the incremental probe join: condense the
    * batch's (band, chunk) key set into a driver-held Bloom filter (three
    * BATCH-sized jobs: emptiness, distinct-count calibration, build; the
    * filter then rides the [[graft.engine.expressions.BloomMightContain]]
    * expression into every task) and drop the corpus-side banded rows
    * whose bucket no probe touches BEFORE they shuffle. No false
    * negatives, and a false positive merely ships a row that fails the
    * join-key match — results are bit-identical (covered by the
    * incremental == restricted-full-run spec law). At toy scale the
    * probe touches nearly every bucket (derived geometry keeps bucket
    * count ≈ n/128, so any batch larger than that count covers them
    * all); in the true daily-batch regime (batch ≪ corpus/128) this is
    * the difference between shuffling corpus×bands banded rows and
    * shuffling only the probed fraction — measured at the 100× step
    * (SCALE.md). An empty batch prunes everything (and sidesteps
    * `stat.bloomFilter`'s empty-input NPE). */
  private def pruneToProbedBuckets(exBanded: DataFrame,
                                   inBanded: DataFrame): DataFrame = {
    val keys = inBanded.select(xxhash64(col("band"), col("chunk")).as("k"))
    if (keys.isEmpty) exBanded.limit(0)
    else {
      val expected = math.max(keys.distinct().count(), 1L)
      val bloom = keys.stat.bloomFilter("k", expected, 0.01)
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      val bytes = bos.toByteArray
      import org.apache.spark.sql.graftbridge.ColumnBridge
      exBanded.filter(ColumnBridge.column(
        graft.engine.expressions.BloomMightContain(
          ColumnBridge.expression(xxhash64(col("band"), col("chunk"))),
          bytes)))
    }
  }

  private def lshCosinePairsIncrementalCore(existing: DataFrame,
                                            incoming: DataFrame, id: Column,
                                            vec: Column, tau: Double,
                                            bits: Int, bands: Int,
                                            rowsPerBand: Int,
                                            dim: Int): DataFrame = {
    val (exVecs, exBanded) = bandedSignatures(existing, id, vec, bits,
      bands, rowsPerBand, dim)
    val (inVecs, inBanded) = bandedSignatures(incoming, id, vec, bits,
      bands, rowsPerBand, dim)
    val maxHam = hammingCut(tau, prefilterBits(bits))
    val all = pruneToProbedBuckets(exBanded, inBanded)
      .withColumn("_new", lit(false))
      .unionByName(inBanded.withColumn("_new", lit(true)))
      .repartition(col("band"), col("chunk"))
    // the probe is the batch's slice OF THE SAME EXCHANGE (filter on the
    // rider flag) — deriving it from inBanded directly planned and ran
    // the batch's signing/banding pass a second time inside the join
    // (r13); ReuseExchange now computes the union banding once and both
    // join sides arrive co-partitioned (the bloom-pruning jobs still
    // sign the batch separately — that gate must run before the union
    // exists). Build side stays the batch-sized probe (hint below).
    val probe = all.filter(col("_new")).select(col("band"), col("chunk"),
      col("cid").as("in_id"), col("sig").as("in_sig"))
    val vecs = exVecs.unionByName(inVecs)
    // batch probes union buckets: new↔existing forms exactly once (the
    // probe side is new-only), new↔new dedups by id order. Bucket keys
    // stay few and duplicate-heavy, so this must be a hash join (an SMJ
    // would buffer every many-to-many bucket group — measured in the full
    // run) — but unlike the full run's symmetric self-join, the BUILD
    // side here must be the BATCH-sized probe: building the corpus side's
    // banded rows OOMs the per-partition hash map exactly when the
    // incremental path matters (measured r13 at the 100× step).
    probe.hint("shuffle_hash").join(all, Seq("band", "chunk"))
      .filter(col("in_id") =!= col("cid") &&
        (!col("_new") || col("in_id") < col("cid")) &&
        hamming(col("in_sig"), col("sig")) <= maxHam)
      .select(least(col("in_id"), col("cid")).as("id1"),
        greatest(col("in_id"), col("cid")).as("id2"))
      .dropDuplicates("id1", "id2")
      .join(vecs.select(col("cid").as("id1"), col("cv").as("v1")), "id1")
      .join(vecs.select(col("cid").as("id2"), col("cv").as("v2")), "id2")
      .select(col("id1"), col("id2"),
        round(cosine(col("v1"), col("v2")), 6).as("cos"))
      .filter(col("cos") >= tau)
  }

  /** SRP signature table (cid, sig) — the PERSIST point of the daily-batch
    * pattern. Signatures are pure per-row functions and prefix-stable
    * across widths (bit j never changes when `bits` grows — hyperplanes
    * are generated per bit index), so: compute once for the corpus at a
    * width with headroom over the current geometry, store next to the
    * embeddings, and append each day's batch. The measured motivation
    * (SCALE.md): recomputing corpus signatures dominated the fixed-batch
    * incremental run ~3.4 s of 4.9 s at the 10× step — persisting them
    * makes the daily marginal batch-sized.
    */
  def srpSignatureTable(emb: DataFrame, id: Column, vec: Column,
                        bits: Int = 832, dim: Int = 64): DataFrame =
    emb.select(id.as("cid"), asDouble(vec).as("cv"))
      .select(col("cid"), srpSignature(col("cv"), bits, dim).as("sig"))

  /** [[lshCosinePairsIncrementalAuto]] against a PERSISTED corpus
    * signature table ([[srpSignatureTable]]) — the production daily run:
    * only the incoming batch is signed today; the existing side's
    * signatures are read back and re-banded as a bit-slicing view (free
    * on geometry steps while the derived geometry fits `sigBits`, the
    * width the table was signed at — a too-narrow table fails loudly
    * DRIVER-SIDE, naming the re-sign width; no job runs). `existing`
    * supplies the vectors for the exact rerank (only candidate ids are
    * ever joined back to it). Bit-identical to
    * [[lshCosinePairsIncrementalAuto]] on the same inputs because
    * signatures are prefix-stable across widths — spec-asserted. */
  def lshCosinePairsIncrementalPresigned(existingSigs: DataFrame,
                                         sigBits: Int, existing: DataFrame,
                                         incoming: DataFrame, id: Column,
                                         vec: Column, tau: Double,
                                         corpusSize: Long, dim: Int = 64,
                                         targetRecall: Double = 0.92)
      : DataFrame = {
    val g = srpGeometry(corpusSize, tau, targetRecall)
    require(sigBits % 64 == 0 && sigBits > 0,
      s"sigBits must be a positive multiple of 64: $sigBits")
    // the banding reads word indices up to ceil(bands*rowsPerBand/64) and
    // the Hamming prefilter up to ceil(min(g.bits, 512)/64); both are
    // <= ceil(g.bits/64), so requiring the stored width to cover g.bits
    // is the whole contract
    require(g.bits <= sigBits,
      s"persisted signature table too narrow: geometry for n=$corpusSize " +
        s"needs ${g.bits} bits, table was signed at $sigBits — re-sign " +
        s"with srpSignatureTable(bits >= ${g.bits}) (grow with headroom; " +
        "prefix bits never change)")
    // band the STORED prefix exactly as a freshly-signed g.bits-wide
    // signature would band: pass g.bits (not sigBits) so the sliced
    // Hamming-prefix width matches the incoming side's word for word
    val exBanded = bandSignatureFrame(
      existingSigs.select(col("cid"), col("sig")), g.bits,
      g.bands, g.rowsPerBand)
    val (inVecs, inBanded) = bandedSignatures(incoming, id, vec, g.bits,
      g.bands, g.rowsPerBand, dim)
    val exVecs = existing.select(id.as("cid"), asDouble(vec).as("cv"))
    val maxHam = hammingCut(tau, prefilterBits(g.bits))
    val all = pruneToProbedBuckets(exBanded, inBanded)
      .withColumn("_new", lit(false))
      .unionByName(inBanded.withColumn("_new", lit(true)))
      .repartition(col("band"), col("chunk"))
    // the probe is the batch's slice OF THE SAME EXCHANGE (filter on the
    // rider flag) — deriving it from inBanded directly planned and ran
    // the batch's signing/banding pass a second time inside the join
    // (r13); ReuseExchange now computes the union banding once and both
    // join sides arrive co-partitioned (the bloom-pruning jobs still
    // sign the batch separately — that gate must run before the union
    // exists). Build side stays the batch-sized probe (hint below).
    val probe = all.filter(col("_new")).select(col("band"), col("chunk"),
      col("cid").as("in_id"), col("sig").as("in_sig"))
    val vecs = exVecs.unionByName(inVecs)
    probe.hint("shuffle_hash").join(all, Seq("band", "chunk"))
      .filter(col("in_id") =!= col("cid") &&
        (!col("_new") || col("in_id") < col("cid")) &&
        hamming(col("in_sig"), col("sig")) <= maxHam)
      .select(least(col("in_id"), col("cid")).as("id1"),
        greatest(col("in_id"), col("cid")).as("id2"))
      .dropDuplicates("id1", "id2")
      .join(vecs.select(col("cid").as("id1"), col("cv").as("v1")), "id1")
      .join(vecs.select(col("cid").as("id2"), col("cv").as("v2")), "id2")
      .select(col("id1"), col("id2"),
        round(cosine(col("v1"), col("v2")), 6).as("cos"))
      .filter(col("cos") >= tau)
  }

  /** Top-`nprobe` nearest centroid indices by dot product (== cosine when
    * the centroids are L2-normalized) — native codegen'd
    * [[graft.engine.expressions.NearestCentroids]], one fused nlist×dim loop
    * per row. */
  def nearestCentroids(vec: Column, cents: Array[Array[Double]],
                       nprobe: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.engine.expressions.NearestCentroids(
      ColumnBridge.expression(vec), cents, nprobe))
  }

  /** Spherical k-means coarse quantizer for the IVF index: Lloyd's
    * iterations run as Spark jobs; the DRIVER only ever holds the model —
    * `nlist` seed vectors at init and the (cluster, dim) partial-sum
    * aggregates per iteration (nlist×dim doubles, independent of corpus
    * size). Vectors are L2-normalized once and cached for the duration of
    * training (released on exit), so each iteration is one assignment pass
    * (codegen'd argmax, zero shuffle) plus one (cl, pos) sum aggregation.
    *
    * Deterministic: seeds are the `nlist` rows with the smallest
    * (murmur3(id), id); ties in assignment break toward the lower centroid
    * index — same model on every run and every cluster.
    *
    * Empty clusters keep their previous centroid (standard Lloyd's repair is
    * unnecessary for a coarse quantizer — an unused list just never gets
    * probed). Zero-norm vectors are excluded from training; at search time
    * they score 0 against every centroid and land in list 0. */
  def ivfTrainCentroids(emb: DataFrame, id: Column, vec: Column,
                        nlist: Int = 16, iters: Int = 5): Array[Array[Double]] = {
    import org.apache.spark.storage.StorageLevel
    val nv = emb.select(id.as("cid"), asDouble(vec).as("cv"))
      .withColumn("nrm", norm(col("cv")))
      .filter(col("nrm") > 0)
      .select(col("cid"),
        transform(col("cv"), x => x / col("nrm")).as("nv"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var cents = nv
        .orderBy(hash(col("cid")), col("cid")).limit(nlist)
        .select(col("nv"))
        .collect()
        .map(_.getSeq[Double](0).toArray)
      require(cents.length > 0, "ivfTrainCentroids: empty corpus")
      // the model's width IS the embedding width (taken from the seeds) —
      // no separate dim parameter to mismatch; a mixed-width corpus fails
      // loudly in the accumulation below
      val width = cents.head.length
      require(cents.forall(_.length == width),
        s"ivfTrainCentroids: seed vectors have mixed widths " +
          s"(${cents.map(_.length).distinct.mkString(",")})")
      // early exit on convergence: the per-iteration sums are already on the
      // driver, so comparing new centroids to old is free — Lloyd's on
      // clusterable data typically converges in 2-3 rounds and the remaining
      // `iters` jobs would recompute an identical model
      var it = 0
      var moved = true
      while (it < iters && moved) {
        val sums = nv
          .select(element_at(nearestCentroids(col("nv"), cents, 1), 1)
            .as("cl"), posexplode(col("nv")).as(Seq("pos", "x")))
          .groupBy(col("cl"), col("pos"))
          .agg(sum(col("x")).as("s"))
          .collect()
        val acc = Array.fill(cents.length)(new Array[Double](width))
        val seen = new Array[Boolean](cents.length)
        sums.foreach { r =>
          val cl = r.getInt(0)
          val pos = r.getInt(1)
          // defensive invariant: mixed corpus widths already fail loudly
          // inside NearestCentroids (strict width check) during the
          // assignment this aggregation computes — this guard only protects
          // against a future refactor decoupling the two
          if (pos >= width) throw new IllegalStateException(
            s"ivfTrainCentroids: aggregation saw dim $pos beyond model " +
              s"width $width despite the assignment width check")
          acc(cl)(pos) = r.getDouble(2)
          seen(cl) = true
        }
        val next = cents.indices.map { c =>
          if (!seen(c)) cents(c)
          else {
            val s = acc(c)
            val n = math.sqrt(s.map(x => x * x).sum)
            if (n == 0) cents(c) else s.map(_ / n)
          }
        }.toArray
        moved = cents.indices.exists { c =>
          cents(c).indices.exists(j =>
            math.abs(next(c)(j) - cents(c)(j)) > 1e-12)
        }
        cents = next
        it += 1
      }
      cents
    } finally nv.unpersist(blocking = false)
  }

  /** Inverted-list assignment: each corpus vector tagged with its nearest
    * centroid — (cid, cv, cl), one codegen'd pass, zero shuffle. Persist the
    * result (or sink it partitioned by `cl`) to amortize the index over many
    * searches. */
  def ivfAssign(emb: DataFrame, id: Column, vec: Column,
                cents: Array[Array[Double]]): DataFrame =
    emb.select(id.as("cid"), asDouble(vec).as("cv"))
      .withColumn("cl", element_at(nearestCentroids(col("cv"), cents, 1), 1))

  /** IVF-Flat ANN search with a pre-trained quantizer: each query probes its
    * `nprobe` nearest inverted lists; candidates are the corpus rows in
    * those lists (broadcast join on the list id — the corpus never
    * shuffles); exact cosine reranks to top-k. Scanned fraction ≈
    * nprobe/nlist of the corpus per query — at scale, sink the assignment
    * partitioned by `cl` and list pruning becomes partition pruning.
    *
    * Output matches [[cosineTopK]]: (qid, cid, cos, rn). Recall < 1 by
    * design (a true neighbor in an unprobed list is missed) and — unlike
    * [[lshCosineTopK]] — DEPENDS ON CORPUS CLUSTERABILITY: the quantizer
    * only prunes where direction predicts neighborhood. On a clusterable
    * corpus (the normal case for trained embeddings), recall ≥ 0.9 at
    * nprobe/nlist = 4/16 (SimilaritySpec, 20-cluster fixture, measured
    * 1.0). On an ISOTROPIC corpus, top-k reaches into background
    * distances and recall degrades to ≈ the scanned fraction
    * nprobe/nlist (measured on the synthetic testdata: 0.64 at 4/16,
    * 0.88 at 8/16) — there, prefer [[lshCosineTopK]], whose
    * Hamming-ranked window handles background-distance neighbors.
    * SimilaritySpec pins both regimes. */
  def ivfCosineTopKWith(indexed: DataFrame, cents: Array[Array[Double]],
                        queryIds: Seq[Long], k: Int,
                        nprobe: Int = 4): DataFrame = {
    val queries = indexed.filter(col("cid").isin(queryIds: _*))
      .select(col("cid").as("qid"), col("cv").as("qv"),
        explode(nearestCentroids(col("cv"), cents, nprobe)).as("cl"))
    val scored = indexed.join(broadcast(queries), Seq("cl"))
      .filter(col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"),
        round(cosine(col("cv"), col("qv")), 6).as("cos"))
    topKPerQuery(scored, k)
  }

  /** Driver-side probe-list computation for ONE query vector — same scoring
    * and tie-break (dot product, ties to the lower index) as the
    * [[graft.engine.expressions.NearestCentroids]] expression, so the two
    * paths probe identical lists. Model-scale work: nlist×dim flops. */
  private[graft] def probeLists(cents: Array[Array[Double]], qv: Array[Double],
                                nprobe: Int): Seq[Int] = {
    require(nprobe >= 1 && nprobe <= cents.length,
      s"nprobe must be in [1, ${cents.length}]: $nprobe")
    val dots = cents.map { c =>
      require(c.length == qv.length,
        s"probeLists: query has ${qv.length} dims, centroids ${c.length}")
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * qv(i); i += 1 }
      s
    }
    val taken = new Array[Boolean](cents.length)
    Seq.tabulate(nprobe) { _ =>
      var best = -1; var bd = Double.NegativeInfinity; var j = 0
      while (j < dots.length) {
        if (!taken(j) && dots(j) > bd) { best = j; bd = dots(j) }
        j += 1
      }
      taken(best) = true
      best
    }
  }

  /** IVF search over an ON-DISK index sunk with `partitionBy("cl")` — the
    * 100 TB layout promised in [[ivfAssign]]'s doc, demonstrated: the query
    * set is driver-held (query batches are model-scale), so its probe lists
    * are computed up front and the reader gets a LITERAL `cl IN (...)`
    * predicate — list pruning IS partition pruning. The scan plans only the
    * probed lists' directories (`FileSourceScanExec.selectedPartitions` ==
    * union of probe lists — asserted in SimilaritySpec); unprobed lists are
    * never listed, opened, or read. Rerank is the same bounded top-k
    * aggregation as the in-memory path; results are identical to
    * [[ivfCosineTopKWith]] on the same index. */
  def ivfCosineTopKPartitioned(spark: org.apache.spark.sql.SparkSession,
                               indexPath: String,
                               cents: Array[Array[Double]],
                               queries: Seq[(Long, Array[Double])], k: Int,
                               nprobe: Int = 4): DataFrame = {
    import spark.implicits._
    val probed = queries.map { case (qid, qv) =>
      (qid, qv, probeLists(cents, qv, nprobe))
    }
    val lists = probed.flatMap(_._3).distinct.sorted
    val qdf = probed
      .flatMap { case (qid, qv, ls) => ls.map(cl => (qid, qv, cl)) }
      .toDF("qid", "qv", "cl")
    val scored = spark.read.parquet(indexPath)
      .filter(col("cl").isin(lists: _*)) // static partition pruning
      .join(broadcast(qdf), Seq("cl"))
      .filter(col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"),
        round(cosine(col("cv"), col("qv")), 6).as("cos"))
    topKPerQuery(scored, k)
  }

  /** Train + index + search in one call — the small-corpus convenience
    * entry; at scale, train once ([[ivfTrainCentroids]]), persist the
    * assignment ([[ivfAssign]]), and search many times
    * ([[ivfCosineTopKWith]]). */
  def ivfCosineTopK(emb: DataFrame, id: Column, vec: Column,
                    queryIds: Seq[Long], k: Int, nlist: Int = 16,
                    nprobe: Int = 4, iters: Int = 5): DataFrame = {
    val cents = ivfTrainCentroids(emb, id, vec, nlist, iters)
    ivfCosineTopKWith(ivfAssign(emb, id, vec, cents), cents, queryIds, k,
      nprobe)
  }

  /** SemDeDup-style semantic dedup over a PRE-BUILT IVF assignment
    * (cid, cv, cl): a row is dropped iff a LOWER-id row in the SAME
    * inverted list is cosine >= `tau` to it — cluster-then-dedup (Abbas
    * et al. 2023, arXiv:2303.09540) with a deterministic keep rule (min
    * id per similarity neighborhood), no iteration.
    *
    * Scale shape: the only shuffle is the within-list self-join on `cl`
    * — quadratic INSIDE a list but never across lists, so the quantizer's
    * `nlist` bounds the blocking exactly like LSH bands do for
    * [[lshCosinePairs]]. At corpus scale pick `nlist` ∝ corpus/target-
    * list-size (e.g. ~100k lists for web scale) and sink the assignment
    * `partitionBy("cl")` so each list dedups from its own partition
    * ([[ivfAssign]] docs). Unlike the LSH/minhash paths this trades
    * recall for the quantizer's view of geometry: a near-dup pair split
    * across two lists is missed (same regime caveats as
    * [[ivfCosineTopKWith]] — SimilaritySpec pins twin-collapse on a
    * clusterable corpus).
    *
    * Zero-norm vectors have NaN cosine to everything: never dropped,
    * never drop others — the NaN guard is explicit because Spark orders
    * NaN ABOVE every double, so a bare `cos >= tau` would drop them.
    * Output: surviving (cid, cl). */
  def semDedupWith(indexed: DataFrame, tau: Double): DataFrame = {
    val left = indexed.select(col("cl"), col("cid"), col("cv"))
    val right = indexed.select(col("cl"), col("cid").as("cid2"),
      col("cv").as("cv2"))
    val cos = round(cosine(col("cv"), col("cv2")), 6)
    val dominated = left.join(right, Seq("cl"))
      .filter(col("cid2") < col("cid") && !isnan(cos) && cos >= tau)
      .select(col("cid")).distinct()
    indexed.join(dominated, Seq("cid"), "left_anti")
      .select(col("cid"), col("cl"))
  }

  /** Train + assign + dedup in one call — small-corpus convenience; at
    * scale train once, persist the assignment, [[semDedupWith]] many. */
  def semDedup(emb: DataFrame, id: Column, vec: Column, tau: Double,
               nlist: Int = 16, iters: Int = 5): DataFrame = {
    val cents = ivfTrainCentroids(emb, id, vec, nlist, iters)
    semDedupWith(ivfAssign(emb, id, vec, cents), tau)
  }

  /** Symmetric per-vector int8 quantization of an embedding column — the
    * storage layout for corpus-scale ANN (4× smaller than float32; IVF lists
    * of int8 codes + one scale per vector). `q[i] = floor(v[i]·127/maxabs)`,
    * reconstructed as `q[i]·maxabs/127` ([[dequantizeInt8]]). `floor` (not
    * round) so the mapping has no .5-tie anywhere — bit-identical across
    * engines, oracle-checkable. Zero vectors quantize to all-zero codes.
    * Output columns: (codes: array<int>, scale: double). */
  def quantizeInt8(vec: Column): (Column, Column) = {
    val v = asDouble(vec)
    val m = array_max(transform(v, x => abs(x)))
    val codes = when(m === 0.0, transform(v, _ => lit(0)))
      .otherwise(transform(v, x => floor(x * 127.0 / m).cast("int")))
    (codes, m / 127.0)
  }

  /** Inverse of [[quantizeInt8]]: codes × scale back to array<double>. */
  def dequantizeInt8(codes: Column, scale: Column): Column =
    transform(codes, q => q.cast("double") * scale)

  /** Deterministic ±1 hyperplane matrix (bits × dim), seeded by index — the
    * same on every JVM, so signatures are reproducible cluster-wide. */
  private[graft] def hyperplanes(bits: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(bits, dim) { (j, k) =>
      val h = scala.util.hashing.MurmurHash3.productHash((j, k))
      if ((h & 1) == 0) 1.0 else -1.0
    }

  /** Estimated corpus row count from optimizer stats — no job. Parquet scans
    * report sizeInBytes; rowCount only exists under CBO/collected stats, so
    * fall back to bytes / (8 bytes per double × dim, plus id) per row.
    * sizeInBytes is the COMPRESSED on-disk size while the divisor is the
    * uncompressed row width, so the raw quotient systematically
    * underestimates rows — which would let a corpus past the measured n^2
    * cliff slip under the maxRowsPerBucket guards that rely on this
    * (ADVICE r12). Bias by an assumed ~2x parquet compression ratio for
    * double columns; the estimate stays order-of-magnitude only, and the
    * guards it feeds err loud (refuse) rather than silent. Callers at real
    * scale should prefer the *Auto entry points, which take a true count. */
  private def estimatedRows(emb: DataFrame, dim: Int): Long = {
    val stats = emb.queryExecution.optimizedPlan.stats
    stats.rowCount.map(_.toLong).getOrElse {
      (stats.sizeInBytes * 2 / BigInt(8L * dim + 8)).toLong max 1L
    }
  }

  /** LSH-bucketed ANN: banded candidates (corpus vectors sharing >= 1 band
    * chunk with the query), ranked by full-signature Hamming distance to keep
    * the best `candidatesPerQuery` per query, exact-cosine reranked to top-k.
    * The Hamming ranking between blocking and rerank is what rescues recall
    * on FAR neighbors (an exact top-k reaches into background distances where
    * single-band collisions alone are noisy).
    *
    * `candidatesPerQuery <= 0` (the default) auto-scales the Hamming window
    * to `clamp(max(40k, rows/5), 10_000)` from optimizer scan stats. The
    * floor is recall-driven: an exact top-k reaches into background
    * distances, where a true neighbor's Hamming rank among n background
    * collisions grows ~linearly in n (measured: 40-candidate window → recall
    * 0.8 at n=500; 200 → ≥0.9). The cap bounds the rerank join at corpus
    * scale, where near-neighbor Hamming ranks ARE accurate and the window
    * only needs to cover k with margin. Note the window depth does NOT
    * bound the banded-join/ranking cost — collisions are ranked before the
    * cut — so shrinking it cannot rescue small-corpus latency; see the
    * crossover note below for when to use brute force instead.
    *
    * CROSSOVER vs [[cosineTopK]]: brute force is one linear corpus pass per
    * query batch — at n = 2 000 (sf0.1) it wins and LSH's signing + banded
    * join overhead is pure loss. LSH amortizes the one-off signing and scores
    * only bucket collisions (~n^0.65 per query at these parameters), so it
    * overtakes once n reaches the high 10^4s and is the only viable path at
    * corpus scale (10^8+, where a linear pass per query batch is a full-table
    * scan). Below that, call [[cosineTopK]].
    *
    * Returns (qid, cid, cos, rn) like [[cosineTopK]] — recall < 1 by design;
    * see SimilaritySpec for the measured recall floor. */
  def lshCosineTopK(emb: DataFrame, id: Column, vec: Column,
                    queryIds: Seq[Long], k: Int, bits: Int = 256,
                    bands: Int = 24, rowsPerBand: Int = 4, dim: Int = 64,
                    candidatesPerQuery: Int = 0,
                    maxRowsPerBucket: Int = 1024): DataFrame = {
    val nEst = estimatedRows(emb, dim)
    require(nEst <= (1L << rowsPerBand) * maxRowsPerBucket,
      s"lshCosineTopK: ~$nEst corpus rows over ${1 << rowsPerBand} " +
        s"buckets/band (rowsPerBand=$rowsPerBand) exceeds " +
        s"$maxRowsPerBucket rows/bucket — a fixed geometry goes quadratic " +
        "here (measured, SCALE.md). Use lshCosineTopKAuto(corpusSize) to " +
        "derive the geometry, or raise maxRowsPerBucket deliberately.")
    lshCosineTopKCore(emb, id, vec, queryIds, k, bits, bands, rowsPerBand,
      dim, candidatesPerQuery)
  }

  /** [[lshCosineTopK]] with geometry DERIVED from the (caller-known) corpus
    * size via [[srpGeometry]] — the default entry point at scale. The
    * geometry threshold defaults to the tau-0.4 near-dup regime (top-k has
    * no tau; 0.4 is the weakest — hence most conservative — threshold the
    * engine tunes for). */
  def lshCosineTopKAuto(emb: DataFrame, id: Column, vec: Column,
                        queryIds: Seq[Long], k: Int, corpusSize: Long,
                        dim: Int = 64, candidatesPerQuery: Int = 0,
                        geometryTau: Double = 0.4,
                        targetRecall: Double = 0.92): DataFrame = {
    val g = srpGeometry(corpusSize, geometryTau, targetRecall)
    lshCosineTopKCore(emb, id, vec, queryIds, k, g.bits, g.bands,
      g.rowsPerBand, dim, candidatesPerQuery)
  }

  private def lshCosineTopKCore(emb: DataFrame, id: Column, vec: Column,
                                queryIds: Seq[Long], k: Int, bits: Int,
                                bands: Int, rowsPerBand: Int, dim: Int,
                                candidatesPerQuery: Int): DataFrame = {
    val cpq =
      if (candidatesPerQuery > 0) candidatesPerQuery
      else math.min(
        math.max(40L * k, estimatedRows(emb, dim) / 5L), 10000L).toInt
    val (vecs, banded) = bandedSignatures(emb, id, vec, bits, bands,
      rowsPerBand, dim)
    val queries = banded.filter(col("cid").isin(queryIds: _*))
      .select(col("cid").as("qid"), col("sig").as("qsig"),
        col("band"), col("chunk"))
    val queryVecs = vecs.filter(col("cid").isin(queryIds: _*))
      .select(col("cid").as("qid"), col("cv").as("qv"))
    // Hamming ranking as a bounded top-k aggregation (lowest distance =
    // highest -ham, ties to the lower cid — identical selection to the old
    // row_number window, but partial-aggregated: no single task ever holds
    // all of a query's bucket collisions)
    val candidateIds = banded.join(broadcast(queries), Seq("band", "chunk"))
      .filter(col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"),
        hamming(col("sig"), col("qsig")).as("ham"))
      .dropDuplicates("qid", "cid")
      .groupBy(col("qid"))
      .agg(boundedTopK(-col("ham").cast("double"), col("cid"), cpq).as("_tk"))
      .select(col("qid"), explode(col("_tk.id")).as("cid"))
    // corpus vectors re-attach only for the ≤ cpq survivors per query; the
    // (tiny) query vectors ride a broadcast
    val scored = candidateIds
      .join(vecs, "cid")
      .join(broadcast(queryVecs), "qid")
      .select(col("qid"), col("cid"),
        round(cosine(col("cv"), col("qv")), 6).as("cos"))
    topKPerQuery(scored, k)
  }

  // ---- Product quantization (PQ) ----

  /** PQ code assignment column — see [[graft.engine.expressions.PqEncode]]. */
  def pqEncodeCol(vec: Column, codebooks: Array[Array[Array[Double]]]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.engine.expressions.PqEncode(
      ColumnBridge.expression(vec), codebooks))
  }

  /** Per-query ADC lookup-table column — see
    * [[graft.engine.expressions.PqAdcTable]]. */
  def pqAdcTableCol(vec: Column, codebooks: Array[Array[Array[Double]]]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.engine.expressions.PqAdcTable(
      ColumnBridge.expression(vec), codebooks))
  }

  /** ADC score column (m table lookups per candidate) — see
    * [[graft.engine.expressions.PqAdcScore]]. */
  def pqAdcScoreCol(codes: Column, table: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.engine.expressions.PqAdcScore(
      ColumnBridge.expression(codes), ColumnBridge.expression(table)))
  }

  /** L2-normalize, passing zero-norm vectors through unchanged (they encode
    * deterministically against whatever codebook and score 0 everywhere —
    * same policy as the IVF search path). */
  private def normalized(v: Column): Column = {
    val nrm = norm(v)
    when(nrm > 0, transform(v, x => x / nrm)).otherwise(v)
  }

  /** Product-quantizer training: per-subspace k-means over L2-normalized
    * vectors (Jégou et al. 2011; cosine on normalized inputs = inner
    * product, which ADC approximates subspace-wise). Lloyd's runs as Spark
    * jobs with ALL m subspaces folded into one pass per iteration: encode
    * (codegen'd argmin, zero shuffle) + one (dim-position, codeword) sum/
    * count aggregation whose result — at most dim·k rows — is the only
    * thing the driver ever holds. Model size k·dim doubles, independent of
    * corpus size.
    *
    * Deterministic: seeds are the `k` rows with the smallest
    * (murmur3(id), id), sliced into their m subvectors; encode ties break
    * toward the lower code. Empty codes keep their previous codeword (an
    * unused codeword is simply never emitted). Zero-norm vectors are
    * excluded from training, like [[ivfTrainCentroids]].
    *
    * Returns codebooks m × k × (dim/m); `dim` must divide by `m`. */
  def pqTrain(emb: DataFrame, id: Column, vec: Column,
              m: Int = 4, k: Int = 16,
              iters: Int = 5): Array[Array[Array[Double]]] = {
    import org.apache.spark.storage.StorageLevel
    require(m > 0 && k > 0 && iters > 0, s"pqTrain: bad (m=$m, k=$k, iters=$iters)")
    val nv = emb.select(id.as("cid"), asDouble(vec).as("cv"))
      .withColumn("nrm", norm(col("cv")))
      .filter(col("nrm") > 0)
      .select(col("cid"), transform(col("cv"), x => x / col("nrm")).as("nv"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // seed POOL larger than k: per subspace the k codewords are the first
      // k DISTINCT subvectors in pool order — k identical-looking seed rows
      // would otherwise plant duplicate codewords, which Lloyd's never
      // separates (ties break to the lower index, so the duplicate starves)
      // and the quantizer silently loses resolution (measured on the
      // sign-pattern fixture in SimilaritySpec: recall 0.36 → 0.84)
      val seeds = nv.orderBy(hash(col("cid")), col("cid")).limit(4 * k)
        .select(col("nv")).collect().map(_.getSeq[Double](0).toArray)
      require(seeds.length >= k,
        s"pqTrain: corpus has only ${seeds.length} non-zero vectors, need k=$k")
      val dim = seeds.head.length
      require(seeds.forall(_.length == dim),
        s"pqTrain: mixed vector widths (${seeds.map(_.length).distinct.mkString(",")})")
      require(dim % m == 0, s"pqTrain: dim $dim not divisible by m=$m")
      val dsub = dim / m
      var cents: Array[Array[Array[Double]]] = Array.tabulate(m) { s =>
        val subs = seeds.iterator.map(_.slice(s * dsub, (s + 1) * dsub))
        val distinct = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
        val seen = scala.collection.mutable.HashSet.empty[Seq[Double]]
        subs.foreach { sv =>
          if (distinct.length < k && seen.add(sv.toSeq)) distinct += sv
        }
        // pool exhausted below k distinct patterns: cycle what exists (the
        // duplicates stay unused, harmlessly — the data has no more detail)
        Array.tabulate(k)(j => distinct(j % distinct.length))
      }
      var it = 0
      var moved = true
      while (it < iters && moved) {
        // one job: encode + positional sums. Group key (pos, code) fixes the
        // subspace (s = pos / dsub) — at most dim·k groups, model-sized.
        val rows = nv
          .select(pqEncodeCol(col("nv"), cents).as("codes"),
            posexplode(col("nv")).as(Seq("pos", "x")))
          .groupBy(col("pos"),
            element_at(col("codes"),
              (col("pos") / lit(dsub)).cast("int") + 1).as("cw"))
          .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
          .collect()
        val sums = Array.fill(m, k)(new Array[Double](dsub))
        val counts = Array.fill(m, k)(0L)
        rows.foreach { r =>
          val pos = r.getInt(0)
          val cw = r.getInt(1)
          val s = pos / dsub
          sums(s)(cw)(pos % dsub) = r.getDouble(2)
          counts(s)(cw) = r.getLong(3)
        }
        val next = Array.tabulate(m, k) { (s, j) =>
          val n = counts(s)(j)
          if (n == 0L) cents(s)(j) else sums(s)(j).map(_ / n)
        }
        moved = (0 until m).exists(s => (0 until k).exists(j =>
          (0 until dsub).exists(i =>
            math.abs(next(s)(j)(i) - cents(s)(j)(i)) > 1e-12)))
        cents = next
        it += 1
      }
      cents
    } finally nv.unpersist(blocking = false)
  }

  /** Encode a corpus against a trained product quantizer: (cid, codes) with
    * codes = m small ints per vector. One codegen'd map pass, zero shuffle —
    * this DataFrame (m ints per row instead of dim floats) is the entire
    * search-time corpus state; persist it (or sink it) to amortize over many
    * query batches. `normalize` must match how the codebooks were trained
    * (true for [[pqTrain]]; false for externally fixed raw codebooks, e.g.
    * the SQL-expressible oracle model). */
  def pqEncode(emb: DataFrame, id: Column, vec: Column,
               codebooks: Array[Array[Array[Double]]],
               normalize: Boolean = true): DataFrame = {
    val v = asDouble(vec)
    val nv = if (normalize) normalized(v) else v
    emb.select(id.as("cid"), pqEncodeCol(nv, codebooks).as("codes"))
  }

  /** PQ-ADC ANN search over a pre-encoded corpus: each query computes its
    * m×k inner-product table once ([[pqAdcTableCol]]), rides a broadcast,
    * and every corpus candidate scores with m table lookups — no decode, no
    * shuffle of the corpus, and the scan reads m ints per row instead of
    * dim floats (the 100-TB point of PQ: the index is ~dim·8/m× smaller
    * than the vectors). Output (qid, cid, adc, rn); `adc` approximates
    * cosine (queries normalized, codebooks trained normalized) with
    * quantization error bounded by the per-subspace reconstruction error —
    * recall floor pinned in SimilaritySpec. Compose with [[ivfAssign]]
    * (encode within lists, probe then ADC) for IVF-PQ. */
  def pqCosineTopKWith(encoded: DataFrame, codebooks: Array[Array[Array[Double]]],
                       emb: DataFrame, id: Column, vec: Column,
                       queryIds: Seq[Long], k: Int,
                       normalizeQueries: Boolean = true): DataFrame = {
    val queries = emb.select(id.as("qid"), asDouble(vec).as("qv"))
      .filter(col("qid").isin(queryIds: _*))
      .select(col("qid"), pqAdcTableCol(
        if (normalizeQueries) normalized(col("qv")) else col("qv"),
        codebooks).as("tbl"))
    val scored = encoded.crossJoin(broadcast(queries))
      .filter(col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"),
        round(pqAdcScoreCol(col("codes"), col("tbl")), 6).as("cos"))
    topKPerQuery(scored, k).withColumnRenamed("cos", "adc")
  }

  /** Train + encode + search in one call (small-scale convenience; at scale
    * train once, persist the encoded corpus, and call
    * [[pqCosineTopKWith]]). */
  def pqCosineTopK(emb: DataFrame, id: Column, vec: Column,
                   queryIds: Seq[Long], k: Int, m: Int = 4,
                   codesPerSub: Int = 16, iters: Int = 5): DataFrame = {
    val cb = pqTrain(emb, id, vec, m, codesPerSub, iters)
    pqCosineTopKWith(pqEncode(emb, id, vec, cb), cb, emb, id, vec, queryIds, k)
  }

  /** The composed IVF-PQ index — (cid, cl, codes), ONE codegen'd map pass,
    * zero shuffle, and the original vectors are gone: per row an int list id
    * plus m small ints. This is the FAISS-style layout for corpus-scale ANN
    * (coarse quantizer prunes which rows are touched; PQ compresses what a
    * touched row costs). Sink it `partitionBy("cl")` and probe pruning
    * becomes partition pruning exactly as in [[ivfCosineTopKPartitioned]]. */
  def ivfPqIndex(emb: DataFrame, id: Column, vec: Column,
                 cents: Array[Array[Double]],
                 codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val v = asDouble(vec)
    emb.select(id.as("cid"),
      element_at(nearestCentroids(v, cents, 1), 1).as("cl"),
      pqEncodeCol(normalized(v), codebooks).as("codes"))
  }

  /** IVF-PQ search over an ON-DISK index sunk with `partitionBy("cl")` —
    * the FAISS-style 100 TB layout [[ivfPqIndex]] promises, demonstrated
    * end-to-end (the PQ twin of [[ivfCosineTopKPartitioned]]): the query
    * batch is driver-held (model-scale), so probe lists are computed up
    * front ([[probeLists]] — same scoring and tie-break as the executor
    * expression) and the reader gets a LITERAL `cl IN (...)` predicate;
    * list pruning IS partition pruning (unprobed lists are never listed,
    * opened, or read — asserted on `selectedPartitions` in
    * SimilaritySpec), and a touched row costs m ints + m table lookups
    * instead of dim floats. Queries are L2-normalized for the ADC table
    * exactly as in [[ivfPqTopKWith]]; results are identical to it on the
    * same index (spec'd). Output (qid, cid, adc, rn). */
  def ivfPqTopKPartitioned(spark: org.apache.spark.sql.SparkSession,
                           indexPath: String,
                           cents: Array[Array[Double]],
                           codebooks: Array[Array[Array[Double]]],
                           queries: Seq[(Long, Array[Double])], k: Int,
                           nprobe: Int = 4): DataFrame = {
    import spark.implicits._
    val probed = queries.map { case (qid, qv) =>
      (qid, qv, probeLists(cents, qv, nprobe))
    }
    val lists = probed.flatMap(_._3).distinct.sorted
    val qdf = probed
      .flatMap { case (qid, qv, ls) => ls.map(cl => (qid, qv, cl)) }
      .toDF("qid", "qv", "cl")
      .select(col("qid"),
        pqAdcTableCol(normalized(col("qv")), codebooks).as("tbl"), col("cl"))
    val scored = spark.read.parquet(indexPath)
      .filter(col("cl").isin(lists: _*)) // static partition pruning
      .join(broadcast(qdf), Seq("cl"))
      .filter(col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"),
        round(pqAdcScoreCol(col("codes"), col("tbl")), 6).as("cos"))
    topKPerQuery(scored, k).withColumnRenamed("cos", "adc")
  }

  /** IVF-PQ search: each query probes its `nprobe` nearest lists and
    * ADC-scores ONLY the rows in them — candidate count is ~nprobe/nlist of
    * the corpus, each costing m table lookups instead of a dim-float
    * cosine. The query side (probe lists + ADC table) rides one broadcast;
    * the index never shuffles. Output (qid, cid, adc, rn); recall compounds
    * the IVF clusterability caveat ([[ivfCosineTopKWith]]) with PQ
    * quantization error ([[pqCosineTopKWith]]) — both regimes spec'd. */
  def ivfPqTopKWith(indexed: DataFrame, cents: Array[Array[Double]],
                    codebooks: Array[Array[Array[Double]]],
                    emb: DataFrame, id: Column, vec: Column,
                    queryIds: Seq[Long], k: Int, nprobe: Int = 4): DataFrame = {
    val queries = emb.select(id.as("qid"), asDouble(vec).as("qv"))
      .filter(col("qid").isin(queryIds: _*))
      .select(col("qid"),
        pqAdcTableCol(normalized(col("qv")), codebooks).as("tbl"),
        explode(nearestCentroids(col("qv"), cents, nprobe)).as("cl"))
    val scored = indexed.join(broadcast(queries), Seq("cl"))
      .filter(col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"),
        round(pqAdcScoreCol(col("codes"), col("tbl")), 6).as("cos"))
    topKPerQuery(scored, k).withColumnRenamed("cos", "adc")
  }
}
