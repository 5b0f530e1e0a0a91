package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("cid").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("cid"), col("cos"), col("rn").cast("long").as("rn"))
  }

  /** Embedding-cosine near-dup pairs, exact: every (id1 < id2) pair with
    * cosine >= tau. Quadratic — the small-scale baseline/oracle; the corpus
    * path is [[lshCosinePairs]]. The right side is broadcast (nested-loop
    * join on the inequality), so use only when one side fits in memory. */
  def cosinePairs(emb: DataFrame, id: Column, vec: Column,
                  tau: Double): DataFrame = {
    val a = emb.select(id.as("id1"), asDouble(vec).as("v1"))
    val b = emb.select(id.as("id2"), asDouble(vec).as("v2"))
    a.join(broadcast(b), col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        round(cosine(col("v1"), col("v2")), 6).as("cos"))
      .filter(col("cos") >= tau)
  }

  /** Embedding-cosine near-dup pairs at scale: candidates share >= 1 LSH
    * signature band (shuffle on (band, chunk) buckets — no quadratic
    * cross-join), then exact cosine rerank with threshold tau.
    * Recall < 1 by design; measured against [[cosinePairs]] in specs. */
  def lshCosinePairs(emb: DataFrame, id: Column, vec: Column, tau: Double,
                     bits: Int = 16, bands: Int = 4, dim: Int = 64): DataFrame = {
    // bucket-join on IDS ONLY (vectors are ~0.5 KB each — carrying them
    // through the bucket shuffle dominates cost); re-attach for the rerank
    val (vecs, banded) = bandedSignatures(emb, id, vec, bits, bands, dim)
    val l = banded.select(col("band"), col("chunk"), col("cid").as("id1"))
    val r = banded.select(col("band"), col("chunk"), col("cid").as("id2"))
    l.join(r, Seq("band", "chunk"))
      .filter(col("id1") < col("id2"))
      .dropDuplicates("id1", "id2")
      .join(vecs.select(col("cid").as("id1"), col("cv").as("v1")), "id1")
      .join(vecs.select(col("cid").as("id2"), col("cv").as("v2")), "id2")
      .select(col("id1"), col("id2"),
        round(cosine(col("v1"), col("v2")), 6).as("cos"))
      .filter(col("cos") >= tau)
  }

  /** Shared banding stage for both LSH paths: (vectors as (cid, cv),
    * banded signature chunks as (cid, band, chunk)). `dim` MUST match the
    * embedding dimension — shorter planes zero every signature and collapse
    * all buckets into one (quadratic blowup). */
  private def bandedSignatures(emb: DataFrame, id: Column, vec: Column,
                               bits: Int, bands: Int,
                               dim: Int): (DataFrame, DataFrame) = {
    require(bits % bands == 0, "bits must divide into bands")
    val rbits = bits / bands
    val planes = hyperplanes(bits, dim)
    val mask = (1L << rbits) - 1
    val vecs = emb.select(id.as("cid"), asDouble(vec).as("cv"))
    val banded = vecs
      .withColumn("sig", signature(col("cv"), planes))
      .select(col("cid"), posexplode(array(
        (0 until bands).map(j =>
          shiftright(col("sig"), j * rbits).bitwiseAND(mask)): _*))
        .as(Seq("band", "chunk")))
    (vecs, banded)
  }

  /** Deterministic ±1 hyperplane matrix (bits × dim), seeded by index — the
    * same on every JVM, so signatures are reproducible cluster-wide. */
  private[graft] def hyperplanes(bits: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(bits, dim) { (j, k) =>
      val h = scala.util.hashing.MurmurHash3.productHash((j, k))
      if ((h & 1) == 0) 1.0 else -1.0
    }

  /** bits-bit sign signature of `vec` against [[hyperplanes]], as a long.
    * Pure expression: one dot product per bit over the literal plane. */
  private def signature(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, j) =>
      val planeLit = array(p.map(lit): _*)
      when(dot(vec, planeLit) >= 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** LSH-bucketed ANN: candidates = corpus vectors sharing at least one
    * signature band with the query; exact cosine rerank within candidates.
    * Returns (qid, cid, cos, rn) like [[cosineTopK]] — recall < 1 by design;
    * see SimilaritySpec for the measured recall floor. */
  def lshCosineTopK(emb: DataFrame, id: Column, vec: Column,
                    queryIds: Seq[Long], k: Int, bits: Int = 16,
                    bands: Int = 4, dim: Int = 64): DataFrame = {
    val (vecs, banded) = bandedSignatures(emb, id, vec, bits, bands, dim)
    // query side is tiny: carry its vector in the broadcast; corpus vectors
    // join back only for surviving candidates
    val queries = banded.filter(col("cid").isin(queryIds: _*))
      .join(vecs, "cid")
      .select(col("cid").as("qid"), col("cv").as("qv"),
        col("band"), col("chunk"))
    val candidates = banded.join(broadcast(queries), Seq("band", "chunk"))
      .filter(col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"), col("qv"))
      .dropDuplicates("qid", "cid")
      .join(vecs, "cid")
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("cid").asc)
    candidates
      .select(col("qid"), col("cid"),
        round(cosine(col("cv"), col("qv")), 6).as("cos"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }
}
