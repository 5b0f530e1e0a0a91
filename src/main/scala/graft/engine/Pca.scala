package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed PCA over an embedding column — the dimensionality-reduction /
  * whitening step of embedding-based corpus curation (SemDeDup's cluster
  * space, dedup visualization, cheap ANN pre-projection).
  *
  * Scale shape: the corpus-sized work is ONE aggregation producing the
  * dim×(dim+1)/2 second-moment matrix (hash partial-aggregation keeps the
  * shuffle at ≤ pairs×tasks rows — the per-row pair explosion never
  * materializes, it feeds the in-task hash agg through codegen). Everything
  * after — eigendecomposition, component selection — runs on the driver over
  * a model-sized (dim²) matrix, exactly like the IVF centroid training
  * (`Similarity.ivfTrainCentroids`). Projection is a second corpus-linear
  * map-side pass; data rows never shuffle.
  *
  * Cross-engine exactness: embeddings are quantized per COMPONENT to integer
  * micro-units (floor(x·10⁶)) BEFORE any aggregation, so the moment sums are
  * exact integers in any engine; the covariance is then a fixed-shape IEEE
  * scalar expression over those integers (see the verify skill's
  * float-boundary policy). The eigen step is deliberately NOT oracled —
  * iterative Jacobi is not SQL-expressible; its laws (orthonormality,
  * eigen-equation residual, descending spectrum) are spec'd instead.
  */
object Pca {

  /** Integer micro-unit quantization of the (float) embedding. */
  private def quantized(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * lit(1000000.0)).cast("long"))

  /** Upper-triangle pairwise second moments + per-axis sums of the
    * micro-quantized embedding: (i, j, n, s_i, s_j, s_ij, cov) with
    * 0-based axes, i <= j, and
    * `cov = ((s_ij − s_i·s_j/n)/n)/10¹² ` (original units²) rounded to 9.
    * Each vector folds straight into a per-task
    * [[graft.engine.expressions.MomentMatrix]] buffer — no per-row pair
    * structs are ever allocated, and the shuffle carries one buffer per
    * task instead of d(d+1)/2 rows per task. Sums accumulate in 128 bits
    * and surface as DECIMAL(38,0): 64-bit moment sums silently wrap near
    * 10⁷ unit-norm rows, far below a 100 TB embedding table; the DuckDB
    * oracle's HUGEINT sums are 128-bit natively (same null-element and
    * count semantics as the exploded groupBy form this replaces — see
    * MomentMatrix's Scaladoc). */
  def covariance(emb: DataFrame, vec: Column): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val d = TextOps.spreadForCpu(emb).select(quantized(vec).as("q"))
    val mm = ColumnBridge.column(
      graft.engine.expressions.MomentMatrix(
        ColumnBridge.expression(col("q"))).toAggregateExpression())
    val moments = d.agg(mm.as("m"))
      .select(explode(col("m")).as("e"))
      .select(col("e.i").as("i"), col("e.j").as("j"), col("e.n").as("n"),
        col("e.s_i").as("s_i"), col("e.s_j").as("s_j"),
        col("e.s_ij").as("s_ij"))
    moments.select(col("i").cast("long").as("i"), col("j").cast("long").as("j"),
      col("n"), col("s_i"), col("s_j"), col("s_ij"),
      round(((col("s_ij").cast("double")
        - col("s_i").cast("double") * col("s_j").cast("double")
          / col("n").cast("double"))
        / col("n").cast("double")) / lit(1.0e12), 9).as("cov"))
  }

  /** Fitted model: mean vector, principal components (rows, orthonormal,
    * descending eigenvalue), eigenvalues. Model-scale — lives on the
    * driver and broadcasts in closures like the IVF centroid matrix. */
  final case class Model(mean: Array[Double],
                         components: Array[Array[Double]],
                         eigenvalues: Array[Double])

  /** Fit PCA: one distributed moment aggregation ([[covariance]]), then
    * driver-side cyclic-Jacobi eigendecomposition of the dim×dim matrix.
    * Deterministic: fixed sweep order, sign fixed so each component's
    * largest-|x| entry is positive. */
  def fit(emb: DataFrame, vec: Column, k: Int): Model = {
    val rows = covariance(emb, vec)
      .select(col("i"), col("j"), col("n"), col("s_i"), col("cov"))
      .collect()
    require(rows.nonEmpty, "cannot fit PCA on an empty frame")
    val dim = rows.iterator.map(_.getLong(1)).max.toInt + 1
    require(k >= 1 && k <= dim, s"k must be in [1, $dim]: $k")
    val cov = Array.ofDim[Double](dim, dim)
    val mean = new Array[Double](dim)
    rows.foreach { r =>
      val (i, j) = (r.getLong(0).toInt, r.getLong(1).toInt)
      val c = r.getDouble(4)
      cov(i)(j) = c; cov(j)(i) = c
      if (i == j)
        mean(i) = r.getDecimal(3).doubleValue() / r.getLong(2) / 1.0e6
    }
    val (values, vectors) = jacobiEigen(cov)
    Model(mean, vectors.take(k), values.take(k))
  }

  /** Driver-side precision (inverse-covariance) matrix from a FULL-rank
    * fitted model: `P = Σ_k v_k v_kᵀ / (λ_k + ridge)`. Model-sized (d²
    * doubles) like the IVF centroid matrix; `ridge` guards near-singular
    * spectra (a constant embedding axis at corpus scale would make Σ
    * singular and the plain inverse explode). Fit with `k = dim`. */
  def precision(model: Model, ridge: Double = 1e-9): Array[Array[Double]] = {
    val d = model.mean.length
    require(model.components.length == d,
      s"precision needs a full-rank fit (k = $d, got ${model.components.length})")
    require(ridge >= 0.0, s"ridge must be >= 0: $ridge")
    val p = Array.ofDim[Double](d, d)
    var k = 0
    while (k < d) {
      val vk = model.components(k)
      val inv = 1.0 / (model.eigenvalues(k) + ridge)
      var i = 0
      while (i < d) {
        var j = 0
        while (j < d) { p(i)(j) += vk(i) * vk(j) * inv; j += 1 }
        i += 1
      }
      k += 1
    }
    p
  }

  /** Mahalanobis outlier score `m2 = (x − μ)ᵀ P (x − μ)` per embedding —
    * embedding-space outlier removal for corpus curation (drop
    * out-of-distribution vectors before training; the multivariate
    * generalization of `Analytics.robustAnomalies`' univariate cut). The
    * model (mean + precision) is driver-sized and rides the plan as
    * literals, so the scan is MAP-ONLY — no shuffle, no join, one pass at
    * any corpus size.
    *
    * Codegen shape: the d centered differences are bound ONCE as columns
    * and every quadratic-form term references those attributes — each
    * `element_at` subtree appears exactly once, so the replicated-subtree
    * Janino trap (CLAUDE.md; the q_lr_sweep lesson) never forms (each
    * alias has d+1 consumers, which keeps it bound through
    * CollapseProject). Term order is fixed (row-major i, then j; left
    * fold), so the IEEE double result is bit-stable and SQL-replayable —
    * the fixed-model oracle pattern (`Classifier.intMargin`, PQ-ADC).
    * Output: (vec_id, m2 rounded to 6). */
  def mahalanobisScore(emb: DataFrame, id: Column, vec: Column,
                       mean: Seq[Double],
                       precision: Seq[Seq[Double]]): DataFrame = {
    val d = mean.length
    require(d > 0 && precision.length == d && precision.forall(_.length == d),
      s"precision must be ${d}x$d to match the mean")
    val centered = emb.select(id.as("vec_id") +:
      (0 until d).map(i =>
        (element_at(vec, i + 1).cast("double") - lit(mean(i)))
          .as(s"_c$i")): _*)
    val m2 = (for (i <- 0 until d; j <- 0 until d)
      yield col(s"_c$i") * col(s"_c$j") * lit(precision(i)(j)))
      .reduce(_ + _)
    centered.select(col("vec_id"), round(m2, 6).as("m2"))
  }

  /** Mahalanobis score from a FITTED model — the scale path for real
    * embedding widths. `m2 = Σ_k ⟨x − μ, v_k⟩² / (λ_k + ridge)` over the
    * model's components: with a full-rank fit (k = dim) this equals
    * `(x − μ)ᵀ P (x − μ)` exactly (spec'd); with k < dim it scores the
    * top-k whitened subspace only. O(k·d) array-kernel work per row via
    * [[Similarity.dot]] (rewritten to the native ArrayDot by
    * `RewriteHofCosine`) instead of [[mahalanobisScore]]'s d² scalar
    * terms, which at d = 64 would emit a 4096-term projection — past the
    * JVM method-size cliff where codegen silently degrades. The centered
    * array is bound once as a column with k consumers, so it survives
    * CollapseProject un-replicated (the HOF-lambda no-CSE lesson).
    * Map-only; model literals ride the plan. */
  def mahalanobisFromModel(emb: DataFrame, id: Column, vec: Column,
                           model: Model, ridge: Double = 1e-9): DataFrame = {
    require(ridge >= 0.0, s"ridge must be >= 0: $ridge")
    val centered = emb.select(id.as("vec_id"),
      zip_with(Similarity.asDouble(vec), typedlit(model.mean.toSeq),
        (x, m) => x - m).as("_c"))
    // each component's dot is bound ONCE as a column and consumed twice
    // (squared) — never `dot * dot`, which would replicate the whole
    // array-dot subtree per component (the no-CSE trap)
    val projections = centered.select(col("vec_id") +:
      model.components.zipWithIndex.map { case (comp, k) =>
        Similarity.dot(col("_c"), typedlit(comp.toSeq)).as(s"_p$k")
      }: _*)
    val m2 = model.eigenvalues.zipWithIndex.map { case (lam, k) =>
      col(s"_p$k") * col(s"_p$k") / lit(lam + ridge)
    }.reduce(_ + _)
    projections.select(col("vec_id"), round(m2, 6).as("m2"))
  }

  /** Project onto the top components: map-side only, one pass.
    * Output: (id, pc ∈ [1, k], value rounded to 6) — flat scalars, exploded
    * (the driver's rows-only comparator requires sortable cells). */
  def project(emb: DataFrame, id: Column, vec: Column, model: Model): DataFrame = {
    val centered = zip_with(Similarity.asDouble(vec),
      typedlit(model.mean.toSeq), (x, m) => x - m)
    val scores = array(model.components.zipWithIndex.map { case (comp, c) =>
      struct(lit(c + 1).cast("long").as("pc"),
        round(Similarity.dot(centered, typedlit(comp.toSeq)), 6).as("value"))
    }: _*)
    emb.select(id.as("vec_id"), explode(scores).as("e"))
      .select(col("vec_id"), col("e.pc").as("pc"), col("e.value").as("value"))
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: rotate away
    * the largest off-diagonal elements sweep by sweep until convergence.
    * Returns (eigenvalues descending, matching orthonormal eigenvectors as
    * ROWS, each sign-fixed: largest-|entry| positive). Pure and
    * deterministic — unit-testable without Spark. */
  private[graft] def jacobiEigen(a0: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    val a = Array.tabulate(n, n)((i, j) => a0(i)(j))
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    val tol = 1e-14 * math.max(1.0, frobenius(a))
    while (off > tol && sweep < 100) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          if (math.abs(a(p)(q)) > tol / (n * n)) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val t =
              if (theta == 0.0) 1.0
              else math.signum(theta) /
                (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < n) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < n) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    val order = (0 until n).sortBy(i => -a(i)(i))
    val values = order.map(i => a(i)(i)).toArray
    val vectors = order.map { col =>
      val vec = Array.tabulate(n)(r => v(r)(col))
      val m = vec.indices.maxBy(i => (math.abs(vec(i)), -i))
      if (vec(m) < 0) vec.map(-_) else vec
    }.toArray
    (values, vectors)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = 0
      while (j < a.length) {
        if (i != j) s += a(i)(j) * a(i)(j)
        j += 1
      }
      i += 1
    }
    math.sqrt(s)
  }

  private def frobenius(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = 0
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    math.sqrt(s)
  }
}
