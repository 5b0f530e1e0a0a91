package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trainable document-quality classifier — the fastText/LR-style
  * curated-vs-crawl filter every large pretraining pipeline runs (GPT-3's
  * quality LR against WebText, CCNet's fastText stage; public recipes).
  * Logistic regression over EXACT-INTEGER text features, trained with
  * full-batch gradient descent expressed as Spark aggregations: per
  * iteration ONE pass over the (cached) feature frame computes the
  * d-component gradient and the loss; the driver only ever holds the
  * weight vector — model-scale state, the `ivfTrainCentroids` contract.
  * Scoring is a map-only dot product, and with integer weights the margin
  * is exact BIGINT arithmetic — SQL-replayable (the fixed-model oracle
  * trick: `q_lr_margin`).
  *
  * Features standardize internally (GD on raw counts with 500× scale
  * spread would need per-feature rates); the returned model is FOLDED BACK
  * to raw-feature space, so callers score raw features directly.
  *
  * No counterpart in the reference pipeline (its quality gates are
  * hand-set thresholds — `SURVEY.md` §2.7); this generalizes them to a
  * trained gate over the same style of features.
  */
object Classifier {

  /** Exact-integer per-doc features, every one SQL-replayable (mirrors of
    * the green `q_doc_stats` oracle): [bias=1, n_tokens, n_chars,
    * stopword_hits, n_digit_chars, n_word_tokens]. */
  def docFeatures(text: Column, stopwords: Seq[String]): Column =
    array(docFeatureCols(text, stopwords): _*)

  /** The feature columns individually (same order as [[docFeatures]]) —
    * for margins built WITHOUT array indexing: each feature subtree appears
    * exactly once in the plan, so there is nothing for subexpression
    * elimination to replicate. Binding the array through a projection is
    * NOT enough — CollapseProject re-inlines it into every consumer (the
    * filter+aggregate of the threshold sweep tripped the Janino "not an
    * rvalue" fallback that way). */
  def docFeatureCols(text: Column, stopwords: Seq[String]): Seq[Column] = Seq(
    lit(1L),
    size(TextOps.tokens(text)).cast("long"),
    length(text).cast("long"),
    element_at(TextOps.markerCounts(text, Seq(stopwords)), 1),
    regexp_count(text, lit("[0-9]")).cast("long"),
    regexp_count(text, lit("[a-z0-9]+")).cast("long"))

  /** Integer margin Σ wᵢ·fᵢ over a long-feature array — exact BIGINT
    * arithmetic end to end (the oracled scoring shape; thresholding a
    * monotone sigmoid IS thresholding the margin). */
  def intMargin(features: Column, w: Seq[Long]): Column =
    w.zipWithIndex.map { case (wi, i) =>
      lit(wi) * element_at(features, i + 1)
    }.reduce(_ + _)

  /** Integer margin straight from the text — the codegen-safe scoring
    * shape (see [[docFeatureCols]]). */
  def intMarginOf(text: Column, stopwords: Seq[String],
                  w: Seq[Long]): Column =
    w.zip(docFeatureCols(text, stopwords))
      .map { case (wi, f) => lit(wi) * f }.reduce(_ + _)

  /** Double margin straight from the text against a trained raw-space
    * model (same single-use-per-feature construction). */
  def marginOf(text: Column, stopwords: Seq[String],
               w: Array[Double]): Column =
    w.toSeq.zip(docFeatureCols(text, stopwords))
      .map { case (wi, f) => lit(wi) * f.cast("double") }.reduce(_ + _)

  /** Double margin against a trained raw-space model. */
  def margin(features: Column, w: Array[Double]): Column =
    w.zipWithIndex.map { case (wi, i) =>
      lit(wi) * element_at(features, i + 1).cast("double")
    }.reduce(_ + _)

  /** Full-batch GD for L2-regularized logistic regression.
    *
    * `df` must carry `features` (array<bigint>, element 0 the constant 1)
    * and `label` (0/1). Internally standardizes features 1..d−1 to zero
    * mean / unit variance (one aggregation), then runs `iters` passes:
    * margin → sigmoid → error, gradient via posexplode + groupBy(pos) —
    * d rows to the driver per pass. Deterministic: no sampling, no
    * row-order dependence (sums commute up to FP association; at these
    * feature dims the 1e-16 jitter is far below the 1e-6 convergence
    * scale).
    *
    * Returns (rawWeights, perIterationLoss): rawWeights fold the
    * standardization back so `margin(features, rawWeights)` scores RAW
    * integer features; loss is mean log-loss, for convergence asserts. */
  def trainLogReg(df: DataFrame, features: Column, label: Column,
                  iters: Int = 30, lr: Double = 0.5,
                  l2: Double = 0.0): (Array[Double], Seq[Double]) = {
    import org.apache.spark.storage.StorageLevel
    val base = df.select(features.as("f"), label.cast("double").as("y"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val d = base.select(size(col("f"))).head.getInt(0)
      val n = base.count().toDouble
      require(n > 0, "trainLogReg: empty input")
      // standardization stats for features 1..d-1 (0 is the bias)
      val stats = base.select(posexplode(col("f")).as(Seq("pos", "x")))
        .groupBy(col("pos"))
        .agg(avg(col("x")).as("m"), stddev_pop(col("x")).as("s"))
        .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2)))
        .toMap
      val means = Array.tabulate(d)(i => if (i == 0) 0.0 else stats(i)._1)
      val stds = Array.tabulate(d) { i =>
        val s = if (i == 0) 1.0 else stats(i)._2
        if (s == 0.0) 1.0 else s // constant feature: leave it centered
      }
      val std = zip_with(col("f").cast("array<double>"),
        typedLit(means.toSeq), (x, m) => x - m)
      val xs = zip_with(std, typedLit(stds.toSeq), (x, s) => x / s)
      val frame = base.select(xs.as("xs"), col("y"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      try {
        frame.count() // materialize once; iterations reuse the cache
        var w = new Array[Double](d)
        val losses = scala.collection.mutable.ArrayBuffer.empty[Double]
        var it = 0
        while (it < iters) {
          val p = lit(1.0) / (lit(1.0) +
            exp(-margin(col("xs"), w)))
          val rows = frame
            .select(col("y"), p.as("p"),
              posexplode(col("xs")).as(Seq("pos", "x")))
            .groupBy(col("pos"))
            .agg(sum((col("p") - col("y")) * col("x")).as("g"),
              // log-loss with clamped probabilities (exactly-0/1 sigmoid
              // is impossible at finite margins, the clamp is belt and
              // braces); every pos row carries the same total
              sum(-(col("y") * log(greatest(col("p"), lit(1e-15))) +
                (lit(1.0) - col("y")) *
                  log(greatest(lit(1.0) - col("p"), lit(1e-15)))))
                .as("ll"))
            .collect()
          val grad = new Array[Double](d)
          var loss = 0.0
          rows.foreach { r =>
            grad(r.getInt(0)) = r.getDouble(1) / n + l2 * w(r.getInt(0))
            loss = r.getDouble(2) / n
          }
          var i = 0
          while (i < d) { w(i) -= lr * grad(i); i += 1 }
          losses += loss
          it += 1
        }
        // fold standardization into the weights: margin over raw features
        // equals the trained std-space margin
        val raw = new Array[Double](d)
        var i = 1
        while (i < d) { raw(i) = w(i) / stds(i); i += 1 }
        raw(0) = w(0) - (1 until d).map(j => w(j) * means(j) / stds(j)).sum
        (raw, losses.toSeq)
      } finally frame.unpersist(blocking = false)
    } finally base.unpersist(blocking = false)
  }

  /** Map-only scoring with a trained raw-space model: (margin, p, keep).
    * Margin binds through a column before reuse — replicating the
    * element_at-over-array(...) subtree per consumer trips a Spark codegen
    * bug under subexpression elimination and silently drops the whole
    * projection to interpreted mode (observed on the parquet-scan path;
    * `q_lr_margin`'s entry documents the same rule). */
  def score(df: DataFrame, features: Column, w: Array[Double],
            threshold: Double = 0.5): DataFrame =
    df.withColumn("margin", margin(features, w))
      .withColumn("p", lit(1.0) / (lit(1.0) + exp(-col("margin"))))
      .withColumn("keep", col("p") >= threshold)
}
