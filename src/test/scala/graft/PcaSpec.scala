package graft

import graft.engine.{Pca, Tables}
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {

  test("jacobiEigen: known 3x3 spectrum, orthonormal, sign-fixed") {
    val a = Array(
      Array(2.0, 1.0, 0.0),
      Array(1.0, 2.0, 0.0),
      Array(0.0, 0.0, 5.0))
    val (vals, vecs) = Pca.jacobiEigen(a)
    vals(0) shouldBe 5.0 +- 1e-12
    vals(1) shouldBe 3.0 +- 1e-12
    vals(2) shouldBe 1.0 +- 1e-12
    vecs(0)(2) shouldBe 1.0 +- 1e-12 // (0,0,1), sign-fixed positive
    vecs(1)(0) shouldBe math.sqrt(0.5) +- 1e-12 // (1,1,0)/√2
    vecs(2)(0) shouldBe math.sqrt(0.5) +- 1e-12 // (1,-1,0)/√2, first-entry +
    vecs(2)(1) shouldBe -math.sqrt(0.5) +- 1e-12
    for (i <- 0 until 3; j <- 0 until 3) {
      val d = (0 until 3).map(k => vecs(i)(k) * vecs(j)(k)).sum
      d shouldBe (if (i == j) 1.0 else 0.0) +- 1e-12
    }
  }

  test("covariance moments: hand-computed on a fixture with null vectors " +
    "and null elements (the exploded-form semantics, pinned); ragged throws") {
    import spark.implicits._
    // quantization is floor(x·10⁶): pick values exact in micro-units
    val rows: Seq[Seq[java.lang.Double]] = Seq(
      Seq[java.lang.Double](1.0, 2.0),
      Seq[java.lang.Double](3.0, null), // null element: skipped in its sums
      null                              // null vector: contributes nothing
    )
    val df = rows.toDF("v")
    val out = Pca.covariance(df, col("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDecimal(3).longValueExact,
          r.getDecimal(4).longValueExact, r.getDecimal(5).longValueExact))
      .toMap
    // n counts the two non-null vectors for EVERY pair (the old
    // count(lit(1)) counted the pair row even with null elements)
    out((0L, 0L)) shouldBe ((2L, 4000000L, 4000000L, 10000000000000L))
    // s_i sums non-null q(i) over both rows; s_ij only where both non-null
    out((0L, 1L)) shouldBe ((2L, 4000000L, 2000000L, 2000000000000L))
    out((1L, 1L)) shouldBe ((2L, 2000000L, 2000000L, 4000000000000L))
    out.size shouldBe 3
    // ragged dimensions are a hard error, not silent per-pair counts
    val ragged = Seq(Seq[java.lang.Double](1.0), Seq[java.lang.Double](1.0, 2.0))
      .toDF("v")
    intercept[Exception] {
      Pca.covariance(ragged, col("v")).collect()
    }
  }

  test("covariance moments survive 64-bit overflow: sums past Long.MaxValue " +
    "are exact DECIMAL(38,0), in ONE task and across merged tasks") {
    import spark.implicits._
    // q = 3·10⁹ per row → each product is 9·10¹⁸ (just under Long.Max);
    // three rows sum to 2.7·10¹⁹ — impossible in 64 bits
    val rows = Seq.fill(3)(Seq(3000.0))
    def sij(df: org.apache.spark.sql.DataFrame): java.math.BigDecimal =
      Pca.covariance(df, col("v")).collect()(0).getDecimal(5)
    val expected = new java.math.BigDecimal("27000000000000000000")
    sij(rows.toDF("v").coalesce(1)) shouldBe expected          // update path
    sij(rows.toDF("v").repartition(3)) shouldBe expected       // merge path
    // per-row products beyond long range fail LOUDLY, never wrap
    intercept[Exception] {
      Pca.covariance(Seq(Seq(4000.0)).toDF("v"), col("v")).collect()
    }
  }

  test("covariance moments survive NEGATIVE 64-bit overflow: mixed-sign " +
    "products past Long.MinValue, in ONE task and across merged tasks") {
    import spark.implicits._
    // q = (3·10⁹, −3·10⁹) per row → each cross product is −9·10¹⁸ (just
    // above Long.Min); three rows sum to −2.7·10¹⁹ — drives the lo-word
    // carry with a NEGATIVE hi word, the sign path the positive fixture
    // above never touches
    val rows = Seq.fill(3)(Seq(3000.0, -3000.0))
    def sij(df: org.apache.spark.sql.DataFrame): java.math.BigDecimal =
      Pca.covariance(df, col("v")).collect()
        .find(r => r.getLong(0) == 0L && r.getLong(1) == 1L).get.getDecimal(5)
    val expected = new java.math.BigDecimal("-27000000000000000000")
    sij(rows.toDF("v").coalesce(1)) shouldBe expected          // update path
    sij(rows.toDF("v").repartition(3)) shouldBe expected       // merge path
  }

  test("property: 128-bit signed add matches BigInt word-for-word over " +
    "mixed-sign longs (update fold and pairwise merge, s and ss lanes)") {
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.{ArrayType, LongType}
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import graft.engine.expressions.{MomentBuffer, MomentMatrix}
    // merge() lives on the aggregate; the child is never evaluated here
    val mm = MomentMatrix(BoundReference(0, ArrayType(LongType), true))
    // bias toward magnitudes that force lo-word carries and sign flips:
    // full-range, near ±Long extremes, and small values that straddle zero
    val vGen: Gen[Long] = Gen.oneOf(
      Gen.choose(Long.MinValue, Long.MaxValue),
      Gen.choose(Long.MaxValue - 1000L, Long.MaxValue),
      Gen.choose(Long.MinValue, Long.MinValue + 1000L),
      Gen.choose(-1000L, 1000L))
    val listGen = Gen.choose(1, 60).flatMap(n => Gen.listOfN(n, vGen))
    // int128 words of the reference sum: hi = s >> 64, lo = low 64 bits
    def words(s: BigInt): (Long, Long) = ((s >> 64).toLong, s.toLong)
    (1 to 50).foreach { i =>
      listGen.apply(Gen.Parameters.default, Seed(7L + i)).foreach { vs =>
        val (hi, lo) = words(vs.map(BigInt(_)).sum)
        // update path: fold every value into one cell via MomentBuffer.add
        val b = new MomentBuffer
        b.init(1)
        vs.foreach(v => b.add(b.sHi, b.sLo, 0, v))
        (b.sHi(0), b.sLo(0)) shouldBe ((hi, lo))
        // merge path: same values split across up to 4 buffers, reduced
        // through MomentMatrix.merge — covers BOTH the s and ss lanes
        // (merge carries them in separate loops)
        val k = 1 + vs.length % 4
        val merged = vs.grouped(math.max(1, (vs.length + k - 1) / k)).map {
          chunk =>
            val c = new MomentBuffer
            c.init(1)
            chunk.foreach { v =>
              c.add(c.sHi, c.sLo, 0, v)
              c.add(c.ssHi, c.ssLo, 0, v)
            }
            c.n = chunk.length
            c
        }.reduce((x, y) => mm.merge(x, y))
        (merged.sHi(0), merged.sLo(0)) shouldBe ((hi, lo))
        (merged.ssHi(0), merged.ssLo(0)) shouldBe ((hi, lo))
        merged.n shouldBe vs.length
      }
    }
  }

  test("fit on real embeddings: orthonormal components, descending " +
    "non-negative spectrum, eigen-equation residual tiny") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val model = Pca.fit(emb, col("embedding"), 4)
    val dim = model.mean.length
    dim shouldBe 64
    for (i <- 0 until 4; j <- 0 until 4) {
      val d = (0 until dim).map(k => model.components(i)(k) *
        model.components(j)(k)).sum
      d shouldBe (if (i == j) 1.0 else 0.0) +- 1e-9
    }
    model.eigenvalues.sliding(2).foreach { case Array(a1, a2) =>
      a1 should be >= a2 - 1e-12
    }
    model.eigenvalues.foreach(_ should be >= -1e-9)
    // eigen-equation ‖Cv − λv‖ ≤ 1e-8·max(1, λ) against the same
    // covariance frame the fit consumed
    val cov = Array.ofDim[Double](dim, dim)
    Pca.covariance(emb, col("embedding")).collect().foreach { r =>
      val (i, j) = (r.getLong(0).toInt, r.getLong(1).toInt)
      cov(i)(j) = r.getDouble(6); cov(j)(i) = r.getDouble(6)
    }
    for (c <- 0 until 4) {
      val v = model.components(c)
      val lam = model.eigenvalues(c)
      val res = math.sqrt((0 until dim).map { i =>
        val cvi = (0 until dim).map(j => cov(i)(j) * v(j)).sum
        val d = cvi - lam * v(i); d * d
      }.sum)
      res should be <= 1e-8 * math.max(1.0, lam)
    }
  }

  test("mahalanobisScore: identity precision is squared L2; asymmetric " +
    "precision weights axes as declared") {
    import spark.implicits._
    val df = Seq((1L, Seq(3.0f, 4.0f)), (2L, Seq(0.0f, 0.0f)),
      (3L, Seq(-1.0f, 2.0f))).toDF("id", "v")
    val eye = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    val l2 = Pca.mahalanobisScore(df, col("id"), col("v"),
        Seq(0.0, 0.0), eye)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    l2(1L) shouldBe 25.0 +- 1e-9
    l2(2L) shouldBe 0.0 +- 1e-9
    l2(3L) shouldBe 5.0 +- 1e-9
    // axis 0 weighted 4×: the (3,4) point now scores 4·9 + 16
    val stretched = Pca.mahalanobisScore(df, col("id"), col("v"),
        Seq(0.0, 0.0), Seq(Seq(4.0, 0.0), Seq(0.0, 1.0)))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    stretched(1L) shouldBe 52.0 +- 1e-9
  }

  test("precision inverts the fitted covariance (P·Σ ≈ I on real " +
    "64-dim embeddings) and mahalanobisFromModel full-rank equals the " +
    "explicit quadratic form") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val dim = 64
    val model = Pca.fit(emb, col("embedding"), dim)
    val p = Pca.precision(model, ridge = 0.0)
    val cov = Array.ofDim[Double](dim, dim)
    Pca.covariance(emb, col("embedding")).collect().foreach { r =>
      val (i, j) = (r.getLong(0).toInt, r.getLong(1).toInt)
      cov(i)(j) = r.getDouble(6); cov(j)(i) = r.getDouble(6)
    }
    for (i <- 0 until dim; j <- 0 until dim) {
      val pij = (0 until dim).map(k => p(i)(k) * cov(k)(j)).sum
      pij shouldBe (if (i == j) 1.0 else 0.0) +- 1e-4
    }
    // full-rank model path == explicit (x−μ)ᵀP(x−μ) on a 3-dim fixture
    // (small d so the d² scalar form stays codegen-friendly)
    import spark.implicits._
    val fx = (0 until 60).map { i =>
      val x = i / 10.0
      val noise = ((i * 37) % 17) / 17.0
      (i.toLong, Seq(x.toFloat, (0.5 * x + noise).toFloat,
        (noise - 0.3 * x).toFloat))
    }.toDF("id", "v")
    val m3 = Pca.fit(fx, col("v"), 3)
    val viaModel = Pca.mahalanobisFromModel(fx, col("id"), col("v"), m3,
        ridge = 1e-9)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaForm = Pca.mahalanobisScore(fx, col("id"), col("v"),
        m3.mean.toSeq, Pca.precision(m3, 1e-9).map(_.toSeq).toSeq)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    viaModel.keySet shouldBe viaForm.keySet
    viaModel.foreach { case (id, m2) =>
      m2 shouldBe viaForm(id) +- math.max(1e-4, 1e-4 * m2)
    }
  }

  test("mahalanobisFromModel: a planted far-outlier tops the scores and " +
    "in-cluster points score low") {
    import spark.implicits._
    val cluster = (0 until 50).map { i =>
      val jx = ((i * 13) % 7 - 3) / 100.0
      val jy = ((i * 29) % 11 - 5) / 100.0
      (i.toLong, Seq((1.0 + jx).toFloat, (2.0 + jy).toFloat))
    }
    val df = (cluster :+ (99L -> Seq(8.0f, -5.0f))).toDF("id", "v")
    val model = Pca.fit(df, col("v"), 2)
    val scores = Pca.mahalanobisFromModel(df, col("id"), col("v"), model)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val top = scores.maxBy(_._2)._1
    top shouldBe 99L
    // the outlier dominates every cluster member by orders of magnitude
    val clusterMax = (scores - 99L).values.max
    scores(99L) should be > 10.0 * clusterMax
    scores.values.foreach(_ should be >= 0.0)
  }

  test("project: per-component variance equals its eigenvalue; fit is " +
    "deterministic") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val model = Pca.fit(emb, col("embedding"), 2)
    val out = Pca.project(emb, col("vec_id"), col("embedding"), model)
    val stats = out.groupBy(col("pc"))
      .agg(avg(col("value")).as("m"),
        avg(col("value") * col("value")).as("m2"))
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2)))).toMap
    for (c <- 1 to 2) {
      val (m, m2) = stats(c.toLong)
      val lam = model.eigenvalues(c - 1)
      (m2 - m * m) shouldBe lam +- math.max(1e-5, 1e-3 * lam)
    }
    val again = Pca.fit(emb, col("embedding"), 2)
    again.eigenvalues.toSeq shouldBe model.eigenvalues.toSeq
    again.components.map(_.toSeq).toSeq shouldBe
      model.components.map(_.toSeq).toSeq
  }

  test("q_pca_project_fixed basis: exactly orthonormal Hadamard rows; " +
    "projection replays in a plain driver fold bit-for-bit") {
    import spark.implicits._
    // the SparkEntry fixed model, re-declared locally (literals on both
    // sides — the point of the fixed-model pattern)
    val mean = Array.fill(64)(0.05)
    val comps = Array.tabulate(4, 64)((b, k) =>
      if (((k >> b) & 1) == 1) -0.125 else 0.125)
    for (a <- 0 until 4; b <- 0 until 4) {
      val dot = (0 until 64).map(k => comps(a)(k) * comps(b)(k)).sum
      dot shouldBe (if (a == b) 1.0 else 0.0) // exact: dyadic arithmetic
    }
    val model = Pca.Model(mean, comps, Array(1.0, 1.0, 1.0, 1.0))
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val out = Pca.project(emb, col("vec_id"), col("embedding"), model)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    vecs.size should be > 0
    out.size shouldBe vecs.size * 4
    // independent replay in the kernel's exact order: ((x0-m)*c0) + ...
    vecs.foreach { case (id, v) =>
      for (b <- 0 until 4) {
        var dot = 0.0
        var i = 0
        while (i < 64) { dot += (v(i) - 0.05) * comps(b)(i); i += 1 }
        val expected = BigDecimal(dot)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        withClue(s"vec $id pc ${b + 1}: ") {
          out((id, (b + 1).toLong)) shouldBe expected
        }
      }
    }
  }
}
