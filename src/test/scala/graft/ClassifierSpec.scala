package graft

import graft.engine.{Classifier, Tables, TextOps}
import org.apache.spark.sql.functions._

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val en = TextOps.langMarkers.toMap.apply("en")

  test("trainLogReg: separates a linearly separable corpus (acc 1.0), " +
    "loss decreases monotonically, deterministic, fold-back consistent") {
    // two deterministic populations the feature vector separates on
    // stopword density and digit count: "curated" prose vs "spam"
    val docs = (0 until 60).map { i =>
      if (i % 2 == 0)
        (i.toLong, "the quick story of a fox and the lazy dog is " +
          s"told again in chapter ${i / 2} of the long book", 1)
      else
        (i.toLong, s"buy now 4 4 4 ${i}99 click 77 win ${i}00 zz " +
          s"free 55 prize ${i}11 xx", 0)
    }.toDF("doc_id", "text", "label")
    val feats = Classifier.docFeatures(col("text"), en)
    val (w, losses) = Classifier.trainLogReg(docs, feats, col("label"))
    // monotone loss under full-batch GD at a stable rate
    losses.zip(losses.tail).foreach { case (a, b) =>
      b should be <= a + 1e-12
    }
    losses.last should be < losses.head
    // perfect training accuracy on the separable fixture
    val scored = Classifier.score(docs, feats, w)
      .select(col("label"), col("keep")).collect()
    scored.foreach { r => (r.getInt(0) == 1) shouldBe r.getBoolean(1) }
    // deterministic end to end
    val (w2, losses2) = Classifier.trainLogReg(docs, feats, col("label"))
    w.toSeq shouldBe w2.toSeq
    losses shouldBe losses2
    // fold-back consistency: raw-space margin reproduces the train-space
    // decision on every row (sign agreement is what the fold guarantees)
    val margins = docs.select(col("label"),
      Classifier.margin(feats, w).as("m")).collect()
    margins.foreach { r => (r.getDouble(1) >= 0) shouldBe (r.getInt(0) == 1) }
  }

  test("trainLogReg on real documents: source-label task learns better " +
    "than the prior; integer margin is exact and matches the long math") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("label", (col("source") === "src0").cast("int"))
    val feats = Classifier.docFeatures(col("text"), en)
    val (_, losses) = Classifier.trainLogReg(docs, feats, col("label"),
      iters = 15)
    // src0 is 1/8 of sources: prior log-loss = H(1/8) ≈ 0.3768; training
    // must do at least as well (features may carry little signal — the
    // assert is learning, not separability)
    losses.last should be < 0.3769

    // intMargin: BIGINT-exact against a driver-side recompute (features
    // bound through a projection first — the q_lr_margin codegen rule)
    val w = Seq(-400L, 7L, -1L, 120L, -3L, 5L)
    val rows = docs.select(col("doc_id"), feats.as("f"))
      .select(col("doc_id"), col("f"),
        Classifier.intMargin(col("f"), w).as("m")).collect()
    rows.foreach { r =>
      val f = r.getSeq[Long](1)
      r.getLong(2) shouldBe f.zip(w).map { case (x, wi) => x * wi }.sum
    }
    // the codegen-safe single-use construction (what the oracled queries
    // run) computes the same margin as the array form
    val direct = docs.select(col("doc_id"),
        Classifier.intMarginOf(col("text"), en, w).as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r => direct(r.getLong(0)) shouldBe r.getLong(2) }
  }
}
