package graft

import graft.engine.{Similarity, Tables}
import org.apache.spark.sql.functions._

class ExpressionSpec extends SparkSpec {
  import spark.implicits._

  test("native graft_cosine == HOF cosine on real embeddings") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))
    val q = emb.limit(1).select(col("v").as("qv"))
    val both = emb.crossJoin(q)
      .select(
        Similarity.cosine(col("v"), col("qv")).as("native"),
        Similarity.cosineHof(col("v"), col("qv")).as("hof"))
      .collect()
    both.foreach { r =>
      r.getDouble(0) shouldBe (r.getDouble(1) +- 1e-12)
    }
  }

  test("null / zero-vector semantics match") {
    val df = Seq(
      (Some(Array(1.0, 2.0)), Some(Array(1.0, 2.0))),
      (None: Option[Array[Double]], Some(Array(1.0, 2.0))),
      (Some(Array(0.0, 0.0)), Some(Array(1.0, 2.0)))
    ).toDF("a", "b")
    val out = df.select(Similarity.cosine(col("a"), col("b")).as("c")).collect()
    out(0).getDouble(0) shouldBe (1.0 +- 1e-12)
    out(1).isNullAt(0) shouldBe true
    out(2).getDouble(0).isNaN shouldBe true // 0/0 — same as the HOF path
  }

  test("null ELEMENT nulls the result (matches HOF propagation)") {
    val df = Seq((Seq(Some(1.0), None), Seq(Some(1.0), Some(2.0))))
      .toDF("a", "b")
    df.select(Similarity.cosine(col("a"), col("b")).as("native"),
        Similarity.cosineHof(col("a"), col("b")).as("hof"))
      .head() match {
      case r =>
        r.isNullAt(0) shouldBe true
        r.isNullAt(1) shouldBe true
    }
  }

  test("graft_cosine is callable from SQL after registration") {
    GraftExtensions.registerOn(spark)
    spark.sql("SELECT graft_cosine(array(0.0d, 3.0d), array(0.0d, 6.0d)) AS c")
      .head().getDouble(0) shouldBe (1.0 +- 1e-12)
  }
}
