package graft

import graft.engine.{Similarity, Tables}
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosineTopK: exact ranking on a known tiny corpus") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)), // closest to 0
      (2L, Array(0.0f, 1.0f, 0.0f)), // orthogonal to 0
      (3L, Array(0.5f, 0.5f, 0.0f))
    ).toDF("vec_id", "embedding")
    val top = Similarity.cosineTopK(vecs, col("vec_id"), col("embedding"),
      Seq(0L), 2).orderBy("rn").collect()
    top.map(_.getLong(1)) shouldBe Array(1L, 3L)
    top(0).getDouble(2) should be > 0.99
  }

  test("LSH ANN: recall vs brute force on testdata sf0.001") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val qs = Seq(0L, 1L, 2L)
    val exact = Similarity.cosineTopK(emb, col("vec_id"), col("embedding"), qs, 5)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshCosineTopK(emb, col("vec_id"), col("embedding"), qs, 5)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    // deterministic planes + data → deterministic recall; pin a floor
    recall should be >= 0.4
    approx.size should be <= exact.size // never returns more than k per query
  }

  test("signature determinism: hyperplanes are JVM-independent constants") {
    val p1 = Similarity.hyperplanes(4, 8)
    val p2 = Similarity.hyperplanes(4, 8)
    p1.flatten.toSeq shouldBe p2.flatten.toSeq
    p1.flatten.toSet shouldBe Set(1.0, -1.0)
  }
}
