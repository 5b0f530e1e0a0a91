package graft

import graft.engine.TextOps
import org.apache.spark.sql.functions._

class TextPrepSpec extends SparkSpec {
  import spark.implicits._

  test("redactPii: emails, URLs, digit runs → typed placeholders") {
    val out = Seq(
      "mail bob.smith+x@corp.example.co for details",
      "see https://a.io/p?q=1 and http://b.c/d now",
      "card 12345678 ok but zip 12345 stays",
      "clean text with no pii at all"
    ).toDF("text").select(TextOps.redactPii(col("text")).as("t"))
      .collect().map(_.getString(0))
    out(0) shouldBe "mail <EMAIL> for details"
    out(1) shouldBe "see <URL> and <URL> now"
    out(2) shouldBe "card <NUM> ok but zip 12345 stays" // 5 digits < 7 kept
    out(3) shouldBe "clean text with no pii at all"
  }

  test("redactPii: email replaced before its domain can half-match a URL") {
    Seq("ping a@ex.com https://ex.com/x 99999990")
      .toDF("text").select(TextOps.redactPii(col("text")).as("t"))
      .head().getString(0) shouldBe "ping <EMAIL> <URL> <NUM>"
  }

  test("chunkDocs: windows, overlap, ragged tail, short doc") {
    val docs = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"), // 10 tokens
      (2L, "a b")                              // shorter than one chunk
    ).toDF("doc_id", "text")
    val out = TextOps.chunkDocs(docs, col("doc_id"), col("text"),
        chunkSize = 4, overlap = 1) // stride 3 → starts 0,3,6,9
      .orderBy("doc_id", "chunk_ix").collect()
    val d1 = out.filter(_.getLong(0) == 1L)
    d1.map(_.getLong(1)) shouldBe Array(0L, 1L, 2L, 3L)
    d1.map(_.getString(2)) shouldBe Array(
      "t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10", "t10")
    d1.map(_.getLong(3)) shouldBe Array(4L, 4L, 4L, 1L)
    // consecutive chunks overlap by exactly `overlap` tokens
    d1.sliding(2).foreach { case Array(a, b) =>
      a.getString(2).split(" ").takeRight(1).toSeq shouldBe
        b.getString(2).split(" ").take(1).toSeq
    }
    val d2 = out.filter(_.getLong(0) == 2L)
    d2.map(_.getString(2)) shouldBe Array("a b")
    d2.map(_.getLong(3)) shouldBe Array(2L)
  }

  test("vocabulary: counts with deterministic tie-break at the k boundary") {
    val docs = Seq("b b b a c", "c a", "d").toDF("text")
    val out = TextOps.vocabulary(docs, col("text"), k = 3).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // a and c tie at 2 → both precede d (count 1) via the token tiebreak
    out shouldBe Array(("b", 3L), ("a", 2L), ("c", 2L))
  }

  test("redactPii is idempotent on real documents (placeholders never re-match)") {
    val docs = graft.engine.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(concat(col("text"), lit(" x@y.io https://z.a 123456789"))
        .as("text"))
    val once = docs.select(TextOps.redactPii(col("text")).as("t"))
    val twice = once.select(TextOps.redactPii(col("t")).as("t"))
    once.collect().map(_.getString(0)).toSeq shouldBe
      twice.collect().map(_.getString(0)).toSeq
  }

  test("chunkDocs covers every token of every real document") {
    val docs = graft.engine.Tables.documents(spark, "/root/testdata/sf0.001")
    val reconstructed = TextOps.chunkDocs(docs, col("doc_id"), col("text"),
        chunkSize = 16, overlap = 0)
      .groupBy("doc_id")
      .agg(concat_ws(" ", array_sort(collect_list(
        struct(col("chunk_ix"), col("chunk_text"))))
        .getField("chunk_text")).as("r"))
    // zero-overlap chunks concatenated in chunk_ix order == original text
    val joined = docs.select(col("doc_id"), col("text"))
      .join(reconstructed, "doc_id")
    joined.filter(col("text") =!= col("r")).count() shouldBe 0
  }

  test("chunkDocs: zero overlap partitions the token stream exactly") {
    val docs = Seq((1L, (1 to 9).map("w" + _).mkString(" ")))
      .toDF("doc_id", "text")
    val out = TextOps.chunkDocs(docs, col("doc_id"), col("text"),
        chunkSize = 3, overlap = 0)
      .orderBy("chunk_ix").collect()
    out.flatMap(_.getString(2).split(" ")) shouldBe
      (1 to 9).map("w" + _).toArray // lossless, no duplication
  }
}
