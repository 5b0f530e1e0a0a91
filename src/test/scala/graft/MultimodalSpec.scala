package graft

import graft.engine.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq((0L, "abcdefgh"), (1L, "zzzz"), (2L, "a"))
    .toDF("doc_id", "text")

  test("asMedia: binary payload with cycling kind metadata") {
    val m = Multimodal.asMedia(docs, col("doc_id"), col("text"))
      .orderBy("media_id").collect()
    m.map(_.getString(1)) shouldBe Array("image", "audio", "video")
    new String(m(0).getAs[Array[Byte]](2)) shouldBe "abcdefgh"
  }

  test("extractFeatures: deterministic normalized histogram per payload") {
    val out = Multimodal.extractFeatures(
        Multimodal.asMedia(docs, col("doc_id"), col("text")))
      .orderBy("media_id").collect()
    out(0).getLong(2) shouldBe 8L // n_bytes
    val hist = out(0).getSeq[Double](3)
    hist.length shouldBe 8
    hist.sum shouldBe (1.0 +- 1e-4) // normalized
    // run twice → identical (stub is deterministic)
    val again = Multimodal.extractFeatures(
        Multimodal.asMedia(docs, col("doc_id"), col("text")))
      .orderBy("media_id").collect()
    again(0).getSeq[Double](3) shouldBe hist
  }

  test("extractFeatures: custom decoder flows through the same plumbing") {
    // stand-in for a real media decoder: kind-tagged length + first byte
    val decoder: Multimodal.Decoder = (kind, bytes) =>
      Array(kind.length.toDouble, bytes.length.toDouble,
        if (bytes.nonEmpty) (bytes(0) & 0xff).toDouble else -1.0)
    val out = Multimodal.extractFeatures(
        Multimodal.asMedia(docs, col("doc_id"), col("text")), decoder)
      .orderBy("media_id").collect()
    out(0).getSeq[Double](3) shouldBe Seq(5.0, 8.0, 'a'.toInt.toDouble)
    out(1).getSeq[Double](3) shouldBe Seq(5.0, 4.0, 'z'.toInt.toDouble)
    out.map(_.getLong(2)) shouldBe Array(8L, 4L, 1L) // n_bytes unchanged
  }

  test("sampleFrames: every-nth-byte rows") {
    val frames = Multimodal.sampleFrames(
        Multimodal.asMedia(docs, col("doc_id"), col("text")), everyN = 4)
      .filter(col("media_id") === 0L).orderBy("frame_offset").collect()
    frames.map(_.getLong(2)) shouldBe Array(0L, 4L)
    frames(0).getInt(3) shouldBe 'a'.toInt
  }
}
