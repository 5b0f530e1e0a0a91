package graft

import graft.engine.{Flows, NearDup, Sampling, Tables, TextOps}
import org.apache.spark.sql.functions._

/** Integration: the full training-data prep train composed end-to-end on
  * real testdata — clean (dedup + quality) → decontaminate → mix to target
  * shares → redact → chunk → vocabulary. Asserts the stages agree with each
  * other (monotone row counts, chunk accounting vs token budget, vocabulary
  * drawn only from surviving docs), not just that each runs. */
class CorpusPipelineSpec extends SparkSpec {

  test("corpus prep train: clean -> decontaminate -> mix -> chunk -> vocab") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val en = TextOps.langMarkers.toMap.apply("en")
    val total = docs.count()

    // 1. clean: exact dedup + near-dup clusters + quality floor
    val cleaned = Flows.corpusClean(docs, col("doc_id"), col("text"), en)
    try {
    val nCleaned = cleaned.count()
    nCleaned should be > 0L
    nCleaned should be < total // the planted dups + low-quality docs fall

    // 2. decontaminate against the src0 "eval set"
    val contaminated = NearDup.contaminationPairs(
        cleaned.filter(col("source") =!= "src0"), col("doc_id"), col("text"),
        docs.filter(col("source") === "src0"), col("doc_id"), col("text"),
        0.5)
      .select(col("corpus_id").as("doc_id")).distinct()
    val decontaminated = cleaned.filter(col("source") =!= "src0")
      .join(contaminated, Seq("doc_id"), "left_anti")
    val nDecon = decontaminated.count()
    nDecon should be > 0L
    nDecon should be <= nCleaned

    // 3. mix to target shares over the surviving corpus
    val mixed = Sampling.mixToShares(decontaminated, col("doc_id"),
      col("source"), Map("src1" -> 0.5, "src2" -> 0.5))
    val mixedSources = mixed.select("source").distinct()
      .collect().map(_.getString(0)).toSet
    mixedSources.subsetOf(Set("src1", "src2")) shouldBe true
    mixed.count() should be > 0L

    // 4. redact + chunk; chunk token accounting must match the doc totals
    val redacted = mixed.select(col("doc_id"),
      TextOps.redactPii(col("text")).as("text"))
    val chunks = TextOps.chunkDocs(redacted, col("doc_id"), col("text"),
      chunkSize = 32, overlap = 0)
    val chunkTokens = chunks.agg(sum("n_tokens")).head().getLong(0)
    val docTokens = redacted
      .agg(sum(TextOps.tokenCount(col("text")))).head().getLong(0)
    chunkTokens shouldBe docTokens // zero overlap => exact partition

    // 5. vocabulary over the final chunks — every vocab token must occur in
    // the surviving text (drawn from chunks, not the raw corpus)
    val vocab = TextOps.vocabulary(chunks, col("chunk_text"), 20)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    vocab.length should be > 0
    vocab.map(_._2).toSeq shouldBe vocab.map(_._2).sortBy(-_).toSeq // ranked
    val vocabTotal = vocab.map(_._2).sum
    vocabTotal should be <= chunkTokens
    // release even on assertion failure — a leaked checkpoint taxes every
    // later suite in the shared JVM-wide session
    } finally NearDup.releaseCheckpoint(cleaned)
  }
}
