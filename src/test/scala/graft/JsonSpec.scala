package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.engine.Ingest

/** Semi-structured JSON column extraction (Ingest.withJsonFields /
  * inferJsonSchema). */
class JsonSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    (1L, """{"k": 7, "tag": "a", "nest": {"x": 1.5}}"""),
    (2L, """{"k": 9}"""),                     // missing fields → null
    (3L, """not json at all"""),              // malformed → all null
    (4L, null.asInstanceOf[String]),          // null payload → all null
    (5L, """{"k": "notanumber"}"""))          // type mismatch → null field

  test("withJsonFields: typed extraction, PERMISSIVE nulls") {
    val df = rows.toDF("id", "props")
    val schema = StructType(Seq(
      StructField("k", LongType),
      StructField("tag", StringType)))
    val out = Ingest.withJsonFields(df, "props", schema)
      .select("id", "k", "tag").as[(Long, Option[Long], Option[String])]
      .collect().map { case (id, k, t) => id -> ((k, t)) }.toMap
    out(1L) shouldBe ((Some(7L), Some("a")))
    out(2L) shouldBe ((Some(9L), None))
    out(3L) shouldBe ((None, None))
    out(4L) shouldBe ((None, None))
    out(5L) shouldBe ((None, None))
  }

  test("withJsonFields: nested struct field") {
    val df = rows.toDF("id", "props")
    val schema = StructType(Seq(
      StructField("nest", StructType(Seq(StructField("x", DoubleType))))))
    val out = Ingest.withJsonFields(df, "props", schema)
      .select(col("id"), col("nest.x").as("x"))
      .as[(Long, Option[Double])].collect().toMap
    out(1L) shouldBe Some(1.5)
    out(2L) shouldBe None
  }

  test("inferJsonSchema: sample-derived schema covers observed fields") {
    val df = rows.toDF("id", "props")
    val s = Ingest.inferJsonSchema(df, "props", sampleRows = 10)
    s.fieldNames should contain allOf ("k", "tag", "nest")
  }

  test("inferJsonSchema → withJsonFields round trip on events-like payloads") {
    val df = (0 until 200).map(i => (i.toLong, s"""{"k": ${i % 13}}"""))
      .toDF("event_id", "props")
    val s = Ingest.inferJsonSchema(df, "props", sampleRows = 50)
    val out = Ingest.withJsonFields(df, "props", s)
      .groupBy(col("k")).count().as[(Long, Long)].collect().toMap
    out.keySet shouldBe (0L until 13L).toSet
    out.values.sum shouldBe 200L
  }
}
