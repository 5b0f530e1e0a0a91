package graft

import graft.engine.{Ingest, Sink}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import java.sql.Timestamp

class SinkIngestSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft_test_").toString

  test("S13 dynamic date-partition overwrite replaces only incoming days") {
    val path = tmpDir() + "/tbl"
    def t(s: String) = Timestamp.valueOf(s)
    val day1 = Seq((1L, t("2024-01-01 05:00:00"), 10.0),
      (2L, t("2024-01-02 06:00:00"), 20.0)).toDF("id", "ts", "v")
    Sink.overwriteDatePartitions(day1, col("ts"), path)
    // re-deliver day 2 with corrected values + a new day 3
    val redo = Seq((2L, t("2024-01-02 06:00:00"), 99.0),
      (3L, t("2024-01-03 07:00:00"), 30.0)).toDF("id", "ts", "v")
    Sink.overwriteDatePartitions(redo, col("ts"), path)
    val out = spark.read.parquet(path).orderBy("id").collect()
    out.map(r => (r.getLong(0), r.getDouble(2))) shouldBe
      Array((1L, 10.0), (2L, 99.0), (3L, 30.0)) // day1 kept, day2 replaced
  }

  test("S14 upsertParquet: creates, then merges with incoming winning") {
    val path = tmpDir() + "/keyed"
    Sink.upsertParquet(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "v"), path,
      Seq("id"), Seq(col("id")))
    Sink.upsertParquet(spark, Seq((2L, "B"), (3L, "C")).toDF("id", "v"), path,
      Seq("id"), Seq(col("id")))
    val out = spark.read.parquet(path).orderBy("id").collect()
    out.map(r => (r.getLong(0), r.getString(1))) shouldBe
      Array((1L, "a"), (2L, "B"), (3L, "C"))
  }

  test("S1 charset fallback: cp949 file decodes, utf-8 preferred when valid") {
    val dir = tmpDir()
    val cp949 = Paths.get(dir, "kr.csv")
    // '발전소명' (plant name) is not valid UTF-8 in cp949 bytes
    Files.write(cp949, "발전소명,호기\n남부발전,1\n".getBytes("x-windows-949"))
    Ingest.detectCharset(cp949.toString, Ingest.defaultCharsets) shouldBe "x-windows-949"
    val df = Ingest.csvWithCharsetFallback(spark, cp949.toString)
    df.columns shouldBe Array("발전소명", "호기")
    df.head().getString(0) shouldBe "남부발전"

    val utf8 = Paths.get(dir, "ok.csv")
    Files.write(utf8, "a,b\n1,2\n".getBytes("UTF-8"))
    Ingest.detectCharset(utf8.toString, Ingest.defaultCharsets) shouldBe "UTF-8"
  }

  test("S1 header normalization collapses embedded whitespace") {
    val dir = tmpDir()
    val f = Paths.get(dir, "h.csv")
    Files.write(f, "col  one,col\ttwo\n1,2\n".getBytes("UTF-8"))
    Ingest.csvWithCharsetFallback(spark, f.toString).columns shouldBe
      Array("col one", "col two")
  }
}
