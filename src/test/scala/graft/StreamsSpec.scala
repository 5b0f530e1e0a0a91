package graft

import graft.streaming.Streams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamsSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("hourlySumStream: windowed sums emitted after watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val out = Streams.hourlySumStream(
      mem.toDF().toDF("ts", "k", "v"), "ts", col("k"), col("v"))
    val q = out.writeStream.format("memory").queryName("hourly")
      .outputMode(Streams.hourlySumMode).start()
    try {
      mem.addData((t("2024-01-01 10:10:00"), "a", 1.0),
        (t("2024-01-01 10:50:00"), "a", 2.0))
      q.processAllAvailable()
      // advance watermark far past the 10:00 window (+2h lateness)
      mem.addData((t("2024-01-01 15:00:00"), "a", 9.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM hourly").collect()
      rows.map(r => (r.getTimestamp(0).toString, r.getString(1), r.getDouble(2)))
        .toSet should contain(("2024-01-01 10:00:00.0", "a", 3.0))
    } finally q.stop()
  }

  test("dedupStream drops re-delivered keys within the watermark horizon") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val out = Streams.dedupStream(mem.toDF().toDF("ts", "k", "v"), "ts", Seq("k"))
    val q = out.writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      mem.addData((t("2024-01-01 10:00:00"), "a", 1.0))
      q.processAllAvailable()
      mem.addData((t("2024-01-01 10:00:00"), "a", 1.0), // exact re-delivery
        (t("2024-01-01 10:05:00"), "b", 2.0))
      q.processAllAvailable()
      spark.sql("SELECT * FROM dedup").count() shouldBe 2
    } finally q.stop()
  }

  test("resumeTracker: per-key watermark + hour coverage, day rollover resets") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp)]
    val out = Streams.resumeTracker(mem.toDF().toDF("k", "ts"), "ts", "k")
    val q = out.writeStream.format("memory").queryName("resume")
      .outputMode(Streams.resumeTrackerMode).start()
    try {
      mem.addData(("p1", t("2024-01-01 00:00:00")), ("p1", t("2024-01-01 01:00:00")))
      q.processAllAvailable()
      mem.addData(("p1", t("2024-01-02 05:00:00"))) // new day resets coverage
      q.processAllAvailable()
      val last = spark.sql(
        "SELECT * FROM resume WHERE grp='p1' ORDER BY lastTs DESC LIMIT 1")
        .collect()(0)
      last.getTimestamp(1).toString shouldBe "2024-01-02 05:00:00.0"
      last.getInt(2) shouldBe 1          // only hour 5 seen on the new day
      last.getString(3) shouldBe "2024-01-02"
    } finally q.stop()
  }
}
