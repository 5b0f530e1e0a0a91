package graft

import graft.engine.{Analytics, Tables}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("rollingByKey: trailing-days frame at day granularity") {
    val df = Seq(
      ("a", t("2024-01-01 05:00:00"), 1.0),
      ("a", t("2024-01-02 06:00:00"), 2.0),
      ("a", t("2024-01-05 07:00:00"), 4.0) // day 1 falls out of a 3-day frame
    ).toDF("k", "ts", "v")
    val out = Analytics.rollingByKey(df, col("k"), col("ts"), col("v"), days = 3)
      .orderBy("day").collect()
    out.map(r => (r.getDate(1).toString, r.getDouble(2), r.getLong(3))) shouldBe
      Array(("2024-01-01", 1.0, 1L), ("2024-01-02", 3.0, 2L),
        ("2024-01-05", 4.0, 1L))
  }

  test("deltaVsPrev: first row null delta, deterministic order") {
    val df = Seq(("a", t("2024-01-01 00:00:00"), 1L, 10.0),
      ("a", t("2024-01-01 01:00:00"), 2L, 13.5),
      ("b", t("2024-01-01 00:30:00"), 3L, 5.0)).toDF("k", "ts", "id", "v")
    val out = Analytics.deltaVsPrev(df, col("k"), col("ts"), col("id"),
      col("v")).orderBy("id").collect()
    out(0).isNullAt(4) shouldBe true
    out(1).getDouble(4) shouldBe 3.5
    out(2).isNullAt(4) shouldBe true // per-key isolation
  }

  test("approxDistinctByGroup within rsd of exact on real data") {
    val ev = Tables.events(spark, "/root/testdata/sf0.01")
    val approx = Analytics.approxDistinctByGroup(ev, col("event_type"),
        col("user_id"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = ev.groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      math.abs(approx(k) - n).toDouble / n should be <= 0.05
    }
  }
}
