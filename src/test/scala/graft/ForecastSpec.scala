package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.engine.Forecast

class ForecastSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, h: Int, m: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $h%02d:$m%02d:00")

  test("expanding historical mean: no leakage of the predicted day") {
    // key "a", hour 5: day1 v=1.0; day2 v=3.0; day3 two rows 1.0 and 3.0
    val df = Seq(
      ("a", ts(1, 5), 1.0), ("a", ts(2, 5), 3.0),
      ("a", ts(3, 5, 0), 1.0), ("a", ts(3, 5, 30), 3.0)
    ).toDF("k", "t", "v")
    val out = Forecast.backtestHistMean(df, col("k"), col("t"), col("v"))
      .orderBy("day").collect()
    out.map(r => (r.getLong(3),
      Option(r.get(4)).map(_.asInstanceOf[Long]),
      Option(r.get(5)).map(_.asInstanceOf[Long]))).toSeq shouldBe Seq(
      (1000000L, None, None),                  // day1: no history
      (3000000L, Some(1000000L), Some(2000000L)), // day2: mean{1.0}
      // day3 actual = mean{1,3} = 2.0; pred = mean over rows {1.0,3.0}
      // of days 1-2 = 2.0 → err 0; day3's own rows excluded from pred
      (2000000L, Some(2000000L), Some(0L)))
  }

  test("row-weighted expanding mean (not mean-of-daily-means)") {
    // day1 has rows {0.0, 0.0}, day2 has {3.0} → day3 pred =
    // floor((0+0+3e6)/3) = 1e6, NOT mean(0, 3e6)/2 = 1.5e6
    val df = Seq(
      ("a", ts(1, 5, 0), 0.0), ("a", ts(1, 5, 30), 0.0),
      ("a", ts(2, 5), 3.0), ("a", ts(3, 5), 9.9)
    ).toDF("k", "t", "v")
    val day3 = Forecast.backtestHistMean(df, col("k"), col("t"), col("v"))
      .filter(col("day") === lit("2024-01-03").cast("date"))
      .collect().head
    day3.getLong(4) shouldBe 1000000L
  }

  test("keys and hours are independent partitions") {
    val df = Seq(
      ("a", ts(1, 5), 1.0), ("a", ts(2, 5), 5.0),
      ("a", ts(1, 6), 100.0), ("a", ts(2, 6), 200.0),
      ("b", ts(1, 5), 7.0), ("b", ts(2, 5), 7.0)
    ).toDF("k", "t", "v")
    val preds = Forecast.backtestHistMean(df, col("k"), col("t"), col("v"))
      .filter(col("pred_micro").isNotNull)
      .collect().map(r => (r.getString(0), r.getLong(2)) -> r.getLong(4)).toMap
    preds(("a", 5L)) shouldBe 1000000L   // only a@5 history
    preds(("a", 6L)) shouldBe 100000000L // only a@6 history
    preds(("b", 5L)) shouldBe 7000000L   // only b@5 history
  }

  test("seasonalDecompose: constant series → zero seasonal/residual; " +
    "identity law; RANGE trend window ignores series gaps") {
    // 48 consecutive hours at a constant 100.0 → trend = y, detr = 0
    val flat = (0 until 48).map(h =>
      ("a", ts(1 + h / 24, h % 24), 100.0)).toDF("k", "t", "v")
    val f = Forecast.seasonalDecompose(flat, col("k"), col("t"), col("v"))
      .collect()
    f should have size 48
    all(f.map(_.getLong(2))) shouldBe 100000000L // y
    all(f.map(_.getLong(3))) shouldBe 100000000L // trend
    all(f.map(_.getLong(4))) shouldBe 0L         // seasonal
    all(f.map(_.getLong(5))) shouldBe 0L         // residual
    // identity y = trend + seasonal + resid holds on arbitrary data
    val noisy = (0 until 72).map(h =>
      ("a", ts(1 + h / 24, h % 24), 50.0 + (h % 7) * 3.25)).toDF("k", "t", "v")
    Forecast.seasonalDecompose(noisy, col("k"), col("t"), col("v"))
      .collect().foreach { r =>
        r.getLong(2) shouldBe r.getLong(3) + r.getLong(4) + r.getLong(5)
      }
    // an hour cell isolated by >12h of gap sees ONLY itself in the RANGE
    // trend frame (a ROWS frame would wrongly pull the distant cells in)
    val gappy = ((0 until 6).map(h => ("a", ts(1, h), 10.0)) :+
      (("a", ts(2, 6), 77.0))).toDF("k", "t", "v")
    val iso = Forecast.seasonalDecompose(gappy, col("k"), col("t"), col("v"))
      .filter(col("h") === lit("2024-01-02 06:00:00").cast("timestamp"))
      .collect().head
    iso.getLong(3) shouldBe 77000000L // trend == own y at the isolated cell
  }

  test("maeByKey: floor mean of abs errors, prediction-less cells excluded") {
    val df = Seq(
      ("a", ts(1, 5), 1.0), ("a", ts(2, 5), 3.0), ("a", ts(3, 5), 2.0)
    ).toDF("k", "t", "v")
    val bt = Forecast.backtestHistMean(df, col("k"), col("t"), col("v"))
    val mae = Forecast.maeByKey(bt).collect().head
    // day2 err = |3e6 - 1e6| = 2e6; day3 err = |2e6 - 2e6| = 0 → MAE 1e6
    (mae.getString(0), mae.getLong(1), mae.getLong(2)) shouldBe
      (("a", 2L, 1000000L))
  }
}
