package graft

import graft.engine.Impute
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Mirrors the reference's imputation unit surface:
  * find_consecutive_missing_groups cases (tests/test_refactoring.py:82-109),
  * the spline/historical dispatch (runs ≤3 vs ≥4,
  * test_refactoring.py:209-262), and shape contracts (:145-201). */
class ImputeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")

  private def series(vals: Seq[Option[Double]], g: String = "s1") =
    vals.zipWithIndex.map { case (v, i) => (g, ts(i), i.toLong, v) }
      .toDF("g", "t", "id", "v")

  test("missingRuns: exact (start, len) tuples") {
    // pattern: _ X X _ _ _ X _  (X = missing) → runs (1,2) and (4,3)... wait:
    // indices: 0 ok, 1-2 missing, 3 ok, 4-6 missing, 7 ok
    val df = series(Seq(Some(1.0), None, None, Some(2.0), None, None, None, Some(3.0)))
    val runs = Impute.missingRuns(df, col("g"), Seq(col("t"), col("id")), col("v"))
      .orderBy("run_start").collect()
    runs.map(r => (r.getTimestamp(1), r.getLong(2))) shouldBe
      Array((ts(1), 2L), (ts(4), 3L))
  }

  test("missingRuns: empty / all-missing / none-missing") {
    Impute.missingRuns(series(Seq.empty), col("g"), Seq(col("t"), col("id")),
      col("v")).count() shouldBe 0
    val all = Impute.missingRuns(series(Seq(None, None, None)), col("g"),
      Seq(col("t"), col("id")), col("v")).collect()
    all.map(r => (r.getTimestamp(1), r.getLong(2))) shouldBe Array((ts(0), 3L))
    Impute.missingRuns(series(Seq(Some(1.0), Some(2.0))), col("g"),
      Seq(col("t"), col("id")), col("v")).count() shouldBe 0
  }

  test("splineImpute fills short gap ≈ linear trend, preserves neighbors") {
    // 1,2,3,_,5,6,7,8 → gap at idx 3 should come back ≈ 4
    val df = series(Seq(Some(1.0), Some(2.0), Some(3.0), None, Some(5.0),
      Some(6.0), Some(7.0), Some(8.0)))
    val out = Impute.splineImpute(df, col("g"), col("t"), col("id"), col("v"))
      .orderBy("ts").collect()
    out.length shouldBe 8
    val filled = out(3).getDouble(4)
    filled shouldBe (4.0 +- 0.5) // reference tolerance (test_refactoring.py:118-136)
    out(2).getDouble(4) shouldBe 3.0 // neighbors untouched
    out(4).getDouble(4) shouldBe 5.0
  }

  test("splineImpute leaves long runs (>3) for historical fill") {
    val df = series(Seq(Some(1.0), None, None, None, None, Some(6.0), Some(7.0)))
    val out = Impute.splineImpute(df, col("g"), col("t"), col("id"), col("v"))
      .orderBy("ts").collect()
    (1 to 4).foreach(i => out(i).isNullAt(4) shouldBe true)
    out(0).getDouble(4) shouldBe 1.0
  }

  test("splineImpute falls back to linear with < 4 neighbors") {
    // only 1 point each side → linear: 1,_,3 → 2
    val df = series(Seq(Some(1.0), None, Some(3.0)))
    val out = Impute.splineImpute(df, col("g"), col("t"), col("id"), col("v"))
      .orderBy("ts").collect()
    out(1).getDouble(4) shouldBe (2.0 +- 1e-6)
  }

  test("splineImpute leading-edge gap: one-sided extrapolation") {
    // reference XFAILs this (leading-edge spline gap) — we define it: with
    // >= 2 right-side neighbors the gap linearly extrapolates
    val df = series(Seq(None, Some(2.0), Some(3.0)))
    val out = Impute.splineImpute(df, col("g"), col("t"), col("id"), col("v"))
      .orderBy("ts").collect()
    out(0).getDouble(4) shouldBe (1.0 +- 1e-6)
  }

  test("historicalFill fallback chain: hist → key mean → global mean") {
    // two keys; key s1 has a (m,d,h) history for hour 1, s2 does not
    val df = Seq(
      ("s1", Timestamp.valueOf("2024-01-01 01:00:00"), 0L, Some(10.0)),
      ("s1", Timestamp.valueOf("2024-02-01 01:00:00"), 1L, Some(20.0)), // other (m,d)
      ("s1", Timestamp.valueOf("2025-01-01 01:00:00"), 2L, None),       // hist: (1,1,1) → 10.0
      ("s2", Timestamp.valueOf("2024-03-03 03:00:00"), 3L, Some(40.0)),
      ("s2", Timestamp.valueOf("2024-04-04 04:00:00"), 4L, None),       // no hist → key mean 40
      ("s3", Timestamp.valueOf("2024-05-05 05:00:00"), 5L, None)        // no data → global mean
    ).toDF("g", "t", "id", "v")
    val rows = Impute.historicalFill(df, col("g"), col("t"), col("v"))
      .filter(col("v").isNull).orderBy("grp").collect()
    rows.map(_.getDouble(3)) shouldBe Array(10.0, 40.0, 23.333333)
  }

  test("row count and non-null values preserved (shape contract)") {
    val df = series(Seq(Some(1.0), None, Some(3.0), None, Some(5.0)))
    val out = Impute.historicalFill(df, col("g"), col("t"), col("v"))
    out.count() shouldBe 5
    out.filter(col("v").isNotNull && col("v") =!= col("v_filled"))
      .count() shouldBe 0
  }

  private def dayTs(d: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-$d%02d 10:00:00")

  private def locfMap(rows: Seq[(String, Timestamp, Double)], h: Int) =
    Impute.locfBounded(rows.toDF("k", "t", "v").repartition(5), col("k"),
        col("t"), col("v"), h)
      .collect().map(r => (r.getString(0), r.getDate(1).toString) ->
        ((Option(r.get(2)), Option(r.get(3)), Option(r.get(4))))).toMap

  test("locfBounded: dense spine, carry within horizon only, fill age; " +
    "single-day key trivial") {
    val rows = Seq((1, 1.0), (2, 2.0), (6, 6.0), (12, 12.0))
      .map { case (d, v) => ("a", dayTs(d), v) } :+ (("b", dayTs(5), 5.0))
    val out = locfMap(rows, 3)
    out.size shouldBe 13 // a: days 1..12 spine; b: one day
    out(("a", "2024-01-01")) shouldBe ((Some(100L), Some(100L), Some(0L)))
    out(("a", "2024-01-03")) shouldBe ((None, Some(200L), Some(1L)))
    out(("a", "2024-01-05")) shouldBe ((None, Some(200L), Some(3L))) // edge
    out(("a", "2024-01-06")) shouldBe ((Some(600L), Some(600L), Some(0L)))
    out(("a", "2024-01-09")) shouldBe ((None, Some(600L), Some(3L)))
    out(("a", "2024-01-10")) shouldBe ((None, None, None)) // past horizon
    out(("a", "2024-01-11")) shouldBe ((None, None, None))
    out(("a", "2024-01-12")) shouldBe ((Some(1200L), Some(1200L), Some(0L)))
    out(("b", "2024-01-05")) shouldBe ((Some(500L), Some(500L), Some(0L)))
  }

  test("locfBounded horizon 0: observed days self-fill, every silent day " +
    "stays NULL") {
    val rows = Seq((1, 1.0), (4, 4.0)).map { case (d, v) =>
      ("a", dayTs(d), v) }
    val out = locfMap(rows, 0)
    out(("a", "2024-01-01")) shouldBe ((Some(100L), Some(100L), Some(0L)))
    out(("a", "2024-01-02")) shouldBe ((None, None, None))
    out(("a", "2024-01-03")) shouldBe ((None, None, None))
    out(("a", "2024-01-04")) shouldBe ((Some(400L), Some(400L), Some(0L)))
  }

  test("locfBounded: same-day rows aggregate before filling (daily grain)") {
    val rows = Seq(("a", dayTs(1), 1.0), ("a", dayTs(1), 2.0),
      ("a", dayTs(3), 9.0))
    val out = locfMap(rows, 5)
    out(("a", "2024-01-01")) shouldBe ((Some(300L), Some(300L), Some(0L)))
    out(("a", "2024-01-02")) shouldBe ((None, Some(300L), Some(1L)))
  }
}
