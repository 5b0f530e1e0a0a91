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

  // ---- ACF ----

  /** Driver-side BigInt reference for acfByKey on one key's daily cents. */
  private def acfRef(vals: Seq[Long], lags: Seq[Int]): Map[Int, Option[Long]] = {
    val n = vals.length
    val s = vals.map(BigInt(_)).sum
    val c = vals.map(v => BigInt(n) * v - s)
    val den = c.map(x => x * x).sum
    lags.map { k =>
      val num = (k until n).map(t => c(t) * c(t - k)).reduceOption(_ + _)
      k -> (if (den == 0 || num.isEmpty) None
      else {
        val q = (BigInt(1000000) * num.get.abs) / den
        Some(if (num.get >= 0) q.toLong else -q.toLong)
      })
    }.toMap
  }

  private def dailyRows(key: String, cents: Seq[Long]) =
    cents.zipWithIndex.map { case (c, i) =>
      (key, ts(i + 1, 12), c / 100.0)
    }

  /** The engine floor-quantizes `floor(v*100)` on the DOUBLE v — for some
    * c, c/100.0*100.0 floors to c−1. References must see the same cents
    * the engine does, so mirror the quantization exactly. */
  private def quant(cents: Seq[Long]): Seq[Long] =
    cents.map(c => math.floor(c / 100.0 * 100.0).toLong)

  private def acfMap(rows: Seq[(String, Timestamp, Double)], lags: Seq[Int]) =
    Forecast.acfByKey(rows.toDF("k", "t", "v"), col("k"), col("t"),
        col("v"), lags)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        Option(r.get(3)).map(_.asInstanceOf[Long])).toMap

  test("acfByKey: alternating series hand values, lag past length NULL") {
    // x = 100,300 alternating over 6 days: c = ±600, den = 2,160,000
    // acf1 = -floor(1e6*1.8e6/2.16e6) = -833333; acf2 = +666666
    // acf5 = -floor(1e6*360000/2.16e6) = -166666; lag7 > n → NULL
    val rows = dailyRows("a", Seq(100L, 300L, 100L, 300L, 100L, 300L))
    val out = acfMap(rows, Seq(1, 2, 5, 7))
    out(("a", 1L)) shouldBe Some(-833333L)
    out(("a", 2L)) shouldBe Some(666666L)
    out(("a", 5L)) shouldBe Some(-166666L)
    out(("a", 7L)) shouldBe None
  }

  test("acfByKey: constant series (zero variance) yields NULL, row kept") {
    val out = acfMap(dailyRows("c", Seq.fill(5)(250L)), Seq(1, 2))
    out(("c", 1L)) shouldBe None
    out(("c", 2L)) shouldBe None
    out.size shouldBe 2
  }

  test("acfByKey == BigInt reference on random multi-key series; " +
    "partitioning independent") {
    val rnd = new scala.util.Random(7)
    val series = Map(
      "a" -> Seq.fill(25)(rnd.nextInt(50000).toLong),
      "b" -> Seq.fill(13)(rnd.nextInt(900).toLong),
      "c" -> Seq.fill(4)(rnd.nextInt(100000).toLong))
    val rows = series.toSeq.flatMap { case (k, vs) => dailyRows(k, vs) }
    val lags = Seq(1, 2, 3, 7)
    val df = rows.toDF("k", "t", "v").repartition(7)
    val out = Forecast.acfByKey(df, col("k"), col("t"), col("v"), lags)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    for ((k, vs) <- series; (lagK, exp) <- acfRef(quant(vs), lags))
      out((k, lagK.toLong)) shouldBe exp
    out.size shouldBe series.size * lags.size
  }

  // ---- Trend slope ----

  /** BigInt OLS reference over (dayOffset, cents) points. */
  private def slopeRef(pts: Seq[(Long, Long)]): Option[Long] = {
    val n = BigInt(pts.length)
    val st = pts.map(p => BigInt(p._1)).sum
    val stt = pts.map(p => BigInt(p._1) * p._1).sum
    val sy = pts.map(p => BigInt(p._2)).sum
    val sty = pts.map(p => BigInt(p._1) * p._2).sum
    val num = n * sty - st * sy
    val den = n * stt - st * st
    if (den == 0) None
    else {
      val q = (BigInt(1000000) * num.abs) / den
      Some(if (num >= 0) q.toLong else -q.toLong)
    }
  }

  private def slopeOut(rows: Seq[(String, Timestamp, Double)]) =
    Forecast.trendSlopeByKey(rows.toDF("k", "t", "v").repartition(5),
        col("k"), col("t"), col("v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long])))).toMap

  test("trendSlopeByKey: perfect line exact, constant zero, single-day " +
    "NULL, negative slope") {
    val out = slopeOut(
      dailyRows("line", Seq(100L, 200L, 300L, 400L, 500L)) ++
        dailyRows("flat", Seq(700L, 700L, 700L)) ++
        dailyRows("one", Seq(400L)) ++
        dailyRows("down", Seq(500L, 400L, 300L)))
    out("line") shouldBe ((5L, Some(100000000L))) // +100 c/day exactly
    out("flat") shouldBe ((3L, Some(0L)))
    out("one") shouldBe ((1L, None))
    out("down") shouldBe ((3L, Some(-100000000L)))
  }

  test("trendSlopeByKey == BigInt reference on gapped random series " +
    "(calendar day offsets, not row positions)") {
    val rnd = new scala.util.Random(13)
    // day numbers with gaps; offsets are vs the MIN day, calendar-true
    val days = Seq(2, 3, 5, 9, 10, 17, 23, 28)
    val cents = Seq.fill(days.length)(rnd.nextInt(300000).toLong)
    val rows = days.zip(cents).map { case (dd, c) =>
      ("g", ts(dd, 9), c / 100.0) }
    val qc = quant(cents)
    val expected = slopeRef(days.map(d => (d - days.min).toLong)
      .zip(qc))
    slopeOut(rows)("g") shouldBe ((days.length.toLong, expected))
    expected should not be None
  }

  // ---- Theil–Sen ----

  private def tsOut(rows: Seq[(String, Timestamp, Double)]) =
    Forecast.theilSenSlopeByKey(rows.toDF("k", "t", "v").repartition(4),
        col("k"), col("t"), col("v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap

  test("theilSenSlopeByKey: median shrugs off a massive outlier day " +
    "(OLS on the same series is dragged ~20x)") {
    // 9 perfect-line days (+100 c/day) + one 1000.00 outlier
    val cents = (1 to 9).map(_ * 100L) :+ 100000L
    val rows = dailyRows("a", cents)
    tsOut(rows)("a") shouldBe ((45L, 200000000L)) // 2 × 100 c/day in micro
    val ols = slopeOut(rows)("a")._2.get
    ols should be > 2000000000L // ≥ 20 c/day dragged per the outlier
  }

  test("theilSenSlopeByKey: even pair count interpolates the two middle " +
    "slopes (twice-median integer); truncation toward zero on negatives; " +
    "calendar dt across gaps; single-day key absent") {
    // t 0..3, y 0/100/300/700 → sorted pair micros 1e8, 1.5e8, 2e8,
    // 233333333, 3e8, 4e8 → middles 2e8 + 233333333
    val even = dailyRows("e", Seq(0L, 100L, 300L, 700L))
    // key n: days 1 and 4 (dt=3), 100 → 0: single pair −(1e8 div 3)
    val neg = Seq(("n", ts(1, 9), 1.0), ("n", ts(4, 9), 0.0))
    val single = dailyRows("s", Seq(500L))
    val out = tsOut(even ++ neg ++ single)
    out("e") shouldBe ((6L, 433333333L))
    out("n") shouldBe ((1L, -66666666L))
    out.contains("s") shouldBe false
  }

  // ---- Spearman cross-correlation ----

  private def spearOut(rows: Seq[(String, Timestamp, Double)]) =
    Forecast.spearmanCrossCorr(rows.toDF("k", "t", "v").repartition(4),
        col("k"), col("t"), col("v"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap

  test("spearmanCrossCorr: perfect monotone +1e6, perfect inverse -1e6, " +
    "hand-exact ties via doubled average ranks") {
    val days = Seq(100L, 300L, 200L, 50L, 400L)
    val up = dailyRows("a", days) ++ dailyRows("b", days.map(_ * 2))
    spearOut(up)(("a", "b")) shouldBe ((5L, 1000000L))
    val down = dailyRows("a", days) ++ dailyRows("c", days.map(900L - _))
    spearOut(down)(("a", "c")) shouldBe ((5L, -1000000L))
    // ties: x = 10,10,20,30 → doubled ranks 3,3,6,8; y strictly
    // increasing → 2,4,6,8; Σd² = 2 → ρ = 1e6 − 12e6 div 240 = 950000
    val tied = dailyRows("x", Seq(1000L, 1000L, 2000L, 3000L)) ++
      dailyRows("y", Seq(500L, 600L, 700L, 800L))
    spearOut(tied)(("x", "y")) shouldBe ((4L, 950000L))
  }

  test("spearmanCrossCorr: pairs align on COMMON days with subset-local " +
    "ranks; n<2 pairs absent; k1<k2 canonical") {
    // key a on days 1..4; key b only on days 2..4 — ranks must come from
    // the 3 common days (a's day-1 value would otherwise shift ranks)
    val a = dailyRows("a", Seq(9999L, 100L, 200L, 300L))
    val b = Seq((2, 600L), (3, 500L), (4, 400L)).map { case (dd, c) =>
      ("b", ts(dd, 12), c / 100.0) }
    val out = spearOut(a ++ b)
    out(("a", "b")) shouldBe ((3L, -1000000L)) // perfectly inverse on 2..4
    // pairs sharing fewer than 2 days are absent (no rank geometry)
    val out2 = spearOut(a.take(1) ++ Seq(("d", ts(1, 12), 5.0),
      ("e", ts(9, 12), 1.0)))
    out2 shouldBe empty // a∩d = 1 day; e shares none
  }

  test("panel-quadratic guards fail loudly: spearman maxKeys, theilSen " +
    "maxDays; null-only keys don't count") {
    val three = dailyRows("a", Seq(100L, 200L)) ++
      dailyRows("b", Seq(300L, 400L)) ++ dailyRows("c", Seq(500L, 600L))
    val eSpear = intercept[IllegalArgumentException] {
      Forecast.spearmanCrossCorr(three.toDF("k", "t", "v"),
        col("k"), col("t"), col("v"), maxKeys = 2)
    }
    eSpear.getMessage should include("3 distinct keys exceeds maxKeys=2")
    // at the default cap the same input passes (guard is a priori, cheap)
    Forecast.spearmanCrossCorr(three.toDF("k", "t", "v"),
      col("k"), col("t"), col("v")).collect().length shouldBe 3
    // a key present only via NULL values never reaches the pair join and
    // must not trip the guard either: 3 real keys + 1 null-only key
    // passes at maxKeys = 3
    val withNullKey = three.map { case (k, t, v) => (k, t, Some(v)) } ++
      Seq(("zz", ts(1, 1), None: Option[Double]))
    Forecast.spearmanCrossCorr(withNullKey.toDF("k", "t", "v"),
      col("k"), col("t"), col("v"), maxKeys = 3).collect().length shouldBe 3
    val fiveDays = dailyRows("a", Seq(100L, 200L, 300L, 400L, 500L))
    val eTs = intercept[IllegalArgumentException] {
      Forecast.theilSenSlopeByKey(fiveDays.toDF("k", "t", "v"),
        col("k"), col("t"), col("v"), maxDays = 4)
    }
    eTs.getMessage should include(
      "a key spans 5 distinct days, exceeding maxDays=4")
    Forecast.theilSenSlopeByKey(fiveDays.toDF("k", "t", "v"),
      col("k"), col("t"), col("v")).collect().length shouldBe 1
    // the guard bounds the PER-KEY series length, not the panel's union of
    // days: two keys covering DIFFERENT eras (2 + 3 days, union 5) pass at
    // maxDays = 3 — the quadratic pair join is per-key (ADVICE r8: the
    // global-distinct guard wrongly rejected exactly this input)
    val eras = dailyRows("a", Seq(100L, 200L)) ++
      Seq((8, 300L), (9, 400L), (10, 500L)).map { case (dd, c) =>
        ("b", ts(dd, 12), c / 100.0) }
    Forecast.theilSenSlopeByKey(eras.toDF("k", "t", "v"),
      col("k"), col("t"), col("v"), maxDays = 3)
      .collect().length shouldBe 2
  }

  // ---- Lag features ----

  test("lagFeatures: calendar lags NULL across gaps, trailing-week " +
    "(sum, n) exact, ISO day-of-week") {
    // days 1,2,3,5,9 of Jan 2024 (Jan 1 is a Monday)
    val rows = Seq((1, 100L), (2, 200L), (3, 300L), (5, 500L), (9, 900L))
      .map { case (dd, c) => ("a", ts(dd, 8), c / 100.0) }
    val out = Forecast.lagFeatures(rows.toDF("k", "t", "v").repartition(3),
        col("k"), col("t"), col("v"))
      .collect().map { r =>
        r.getDate(1).toString -> ((Option(r.get(3)), Option(r.get(4)),
          r.getLong(5), r.getLong(6), r.getLong(7)))
      }.toMap
    out("2024-01-01") shouldBe ((None, None, 100L, 1L, 1L))       // Mon
    out("2024-01-02") shouldBe ((Some(100L), None, 300L, 2L, 2L))
    out("2024-01-03") shouldBe ((Some(200L), None, 600L, 3L, 3L))
    // day 5: day 4 missing → lag1 NULL; week window covers days 1..5
    out("2024-01-05") shouldBe ((None, None, 1100L, 4L, 5L))
    // day 9: lag7 = day 2's value; week window covers days 3..9 → 3,5,9
    out("2024-01-09") shouldBe ((None, Some(200L), 1700L, 3L, 2L)) // Tue
    out.size shouldBe 5
  }

  // ---- CUSUM ----

  /** Driver-side recursion reference: the textbook clamped CUSUM
    * h_t = max(0, h_{t-1} + y_t) on both sides; returns flagged
    * (dayIx0Based, up, down, direction). */
  private def cusumRef(vals: Seq[Long],
                       hMult: Int): Seq[(Int, Long, Long, String)] = {
    val n = vals.length
    def fdiv(a: BigInt, b: BigInt): BigInt = {
      val q = a / b
      if (a % b != 0 && (a.signum * b.signum) < 0) q - 1 else q
    }
    val mu = fdiv(vals.map(BigInt(_)).sum, n)
    val mad = fdiv(vals.map(v => (BigInt(v) - mu).abs).sum, n)
    val k = mad / 2
    val h = mad * hMult
    var hu = BigInt(0)
    var hd = BigInt(0)
    vals.zipWithIndex.flatMap { case (x, i) =>
      hu = (hu + (BigInt(x) - mu - k)).max(0)
      hd = (hd + (mu - BigInt(x) - k)).max(0)
      if (hu > h || hd > h) {
        val dir = if (hu > h && hd > h) "both" else if (hu > h) "up"
          else "down"
        Some((i, hu.toLong, hd.toLong, dir))
      } else None
    }
  }

  private def cusumOut(rows: Seq[(String, Timestamp, Double)], hMult: Int) =
    Forecast.cusumChangepoints(rows.toDF("k", "t", "v").repartition(5),
        col("k"), col("t"), col("v"), hMult)
      .collect().map(r => (r.getString(0), r.getDate(1).toString) ->
        ((r.getLong(4), r.getLong(5), r.getString(6)))).toMap

  test("cusumChangepoints: closed form == clamped recursion on a level " +
    "shift; constant series flags nothing") {
    // 10 days at 10.00 then 10 at 20.00: mu=1500, mad=500, k=250, h=1500
    val vals = Seq.fill(10)(1000L) ++ Seq.fill(10)(2000L)
    val out = cusumOut(dailyRows("a", vals) ++
      dailyRows("flat", Seq.fill(8)(777L)), 3)
    val exp = cusumRef(quant(vals), 3)
    exp should not be empty
    out.size shouldBe exp.size
    for ((i, up, down, dir) <- exp)
      out(("a", f"2024-01-${i + 1}%02d")) shouldBe ((up, down, dir))
    // the post-shift regime must alarm on the up side by the last day
    out(("a", "2024-01-20"))._3 shouldBe "up"
    out.keys.count(_._1 == "flat") shouldBe 0
  }

  test("cusumChangepoints == recursion on random series, keys independent") {
    val rnd = new scala.util.Random(11)
    val series = Map(
      "a" -> Seq.fill(28)(rnd.nextInt(40000).toLong + 1000L),
      "b" -> (Seq.fill(14)(rnd.nextInt(2000).toLong) ++
        Seq.fill(14)(rnd.nextInt(2000).toLong + 9000L)),
      "c" -> Seq.fill(3)(rnd.nextInt(500).toLong))
    val rows = series.toSeq.flatMap { case (k, vs) => dailyRows(k, vs) }
    val out = cusumOut(rows, 2)
    val exp = series.toSeq.flatMap { case (k, vs) =>
      cusumRef(quant(vs), 2).map { case (i, up, down, dir) =>
        (k, f"2024-01-${i + 1}%02d") -> ((up, down, dir)) }
    }.toMap
    out shouldBe exp
    exp should not be empty
  }

  test("degreeDaySensitivity: hand-computed HDD/CDD slopes, day-coverage " +
    "join, constant-regressor NULL") {
    // temp: day1 mean floor((100+200)/2)=150 cents, day2 300 cents;
    // base 200 -> hdd {50, 0}, cdd {0, 100}
    val temp = Seq((ts(1, 0), 1.00), (ts(1, 1), 2.00), (ts(2, 0), 3.00))
      .toDF("tts", "tv")
    // load g: day1 400+600=1000 cents, day2 3000; day3 has no temp -> drop
    val load = Seq(("g", ts(1, 0), 4.00), ("g", ts(1, 1), 6.00),
      ("g", ts(2, 0), 30.00), ("g", ts(3, 0), 99.00)).toDF("k", "lts", "lv")
    val r = Forecast.degreeDaySensitivity(load, col("k"), col("lts"),
        col("lv"), temp, col("tts"), col("tv"), baseCents = 200L)
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1),
          if (x.isNullAt(2)) None else Some(x.getLong(2)),
          if (x.isNullAt(3)) None else Some(x.getLong(3))))).toMap
    // hdd slope: (1000-3000)/(50-0) = -40 cents/cent = -40e6 micro;
    // cdd slope: (3000-1000)/(100-0) = +20 cents/cent = +20e6 micro
    r("g") shouldBe ((2L, Some(-40000000L), Some(20000000L)))
    // one covered day: both regressors constant -> NULL slopes
    val one = Forecast.degreeDaySensitivity(
      load.filter(col("lts") < lit(ts(2, 0))), col("k"), col("lts"),
      col("lv"), temp, col("tts"), col("tv"), baseCents = 200L)
      .collect().head
    one.getLong(1) shouldBe 1L
    one.isNullAt(2) shouldBe true
    one.isNullAt(3) shouldBe true
  }
}
