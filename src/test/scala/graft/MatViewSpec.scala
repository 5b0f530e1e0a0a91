package graft

import org.apache.spark.sql.functions._
import graft.engine.MatView

class MatViewSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: Seq[(String, java.lang.Double)]) =
    rows.toDF("k", "v")

  private def state(rows: Seq[(String, java.lang.Double)]) =
    MatView.aggState(df(rows), Seq(col("k")), col("v"))

  private def asMap(s: org.apache.spark.sql.DataFrame) =
    s.collect().map { r =>
      r.getString(0) -> ((Option(r.get(1)), r.getLong(2),
        Option(r.get(3)), Option(r.get(4))))
    }.toMap

  test("aggState: micro-quantized sums, null exclusion, all-null group") {
    val s = asMap(state(Seq(
      ("a", 1.5), ("a", 2.25), ("a", null),
      ("b", null))))
    s("a") shouldBe ((Some(3750000L), 2L, Some(1500000L), Some(2250000L)))
    s("b") shouldBe ((None, 0L, None, None))
  }

  test("day-by-day fold == one-shot rebuild, bit-identical") {
    val d1 = Seq(("a", 1.0: java.lang.Double), ("b", 2.0: java.lang.Double))
    val d2 = Seq(("a", 3.5: java.lang.Double), ("c", null: java.lang.Double))
    val d3 = Seq(("b", -0.25: java.lang.Double), ("c", 7.0: java.lang.Double))
    val folded = MatView.mergeStates(
      Seq(MatView.mergeStates(Seq(state(d1), state(d2)), Seq("k")), state(d3)),
      Seq("k"))
    val oneShot = state(d1 ++ d2 ++ d3)
    asMap(folded) shouldBe asMap(oneShot)
    // commutativity: reversed merge order, repartitioned inputs
    val reversed = MatView.mergeStates(
      Seq(state(d3).repartition(5), state(d2), state(d1)), Seq("k"))
    asMap(reversed) shouldBe asMap(oneShot)
  }

  test("sketch state: day-sliced merge == one-shot sketch; exact at small n") {
    val rows = (1 to 300).map(i => (s"d${i % 3}", s"u${i % 50}"))
    val df = rows.toDF("day", "u")
    val daily = MatView.distinctSketchState(df,
      Seq(lit("all").as("grp"), col("day")), col("u"))
    val merged = MatView.sketchEstimate(
        MatView.mergeDistinctSketches(Seq(daily), Seq("grp")))
      .collect().head.getLong(1)
    val direct = MatView.sketchEstimate(
        MatView.distinctSketchState(df, Seq(lit("all").as("grp")), col("u")))
      .collect().head.getLong(1)
    merged shouldBe direct // register-max merge is lossless
    merged shouldBe 50L    // HLL is exact far below register capacity
  }

  test("sketch merge is independent of slicing and partitioning") {
    val rows = (1 to 500).map(i => (s"d${i % 7}", s"u${i % 211}"))
    val df = rows.toDF("day", "u")
    def est(slices: Int) = MatView.sketchEstimate(
        MatView.mergeDistinctSketches(
          (0 until slices).map(sl =>
            MatView.distinctSketchState(
              df.filter(pmod(hash(col("day")), lit(slices)) === sl).repartition(3),
              Seq(lit("all").as("grp")), col("u"))),
          Seq("grp")))
      .collect().head.getLong(1)
    est(2) shouldBe est(5)
    est(5) shouldBe 211L
  }

  test("withMean: Euclidean floor on negative sums; NULL on empty state") {
    val s = MatView.withMean(state(Seq(
      ("neg", -0.000002), ("neg", -0.000003), // vm -2, -3 → sum -5, cnt 2
      ("nul", null))))
    val m = s.collect().map(r => r.getString(0) ->
      Option(r.get(r.fieldIndex("avg_micro")))).toMap
    m("neg") shouldBe Some(-3L) // floor(-5/2) = -3, not trunc -2
    m("nul") shouldBe None
  }

  private def hist(rows: Seq[(String, java.lang.Double)], lo: Long = 0L,
                   hi: Long = 1000L, n: Int = 10) =
    MatView.histState(rows.toDF("k", "v"), Seq(col("k")), col("v"), lo, hi, n)

  test("histState: binning, clamp into edge buckets, null exclusion") {
    // [0, 1000) cents, 10 buckets of 100 cents: 1.5 → 150c → bucket 1
    val s = hist(Seq(("a", 1.5), ("a", 1.99), ("a", 0.0), ("a", 9.999),
        ("a", -3.0), ("a", 25.0), ("a", null)))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    s(1L) shouldBe 2L      // 150c, 199c
    s(0L) shouldBe 2L      // 0c; −300c clamps low
    s(9L) shouldBe 2L      // 999c; 2500c clamps high
    s.values.sum shouldBe 6L // null excluded
  }

  test("histogram fold == one-shot rebuild, bit-identical; merge order " +
    "and partitioning independent") {
    val d1 = Seq(("a", 1.0: java.lang.Double), ("b", 4.5: java.lang.Double))
    val d2 = Seq(("a", 1.2: java.lang.Double), ("a", 9.0: java.lang.Double))
    val d3 = Seq(("b", 4.5: java.lang.Double), ("c", 0.0: java.lang.Double))
    def m(s: org.apache.spark.sql.DataFrame) =
      s.collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
        .toMap
    val folded = MatView.mergeHistStates(
      Seq(MatView.mergeHistStates(Seq(hist(d1), hist(d2)), Seq("k")),
        hist(d3)), Seq("k"))
    val oneShot = hist(d1 ++ d2 ++ d3)
    m(folded) shouldBe m(oneShot)
    val reversed = MatView.mergeHistStates(
      Seq(hist(d3).repartition(5), hist(d2), hist(d1)), Seq("k"))
    m(reversed) shouldBe m(oneShot)
  }

  test("quantilesFromHistState: hand-exact ranks, lower-edge estimates, " +
    "q=0 and q=1e6 edges, per-key independence") {
    // key a: 4 values in buckets 0,0,5,9 → n=4
    //   q=0 → rank 1 → bucket 0; q=500000 → rank 2 → bucket 0
    //   q=750000 → rank 3 → bucket 5 (est 500c); q=1e6 → rank 4 → bucket 9
    // key b: single value in bucket 3 → every q → bucket 3
    val rows = Seq(("a", 0.5), ("a", 0.9), ("a", 5.5), ("a", 9.9),
      ("b", 3.33)).map { case (k, v) => (k, v: java.lang.Double) }
    val out = MatView.quantilesFromHistState(hist(rows), Seq("k"),
        Seq(0L, 500000L, 750000L, 1000000L), 0L, 1000L, 10)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    out(("a", 0L)) shouldBe ((4L, 0L, 0L))
    out(("a", 500000L)) shouldBe ((4L, 0L, 0L))
    out(("a", 750000L)) shouldBe ((4L, 5L, 500L))
    out(("a", 1000000L)) shouldBe ((4L, 9L, 900L))
    out(("b", 500000L)) shouldBe ((1L, 3L, 300L))
    out(("b", 1000000L)) shouldBe ((1L, 3L, 300L))
    out.size shouldBe 8
  }

  test("quantile estimates off a merged state equal the one-shot state's " +
    "(slicing invisible at the read boundary)") {
    val d1 = (0 until 40).map(i => ("a", (i / 4.0): java.lang.Double))
    val d2 = (0 until 25).map(i => ("a", (i / 2.5): java.lang.Double)) ++
      (0 until 9).map(i => ("b", (i * 1.1): java.lang.Double))
    def q(s: org.apache.spark.sql.DataFrame) =
      MatView.quantilesFromHistState(s, Seq("k"),
          Seq(500000L, 900000L, 990000L), 0L, 1000L, 10)
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    q(MatView.mergeHistStates(Seq(hist(d1), hist(d2)), Seq("k"))) shouldBe
      q(hist(d1 ++ d2))
  }
}
