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
}
