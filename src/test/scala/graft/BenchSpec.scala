package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The bench artifact's self-adjudication (VERDICT r7 missing #3): a
  * deliberately slowed entry must surface in the outliers field, computed
  * against the committed envelope. Pure-function tests — no Spark session,
  * no timing dependence. */
class BenchSpec extends AnyFunSuite with Matchers {

  test("adjudicate: a deliberately slowed entry surfaces; in-envelope and " +
    "history-free entries pass") {
    val envelope = Map("q_a" -> 1.0, "q_b" -> 2.0)
    val fresh = Seq(
      "q_a" -> 3.2,  // 3.2× its max — the r7 q_repetition_filter shape
      "q_b" -> 2.9,  // 1.45× — inside the 1.5× tolerance
      "q_new" -> 99.0) // no envelope yet (new this round) — passes
    Bench.adjudicate(fresh, envelope) shouldBe Seq(("q_a", 3.2, 1.0))
    // tightening the factor pulls q_b in too
    Bench.adjudicate(fresh, envelope, factor = 1.2).map(_._1) shouldBe
      Seq("q_a", "q_b")
    Bench.adjudicate(Seq.empty, envelope) shouldBe empty
    Bench.adjudicate(fresh, Map.empty) shouldBe empty
  }

  test("retestOutliers: a flagged entry slowed on pass 1 but clean on the " +
    "idle-queue retest is exonerated as environment; a genuinely slow one " +
    "stays a regression") {
    // the BENCH_r08 shape: q_winnow_fixed read 7.43 s vs envelope max
    // 1.818 s under driver load, then 2.4–2.6 s steady-state at the judge
    val flagged = Seq(("q_env", 7.43, 1.818), ("q_real", 9.0, 2.0))
    val idleQueue = Map("q_env" -> 2.5, "q_real" -> 8.7)
    val out = Bench.retestOutliers(flagged, idleQueue)
    out shouldBe Seq(
      ("q_env", 7.43, 1.818, 2.5, "environment"),   // 2.5 ≤ 1.5 × 1.818
      ("q_real", 9.0, 2.0, 8.7, "regression"))      // 8.7 > 1.5 × 2.0
    // the verdict threshold is the SAME factor that flagged the sample —
    // a retest that would not have been flagged closes the case
    Bench.retestOutliers(Seq(("q_a", 5.0, 1.0)), _ => 1.5)
      .head._5 shouldBe "environment"
    Bench.retestOutliers(Seq(("q_a", 5.0, 1.0)), _ => 1.51)
      .head._5 shouldBe "regression"
    Bench.retestOutliers(Seq.empty, idleQueue) shouldBe empty
  }

  test("FallbackCounter: a WARN event carrying the interpreter-fallback " +
    "phrase increments the counter; unrelated events don't") {
    val app = Bench.installFallbackCounter()
    // the -1 sentinel path (ADVICE r8) only fires when this is false
    app.attached shouldBe true
    // the attach point guarantees root level WARN in production (Bench
    // installs after setLogLevel); force it here so the test JVM's prior
    // log state can't mask the event
    org.apache.logging.log4j.core.config.Configurator.setRootLevel(
      org.apache.logging.log4j.Level.WARN)
    val log = org.apache.logging.log4j.LogManager.getLogger("graft.benchspec")
    val before = app.count.get()
    log.warn("Expr codegen error and falling back to interpreter mode")
    log.warn("some unrelated warning")
    app.count.get() shouldBe before + 1
  }

  test("loadEnvelopeMax: reads the committed BENCH_MEDIANS.json; absent " +
    "file degrades to empty (bench must still produce its number)") {
    val env = Bench.loadEnvelopeMax()
    // the committed envelope covers the whole suite and every max is a
    // positive seconds figure
    env.size should be > 150
    env.values.foreach(_ should be > 0.0)
    env.keySet should contain("q_hourly_by_type")
    Bench.loadEnvelopeMax("/nonexistent/of_course.json") shouldBe empty
  }
}
