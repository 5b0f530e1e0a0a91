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
    "stays a regression only after a second post-cooldown exceedance") {
    // the BENCH_r08 shape: q_winnow_fixed read 7.43 s vs envelope max
    // 1.818 s under driver load, then 2.4–2.6 s steady-state at the judge
    val flagged = Seq(("q_env", 7.43, 1.818), ("q_real", 9.0, 2.0))
    val idleQueue = Map("q_env" -> 2.5, "q_real" -> 8.7)
    val out = Bench.retestOutliers(flagged, idleQueue, load = () => 0.5)
    out(0) shouldBe Bench.OutlierRow(
      "q_env", 7.43, 1.818, 2.5, 0.5, None, None, "environment") // ≤ 1.5 × 1.818
    // q_real exceeded on BOTH retests (the map returns 8.7 each time) —
    // only then does regression stand, and the second retest is recorded
    out(1) shouldBe Bench.OutlierRow(
      "q_real", 9.0, 2.0, 8.7, 0.5, Some(8.7), Some(0.5), "regression")
    // the verdict threshold is the SAME factor that flagged the sample —
    // a retest that would not have been flagged closes the case
    Bench.retestOutliers(Seq(("q_a", 5.0, 1.0)), _ => 1.5)
      .head.verdict shouldBe "environment"
    Bench.retestOutliers(Seq(("q_a", 5.0, 1.0)), _ => 1.51)
      .head.verdict shouldBe "regression"
    Bench.retestOutliers(Seq.empty, idleQueue) shouldBe empty
  }

  test("retestOutliers: the BENCH_r09 q_apply_delta shape — a first retest " +
    "itself load-inflated (slower than the flagged sample) flips to " +
    "environment when the post-cooldown second retest lands in-envelope, " +
    "and the cooldown runs exactly once per suspect") {
    // sample 0.734 s vs envelope max 0.471; first retest 1.062 (busier than
    // the sample it was checking), second retest 0.60 — still above the
    // envelope median but inside the 1.5× flag threshold (0.7065)
    var calls = 0
    var cooldowns = 0
    val measure: String => Double = _ => { calls += 1; if (calls == 1) 1.062 else 0.60 }
    val loads = Iterator(4.2, 0.3) // busy at retest 1, idle at retest 2
    val out = Bench.retestOutliers(
      Seq(("q_apply_delta", 0.734, 0.471)), measure,
      load = () => loads.next(), cooldown = () => cooldowns += 1)
    out.head shouldBe Bench.OutlierRow(
      "q_apply_delta", 0.734, 0.471, 1.062, 4.2, Some(0.60), Some(0.3),
      "environment")
    cooldowns shouldBe 1
    // an in-envelope first retest never pays the cooldown
    Bench.retestOutliers(Seq(("q_x", 3.0, 2.0)), _ => 2.0,
      cooldown = () => fail("cooldown must not run for a clean retest"))
      .head.verdict shouldBe "environment"
  }

  test("systemLoad: reads a non-negative 1-minute load on this platform") {
    // /proc/loadavg exists on the target platform; the contract is only
    // "a number, −1 if unreadable" — never an exception
    Bench.systemLoad() should be >= -1.0
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
