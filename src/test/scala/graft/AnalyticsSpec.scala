package graft

import graft.engine.{Analytics, Tables}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("psiByGroup: zero on identical samples, hand-exact on a shift, " +
    "epsilon floor on empty buckets") {
    val ref = Seq(("a", 0.5), ("a", 0.6), ("a", 0.7), ("a", 1.5))
      .toDF("k", "v")
    val same = Analytics.psiByGroup(ref, ref, col("k"), col("v"), 0L, 200L, 2)
      .collect()
    all(same.map(_.getLong(4))) shouldBe 0L
    // shifted: ref 3:1 across the two buckets, cur 1:3
    val cur = Seq(("a", 0.5), ("a", 1.6), ("a", 1.7), ("a", 1.8))
      .toDF("k", "v")
    val shifted = Analytics
      .psiByGroup(ref, cur, col("k"), col("v"), 0L, 200L, 2)
      .collect().map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    // p = 750000/250000 ppm, q = 250000/750000; ln(3) µnats = 1098612
    shifted(0L) shouldBe ((750000L, 250000L, 500000L * 1098612L))
    shifted(1L) shouldBe ((250000L, 750000L, 500000L * 1098612L))
    // a bucket empty on one side floors to 1 ppm instead of ln(0)
    val curOne = Seq(("a", 0.5)).toDF("k", "v")
    val eps = Analytics.psiByGroup(ref, curOne, col("k"), col("v"), 0L, 200L, 2)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    eps(1L) shouldBe 1L // cur has no bucket-1 mass → epsilon, finite term
  }

  test("rollingMedianDaily: odd/even windows exact, gaps shrink the frame, " +
    "median resists the spike the mean would chase") {
    val df = Seq(
      ("a", t("2024-01-01 01:00:00"), 10.0),
      ("a", t("2024-01-02 01:00:00"), 20.0),
      ("a", t("2024-01-03 01:00:00"), 31.0),
      // 9-day gap: the 2024-01-12 window holds ONLY itself
      ("a", t("2024-01-12 01:00:00"), 1000.0)
    ).toDF("k", "ts", "v")
    val out = Analytics.rollingMedianDaily(df, col("k"), col("ts"),
        col("v"), windowDays = 3)
      .collect().map(r => r.getDate(1).toString -> r.getLong(3)).toMap
    out("2024-01-01") shouldBe 2000L            // {1000} → 2·1000
    out("2024-01-02") shouldBe 3000L            // {1000,2000} → 1000+2000
    out("2024-01-03") shouldBe 4000L            // {1000,2000,3100} → 2·2000
    out("2024-01-12") shouldBe 200000L          // gap → own window only
    // the spike day's median ignores the spike when history returns
    val df2 = df.union(Seq(("a", t("2024-01-13 01:00:00"), 12.0),
      ("a", t("2024-01-14 01:00:00"), 14.0)).toDF("k", "ts", "v"))
    val m14 = Analytics.rollingMedianDaily(df2, col("k"), col("ts"),
        col("v"), windowDays = 3)
      .filter(col("day") === lit("2024-01-14").cast("date"))
      .collect().head.getLong(3)
    m14 shouldBe 2800L // {100000, 1200, 1400} → 2·1400: spike not chased
  }

  test("featureScaling: ppm percent-rank with shared tie ranks, min-max, " +
    "degenerate groups scale to 0") {
    val df = Seq(
      (1L, "a", 10.0), (2L, "a", 20.0), (3L, "a", 20.0), (4L, "a", 40.0),
      (5L, "one", 7.0),          // single-row group
      (6L, "const", 5.0), (7L, "const", 5.0) // constant group
    ).toDF("id", "k", "v")
    val out = Analytics.featureScaling(df, col("id"), col("k"), col("v"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    // group a (n=4): ranks 1, 2, 2, 4 → pr = 0, 333333, 333333, 1000000
    out(1L) shouldBe ((0L, 0L))
    out(2L) shouldBe ((333333L, 333333L)) // (2000-1000)*1e6 div 3000
    out(3L) shouldBe ((333333L, 333333L))
    out(4L) shouldBe ((1000000L, 1000000L))
    out(5L) shouldBe ((0L, 0L))
    out(6L) shouldBe ((0L, 0L))
    out(7L) shouldBe ((0L, 0L))
  }

  test("topNRowsPerGroup == the row_number window idiom, ties to lower id") {
    val df = Seq(
      (1L, "a", 5.0), (2L, "a", 9.0), (3L, "a", 9.0), (4L, "a", 1.0),
      (5L, "b", 2.0), (6L, "b", 2.0), (7L, "b", 2.0)
    ).toDF("id", "k", "v")
    val fast = Analytics.topNRowsPerGroup(df, col("k"), col("v"), col("id"), 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).toSet
    fast shouldBe Set(
      ("a", 2L, 9.0, 1L), ("a", 3L, 9.0, 2L), // 9.0 tie → lower id first
      ("b", 5L, 2.0, 1L), ("b", 6L, 2.0, 2L))
    // no Window operator in the plan — the point of the partial aggregate
    Analytics.topNRowsPerGroup(df, col("k"), col("v"), col("id"), 2)
      .queryExecution.executedPlan.toString should not include "Window"
  }

  test("mixEntropy: ln(k) on uniform mixes, zero on single-category, " +
    "groups independent") {
    val df = (Seq.tabulate(8)(i => ("u", s"c${i % 4}")) ++
      Seq(("m", "only"), ("m", "only"))).toDF("g", "c")
    val out = Analytics.mixEntropy(df, col("g"), col("c"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // uniform 4 categories: p = 250000 ppm, ln(0.25)µ = -1386294 →
    // entropy_pn = 4 · 250000 · 1386294 = ln(4)·1e12 quantized
    out("u") shouldBe ((4L, 8L, 1386294000000L))
    out("m") shouldBe ((1L, 2L, 0L))
  }

  test("transitionCounts: per-key ordering with tie-break; keys independent") {
    val df = Seq(
      // user 1: a→b→a (b at 10:01 ties broken by id: id 2 before id 3)
      (1L, t("2024-01-01 10:00:00"), 1L, "a"),
      (1L, t("2024-01-01 10:01:00"), 2L, "b"),
      (1L, t("2024-01-01 10:01:00"), 3L, "a"),
      // user 2: single event → no transition
      (2L, t("2024-01-01 10:00:00"), 4L, "c"),
      // user 3: a→b again
      (3L, t("2024-01-01 09:00:00"), 5L, "a"),
      (3L, t("2024-01-01 11:00:00"), 6L, "b")
    ).toDF("u", "ts", "id", "s")
    val out = Analytics.transitionCounts(df, col("u"), col("ts"), col("id"),
        col("s"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    out shouldBe Map(("a", "b") -> 2L, ("b", "a") -> 1L)
  }

  test("histogram: clamped integer buckets, nulls excluded") {
    val df = Seq(
      ("a", Some(-5.0)),  // below lo → clamps into bucket 0
      ("a", Some(0.0)),   // bucket 0
      ("a", Some(9.99)),  // cents 999 → (999*4) div 4000 = 0
      ("a", Some(10.0)),  // cents 1000 → bucket 1
      ("a", Some(39.99)), // cents 3999 → bucket 3
      ("a", Some(99.0)),  // above hi → clamps into last bucket (3)
      ("a", None),
      ("b", Some(25.0))   // bucket 2
    ).toDF("k", "v")
    val out = Analytics.histogram(df, col("k"), col("v"), 0L, 4000L, 4)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    out shouldBe Map(
      ("a", 0L) -> 3L, ("a", 1L) -> 1L, ("a", 3L) -> 2L,
      ("b", 2L) -> 1L)
  }

  test("equiDepthBins: equal counts per bin, (value, id) tie-break, " +
    "groups independent") {
    val rows = (1 to 20).map(i => (i.toLong, "a", (i % 4).toDouble)) ++
      (21 to 26).map(i => (i.toLong, "b", i.toDouble))
    val out = Analytics.equiDepthBins(rows.toDF("id", "k", "v"),
        col("k"), col("v"), col("id"), 2)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // group a: 20 rows → 10 per bin; ties on v resolved by id, so bin 1
    // is exactly the 10 smallest (v, id) pairs
    val aBins = out.collect { case ((id, "a"), b) => id -> b }.toMap
    aBins.values.count(_ == 1L) shouldBe 10
    aBins.values.count(_ == 2L) shouldBe 10
    // v values: 1..20 % 4 → 0,1,2,3 cycling; five of each. Sorted by
    // (v, id): all v=0 (ids 4,8,12,16,20), all v=1 (1,5,9,13,17) → bin 1
    Seq(4L, 8L, 12L, 16L, 20L, 1L, 5L, 9L, 13L, 17L)
      .foreach(id => aBins(id) shouldBe 1L)
    // group b: 6 rows → 3 per bin, independent of a
    val bBins = out.collect { case ((id, "b"), b) => id -> b }.toMap
    bBins shouldBe Map(21L -> 1L, 22L -> 1L, 23L -> 1L,
      24L -> 2L, 25L -> 2L, 26L -> 2L)
  }

  test("resampleFill: dense grid, zero fill, boundary buckets exact") {
    val df = Seq(
      ("a", t("2024-01-01 00:03:00"), 1.0),
      ("a", t("2024-01-01 00:17:00"), 2.0),
      ("a", t("2024-01-01 00:18:00"), 3.0),
      ("a", t("2024-01-01 00:59:59"), 4.0), // last instant of the 00:45 bucket
      ("a", t("2024-01-01 01:00:00"), 99.0), // beyond to+step → excluded
      ("b", t("2024-01-01 00:30:00"), 7.0)
    ).toDF("k", "ts", "v")
    val out = Analytics.resampleFill(df, col("k"), col("ts"), col("v"),
        900L, "2024-01-01 00:00:00", "2024-01-01 00:45:00")
      .collect().map(r => (r.getString(0), r.getTimestamp(1).toString,
        r.getDouble(2), r.getLong(3))).toSet
    out shouldBe Set(
      ("a", "2024-01-01 00:00:00.0", 1.0, 1L),
      ("a", "2024-01-01 00:15:00.0", 5.0, 2L),
      ("a", "2024-01-01 00:30:00.0", 0.0, 0L),
      ("a", "2024-01-01 00:45:00.0", 4.0, 1L),
      ("b", "2024-01-01 00:00:00.0", 0.0, 0L),
      ("b", "2024-01-01 00:15:00.0", 0.0, 0L),
      ("b", "2024-01-01 00:30:00.0", 7.0, 1L),
      ("b", "2024-01-01 00:45:00.0", 0.0, 0L))
  }

  test("resampleFill rejects a range that is not whole steps") {
    val df = Seq(("a", t("2024-01-01 00:00:00"), 1.0)).toDF("k", "ts", "v")
    an[IllegalArgumentException] should be thrownBy
      Analytics.resampleFill(df, col("k"), col("ts"), col("v"), 900L,
        "2024-01-01 00:00:00", "2024-01-01 00:40:00")
  }

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

  test("sessionize: gap splits, per-key independence, boundary inclusive") {
    val df = Seq(
      // key a: three events in one session (gaps 10 and 29 min), then a
      // 31-min gap opens a second session
      ("a".hashCode.toLong, t("2024-01-01 08:00:00"), 1.0),
      ("a".hashCode.toLong, t("2024-01-01 08:10:00"), 2.0),
      ("a".hashCode.toLong, t("2024-01-01 08:39:00"), 3.0),
      ("a".hashCode.toLong, t("2024-01-01 09:10:00"), 4.0),
      // key b: a gap of EXACTLY 30 min stays one session (strict >)
      ("b".hashCode.toLong, t("2024-01-01 08:00:00"), 5.0),
      ("b".hashCode.toLong, t("2024-01-01 08:30:00"), 6.0)
    ).toDF("k", "ts", "v")
    val out = Analytics.sessionize(df, col("k"), col("ts"), col("v"), 30)
      .orderBy("key", "session_ix").collect()
    val a = out.filter(_.getLong(0) == "a".hashCode.toLong)
    a.map(_.getLong(1)) shouldBe Array(1L, 2L)
    a.map(_.getLong(4)) shouldBe Array(3L, 1L) // n_events per session
    a(0).getTimestamp(2) shouldBe t("2024-01-01 08:00:00") // session_start
    a(0).getTimestamp(3) shouldBe t("2024-01-01 08:39:00") // session_end
    a(0).getDouble(5) shouldBe 6.0
    val b = out.filter(_.getLong(0) == "b".hashCode.toLong)
    b.map(_.getLong(4)) shouldBe Array(2L) // 30:00 gap is NOT a break
  }

  test("robustAnomalies: median/MAD flags the spike, not the stuck mean") {
    // key 1: values cluster at ~10 with one 100.0 spike. mean-based z would
    // be dragged by the spike itself; median 10.10, MAD in cents stays small
    val df = Seq(
      (1L, 1L, 10.00), (1L, 2L, 10.10), (1L, 3L, 10.20), (1L, 4L, 9.90),
      (1L, 5L, 100.0), // the anomaly
      (2L, 6L, 5.0), (2L, 7L, 5.0), (2L, 8L, 5.0) // MAD = 0 → flags nothing
    ).toDF("k", "id", "v")
    val out = Analytics.robustAnomalies(df, col("k"), col("id"), col("v"), 3)
      .collect()
    out.map(r => (r.getLong(0), r.getLong(1))) shouldBe Array((1L, 5L))
    out(0).getLong(2) shouldBe 10000L // v_cents
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

  test("profile: exact per-column stats in one pass") {
    val df = Seq(
      (Some(1L), Some(1.5), Some("a")),
      (Some(2L), None, Some("a")),
      (None, Some(-3.0), Some("b")),
      (Some(2L), Some(1.5), None)
    ).toDF("id", "v", "s")
    val out = Analytics.profile(df, Seq("id", "v"), Seq("s"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)),
          if (r.isNullAt(5)) None else Some(r.getDouble(5))))).toMap
    out("id") shouldBe ((4L, 1L, 2L, Some(1.0), Some(2.0)))
    out("v") shouldBe ((4L, 1L, 2L, Some(-3.0), Some(1.5)))
    out("s") shouldBe ((4L, 1L, 2L, None, None))
  }

  test("profileApprox tracks exact profile; plan has no Expand") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val cols = (Seq("event_id", "user_id", "value"), Seq("event_type"))
    val exact = Analytics.profile(ev, cols._1, cols._2)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val approxDf = Analytics.profileApprox(ev, cols._1, cols._2)
    approxDf.queryExecution.executedPlan.toString should not include "Expand"
    val approx = approxDf.collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    exact.foreach { case (c, n) =>
      assert(math.abs(approx(c) - n) <= math.max(2L, (n * 0.06).toLong),
        s"col $c: approx ${approx(c)} vs exact $n")
    }
    // non-distinct stats are identical, not approximate
    val ex2 = Analytics.profile(ev, cols._1, cols._2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val ap2 = approxDf
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    ap2 shouldBe ex2
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

  test("percentile sketch tracks the exact per-group percentiles") {
    val ev = Tables.events(spark, "/root/testdata/sf0.01")
    val exact = Analytics.percentilesByGroup(ev, col("event_type"),
        col("value")).collect()
      .map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val approx = Analytics.percentilesApproxByGroup(ev, col("event_type"),
        col("value")).collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    exact.foreach { case (k, (p50, p95, p99)) =>
      val Seq(a50, a95, a99) = approx(k).toSeq
      // rank error 1/accuracy=1e-4 on ~2000-row groups → within a hair of
      // the exact value; assert a conservative relative envelope
      a50 shouldBe p50 +- math.max(0.5, p50 * 0.02)
      a95 shouldBe p95 +- math.max(0.5, p95 * 0.02)
      a99 shouldBe p99 +- math.max(1.0, p99 * 0.03)
    }
  }

  test("funnel: order enforced, equal-ts counts, counts monotone, ppm conversions") {
    val ev = Seq(
      // u1 completes in order
      (1L, t("2024-01-01 10:00:00"), "view"),
      (1L, t("2024-01-01 11:00:00"), "click"),
      (1L, t("2024-01-01 12:00:00"), "purchase"),
      // u2 clicked BEFORE viewing → click doesn't count; re-click after does not exist
      (2L, t("2024-01-01 09:00:00"), "click"),
      (2L, t("2024-01-01 10:00:00"), "view"),
      // u3 view + click at the SAME instant (>= counts), no purchase
      (3L, t("2024-01-01 10:00:00"), "view"),
      (3L, t("2024-01-01 10:00:00"), "click"),
      // u4 purchases without the earlier stages → counts nowhere
      (4L, t("2024-01-01 10:00:00"), "purchase")
    ).toDF("uid", "ts", "et")
    val got = Analytics.funnel(ev, col("uid"), col("ts"), col("et"),
        Seq("view", "click", "purchase"))
      .orderBy("stage_ix")
      .as[(Long, String, Long, Long)].collect()
    got shouldBe Array(
      (0L, "view", 3L, 750000L),     // 3 of 4 users viewed
      (1L, "click", 2L, 666666L),    // u1 + u3 (equal-ts); u2's early click out
      (2L, "purchase", 1L, 500000L)) // u1 only; u4's bare purchase out
  }

  test("retentionCohorts: first-day cohorts, floor-week offsets, distinct actives") {
    val ev = Seq(
      (1L, t("2024-01-01 10:00:00")), // cohort 2024-01-01
      (1L, t("2024-01-03 10:00:00")), // offset 0 (2 days)
      (1L, t("2024-01-08 10:00:00")), // offset 1 (7 days)
      (1L, t("2024-01-08 12:00:00")), // same user+week → still 1 distinct
      (2L, t("2024-01-02 10:00:00")), // cohort 2024-01-02
      (2L, t("2024-01-16 10:00:00"))  // offset 2 (14 days)
    ).toDF("uid", "ts")
    val got = Analytics.retentionCohorts(ev, col("uid"), col("ts"))
      .select(col("cohort_day").cast("string"), col("offset_weeks"),
        col("n_active"))
      .as[(String, Long, Long)].collect().sortBy(r => (r._1, r._2))
    got shouldBe Array(
      ("2024-01-01", 0L, 1L),
      ("2024-01-01", 1L, 1L),
      ("2024-01-02", 0L, 1L),
      ("2024-01-02", 2L, 1L))
  }

  test("winsorizeByGroup: clamps at interpolated per-group percentile cents, groups independent") {
    // the 0.005 offset parks every value AND every interpolated bound at
    // ~x.5 cents, so floor(×100) is 1-ulp-robust (never at a cent boundary)
    val a = (1 to 20).map(i => ("a", i.toLong, i + 0.005))
    val b = Seq(("b", 100L, 5.005), ("b", 101L, 6.005), ("b", 102L, 7.005))
    val got = Analytics.winsorizeByGroup((a ++ b).toDF("grp", "id", "v"),
        col("grp"), col("v"), 0.05, 0.95)
      .select("id", "v_cents").as[(Long, Long)].collect().toMap
    // group a: p05 = 1.005 + 0.95·1 = 1.955 → 195 ¢; p95 = 19.055 → 1905 ¢
    got(1L) shouldBe 195L    // below lo → clamped up
    got(2L) shouldBe 200L    // inside band → untouched cents
    got(10L) shouldBe 1000L
    got(20L) shouldBe 1905L  // above hi → clamped down
    // group b has its own bounds: p05 = 5.105 → 510 ¢, p95 = 6.905 → 690 ¢
    got(100L) shouldBe 510L
    got(101L) shouldBe 600L
    got(102L) shouldBe 690L
  }

  test("ewmaScaledByKey: hand-computed weighted sums, per-key isolation, tie-break order") {
    val df = Seq(
      ("a", t("2024-01-01 00:00:00"), 1L, 1.0),
      ("a", t("2024-01-01 01:00:00"), 2L, 2.0),
      ("a", t("2024-01-01 02:00:00"), 3L, 3.0),
      ("b", t("2024-01-01 00:30:00"), 4L, 10.0),
      // same ts as id=6: tie broken by id, so id=5 is the EARLIER reading
      ("c", t("2024-01-01 00:00:00"), 5L, 1.0),
      ("c", t("2024-01-01 00:00:00"), 6L, 2.0)
    ).toDF("k", "ts", "id", "v")
    val got = Analytics.ewmaScaledByKey(df, col("k"), col("ts"), col("id"),
        col("v"), depth = 2)
      .select("id", "ewma_scaled").as[(Long, Long)].collect().toMap
    // weights (current, lag1, lag2) = (4, 2, 1) on cents
    got shouldBe Map(
      1L -> 400L,            // 100*4
      2L -> (200 * 4 + 100 * 2L),
      3L -> (300 * 4 + 200 * 2 + 100L),
      4L -> 4000L,           // fresh key: no history
      5L -> 400L,
      6L -> (200 * 4 + 100 * 2L))
  }

  test("ewmaScaledByKey: partitioning-independent and exact vs driver-side recurrence") {
    val rows = (0 until 400).map { i =>
      (s"k${i % 3}", t(f"2024-01-${i % 28 + 1}%02d ${i % 24}%02d:00:00"),
        i.toLong, (i * 37 % 1000) / 10.0 - 17.3)
    }
    val df = rows.toDF("k", "ts", "id", "v")
    val a = Analytics.ewmaScaledByKey(df, col("k"), col("ts"), col("id"),
        col("v"), depth = 20)
      .select("id", "ewma_scaled").as[(Long, Long)].collect().toMap
    val b = Analytics.ewmaScaledByKey(df.repartition(13), col("k"), col("ts"),
        col("id"), col("v"), depth = 20)
      .select("id", "ewma_scaled").as[(Long, Long)].collect().toMap
    a shouldBe b
    // driver-side truth: same truncated weighted sum in BigInt
    rows.groupBy(_._1).values.foreach { g =>
      val ord = g.sortBy(r => (r._2.getTime, r._3))
      ord.zipWithIndex.foreach { case ((_, _, id, _), i) =>
        val expect = (0 to math.min(20, i)).map { k =>
          BigInt(math.floor(ord(i - k)._4 * 100).toLong) * BigInt(1L << (20 - k))
        }.sum
        BigInt(a(id)) shouldBe expect
      }
    }
  }

  test("meterIntervals: normal deltas, rollover healing, reset-to-zero, " +
    "first-reading NULL, key independence") {
    val df = Seq(
      // meter a: 10 → 40 → wrap (95→5 under m=100): usage 30 then 10
      ("a", t("2024-01-01 00:00:00"), 1L, 10L),
      ("a", t("2024-01-01 01:00:00"), 2L, 40L),
      ("a", t("2024-01-01 02:00:00"), 3L, 95L),
      ("a", t("2024-01-01 03:00:00"), 4L, 5L),
      // meter b: untouched by a's wrap
      ("b", t("2024-01-01 00:30:00"), 5L, 7L),
      ("b", t("2024-01-01 01:30:00"), 6L, 9L)
    ).toDF("k", "ts", "id", "reading")
    val wrap = Analytics.meterIntervals(df, col("k"), col("ts"), col("id"),
        col("reading"), wrapModulus = Some(100L))
      .collect().map(r => r.getLong(2) ->
        ((if (r.isNullAt(4)) -1L else r.getLong(4)), r.getBoolean(5))).toMap
    wrap(1L) shouldBe ((-1L, false)) // first reading: no interval
    wrap(2L) shouldBe ((30L, false))
    wrap(3L) shouldBe ((55L, false))
    wrap(4L) shouldBe ((10L, true))  // 5 − 95 + 100: healed rollover,
                                     // still flagged is_discontinuity
    wrap(5L) shouldBe ((-1L, false))
    wrap(6L) shouldBe ((2L, false))
    // reset-to-zero policy: the same drop means a replaced counter
    val reset = Analytics.meterIntervals(df, col("k"), col("ts"), col("id"),
        col("reading"), wrapModulus = None)
      .filter(col("id") === 4L).collect().head
    reset.getLong(4) shouldBe 5L // usage restarts from the new register
    reset.getBoolean(5) shouldBe true
    reset.schema.fieldNames(5) shouldBe "is_discontinuity"
  }

  test("timeWeightedMeanDaily: step-hold weights, day-boundary truncation, " +
    "floor mean, burst not over-weighted, null ticks spanned LOCF-style") {
    // key a, one day: 100 held 6 h, then 400 held 18 h (to midnight)
    //   twa = (10000·6 + 40000·18)/24 = 32500 cents
    // a plain avg would say 25000 — the long-held 400 must dominate.
    // The null tick at 03:00 must change NOTHING: the 100-reading's hold
    // spans it (no dilution toward zero, no n_samples/covered_ms count).
    val df = Seq(
      ("a", t("2024-01-01 00:00:00"), 1L, Some(100.0)),
      ("a", t("2024-01-01 03:00:00"), 9L, None),
      ("a", t("2024-01-01 06:00:00"), 2L, Some(400.0)),
      // key a, next day: single sample from 12:00 → covers half the day
      ("a", t("2024-01-02 12:00:00"), 3L, Some(50.0)),
      // key b: a burst of three ticks in one minute then 12 h of 7.0 —
      // the burst's weight is its held minutes only
      ("b", t("2024-01-01 11:00:00"), 4L, Some(1000.0)),
      ("b", t("2024-01-01 11:00:30"), 5L, Some(1000.0)),
      ("b", t("2024-01-01 11:01:00"), 6L, Some(7.0))
    ).toDF("k", "ts", "id", "v")
    val out = Analytics.timeWeightedMeanDaily(df, col("k"), col("ts"),
        col("id"), col("v"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    out(("a", "2024-01-01")) shouldBe ((2L, 86400000L, 32500L))
    // day 2: covered only from noon (43200000 ms), value constant
    out(("a", "2024-01-02")) shouldBe ((1L, 43200000L, 5000L))
    // b: 60 s at 100000 cents, then 46740 s at 700 cents
    //   floor((100000·60000 + 700·46740000)/46800000) = 827
    out(("b", "2024-01-01")) shouldBe ((3L, 46800000L, 827L))
  }

  test("rollupReport == union of the per-level groupBys, nulls sentineled, one Expand") {
    val df = Seq(
      ("p1", "s1", 10L), ("p1", "s1", 5L), ("p1", "s2", 7L), ("p2", "s1", 3L)
    ).toDF("p", "s", "v")
    val got = Analytics.rollupReport(df,
        Seq((col("p"), "priority"), (col("s"), "status")), "ALL",
        Seq(sum(col("v")).as("tot")))
      .select("priority", "status", "n_rows", "tot")
      .as[(String, String, Long, Long)].collect().sortBy(r => (r._1, r._2))
    got shouldBe Array(
      ("ALL", "ALL", 4L, 25L),
      ("p1", "ALL", 3L, 22L),
      ("p1", "s1", 2L, 15L),
      ("p1", "s2", 1L, 7L),
      ("p2", "ALL", 1L, 3L),
      ("p2", "s1", 1L, 3L))
    // single-pass shape: the plan is one Expand feeding one aggregate — not
    // a union of per-level groupBys (which would plan Union, no Expand)
    val plan = Analytics.rollupReport(df,
        Seq((col("p"), "priority"), (col("s"), "status")), "ALL",
        Seq(sum(col("v")).as("tot")))
      .queryExecution.executedPlan.toString
    plan should include("Expand")
    plan should not include "Union"
  }

  private def lfMap(rows: Seq[(String, Timestamp, Double)]) =
    Analytics.loadFactors(rows.toDF("k", "ts", "v").repartition(4),
        col("k"), col("ts"), col("v"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        Option(r.get(3)), Option(r.get(4))))).toMap

  test("loadFactors: hand-exact ppm, coincidence at the system peak day, " +
    "silent-at-peak NULL") {
    val rows = Seq(
      ("a", t("2024-01-01 08:00:00"), 1.0),
      ("a", t("2024-01-02 08:00:00"), 2.0),
      ("a", t("2024-01-03 08:00:00"), 1.0),
      ("b", t("2024-01-01 09:00:00"), 3.0),
      ("b", t("2024-01-02 09:00:00"), 1.0))
    // totals: d1=400, d2=300, d3=100 → system peak day = Jan 1
    val out = lfMap(rows)
    // a: n=3, s=400, peak=200 → lf = 400e6 div 600 = 666666;
    //    value@peak=100 → coincidence = 100e6 div 200 = 500000
    out("a") shouldBe ((3L, 200L, Some(666666L), Some(500000L)))
    out("b") shouldBe ((2L, 300L, Some(666666L), Some(1000000L)))
  }

  test("loadFactors: tied system-peak totals break to the EARLIER day; " +
    "zero-peak key yields NULLs; silent-at-peak coincidence is NULL") {
    // mirrored keys: totals d1 = d2 = 600 → the tie breaks to Jan 1
    val mirrored = Seq(
      ("m", t("2024-01-01 08:00:00"), 5.0), ("m", t("2024-01-02 08:00:00"), 1.0),
      ("w", t("2024-01-01 08:00:00"), 1.0), ("w", t("2024-01-02 08:00:00"), 5.0))
    val o2 = lfMap(mirrored)
    o2("m") shouldBe ((2L, 500L, Some(600000L), Some(1000000L)))
    o2("w") shouldBe ((2L, 500L, Some(600000L), Some(200000L)))
    // were the LATER day chosen the two coincidences would swap — pinned
    // all-zero key: peak 0 → both ratios NULL
    lfMap(mirrored :+ (("z", t("2024-01-01 10:00:00"), 0.0)))
      .apply("z") shouldBe ((1L, 0L, None, None))
    // a d3-only key big enough to own the system peak: m/w silent there
    val o4 = lfMap(mirrored :+ (("s", t("2024-01-03 09:00:00"), 9.9)))
    o4("m")._4 shouldBe None
    o4("w")._4 shouldBe None
    o4("s")._4 shouldBe Some(1000000L)
  }

  private def stuckFixture = Seq(
    // A: q(10-cent buckets) = 10,10,10,25,25,10 -> runs (10,3)(25,2)(10,1)
    ("A", t("2024-01-01 00:00:00"), 1L, Some(1.00)),
    ("A", t("2024-01-01 01:00:00"), 2L, Some(1.02)),
    ("A", t("2024-01-01 02:00:00"), 3L, Some(1.03)),
    ("A", t("2024-01-01 03:00:00"), 4L, Some(2.50)),
    ("A", t("2024-01-01 04:00:00"), 5L, Some(2.51)),
    ("A", t("2024-01-01 05:00:00"), 6L, Some(1.00)),
    // B: a null splits nothing (dropped before the islands); -0.05 floors
    // to bucket -1 (floorDiv, not truncation)
    ("B", t("2024-01-01 00:00:00"), 1L, Some(-0.05)),
    ("B", t("2024-01-01 01:00:00"), 2L, None),
    ("B", t("2024-01-01 02:00:00"), 3L, Some(-0.01))
  ).toDF("k", "ts", "id", "v")

  test("stuckRuns: islands, min length, floor bucketing of negatives") {
    val r2 = Analytics.stuckRuns(stuckFixture, col("k"), col("ts"),
        col("id"), col("v"), quantCents = 10L, minLen = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getTimestamp(3), r.getTimestamp(4)))
    r2.toSet shouldBe Set(
      ("A", 10L, 3L, t("2024-01-01 00:00:00"), t("2024-01-01 02:00:00")),
      ("A", 25L, 2L, t("2024-01-01 03:00:00"), t("2024-01-01 04:00:00")),
      // B: both non-null ticks floor to bucket -1 -> one run of 2 spanning
      // the dropped null tick
      ("B", -1L, 2L, t("2024-01-01 00:00:00"), t("2024-01-01 02:00:00")))
    Analytics.stuckRuns(stuckFixture, col("k"), col("ts"), col("id"),
      col("v"), quantCents = 10L, minLen = 3).count() shouldBe 1L
    an[IllegalArgumentException] should be thrownBy
      Analytics.stuckRuns(stuckFixture, col("k"), col("ts"), col("id"),
        col("v"), quantCents = 10L, minLen = 1)
  }

  test("cadenceProfile: exact rank statistics of inter-arrival gaps") {
    val fx = Seq(
      // a: gaps 1000,2000,3000,4000 ms (even n=4)
      ("a", t("2024-01-01 00:00:00"), 1L), ("a", t("2024-01-01 00:00:01"), 2L),
      ("a", t("2024-01-01 00:00:03"), 3L), ("a", t("2024-01-01 00:00:06"), 4L),
      ("a", t("2024-01-01 00:00:10"), 5L),
      // b: one 500 ms gap (odd n=1)
      ("b", t("2024-01-01 00:00:00"), 1L),
      ("b", t("2024-01-01 00:00:00.5"), 2L),
      // c: single tick -> no gaps, no row
      ("c", t("2024-01-01 00:00:00"), 1L)
    ).toDF("k", "ts", "id")
    val r = Analytics.cadenceProfile(fx, col("k"), col("ts"), col("id"))
      .collect().map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4)))).toMap
    // a: med2 = 2000+3000; p95 rank ceil(0.95*4)=4 -> 4000
    r("a") shouldBe ((4L, 5000L, 4000L, 4000L))
    // b: med2 = 2*500; p95 rank 1 -> 500
    r("b") shouldBe ((1L, 1000L, 500L, 500L))
    r.keySet should not contain "c"
  }

  test("veeScorecard: hand-computed quality row per key") {
    val fx = Seq(
      // C: days 1,2,5 present (span 5 -> 600000 ppm); one +300.00 spike;
      // one null row; values 1.00,1.00,1.00 stuck (quant 5000, minLen 3)
      ("C", t("2024-01-01 00:00:00"), 1L, Some(1.00)),
      ("C", t("2024-01-01 01:00:00"), 2L, Some(1.00)),
      ("C", t("2024-01-02 00:00:00"), 3L, Some(1.00)),
      ("C", t("2024-01-05 00:00:00"), 4L, Some(301.00)),
      ("C", t("2024-01-05 01:00:00"), 5L, None),
      // D: all null -> zero-filled scorecard
      ("D", t("2024-01-01 00:00:00"), 1L, None)
    ).toDF("k", "ts", "id", "v")
    val r = Analytics.veeScorecard(fx, col("k"), col("ts"), col("id"),
        col("v"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7)))).toMap
    r("C") shouldBe ((5L, 1L, 3L, 5L, 600000L, 1L, 3L))
    r("D") shouldBe ((1L, 1L, 0L, 0L, 0L, 0L, 0L))
  }

  test("veeFleetRollup: class counts with overlap against the floor") {
    // C fails completeness (600000 < 900000), spiky, stuck, has nulls;
    // D fails completeness (0) and has nulls only
    val fx = Seq(
      ("C", t("2024-01-01 00:00:00"), 1L, Some(1.00)),
      ("C", t("2024-01-01 01:00:00"), 2L, Some(1.00)),
      ("C", t("2024-01-02 00:00:00"), 3L, Some(1.00)),
      ("C", t("2024-01-05 00:00:00"), 4L, Some(301.00)),
      ("C", t("2024-01-05 01:00:00"), 5L, None),
      ("D", t("2024-01-01 00:00:00"), 1L, None)
    ).toDF("k", "ts", "id", "v")
    val sc = Analytics.veeScorecard(fx, col("k"), col("ts"), col("id"),
      col("v"))
    val row = Analytics.veeFleetRollup(sc).collect().head
    (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
      row.getLong(4)) shouldBe ((2L, 2L, 1L, 1L, 2L))
    an[IllegalArgumentException] should be thrownBy
      Analytics.veeFleetRollup(sc, completenessFloorPpm = 2000000L)
  }
}
