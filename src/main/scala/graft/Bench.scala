package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main — driver runs this per-round with SPARK_GRAFT_SF_DIR set
  * (sf0.1). Prints exactly one JSON line. Each query is forced through the
  * `noop` sink so the full plan executes (a bare `count()` would let Catalyst
  * prune aggregates/projections and under-report).
  *
  * SELF-ADJUDICATING since r8 (VERDICT r7 "missing #3"): the artifact
  * carries its own outlier analysis, so a reader never again has to
  * cross-reference `BENCH_MEDIANS.json` by hand to spot an
  * environment-inflated sample (the r7 `q_repetition_filter` incident: a
  * 30 s driver reading whose committed cross-run envelope was 1.05–2.05 s).
  * Each fresh median is compared against the committed envelope max
  * ([[loadEnvelopeMax]]); entries beyond 1.5× are emitted under
  * `"outliers"`, and since r9 each carries a post-suite `"retest"`
  * (median-of-3 on the then-idle queue) with an `"environment"` /
  * `"regression"` verdict — the exoneration half ([[retestOutliers]]),
  * so an inflated sample is settled inside the artifact instead of by
  * judge re-measurement. The line also carries `"interp_fallbacks"` — a
  * live count of "falling back to interpreter" log events
  * ([[FallbackCounter]]; −1 if the appender could not attach, so "not
  * counted" never reads as "zero") — the only signal that codegen
  * silently died (CLAUDE.md), now in-artifact instead of a separate log
  * grep.
  */
object Bench {

  /** Pure adjudication: entries whose fresh time exceeds `factor` × the
    * committed envelope max. Entries without an envelope (new this round)
    * pass — they have no history to dispute. */
  def adjudicate(results: Seq[(String, Double)],
                 envelopeMax: Map[String, Double],
                 factor: Double = 1.5): Seq[(String, Double, Double)] =
    results.flatMap { case (name, got) =>
      envelopeMax.get(name).collect {
        case max if got > factor * max => (name, got, max)
      }
    }

  /** One adjudicated outlier as it appears in the artifact. `retest2` /
    * `loadRetest2` / `extCpu2` are present only when the first retest still
    * exceeded the threshold and a post-cooldown second retest ran. Loads
    * are the 1-minute system load average (−1 when unreadable) captured
    * right after each retest; `extCpu`/`extCpu2` are the PROCESS-EXTERNAL
    * CPU fraction over each retest's window ([[externalCpuFrac]]) — unlike
    * loadavg they are instantaneous and exclude this JVM, so an "idle
    * retest" claim is machine-checkable (VERDICT r10 #5). `envStreak`
    * counts CONSECUTIVE committed artifacts (this one included) whose
    * verdict for this query was "environment": a genuine small regression
    * that always retests just under the threshold would otherwise be
    * exonerated forever (ADVICE r10) — a streak ≥ 3 is the escalation
    * signal to stop exonerating and investigate. */
  final case class OutlierRow(name: String, got: Double, envelopeMax: Double,
                              retest: Double, loadRetest: Double,
                              extCpu: Double,
                              retest2: Option[Double], loadRetest2: Option[Double],
                              extCpu2: Option[Double],
                              verdict: String, envStreak: Int)

  /** 1-minute system load average: /proc/loadavg first field, falling back
    * to the JMX bean, then −1 (load then reads as "not measured", never as
    * "idle"). NOTE (VERDICT r10 wrong #2): loadavg decays over minutes and
    * counts this process's own just-finished threads — fine for relative
    * comparison, never an absolute idleness claim; [[externalCpuFrac]] is
    * the instantaneous, self-excluding measurement. */
  def systemLoad(): Double =
    try new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/proc/loadavg"))).split("\\s+")(0).toDouble
    catch { case _: Exception =>
      try java.lang.management.ManagementFactory
        .getOperatingSystemMXBean.getSystemLoadAverage
      catch { case _: Exception => -1.0 }
    }

  /** One machine+process CPU snapshot in jiffies: `total` = all /proc/stat
    * cpu fields through steal (wall capacity × cores), `busy` = total −
    * idle − iowait, `self` = this process's utime+stime across all threads
    * (/proc/self/stat). All −1 when unreadable (non-Linux), so a failed
    * read never masquerades as "idle". */
  final case class CpuStat(total: Long, busy: Long, self: Long)

  def readCpuStat(): CpuStat =
    try {
      val stat = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/stat")))
      val cpu = stat.linesIterator
        .find(_.startsWith("cpu ")).get.trim.split("\\s+")
      // user nice system idle iowait irq softirq steal [guest guest_nice]
      val v = cpu.drop(1).take(8).map(_.toLong)
      require(v.length == 8)
      val total = v.sum
      val idle = v(3) + v(4)
      val selfLine = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/self/stat")))
      // comm (field 2) may contain spaces — parse after its closing paren;
      // utime/stime are fields 14/15 (1-indexed), i.e. 11/12 past state
      val rest = selfLine.substring(selfLine.lastIndexOf(')') + 2)
        .trim.split("\\s+")
      val selfJ = rest(11).toLong + rest(12).toLong
      CpuStat(total, total - idle, selfJ)
    } catch { case _: Exception => CpuStat(-1, -1, -1) }

  /** Fraction of the machine's CPU capacity consumed by OTHER processes
    * between two snapshots: (Δbusy − Δself) / Δtotal, clamped to [0, 1];
    * −1 when either snapshot was unreadable or the window is empty. Near 0
    * ⇒ the window really was idle apart from this JVM — the
    * machine-checkable form of the "idle retest" claim. Pure. */
  def externalCpuFrac(a: CpuStat, b: CpuStat): Double =
    if (a.total < 0 || b.total < 0 || b.total <= a.total) -1.0
    else {
      val ext = (b.busy - a.busy) - (b.self - a.self)
      math.min(1.0, math.max(0.0, ext.toDouble / (b.total - a.total)))
    }

  /** Consecutive-"environment" streak for `name` over PRIOR artifacts'
    * per-query verdict maps, NEWEST FIRST (current run excluded — callers
    * add 1 for it). An artifact where the query was in-envelope (absent
    * from outliers) breaks the streak: the query behaved that round. Pure
    * (ADVICE r10: repeated exonerations must become visible). */
  def envStreak(name: String,
                priorVerdictsNewestFirst: Seq[Map[String, String]]): Int =
    priorVerdictsNewestFirst
      .takeWhile(_.get(name).contains("environment")).size

  /** The round this bench run belongs to: SPARK_GRAFT_ROUND when the
    * caller knows it, else 1 + the highest committed BENCH_r*.json — a
    * finished round's artifact is by definition prior. Used to name the
    * full-outlier sidecar and to EXCLUDE any artifact of the in-flight
    * round from streak reconstruction (ADVICE r11: a second bench run in
    * the same round must not count the round's own artifact as a
    * prior).
    *
    * AMBIGUITY the fallback cannot resolve (ADVICE r12): after a round's
    * own BENCH_r<n>.json is committed, a SECOND run in that same round
    * without SPARK_GRAFT_ROUND computes n+1 and counts the round's own
    * outliers as priors — exactly the self-counting the `before`
    * exclusion prevents. Rounds are back-to-back same-day, so no mtime
    * window can tell "prior round's artifact, committed an hour ago"
    * from "this round's artifact, re-running" without also risking a
    * misfire that would CLOBBER a committed sidecar (worse than streak
    * inflation). So the fallback keeps n+1 but WARNS LOUDLY whenever the
    * newest artifact is recent enough (< 3 h) that the run could be a
    * same-round repeat — the operator then sets SPARK_GRAFT_ROUND and
    * the warning, not silence, is what rides any mis-attributed run. */
  def currentRound(dir: String = "."): Int =
    sys.env.get("SPARK_GRAFT_ROUND").flatMap(_.toIntOption).getOrElse {
      val newest = committedRounds(dir, "BENCH_r(\\d+)\\.json".r)
        .sortBy(_._1).lastOption
      newest.foreach { case (n, f) =>
        val ageMs = try System.currentTimeMillis() - f.lastModified()
                    catch { case _: Exception => Long.MaxValue }
        if (ageMs < 3L * 3600 * 1000)
          System.err.println(
            f"[bench] WARNING: SPARK_GRAFT_ROUND is unset and BENCH_r$n%02d.json " +
            f"is only ${ageMs / 60000} min old — if this run belongs to round $n " +
            f"(a same-round repeat), its env_streak priors will self-count round " +
            f"$n's own outliers; set SPARK_GRAFT_ROUND=$n to attribute it correctly.")
      }
      1 + newest.map(_._1).getOrElse(0)
    }

  private def committedRounds(dir: String,
                              rx: scala.util.matching.Regex): Seq[(Int, java.io.File)] =
    try {
      new java.io.File(dir).listFiles().toSeq.flatMap { f =>
        f.getName match {
          case rx(n) => Some((n.toInt, f))
          case _ => None
        }
      }
    } catch { case _: Exception => Seq.empty }

  /** Per-query verdict maps from committed artifacts in `dir`, newest
    * round first, rounds >= `before` excluded (see [[currentRound]]).
    * Each round merges its BENCH_r<n>.json — whose driver-parsed headline
    * caps the inline outlier list at the 3 worst — with the FULL
    * BENCH_OUTLIERS_r<n>.json sidecar this bench writes (VERDICT r11 #5:
    * without it, streaks for lesser repeat offenders were invisible to
    * the escalation rule). Unreadable dir/files → empty (streaks then
    * start at this run — the bench must keep producing its number even
    * when the repo layout changes under it). */
  def loadPriorVerdicts(dir: String = ".",
                        before: Int = Int.MaxValue): Seq[Map[String, String]] =
    try {
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      def verdictsOf(f: java.io.File): Map[String, String] =
        try {
          val root = om.readTree(f)
          val outs0 = if (root == null) null else root.get("outliers")
          val outs =
            if (outs0 != null) outs0
            else if (root != null && root.get("parsed") != null)
              root.get("parsed").get("outliers")
            else null
          if (outs == null || !outs.isArray) Map.empty[String, String]
          else {
            val b = Map.newBuilder[String, String]
            val it = outs.elements()
            while (it.hasNext) {
              val o = it.next()
              val n = o.get("name"); val v = o.get("verdict")
              if (n != null && v != null) b += n.asText() -> v.asText()
            }
            b.result()
          }
        } catch { case _: Exception => Map.empty[String, String] }
      val main = committedRounds(dir, "BENCH_r(\\d+)\\.json".r)
        .filter(_._1 < before).toMap
      val side = committedRounds(dir, "BENCH_OUTLIERS_r(\\d+)\\.json".r)
        .filter(_._1 < before).toMap
      (main.keySet ++ side.keySet).toSeq.sorted(Ordering.Int.reverse)
        .map { n =>
          main.get(n).map(verdictsOf).getOrElse(Map.empty) ++
            side.get(n).map(verdictsOf).getOrElse(Map.empty)
        }
    } catch { case _: Exception => Seq.empty }

  /** Deterministic CPU calibration anchor (VERDICT r11 wrong #1 / next
    * #4): `threads` workers each run `iters` rounds of a fixed 64-bit
    * mix (splitmix64 finalizer — public constant from Steele et al.);
    * returns wall seconds. The workload never changes, so the ratio of
    * two rounds' `calib_*` values IS the machine-speed drift between
    * them — the r11 adjudication (unchanged r9 tree +29% on a different
    * day) would have shown up here as ~1.29× instead of reading as an
    * unexplained envelope regression. 1-thread anchors single-core speed;
    * a full-width run anchors whole-machine throughput under the same
    * contention the suite runs with. The fold is consumed by a
    * side-effect check so the loop cannot be dead-code-eliminated. */
  def calibrate(threads: Int, iters: Long = 200_000_000L): Double = {
    require(threads >= 1 && iters >= 1)
    val sink = new java.util.concurrent.atomic.AtomicLong(0)
    def work(seed: Long): Long = {
      var acc = seed
      var i = 0L
      while (i < iters) {
        var z = acc + 0x9e3779b97f4a7c15L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        acc = z ^ (z >>> 31)
        i += 1
      }
      acc
    }
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { k =>
      val t = new Thread(() => { sink.addAndGet(work(k.toLong)); () })
      t.start(); t
    }
    ts.foreach(_.join())
    val dt = (System.nanoTime() - t0) / 1e9
    // consume the fold so the loop cannot be dead-code-eliminated — but
    // never via a throwing assertion: an (astronomically unlikely) hit must
    // not abort the whole bench run (ADVICE r12)
    if (sink.get() == 42L) System.err.println("[bench] calib fold == 42")
    dt
  }

  /** The exoneration half of self-adjudication (r9; VERDICT r8 "missing
    * #1"): [[adjudicate]] can FLAG an environment-inflated sample but not
    * CLEAR it — BENCH_r08 carried 5 outliers a reader could only settle by
    * judge re-measurement. After the measured pass the suite queue is
    * idle, so re-measuring just the flagged entries (`measure` = a
    * median-of-3 of the same noop-sink run) is a clean second opinion:
    * a retest back inside the same `factor`×envelope threshold that
    * flagged the sample marks it `"environment"` in-artifact.
    *
    * A `"regression"` verdict takes MORE evidence (r10; VERDICT r9
    * "missing #1" + ADVICE): BENCH_r09's sole regression verdict rested on
    * a retest (1.062 s) SLOWER than the sample it was checking (0.734 s) —
    * the signature of a retest loop itself running under residual load,
    * and judge idle measurement disagreed. So a first retest beyond the
    * threshold no longer stands alone: after `cooldown` a second retest
    * runs, and only if BOTH exceed `factor`×max does `"regression"` stick;
    * a second retest back in-envelope flips the verdict to
    * `"environment"`. Each retest records the system load beside it so the
    * artifact shows the conditions the verdict was taken under. Pure —
    * timing, load, and the cooldown come in through parameters. */
  def retestOutliers(flagged: Seq[(String, Double, Double)],
                     measure: String => Double,
                     factor: Double = 1.5,
                     load: () => Double = systemLoad _,
                     cooldown: () => Unit = () => (),
                     cpu: () => CpuStat = readCpuStat _,
                     priorStreak: String => Int = _ => 0): Seq[OutlierRow] =
    flagged.map { case (name, got, max) =>
      val c0 = cpu()
      val r1 = measure(name)
      val l1 = load()
      val e1 = externalCpuFrac(c0, cpu())
      if (r1 <= factor * max)
        OutlierRow(name, got, max, r1, l1, e1, None, None, None,
          "environment", priorStreak(name) + 1)
      else {
        cooldown()
        val c2 = cpu()
        val r2 = measure(name)
        val l2 = load()
        val e2 = externalCpuFrac(c2, cpu())
        val verdict =
          if (r2 <= factor * max) "environment" else "regression"
        OutlierRow(name, got, max, r1, l1, e1, Some(r2), Some(l2), Some(e2),
          verdict,
          if (verdict == "environment") priorStreak(name) + 1 else 0)
      }
    }

  /** Committed per-query envelope max from BENCH_MEDIANS.json (Jackson —
    * already on the Spark classpath). Missing/unreadable file or absent
    * `queries` node → empty map (adjudication then passes everything):
    * the bench must keep producing its number even when the repo layout
    * changes under it. */
  def loadEnvelopeMax(path: String = "BENCH_MEDIANS.json"): Map[String, Double] =
    try {
      val root = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(new java.io.File(path))
      val qs = if (root == null) null else root.get("queries")
      if (qs == null) Map.empty
      else {
        val b = Map.newBuilder[String, Double]
        val it = qs.fields()
        while (it.hasNext) {
          val e = it.next()
          val mx = e.getValue.get("max")
          if (mx != null && mx.isNumber) b += e.getKey -> mx.asDouble()
        }
        b.result()
      }
    } catch { case _: Exception => Map.empty }

  /** Committed calib_1t anchor from BENCH_MEDIANS.json's `calib` node, or
    * -1 when absent/unreadable (a missing anchor must read as "not
    * checked", never as "in spec"). calib_1t is the right anchor for ANY
    * core count — the 1-thread splitmix64 loop is cpu-count independent,
    * so it gates the driver's low-core scaling run too. */
  def loadCalibAnchor(path: String = "BENCH_MEDIANS.json"): Double =
    try {
      val root = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(new java.io.File(path))
      val c = if (root == null) null else root.get("calib")
      val v = if (c == null) null else c.get("calib_1t")
      if (v != null && v.isNumber && v.asDouble() > 0) v.asDouble() else -1.0
    } catch { case _: Exception => -1.0 }

  /** Calibration gate (VERDICT r13 #8): the r13 8-core scaling run executed
    * on a machine reading calib_1t 1.256 vs the 0.916 anchor (~37%
    * degraded) and silently produced 27 contaminated samples that read as
    * serialization cliffs. The fixed splitmix64 loop never changes, so
    * calib/anchor IS the machine drift; beyond `tol` the whole block is
    * suspect and the artifact must say so rather than let a reader grade
    * per-query ratios from it. Returns (ratio, suspect); ratio -1 / suspect
    * false when no anchor is committed. Pure. */
  def calibGate(calib1t: Double, anchor: Double,
                tol: Double = 0.10): (Double, Boolean) =
    if (anchor <= 0 || calib1t <= 0) (-1.0, false)
    else {
      val r = calib1t / anchor
      (r, math.abs(r - 1.0) > tol)
    }

  /** log4j2 appender counting interpreted-fallback warnings as they
    * happen. Spark logs "Expr codegen error and falling back to
    * interpreter mode" at WARN through the root logger — attaching here
    * sees every query's events regardless of which class emitted them. */
  private[graft] final class FallbackCounter
      extends org.apache.logging.log4j.core.appender.AbstractAppender(
        "graftFallbackCounter", null, null, true,
        org.apache.logging.log4j.core.config.Property.EMPTY_ARRAY) {
    val count = new java.util.concurrent.atomic.AtomicLong(0)
    /** true only once the appender is wired into the root logger — a
      * reported count is meaningless before then (ADVICE r8: a swallowed
      * attach failure must not read as "zero fallbacks"). */
    @volatile var attached: Boolean = false
    override def append(ev: org.apache.logging.log4j.core.LogEvent): Unit = {
      val m = ev.getMessage
      if (m != null && m.getFormattedMessage != null &&
          m.getFormattedMessage.contains("falling back to interpreter"))
        count.incrementAndGet()
    }
  }

  /** MUST be called AFTER Spark initializes logging (session built +
    * setLogLevel): touching the log4j2 context first would leave the
    * DefaultConfiguration with a second appender, which makes Spark's
    * `islog4j2DefaultConfigured()` false and silently skips loading its
    * log4j2 defaults — root stays at DefaultConfiguration's ERROR until
    * setLogLevel, and the log layout changes (code-review r8 finding).
    * Warm-up and all measured passes run after this attach, so every
    * query-time event is still counted. */
  private[graft] def installFallbackCounter(): FallbackCounter = {
    val app = new FallbackCounter
    app.start()
    try {
      val ctx = org.apache.logging.log4j.LogManager.getContext(false)
        .asInstanceOf[org.apache.logging.log4j.core.LoggerContext]
      ctx.getConfiguration.getRootLogger
        .addAppender(app, org.apache.logging.log4j.Level.WARN, null)
      ctx.updateLoggers()
      app.attached = true
    } catch { case _: Exception => () } // counting is best-effort; the
    // artifact then carries the -1 sentinel instead of a false all-clear
    app
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // engine session configs live in SessionProfile, shared with Verify and
    // the measurement tools (VERDICT r13 #1: a config only Bench carries is
    // a bench-only win; these are engine settings, not bench tuning)
    val spark = SessionProfile.local(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // attach only now — Spark's log4j2 defaults are loaded and the root
    // level is WARN, so fallback events reach the appender (see the
    // ordering note on installFallbackCounter)
    val fallbacks = installFallbackCounter()
    // machine state BEFORE the suite contributes anything: loadavg here is
    // uncontaminated by this run's own threads, and the CPU snapshot opens
    // the process-external window the artifact reports (VERDICT r10 #5 —
    // "idle" claims must be machine-checkable, not loadavg folklore)
    val loadStart = systemLoad()
    val cpuStart = readCpuStat()
    // machine calibration anchor, taken before the suite warms anything:
    // a fixed splitmix64 loop at 1 thread and at suite width — cross-round
    // sums become normalizable by the calib ratio (VERDICT r11 wrong #1)
    val calib1t = calibrate(1)
    val calibWide = calibrate(cpus.toInt)
    // calibration gate: compare this machine-now against the committed
    // anchor BEFORE running the suite, and carry the verdict in-artifact —
    // a degraded machine (the r13 c8 run: 1.256 vs 0.916 anchor) must mark
    // its own scaling block suspect instead of reading as serialization
    val (calibRatio, calibSuspect) = calibGate(calib1t, loadCalibAnchor())
    if (calibSuspect)
      System.err.println(
        f"[bench] WARNING: calib_1t $calib1t%.3f is ${(calibRatio - 1) * 100}%.0f%% " +
        f"off the committed anchor — machine degraded/changed; per-query " +
        f"numbers from this run are suspect (calib_suspect=true in artifact).")
    // Warm-up pass: run every query once unmeasured so Janino codegen
    // compilation and JIT warm-up (observed 3-25× on the heavy near-dup
    // plans) don't bill the measured pass. Steady-state throughput is the
    // number that scales to a long-lived cluster.
    val sorted = SparkEntry.queries.toSeq.sortBy(_._1)
    sorted.foreach { case (name, fn) =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] warmup $name failed: ${e.getMessage}")
      }
    }
    def medianOf3(name: String,
                  fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      Seq(once(), once(), once()).sorted.apply(1)
    }
    // Median of 3 for EVERY entry. History of this policy: r4 showed
    // single streaming samples reading ~10× steady-state under disk
    // load; r5 extended median-of-3 to batch entries whose warm-up ran
    // >1 s; r6 proved the remaining single-sample sub-second class is
    // still unadjudicable from committed artifacts (q_rolling_window
    // read 1.12 s in the committed run vs 0.26–0.57 s across every
    // local re-run and BenchFocus steady-state — a 4.9× swing on
    // untouched code that a median would have absorbed). The uniform
    // policy costs ~2 extra sub-second passes per cheap query (~+1.5
    // min suite wall) and removes the whole measurement-dispute class.
    val results = sorted.map { case (name, fn) => name -> medianOf3(name, fn) }
    val qs = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // load at the end of the measured pass — the conditions the flagged
    // samples were taken under (VERDICT r9 missing #1: without this a
    // reader can't tell a loaded driver run from a real slowdown) — plus
    // the suite-window process-external CPU fraction (r10 #5)
    val loadSample = systemLoad()
    val cpuExternal = externalCpuFrac(cpuStart, readCpuStat())
    // in-artifact adjudication: fresh median vs committed envelope max,
    // then the exoneration pass — each flagged entry re-measured
    // median-of-3 now that the suite queue is idle, with a post-cooldown
    // second retest before any "regression" verdict (see retestOutliers)
    // and the cross-round environment-streak counter (ADVICE r10)
    val byName = sorted.toMap
    val cooldownSec =
      sys.env.getOrElse("SPARK_GRAFT_RETEST_COOLDOWN_SEC", "20").toLong
    val round = currentRound()
    val priors = loadPriorVerdicts(before = round)
    val outlierRows = retestOutliers(
      adjudicate(results, loadEnvelopeMax()),
      name => medianOf3(name, byName(name)),
      cooldown = () => Thread.sleep(cooldownSec * 1000L),
      priorStreak = name => envStreak(name, priors))
    def outlierJson(rows: Seq[OutlierRow]): String =
      rows.map { r =>
        val second = (r.retest2, r.loadRetest2, r.extCpu2) match {
          case (Some(r2), Some(l2), Some(e2)) =>
            f""","retest2":$r2%.3f,"load_retest2":$l2%.2f,"ext_cpu2":$e2%.3f"""
          case _ => ""
        }
        f"""{"name":"${r.name}","got":${r.got}%.3f,"envelope_max":${r.envelopeMax}%.3f,"retest":${r.retest}%.3f,"load_retest":${r.loadRetest}%.2f,"ext_cpu":${r.extCpu}%.3f$second,"verdict":"${r.verdict}","env_streak":${r.envStreak}}"""
      }.mkString("[", ",", "]")
    val outliers = outlierJson(outlierRows)
    val nFallbacks =
      if (fallbacks.attached) fallbacks.count.get() else -1L
    // FULL outlier sidecar for this round (VERDICT r11 #5): committed as
    // BENCH_OUTLIERS_r<n>.json so loadPriorVerdicts reconstructs streaks
    // for EVERY flagged query, not just the headline's 3 worst
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(f"BENCH_OUTLIERS_r$round%02d.json"),
      (f"""{"round":$round,"outliers":$outliers}""" + "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Exception =>
      System.err.println(s"[bench] could not write outlier sidecar: " +
        e.getMessage)
    }
    val json =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"outliers":$outliers,"load_start":$loadStart%.2f,"load_sample":$loadSample%.2f,"cpu_external":$cpuExternal%.3f,"calib_1t":$calib1t%.3f,"calib_${cpus}%st":$calibWide%.3f,"calib_vs_anchor":$calibRatio%.3f,"calib_suspect":$calibSuspect,"interp_fallbacks":$nFallbacks,"sf":"$sfDir"}"""
    // The driver captures only a ~2.2 KB tail of stdout, so a single line
    // carrying all ~99 per-query timings truncates mid-object and parses as
    // null (r4/r5 BENCH artifacts). Print the full detail line FIRST (tail
    // truncation then only clips detail), and end with a short headline
    // line that always fits the tail whole: total, query count, slowest —
    // and the adjudication fields, which matter most to a driver-side
    // reader.
    println(json)
    val (maxName, maxT) = results.maxBy(_._2)
    // the headline line must ALWAYS fit the driver's ~2.2 KB stdout tail
    // whole — exactly the mass-inflation scenario that produces many
    // outliers would otherwise truncate it mid-object (the r4/r5
    // parsed-null failure mode; code-review r8 finding). Cap the inline
    // list at the 3 worst by ratio and carry the full count; the complete
    // array lives in the detail line and the SPARK_GRAFT_BENCH_OUT file.
    val headOutliers = outlierJson(
      outlierRows.sortBy(r => -(r.got / r.envelopeMax)).take(3))
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","n":${results.size},"max":{"$maxName":$maxT%.3f},"n_outliers":${outlierRows.size},"outliers":$headOutliers,"load_start":$loadStart%.2f,"load_sample":$loadSample%.2f,"cpu_external":$cpuExternal%.3f,"calib_1t":$calib1t%.3f,"calib_${cpus}%st":$calibWide%.3f,"calib_vs_anchor":$calibRatio%.3f,"calib_suspect":$calibSuspect,"interp_fallbacks":$nFallbacks,"detail":"${sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/tmp/graft_bench.json")}","sf":"$sfDir"}""")
    // belt-and-braces for the driver's parser: also drop the JSON in a known
    // file, immune to any logger prefixes on stdout. Overridable so
    // back-to-back runs over different SF dirs don't clobber each other.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/tmp/graft_bench.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Exception =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    spark.stop()
  }
}
