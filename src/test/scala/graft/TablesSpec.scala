package graft

import graft.engine.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Pins the dual physical `ts` generations of `events.parquet`
  * (TIMESTAMP(NANOS) read as legacy long vs native TIMESTAMP(MICROS) /
  * NTZ): both must normalize to identical session-zone timestamps, and
  * BOTH branches of `eventsRange` must reach the parquet scan as pushed
  * filters — at 100 TB that is the difference between scanning a day and
  * scanning the table. The micros fixture is synthesized from the nanos
  * testdata so this holds before any data refresh flips the type. */
class TablesSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  /** Micros-generation twin of the sf0.001 events table (NTZ `ts`),
    * written once per JVM. */
  private lazy val microsDir: String = {
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"), "graft_micros_events_fixture")
    Tables.events(spark, sf)
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
      .coalesce(1)
      .write.mode("overwrite")
      .parquet(new java.io.File(dir, "events.parquet").getAbsolutePath)
    dir.getAbsolutePath
  }

  private def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
    case s: FileSourceScanExec => Seq(s)
    case other => other.children.flatMap(scans)
  }

  private def pushedFilters(df: DataFrame): String =
    scans(df.queryExecution.executedPlan)
      .map(_.metadata.getOrElse("PushedFilters", "")).mkString(";")

  private def collectKeyed(df: DataFrame): Set[(Long, String)] =
    df.select(col("event_id").cast("long"), col("ts").cast("string"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("events: micros(NTZ) and legacy-nanos generations normalize to " +
    "identical session-zone timestamps") {
    val nanos = Tables.events(spark, sf)
    val micros = Tables.events(spark, microsDir)
    micros.schema("ts").dataType shouldBe nanos.schema("ts").dataType
    collectKeyed(micros) shouldBe collectKeyed(nanos)
  }

  test("eventsRange: both generations return the same rows and PUSH the " +
    "ts bounds into the parquet scan") {
    val from = "2024-01-05"; val to = "2024-01-07"
    val nanos = Tables.eventsRange(spark, sf, from, to)
    val micros = Tables.eventsRange(spark, microsDir, from, to)
    val rows = collectKeyed(nanos)
    rows should not be empty
    collectKeyed(micros) shouldBe rows
    // legacy branch: the compare is on the raw nanos long
    val pfNanos = pushedFilters(nanos)
    pfNanos should include("GreaterThanOrEqual(ts")
    pfNanos should include("LessThan(ts")
    // micros branch: the native NTZ predicate must reach the scan too
    val pfMicros = pushedFilters(micros)
    pfMicros should include("GreaterThanOrEqual(ts")
    pfMicros should include("LessThan(ts")
  }

  test("events access fails loudly in a non-UTC session (the NTZ→LTZ " +
    "normalization is only value-preserving in UTC)") {
    val other = spark.newSession()
    other.conf.set("spark.sql.session.timeZone", "Asia/Seoul")
    val e = intercept[IllegalArgumentException] {
      Tables.events(other, sf)
    }
    e.getMessage should include("timeZone=UTC")
  }
}
