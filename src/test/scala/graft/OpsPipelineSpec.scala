package graft

import graft.engine.{Analytics, Expectations, Ingest, MatView, Tables}
import org.apache.spark.sql.functions._

/** Integration: the warehouse OPERATIONS train composed end-to-end on real
  * testdata — expectation gate → schema-conform union of two feed
  * generations → incremental MV state fold → distribution-drift check
  * between the increments. Asserts the stages agree with each other (the
  * gate admits exactly what the conform step unions, the folded state
  * equals a one-shot rebuild over the conformed batch, the drift check
  * covers every (group, bucket) cell), not just that each runs. */
class OpsPipelineSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"

  test("ops pipeline: gate -> conform -> incremental state -> drift") {
    val ev = Tables.events(spark, sfDir)

    // 1. Expectation gate on the raw batch: structural rules must pass
    // before anything merges (the release criterion is `pass` = 1 rows
    // only). The value-range rule is deliberately generous — the gate
    // checks contracts, not distributions (drift is step 4's job).
    val gate = Expectations.check(ev,
      rowRules = Seq(
        "not_null:event_id" -> col("event_id").isNull,
        "not_null:ts" -> col("ts").isNull,
        "range:value" -> (col("value") < -1000 || col("value") > 100000)),
      uniqueRules = Seq("unique:event_id" -> Seq("event_id")))
    gate.filter(col("pass") === 0).count() shouldBe 0L

    // 2. Two simulated feed generations (one missing event_type, one with
    // stringified values) conform by name onto one target — nothing lost
    import org.apache.spark.sql.types._
    val target = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("event_type", StringType),
      StructField("value", DoubleType)))
    val genA = ev.filter(col("event_id") % 2 === 0)
      .select(col("event_id"), col("ts"), col("value"))
    val genB = ev.filter(col("event_id") % 2 === 1)
      .select(col("event_id"), col("ts"), col("event_type"),
        col("value").cast("string").as("value"))
    val conformed = Ingest.conformUnion(Seq(genA, genB), target)
    conformed.count() shouldBe ev.count()
    conformed.schema shouldBe target

    // 3. Incremental MV state: first-half delta ⊕ second-half delta must
    // BE the one-shot rebuild over the whole conformed batch
    val cut = lit("2024-01-16").cast("timestamp")
    def keys = Seq(to_date(col("ts")).as("day"))
    val fold = MatView.mergeStates(Seq(
      MatView.aggState(conformed.filter(col("ts") < cut), keys, col("value")),
      MatView.aggState(conformed.filter(col("ts") >= cut), keys, col("value"))),
      Seq("day"))
    val oneShot = MatView.aggState(conformed, keys, col("value"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.get(0).toString ->
        ((Option(r.get(1)), r.getLong(2), Option(r.get(3)),
          Option(r.get(4))))).toMap
    canon(fold) shouldBe canon(oneShot)

    // 4. Drift check between the two increments rides the same conformed
    // batch: the spine is complete (every group × bucket has a row) and
    // identical halves would zero it — here the halves genuinely differ
    // somewhere, but no term may blow past a sanity bound (ppm × µnat)
    val psi = Analytics.psiByGroup(
      conformed.filter(col("ts") < cut).filter(col("event_type").isNotNull),
      conformed.filter(col("ts") >= cut).filter(col("event_type").isNotNull),
      col("event_type"), col("value"), 0L, 20000L, 20)
    val rows = psi.collect()
    rows.length shouldBe rows.map(_.getString(0)).distinct.length * 20
    all(rows.map(_.getLong(4))) should be >= 0L // (p−q)·ln(p/q) ≥ 0 always
    val totalPsi = rows.map(_.getLong(4)).sum / 1e12
    totalPsi should be < 1.0 // same month, same source: drift is mild
  }
}
