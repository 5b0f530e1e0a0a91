package graft

import org.apache.spark.sql.functions._
import graft.engine.Billing

class BillingSpec extends SparkSpec {
  import spark.implicits._

  // 2024-01-15 is a Monday, 2024-01-13 a Saturday (band-rule fixtures)
  private def fixture = Seq(
    ("u1", "2024-01-15 10:00:00", Some(1.23)),  // weekday 10h  -> peak 123
    ("u1", "2024-01-15 10:30:00", Some(2.00)),  // same hour    -> peak 200
    ("u1", "2024-01-15 22:00:00", Some(3.00)),  // 22h          -> off  300
    ("u1", "2024-01-13 10:00:00", Some(4.00)),  // Saturday     -> off  400
    ("u1", "2024-02-01 00:00:00", Some(5.555)), // floor -> 555, off
    ("u2", "2024-01-15 09:00:00", Some(-1.01)), // 9h edge peak, floor -101
    ("u2", "2024-01-15 21:00:00", None)         // null: excluded
  ).toDF("user", "tss", "value")
    .select(col("user"), to_timestamp(col("tss")).as("ts"), col("value"))

  private def stmt = Billing.billingStatement(
    fixture, col("user"), col("ts"), col("value"))

  test("billing statement matches hand-computed integer charges") {
    val rows = stmt.collect().map(r =>
      (r.getString(0), r.getDate(1).toString) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7)))).toMap
    // u1 Jan: peak 323, off 700; energy 323*180 + 700*90 = 121140
    //   hourly cents {323, 300, 400} -> demand 400*12000 = 4800000
    rows(("u1", "2024-01-01")) shouldBe
      ((323L, 700L, 121140L, 400L, 4800000L, 4921140L))
    // u1 Feb: off 555 -> energy 49950; demand 555*12000 = 6660000
    rows(("u1", "2024-02-01")) shouldBe
      ((0L, 555L, 49950L, 555L, 6660000L, 6709950L))
    // u2 Jan: 9h is peak-inclusive; floor(-1.01*100) = -101 flows exactly
    rows(("u2", "2024-01-01")) shouldBe
      ((-101L, 0L, -18180L, -101L, -1212000L, -1230180L))
    rows should have size 3 // the null reading created no (u2, month) cell
  }

  test("band edges: 21h is off-peak, weekend mornings are off-peak") {
    val edge = Seq(
      ("e", "2024-01-15 21:00:00", 1.00), // 21h -> off
      ("e", "2024-01-14 10:00:00", 2.00)  // Sunday -> off
    ).toDF("user", "tss", "value")
      .select(col("user"), to_timestamp(col("tss")).as("ts"), col("value"))
    val r = Billing.touEnergyCharges(edge, col("user"), col("ts"),
      col("value")).collect().head
    r.getLong(2) shouldBe 0L   // peak_cents
    r.getLong(3) shouldBe 300L // off_cents
  }

  test("statement join is total: every (key, month) appears exactly once") {
    val tou = Billing.touEnergyCharges(fixture, col("user"), col("ts"),
      col("value")).count()
    stmt.count() shouldBe tou
  }

  test("declared-contract guards fail loudly") {
    an[IllegalArgumentException] should be thrownBy
      Billing.touEnergyCharges(fixture, col("user"), col("ts"), col("value"),
        peakStartHour = 21, peakEndHour = 9)
    an[IllegalArgumentException] should be thrownBy
      Billing.demandCharge(fixture, col("user"), col("ts"), col("value"),
        rateMicro = -1L)
  }
}
