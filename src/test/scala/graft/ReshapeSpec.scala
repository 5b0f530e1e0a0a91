package graft

import graft.engine.{Dedup, Unpivot}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** W1/W2 hour conventions (incl. the 24→next-day rollover the reference
  * hand-rolls at namdong_wind_collect.py:127-138) and U2/U3 dedup
  * determinism. */
class ReshapeSpec extends SparkSpec {
  import spark.implicits._

  test("hour conventions: 0-based vs 1-based disagree by exactly 1h; 24 rolls over") {
    val wide = Seq(("2024-03-10", 1.0, 24.0)).toDF("ymd", "h01", "h24")
    val long = Unpivot.meltHours(wide, Seq("ymd"), Seq("h01", "h24"))
      .select(col("hour_col"),
        Unpivot.tsZeroBased(col("ymd"), col("hour_col")).as("ts0"),
        Unpivot.tsOneBased(col("ymd"), col("hour_col")).as("ts1"))
      .orderBy("hour_col").collect()
    // h01: 0-based → 00:00, 1-based → 01:00
    long(0).getTimestamp(1) shouldBe Timestamp.valueOf("2024-03-10 00:00:00")
    long(0).getTimestamp(2) shouldBe Timestamp.valueOf("2024-03-10 01:00:00")
    // h24: 0-based → 23:00 same day, 1-based → next-day 00:00 (rollover)
    long(1).getTimestamp(1) shouldBe Timestamp.valueOf("2024-03-10 23:00:00")
    long(1).getTimestamp(2) shouldBe Timestamp.valueOf("2024-03-11 00:00:00")
  }

  test("melt keeps nulls (pandas semantics); caller drops them") {
    val wide = Seq(("d1", Some(1.0), None: Option[Double])).toDF("ymd", "h01", "h02")
    val long = Unpivot.meltHours(wide, Seq("ymd"), Seq("h01", "h02"))
    long.count() shouldBe 2
    long.filter(col("generation").isNotNull).count() shouldBe 1
  }

  test("keep-last dedup is deterministic under repartition") {
    val df = Seq(
      ("k1", 1, 10.0), ("k1", 2, 20.0), ("k1", 3, 30.0),
      ("k2", 5, 50.0), ("k2", 4, 40.0)
    ).toDF("k", "seq", "v").repartition(8)
    val out = Dedup.keepLast(df, Seq(col("k")), Seq(col("seq")))
      .orderBy("k").collect()
    out.map(r => (r.getString(0), r.getDouble(2))) shouldBe
      Array(("k1", 30.0), ("k2", 50.0))
    val first = Dedup.keepFirst(df, Seq(col("k")), Seq(col("seq")))
      .orderBy("k").collect()
    first.map(r => (r.getString(0), r.getDouble(2))) shouldBe
      Array(("k1", 10.0), ("k2", 40.0))
  }

  test("upsert: incoming wins on conflict, both sides' uniques kept") {
    val existing = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val incoming = Seq((2L, "B"), (3L, "C")).toDF("id", "v")
    val out = Dedup.upsert(existing, incoming, Seq("id"), Seq(col("id")))
      .orderBy("id").collect()
    out.map(r => (r.getLong(0), r.getString(1))) shouldBe
      Array((1L, "a"), (2L, "B"), (3L, "C"))
  }
}
