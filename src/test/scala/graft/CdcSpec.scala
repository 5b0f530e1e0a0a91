package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.engine.Cdc

/** [[graft.engine.Cdc]]: keyed snapshot diff + SCD Type-2 build. */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // ---- applyDelta ----

  test("applyDelta: applyDelta(A, snapshotDiff(A, B)) == B, including " +
    "null transitions in both directions") {
    val a = Seq(
      (1L, Some("x")), (2L, Some("y")), (3L, Option.empty[String]),
      (4L, Some("keep")), (6L, Some("q"))
    ).toDF("k", "v")
    val b = Seq(
      (2L, Some("y2")), (3L, Some("z")), (4L, Some("keep")),
      (5L, Some("new")), (6L, Option.empty[String])
    ).toDF("k", "v")
    val delta = Cdc.snapshotDiff(a, b, Seq("k"), Seq("v"))
    val applied = Cdc.applyDelta(a, delta, Seq("k"), Seq("v"))
    applied.collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet shouldBe
      b.collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
  }

  test("applyDelta: empty delta is the identity") {
    val a = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    val delta = Cdc.snapshotDiff(a, a, Seq("k"), Seq("v"))
    delta.count() shouldBe 0
    Cdc.applyDelta(a, delta, Seq("k"), Seq("v"))
      .collect().map(_.toSeq).toSet shouldBe a.collect().map(_.toSeq).toSet
  }

  // ---- snapshotDiff ----

  test("snapshotDiff: insert / delete / update / unchanged-dropped") {
    val oldSnap = Seq(
      (1L, "A", 10), (2L, "B", 20), (3L, "C", 30), (4L, null.asInstanceOf[String], 40)
    ).toDF("k", "s", "v")
    val newSnap = Seq(
      (2L, "B", 20),   // unchanged → dropped
      (3L, "C2", 30),  // update (string change)
      (4L, "D", 40),   // update (null → value: null-safe compare)
      (5L, "E", 50)    // insert
    ).toDF("k", "s", "v")
    val got = Cdc.snapshotDiff(oldSnap, newSnap, Seq("k"), Seq("s", "v"))
      .select("k", "change_type", "old_s", "new_s")
      .as[(Long, String, Option[String], Option[String])]
      .collect().sortBy(_._1)
    got shouldBe Array(
      (1L, "delete", Some("A"), None),
      (3L, "update", Some("C"), Some("C2")),
      (4L, "update", None, Some("D")),
      (5L, "insert", None, Some("E")))
  }

  test("snapshotDiff: identical snapshots produce an empty delta") {
    val snap = Seq((1L, "A"), (2L, "B")).toDF("k", "s")
    Cdc.snapshotDiff(snap, snap, Seq("k"), Seq("s")).count() shouldBe 0L
  }

  test("snapshotDiff: null-valued compare column equal on both sides is unchanged") {
    val a = Seq((1L, null.asInstanceOf[String])).toDF("k", "s")
    Cdc.snapshotDiff(a, a, Seq("k"), Seq("s")).count() shouldBe 0L
  }

  // ---- scd2 ----

  test("scd2: consecutive same-state rows collapse; versions chain valid_from→valid_to") {
    val log = Seq(
      (7L, ts("2024-01-01 00:00:00"), 1L, "bronze"),
      (7L, ts("2024-01-02 00:00:00"), 2L, "bronze"), // no-op change → collapsed
      (7L, ts("2024-01-03 00:00:00"), 3L, "silver"),
      (7L, ts("2024-01-05 00:00:00"), 4L, "gold"),
      (9L, ts("2024-01-04 00:00:00"), 5L, "silver")
    ).toDF("uid", "t", "id", "tier")
    val got = Cdc.scd2(log, col("uid"), col("t"), col("id"), Seq("tier"))
      .select("uid", "tier", "valid_from", "valid_to", "is_current")
      .as[(Long, String, Timestamp, Option[Timestamp], Long)]
      .collect().sortBy(r => (r._1, r._3.getTime))
    got shouldBe Array(
      (7L, "bronze", ts("2024-01-01 00:00:00"), Some(ts("2024-01-03 00:00:00")), 0L),
      (7L, "silver", ts("2024-01-03 00:00:00"), Some(ts("2024-01-05 00:00:00")), 0L),
      (7L, "gold", ts("2024-01-05 00:00:00"), None, 1L),
      (9L, "silver", ts("2024-01-04 00:00:00"), None, 1L))
  }

  test("scd2: re-entering an earlier state opens a NEW version (not merged)") {
    val log = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "a"),
      (1L, ts("2024-01-02 00:00:00"), 2L, "b"),
      (1L, ts("2024-01-03 00:00:00"), 3L, "a")
    ).toDF("uid", "t", "id", "v")
    val got = Cdc.scd2(log, col("uid"), col("t"), col("id"), Seq("v"))
      .select("v", "is_current").as[(String, Long)].collect().sortBy(_._1)
    got.count(_._1 == "a") shouldBe 2
    got.filter(_._2 == 1L).map(_._1).toSeq shouldBe Seq("a")
  }

  test("scd2: null attribute is a real state under null-safe comparison") {
    val log = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "x"),
      (1L, ts("2024-01-02 00:00:00"), 2L, null.asInstanceOf[String]),
      (1L, ts("2024-01-03 00:00:00"), 3L, null.asInstanceOf[String]),
      (1L, ts("2024-01-04 00:00:00"), 4L, "x")
    ).toDF("uid", "t", "id", "v")
    Cdc.scd2(log, col("uid"), col("t"), col("id"), Seq("v")).count() shouldBe 3L
  }

  test("scd2: timestamp ties broken by the tie-break column, both windows") {
    val log = Seq(
      (1L, ts("2024-01-01 00:00:00"), 2L, "late"),
      (1L, ts("2024-01-01 00:00:00"), 1L, "early")
    ).toDF("uid", "t", "id", "v")
    val got = Cdc.scd2(log, col("uid"), col("t"), col("id"), Seq("v"))
      .select("v", "is_current").as[(String, Long)].collect().toMap
    got shouldBe Map("early" -> 0L, "late" -> 1L)
  }

  test("scd2: one shuffle total — the post-collapse window reuses the key partitioning") {
    val log = Seq((1L, ts("2024-01-01 00:00:00"), 1L, "a"),
        (2L, ts("2024-01-02 00:00:00"), 2L, "b"))
      .toDF("uid", "t", "id", "v")
    val out = Cdc.scd2(log, col("uid"), col("t"), col("id"), Seq("v"))
    out.count() shouldBe 2L
    val plan = out.queryExecution.executedPlan.toString
    "Exchange hashpartitioning".r.findAllIn(plan).length shouldBe 1
  }
}
