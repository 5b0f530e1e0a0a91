package graft

import org.apache.spark.sql.functions._
import graft.engine.Expectations

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, Some("a"), Some(10.0)),
    (2L, Some("a"), Some(-5.0)),
    (2L, None, Some(99.0)),
    (3L, Some("b"), None),
    (3L, Some("b"), Some(10.0))
  ).toDF("id", "cat", "v")

  private def run() = Expectations.check(df,
    rowRules = Seq(
      "not_null:cat" -> col("cat").isNull,
      "range:v" -> (col("v") < 0 || col("v") > 50),
      "in_set:cat" -> !col("cat").isin("a", "b")),
    uniqueRules = Seq(
      "unique:id" -> Seq("id"),
      "unique:id,cat" -> Seq("id", "cat")))
    .collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

  test("row rules: nulls are not violations unless the predicate says so") {
    val m = run()
    m("not_null:cat") shouldBe ((1L, 5L, 0L))
    // -5 and 99 violate the range; the NULL v is not a violation
    m("range:v") shouldBe ((2L, 5L, 0L))
    // NULL cat: isin → NULL → not counted (documented semantics)
    m("in_set:cat") shouldBe ((0L, 5L, 1L))
  }

  test("unique rules: surplus-row counting, null keys group together") {
    val m = run()
    // ids: 1,2,2,3,3 → 5 rows, 3 groups → 2 surplus
    m("unique:id") shouldBe ((2L, 5L, 0L))
    // (id,cat): (1,a),(2,a),(2,null),(3,b),(3,b) → 4 groups → 1 surplus
    m("unique:id,cat") shouldBe ((1L, 5L, 0L))
  }

  test("empty input: zero rows, zero violations, all pass") {
    val m = Expectations.check(df.limit(0),
      rowRules = Seq("not_null:cat" -> col("cat").isNull),
      uniqueRules = Seq("unique:id" -> Seq("id")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    m("not_null:cat") shouldBe ((0L, 0L, 1L))
    m("unique:id") shouldBe ((0L, 0L, 1L))
  }

  test("checkFk: non-null unmatched keys violate; NULL keys don't; " +
    "duplicate dim keys never fan out the count") {
    val fact = Seq(Some(1L), Some(1L), Some(2L), Some(9L), None)
      .toDF("fk")
    val dim = Seq(1L, 1L, 1L, 2L, 3L).toDF("dk") // dupes must not fan out
    val r = Expectations.checkFk(fact, col("fk"), dim, col("dk"), "fk:t")
      .collect().head
    (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)) shouldBe
      (("fk:t", 1L, 5L, 0L)) // only 9 violates; NULL passes; n_rows exact
    // empty fact: zero violations, pass
    val e = Expectations.checkFk(fact.limit(0), col("fk"), dim, col("dk"),
      "fk:e").collect().head
    (e.getLong(1), e.getLong(2), e.getLong(3)) shouldBe ((0L, 0L, 1L))
  }

  test("all row rules fold into a single aggregate scan") {
    val plan = Expectations.check(df,
      rowRules = Seq(
        "r1" -> col("cat").isNull,
        "r2" -> (col("v") < 0),
        "r3" -> !col("cat").isin("a")))
      .queryExecution.optimizedPlan
    // one logical Aggregate over the source → one scan however many rules
    val aggs = plan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a }
    aggs.size shouldBe 1
  }
}
