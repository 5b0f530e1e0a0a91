package graft

import org.apache.spark.sql.functions._
import graft.engine.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  // a->b, a->c, b->c, c->a, c->d  (d is dangling: no out-edges)
  private def fixture =
    Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("c", "d"))
      .toDF("src", "dst")

  private def ranksMap(iters: Int): Map[String, Long] =
    Graph.pageRank(fixture, col("src"), col("dst"), iters = iters)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("pageRank matches hand-computed integer ranks, 1 iteration") {
    // outdeg a=2, b=1, c=2; r0 = 1e9 each
    // contrib: a <- c/2 = 5e8; b <- a/2 = 5e8; c <- a/2 + b = 1.5e9; d <- 5e8
    // r1 = (15e9 + 85*contrib) div 100
    ranksMap(1) shouldBe Map(
      "a" -> 575000000L, "b" -> 575000000L,
      "c" -> 1425000000L, "d" -> 575000000L)
  }

  test("pageRank matches hand-computed integer ranks, 2 iterations") {
    // from r1: contrib a <- c/2 = 712500000; b <- a/2 = 287500000;
    //          c <- a/2 + b = 862500000; d <- c/2 = 712500000
    ranksMap(2) shouldBe Map(
      "a" -> 755625000L, "b" -> 394375000L,
      "c" -> 883125000L, "d" -> 755625000L)
  }

  test("pageRank: node with no in-edges holds the damped base exactly") {
    val r = Graph.pageRank(Seq(("x", "y")).toDF("src", "dst"),
      col("src"), col("dst"), iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // x never receives contributions: rank = (15 * 1e9) div 100 every round
    r("x") shouldBe 150000000L
  }

  test("pageRank: total mass never exceeds n * R (sink-leak only)") {
    (1 to 3).foreach { it =>
      val total = ranksMap(it).values.sum
      total should be <= 4L * Graph.RankUnit
    }
  }

  test("pageRank is independent of input partitioning and duplicate edges") {
    val base = ranksMap(3)
    val shuffled = Graph.pageRank(
      fixture.union(fixture).repartition(7), // dup edges collapse (simple graph)
      col("src"), col("dst"), iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    shuffled shouldBe base
  }

  test("degrees: full outer with zero fill") {
    val d = Graph.degrees(fixture, col("src"), col("dst"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    d shouldBe Map(
      "a" -> ((2L, 1L)), "b" -> ((1L, 1L)),
      "c" -> ((2L, 2L)), "d" -> ((0L, 1L)))
  }
}
