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

  test("pageRank dangling redistribution matches hand-computed ranks " +
    "(a->b, b dangling), 2 iterations") {
    // n=2, d dangling mass splits div 2 each round
    // r1: share = 1e9 div 2 = 5e8; contrib b <- 1e9, a <- 0
    //   a = (15e9 + 85*(0 + 5e8)) div 100      = 575000000
    //   b = (15e9 + 85*(1e9 + 5e8)) div 100    = 1425000000
    // r2: dm = rank(b) = 1425000000, share = 712500000; contrib b <- 575e6
    //   a = (15e9 + 85*712500000) div 100              = 755625000
    //   b = (15e9 + 85*(575000000+712500000)) div 100  = 1244375000
    val r = Graph.pageRank(Seq(("a", "b")).toDF("src", "dst"),
        col("src"), col("dst"), iters = 2, redistributeDangling = true)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    r shouldBe Map("a" -> 755625000L, "b" -> 1244375000L)
  }

  test("pageRank redistribution recovers sink-leaked mass (total strictly " +
    "above the sink-leak variant; still bounded by n*R)") {
    val plain = Graph.pageRank(fixture, col("src"), col("dst"), iters = 2)
      .agg(sum("rank_ppb")).first().getLong(0)
    val redist = Graph.pageRank(fixture, col("src"), col("dst"), iters = 2,
        redistributeDangling = true)
      .agg(sum("rank_ppb")).first().getLong(0)
    redist should be > plain
    redist should be <= 4L * Graph.RankUnit
  }

  test("pageRank 10 iterations: truncated lineage completes, L1 deltas " +
    "recorded per round and shrinking, diagnostics don't change values") {
    val deltas = scala.collection.mutable.ArrayBuffer.empty[Long]
    val r10 = Graph.pageRank(fixture, col("src"), col("dst"), iters = 10,
        checkpointEvery = 3, deltaL1Out = deltas)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    deltas should have length 10
    all(deltas) should be >= 0L
    deltas.last should be < deltas.head // damped chain converges
    // checkpoint/diagnostic plumbing is value-neutral: 3-iter diag run ==
    // the plain 3-iter run
    val d3 = scala.collection.mutable.ArrayBuffer.empty[Long]
    val diag3 = Graph.pageRank(fixture, col("src"), col("dst"), iters = 3,
        deltaL1Out = d3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    diag3 shouldBe ranksMap(3)
    d3 should have length 3
    // 10-round ranks are a fixpoint-ward refinement, not garbage: mass
    // bound still holds
    r10.values.sum should be <= 4L * Graph.RankUnit
  }

  private def hitsMap(iters: Int): Map[String, (Long, Long)] =
    Graph.hits(fixture, col("src"), col("dst"), iters = iters)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("hits matches hand-computed integer scores, 1 iteration") {
    // indeg: a=1, b=1, c=2, d=1 → auth_raw = R·indeg, max 2e9, scale 2
    // auth1: a=5e8, b=5e8, c=1e9, d=5e8
    // hub_raw: a=auth(b)+auth(c)=1.5e9, b=auth(c)=1e9, c=auth(a)+auth(d)=1e9
    // max 1.5e9 → scale 1 → hub1 = raw; d has no out-edges → 0
    hitsMap(1) shouldBe Map(
      "a" -> ((500000000L, 1500000000L)),
      "b" -> ((500000000L, 1000000000L)),
      "c" -> ((1000000000L, 1000000000L)),
      "d" -> ((500000000L, 0L)))
  }

  test("hits matches hand-computed integer scores, 2 iterations") {
    // auth_raw2: a=hub(c)=1e9, b=hub(a)=1.5e9, c=hub(a)+hub(b)=2.5e9,
    //            d=hub(c)=1e9; max 2.5e9 → scale 2
    // auth2: a=5e8, b=7.5e8, c=1.25e9, d=5e8
    // hub_raw2: a=2e9, b=1.25e9, c=1e9; max 2e9 → scale 2
    hitsMap(2) shouldBe Map(
      "a" -> ((500000000L, 1000000000L)),
      "b" -> ((750000000L, 625000000L)),
      "c" -> ((1250000000L, 500000000L)),
      "d" -> ((500000000L, 0L)))
  }

  test("hits: source-only node has auth 0, sink-only node has hub 0") {
    val r = Graph.hits(Seq(("x", "y")).toDF("src", "dst"),
      col("src"), col("dst"), iters = 2)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    r shouldBe Map(
      "x" -> ((0L, 1000000000L)),
      "y" -> ((1000000000L, 0L)))
  }

  test("hits is independent of input partitioning and duplicate edges") {
    val base = hitsMap(2)
    val shuffled = Graph.hits(fixture.union(fixture).repartition(7),
      col("src"), col("dst"), iters = 2)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    shuffled shouldBe base
  }

  test("hits 10 iterations: truncated lineage completes, argmax pinned " +
    "at ~R and scores bounded") {
    val r10 = hitsMap(10)
    val auths = r10.values.map(_._1)
    val hubs = r10.values.map(_._2)
    auths.max should be >= Graph.RankUnit
    auths.max should be < 2L * Graph.RankUnit
    hubs.max should be >= Graph.RankUnit
    hubs.max should be < 2L * Graph.RankUnit
    all(auths) should be >= 0L
    all(hubs) should be >= 0L
  }

  test("Long-safety guards fail loudly: pageRank maxNodes (redistribution " +
    "path), hits maxDegree; defaults pass the fixture") {
    // fixture has 4 nodes; the redistribution path counts them anyway, so
    // the bound is free — a 3-node cap must throw with the R-shrink
    // remediation, the default (~9.2e7) must pass
    val ePr = intercept[IllegalArgumentException] {
      Graph.pageRank(fixture, col("src"), col("dst"),
        redistributeDangling = true, maxNodes = 3L)
    }
    ePr.getMessage should include("4 nodes exceeds maxNodes=3")
    ePr.getMessage should include("Shrink the rank unit")
    // the sink-leak default path never counts nodes and must NOT trip even
    // with an absurd cap (guard lives on the path that already counts)
    Graph.pageRank(fixture, col("src"), col("dst"), maxNodes = 1L)
      .collect().length shouldBe 4
    // max degree in the fixture is 2 (in: c<-{a,b}; out: a->{b,c}, c->{a,d})
    val eHits = intercept[IllegalArgumentException] {
      Graph.hits(fixture, col("src"), col("dst"), maxDegree = 1L)
    }
    eHits.getMessage should include("max in/out-degree 2 exceeds maxDegree=1")
    Graph.hits(fixture, col("src"), col("dst"), maxDegree = 2L)
      .collect().length shouldBe 4
  }

  test("degrees: full outer with zero fill") {
    val d = Graph.degrees(fixture, col("src"), col("dst"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    d shouldBe Map(
      "a" -> ((2L, 1L)), "b" -> ((1L, 1L)),
      "c" -> ((2L, 2L)), "d" -> ((0L, 1L)))
  }
}
