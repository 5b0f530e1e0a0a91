package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Link-graph analytics for corpus curation.
  *
  * Web-scale training-data pipelines rank crawl sources by link authority
  * (Common Crawl publishes harmonic-centrality/PageRank host rankings
  * precisely so curation pipelines can weight or cut domains). This module
  * provides the ranking primitive as a deterministic fixed-iteration
  * computation, so the result is a pure function of the edge set and can be
  * replayed bit-for-bit by the DuckDB oracle.
  *
  * Integer contract: ranks live in parts-per-billion (ppb) of the per-node
  * unit mass and every step is BIGINT floor arithmetic — no float
  * accumulation order to diverge cross-engine. With unnormalized unit
  * initialization (every node starts at R = 1e9) total mass is ≤ n·R, so the
  * damped update's `dampPct · contrib` term stays inside Long up to ~1e8
  * nodes; beyond that, shrink R (the iteration is scale-free) — documented
  * in SCALE.md.
  *
  * 100 TB shape: the edge list (the data-scale side) is joined with its
  * out-degree once, hash-partitioned by `src`, and persisted — each of the
  * `iters` rounds then reuses that partitioning for its rank join (the rank
  * table is node-sized, orders of magnitude smaller than the edges) and pays
  * one groupBy(dst) shuffle. Nothing collects to the driver; the returned
  * frame is node-sized. For iteration counts beyond 3 the loop eagerly
  * `localCheckpoint`s the rank frame every `checkpointEvery` rounds and
  * releases the superseded blocks (the `NearDup.dedupClusters` pattern),
  * so lineage depth and optimizer time stay bounded at any `iters`; at the
  * default of 3 the composed plan is shallow enough as-is and plans
  * exactly as before.
  */
object Graph {

  /** Unit rank mass: 1e9 ppb. */
  val RankUnit: Long = 1000000000L

  /** Fixed-iteration damped PageRank. Default is the sink-leak variant:
    * mass flowing into dangling nodes is not redistributed — the standard
    * simplification when ranks are used as a relative quality signal, and
    * what keeps the computation exactly SQL-replayable with the cheapest
    * plan. `redistributeDangling = true` switches to the textbook variant:
    * each round the total rank mass sitting on dangling nodes (no
    * out-edges) is floor-split evenly across all nodes and joins the
    * contribution term — still all-BIGINT and still SQL-replayable (the
    * dangling sum is a one-row aggregate crossed in broadcast-style), just
    * one extra node-sized aggregate per round.
    *
    * Per iteration, with integer floor division at every step:
    * {{{
    *   contrib(v) = Σ_{(u,v) ∈ E} rank(u) div outdeg(u)
    *   share      = (Σ_{u dangling} rank(u)) div n        [redistribution]
    *   rank'(v)   = ((100 - dampPct)·R
    *                 + dampPct·(contrib(v) [+ share])) div 100
    * }}}
    *
    * Lineage: each round stacks two joins and an aggregate onto the plan,
    * so for `iters > 3` the rank frame is eagerly `localCheckpoint`ed
    * every `checkpointEvery` rounds (node-sized pass; previous checkpoint
    * blocks released — the `NearDup.dedupClusters` hygiene) to keep
    * optimizer time and lineage depth bounded. Under
    * `redistributeDangling` EVERY non-final round checkpoints — each
    * following round reads the ranks twice (contribution join + the
    * dangling aggregate), so an uncheckpointed round doubles upstream
    * recompute per level (the hits() half-step lesson). The default
    * 3-round sink-leak call never checkpoints mid-loop and plans exactly
    * as before.
    *
    * Long-safety is a RUNTIME guarantee on the redistribution path (which
    * already counts nodes): `maxNodes` defaults to the documented
    * ~9.2e7-node bound and the call fails loudly beyond it.
    *
    * Convergence diagnostic: pass a `deltaL1Out` buffer to receive
    * ‖rank′ − rank‖₁ after every round (one one-row aggregate per round;
    * rounds are then checkpointed eagerly so round r doesn't recompute
    * rounds 1..r−1). Round 1's delta is against the uniform init R.
    *
    * Edges are deduplicated (simple graph) and null endpoints dropped.
    * Returns `(node STRING, rank_ppb BIGINT)` for every node appearing as a
    * source or destination.
    */
  def pageRank(edges: DataFrame, src: org.apache.spark.sql.Column,
               dst: org.apache.spark.sql.Column, iters: Int = 3,
               dampPct: Int = 85, redistributeDangling: Boolean = false,
               checkpointEvery: Int = 3,
               deltaL1Out: scala.collection.mutable.Buffer[Long] = null,
               maxNodes: Long = Long.MaxValue / (100L * RankUnit))
      : DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dampPct >= 0 && dampPct <= 100, s"dampPct in [0,100], got $dampPct")
    require(checkpointEvery >= 1, s"checkpointEvery >= 1, got $checkpointEvery")
    require(maxNodes >= 1, s"maxNodes >= 1, got $maxNodes")
    val e = edges.select(src.cast("string").as("src"), dst.cast("string").as("dst"))
      .na.drop().distinct()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // The data-scale invariant of the loop: partition the (edge, outdeg)
    // table by src ONCE; every iteration's rank join reuses it.
    val eo = e.join(outdeg, "src")
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // dangling = appears only as dst (node-sized; persisted only when used)
    val danglingNodes =
      if (redistributeDangling)
        Some(nodes.join(outdeg.select(col("src").as("node")),
            Seq("node"), "left_anti")
          .persist(StorageLevel.MEMORY_AND_DISK))
      else None
    try {
      // model-sized driver scalars, only when redistributing (two counts;
      // the nodes count also materializes the persist)
      val nNodes = if (redistributeDangling) nodes.count() else 1L
      if (redistributeDangling)
        require(nNodes > 0, "pageRank redistribution on an empty graph")
      // The Long-safety bound from the module doc, promoted to a LOUD
      // runtime guarantee (the maxKeys/heavyHitters house pattern) on the
      // path that already counts nodes: total mass ≤ n·R, so the damped
      // update's `dampPct · contrib` term needs n ≤ Long.MaxValue/(100·R)
      // (~9.2e7 at R = 1e9). Beyond that, shrink R — the iteration is
      // scale-free — or pre-aggregate the graph (SCALE.md "Link graphs").
      if (redistributeDangling)
        require(nNodes <= maxNodes,
          s"pageRank: $nNodes nodes exceeds maxNodes=$maxNodes — " +
            s"dampPct·contrib can overflow Long at R=$RankUnit ppb. " +
            "Shrink the rank unit (the iteration is scale-free) or raise " +
            "maxNodes deliberately after checking the bound (SCALE.md).")
      val nDangling = danglingNodes.map(_.count()).getOrElse(0L)

      def damped(contribs: DataFrame, prevRanks: Option[DataFrame]): DataFrame =
        danglingNodes match {
          case None =>
            nodes.join(contribs, Seq("node"), "left")
              .select(col("node"),
                expr(s"((${100 - dampPct}L * $RankUnit + $dampPct * " +
                  "coalesce(contrib, 0L)) div 100)").as("rank_ppb"))
          case Some(dang) =>
            // one-row dangling-mass aggregate, crossed broadcast-style
            // (the repo's one-row crossJoin pattern); round 1 has the
            // constant init, so its share is a driver literal
            val withShare = prevRanks match {
              case None =>
                nodes.join(contribs, Seq("node"), "left")
                  .withColumn("_dm", lit(nDangling * RankUnit))
              case Some(pr) =>
                nodes.join(contribs, Seq("node"), "left")
                  .crossJoin(broadcast(
                    pr.join(dang, Seq("node"), "left_semi")
                      .agg(coalesce(sum(col("rank_ppb")), lit(0L)).as("_dm"))))
            }
            withShare.select(col("node"),
              expr(s"((${100 - dampPct}L * $RankUnit + $dampPct * " +
                s"(coalesce(contrib, 0L) + (_dm div ${nNodes}L))) div 100)")
                .as("rank_ppb"))
        }

      // round 1 needs no rank join: every rank is the constant R, so the
      // contribution is R div outdeg straight off the edge table — one
      // node-sized join stage fewer. Measured NEUTRAL on sf0.1 wall time
      // (the loop is dominated by edge-table preparation: distinct +
      // outdeg join + repartition + persist), kept for the smaller plan
      var ranks = damped(eo
        .select(col("dst").as("node"),
          expr(s"$RankUnit div outdeg").as("c"))
        .groupBy("node").agg(sum("c").as("contrib")), None)
      var lastCkpt: DataFrame = null
      def ckptAndDiag(it: Int, prev: Option[DataFrame]): Unit = {
        // under redistribution every following round reads this round's
        // ranks TWICE (contribution join + the broadcast dangling-mass
        // aggregate), so uncheckpointed rounds double their upstream
        // recompute — the same compounding hits() measured at 20.0 s vs
        // 4.3 s. Eagerly materialize EVERY non-final round on that path
        // (node-sized pass), not just beyond the iters>3 cadence.
        val wantCkpt = deltaL1Out != null ||
          (redistributeDangling && it < iters) ||
          (iters > 3 && it < iters && it % checkpointEvery == 0)
        if (wantCkpt) ranks = ranks.localCheckpoint(true)
        if (deltaL1Out != null) {
          val delta = prev match {
            case None => ranks
              .agg(coalesce(sum(abs(col("rank_ppb") - lit(RankUnit))), lit(0L)))
            case Some(pr) => ranks
              .join(pr.withColumnRenamed("rank_ppb", "_prev"), "node")
              .agg(coalesce(sum(abs(col("rank_ppb") - col("_prev"))), lit(0L)))
          }
          deltaL1Out += delta.first().getLong(0)
        }
        if (wantCkpt) {
          // prev's checkpoint blocks are dead once the delta (the only
          // consumer) has run
          if (lastCkpt != null) NearDup.releaseCheckpoint(lastCkpt)
          lastCkpt = ranks
        }
      }
      ckptAndDiag(1, None)
      for (it <- 2 to iters) {
        val prev = ranks
        val contribs = eo
          .join(prev.withColumnRenamed("node", "src"), "src")
          .select(col("dst").as("node"),
            expr("rank_ppb div outdeg").as("c"))
          .groupBy("node").agg(sum("c").as("contrib"))
        ranks = damped(contribs, Some(prev))
        ckptAndDiag(it, Some(prev))
      }
      // Materialize before releasing the loop invariants (the session-hygiene
      // rule: nothing this function persisted may outlive the call).
      val out = ranks.localCheckpoint(true)
      if (lastCkpt != null && !(lastCkpt eq out))
        NearDup.releaseCheckpoint(lastCkpt)
      out
    } finally {
      eo.unpersist(false)
      nodes.unpersist(false)
      danglingNodes.foreach(_.unpersist(false))
    }
  }

  /** Fixed-iteration HITS (hubs & authorities) — the second classic
    * link-analysis signal crawl-curation pipelines reach for after
    * [[pageRank]]: authority scores surface well-cited content hosts,
    * hub scores surface directory/aggregator hosts (both are standard
    * crawl-frontier quality features; Kleinberg, JACM 46(5), 1999).
    *
    * Same determinism contract as [[pageRank]]: ppb integer scores, BIGINT
    * floor arithmetic at every step, fixed iteration count — a pure
    * function of the edge set, replayed CTE-for-CTE by the DuckDB oracle.
    * Per round (all integer):
    * {{{
    *   auth_raw(v) = Σ_{(u,v) ∈ E} hub(u)        [round 1: hub ≡ R]
    *   auth(v)     = auth_raw(v) div max(1, max_v auth_raw div R)
    *   hub_raw(u)  = Σ_{(u,v) ∈ E} auth(v)
    *   hub(u)      = hub_raw(u) div max(1, max_u hub_raw div R)
    * }}}
    * The max-rescale replaces the float L2 normalization: it keeps scores
    * in [0, ~2R] ppb with the argmax pinned at ~R, needs only a one-row
    * aggregate (crossed broadcast-style — the repo's one-row crossJoin
    * pattern), and stays exactly replayable. Long-safety: a raw sum is
    * ≤ deg·2R, so the arithmetic holds to ~2e9 max in/out-degree — far
    * beyond any real host graph's degree — and since r8 the bound is a
    * LOUD runtime guard (`maxDegree`, one cheap degree pass over the
    * persisted edges); documented in SCALE.md.
    *
    * 100 TB shape: the edge list is the only data-scale table. It is
    * deduplicated once and persisted twice — hash-partitioned by `src`
    * (reused by every auth-round rank join) and by `dst` (reused by every
    * hub round) — so each round pays exactly its one unavoidable
    * groupBy shuffle; the score tables are node-sized. Nothing collects
    * to the driver. Returns `(node, auth_ppb, hub_ppb)` for every node,
    * zeros where a direction has no edges.
    */
  def hits(edges: DataFrame, src: org.apache.spark.sql.Column,
           dst: org.apache.spark.sql.Column, iters: Int = 2,
           maxDegree: Long = Long.MaxValue / (4L * RankUnit)): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(maxDegree >= 1, s"maxDegree >= 1, got $maxDegree")
    val e0 = edges.select(src.cast("string").as("src"), dst.cast("string").as("dst"))
      .na.drop().distinct()
    // eByDst is the ONE always-persisted copy (it serves every hub round);
    // everything else — nodes, and the src partitioning — derives from it,
    // so the raw edge build + distinct runs exactly once. The src
    // partitioning only earns its own persisted copy when reused (auth
    // rounds 2..iters, i.e. iters > 2); at iters <= 2 the single auth join
    // just reshuffles the cached blocks.
    val eByDst = e0.repartition(col("dst")).persist(StorageLevel.MEMORY_AND_DISK)
    val reuseSrc = iters > 2
    val eBySrc =
      if (reuseSrc)
        eByDst.repartition(col("src")).persist(StorageLevel.MEMORY_AND_DISK)
      else eByDst
    val nodes = eByDst.select(col("src").as("node"))
      .union(eByDst.select(col("dst").as("node"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // every half-step's raw frame is eagerly checkpointed BEFORE the
    // rescale reads it twice (once for the one-row max, once under the
    // broadcast cross join): without the materialization the two readers
    // recompute the whole upstream plan, and since each half-step nests
    // the previous one the recomputation compounds ~2^(2·iters)
    // (measured: 20.0 s vs 4.3 s at iters=2 on the sf0.1 link graph).
    // The checkpoints are node-sized; all are released before returning.
    val halfSteps = scala.collection.mutable.Buffer.empty[DataFrame]
    try {
      // The Long-safety bound from the Scaladoc, promoted to a LOUD
      // runtime guarantee (the maxKeys house pattern): a raw half-step
      // sum is ≤ degree·2R, so both directions need max degree ≤
      // Long.MaxValue/(4R) (~2.3e9 at R = 1e9; the extra factor of 2 is
      // headroom for the rescale's ~2R score ceiling). One cheap
      // degree pass over the persisted edges — per-direction max via a
      // direction-tagged union, a single partial-agg shuffle — which
      // also warms the eByDst cache the loop reuses.
      val maxDeg = eByDst.select(col("dst").as("node"), lit("i").as("_d"))
        .union(eByDst.select(col("src").as("node"), lit("o").as("_d")))
        .groupBy(col("node"), col("_d")).agg(count(lit(1)).as("deg"))
        .agg(coalesce(max(col("deg")), lit(0L))).first().getLong(0)
      require(maxDeg <= maxDegree,
        s"hits: max in/out-degree $maxDeg exceeds maxDegree=$maxDegree — " +
          s"a half-step raw sum can overflow Long at R=$RankUnit ppb. " +
          "Shrink the rank unit (scores are scale-free), pre-aggregate " +
          "the graph, or raise maxDegree deliberately after checking the " +
          "bound (SCALE.md).")
      def rescale(raw0: DataFrame): DataFrame = {
        val raw = raw0.localCheckpoint(true)
        halfSteps += raw
        // rescale so the argmax lands at ~R: raw div (max div R), floor at
        // every step (both engines; all values non-negative)
        raw.crossJoin(broadcast(raw.agg(max(col("raw")).as("_m"))))
          .select(col("node"),
            expr(s"raw div greatest(1L, _m div ${RankUnit}L)").as("score"))
      }

      // round 1's auth needs no join: hub is the constant R, so
      // auth_raw(v) = R * indeg(v) straight off the dst-partitioned edges
      var auth = rescale(eByDst.groupBy(col("dst").as("node"))
        .agg((count(lit(1)) * RankUnit).as("raw")))
      var hub: DataFrame = null
      def hubRound(): Unit = {
        hub = rescale(eByDst
          .join(auth.withColumnRenamed("node", "dst"), "dst")
          .groupBy(col("src").as("node")).agg(sum(col("score")).as("raw")))
      }
      hubRound()
      for (it <- 2 to iters) {
        auth = rescale(eBySrc
          .join(hub.withColumnRenamed("node", "src"), "src")
          .groupBy(col("dst").as("node")).agg(sum(col("score")).as("raw")))
        hubRound()
        // lineage stays shallow by construction: each half-step reads only
        // the previous CHECKPOINTED raw, so no extra cadence is needed —
        // superseded half-steps (all but the final auth/hub raws) can be
        // released as soon as two newer ones exist
        if (halfSteps.length > 2) {
          halfSteps.dropRight(2).foreach(NearDup.releaseCheckpoint)
          halfSteps.remove(0, halfSteps.length - 2)
        }
      }
      val out = nodes
        .join(auth.withColumnRenamed("score", "auth_ppb"), Seq("node"), "left")
        .join(hub.withColumnRenamed("score", "hub_ppb"), Seq("node"), "left")
        .select(col("node"),
          coalesce(col("auth_ppb"), lit(0L)).as("auth_ppb"),
          coalesce(col("hub_ppb"), lit(0L)).as("hub_ppb"))
        // materialize before the persisted loop inputs are released (the
        // session-hygiene rule, same as pageRank)
        .localCheckpoint(true)
      out
    } finally {
      halfSteps.foreach(NearDup.releaseCheckpoint)
      if (reuseSrc) eBySrc.unpersist(false)
      eByDst.unpersist(false)
      nodes.unpersist(false)
    }
  }

  /** In/out degree table for a directed edge list — the cheap one-pass
    * centrality companion (degree is itself a common crawl-quality signal
    * and the sanity baseline for [[pageRank]]).
    * Returns `(node, out_deg, in_deg)` with zeros for absent directions.
    */
  def degrees(edges: DataFrame, src: org.apache.spark.sql.Column,
              dst: org.apache.spark.sql.Column): DataFrame = {
    val e = edges.select(src.cast("string").as("src"), dst.cast("string").as("dst"))
      .na.drop().distinct()
    val out = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("out_deg"))
    val in = e.groupBy(col("dst").as("node")).agg(count(lit(1)).as("in_deg"))
    out.join(in, Seq("node"), "full")
      .select(col("node"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"))
  }
}
