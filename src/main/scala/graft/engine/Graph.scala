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
  * frame is node-sized. For iteration counts beyond a handful, callers
  * should `localCheckpoint` the rank frame every few rounds to truncate
  * lineage (the `NearDup.dedupClusters` pattern); at the fixed default of 3
  * the composed plan is shallow enough as-is.
  */
object Graph {

  /** Unit rank mass: 1e9 ppb. */
  val RankUnit: Long = 1000000000L

  /** Fixed-iteration damped PageRank (sink-leak variant: mass flowing into
    * dangling nodes is not redistributed — the standard simplification when
    * ranks are used as a relative quality signal, and what keeps the
    * computation exactly SQL-replayable).
    *
    * Per iteration, with integer floor division at every step:
    * {{{
    *   contrib(v) = Σ_{(u,v) ∈ E} rank(u) div outdeg(u)
    *   rank'(v)   = ((100 - dampPct)·R + dampPct·contrib(v)) div 100
    * }}}
    *
    * Edges are deduplicated (simple graph) and null endpoints dropped.
    * Returns `(node STRING, rank_ppb BIGINT)` for every node appearing as a
    * source or destination.
    */
  def pageRank(edges: DataFrame, src: org.apache.spark.sql.Column,
               dst: org.apache.spark.sql.Column, iters: Int = 3,
               dampPct: Int = 85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dampPct >= 0 && dampPct <= 100, s"dampPct in [0,100], got $dampPct")
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
    try {
      def damped(contribs: DataFrame): DataFrame =
        nodes.join(contribs, Seq("node"), "left")
          .select(col("node"),
            expr(s"((${100 - dampPct}L * $RankUnit + $dampPct * " +
              "coalesce(contrib, 0L)) div 100)").as("rank_ppb"))
      // round 1 needs no rank join: every rank is the constant R, so the
      // contribution is R div outdeg straight off the edge table — one
      // node-sized join stage fewer. Measured NEUTRAL on sf0.1 wall time
      // (the loop is dominated by edge-table preparation: distinct +
      // outdeg join + repartition + persist), kept for the smaller plan
      var ranks = damped(eo
        .select(col("dst").as("node"),
          expr(s"$RankUnit div outdeg").as("c"))
        .groupBy("node").agg(sum("c").as("contrib")))
      for (_ <- 2 to iters) {
        val contribs = eo
          .join(ranks.withColumnRenamed("node", "src"), "src")
          .select(col("dst").as("node"),
            expr("rank_ppb div outdeg").as("c"))
          .groupBy("node").agg(sum("c").as("contrib"))
        ranks = damped(contribs)
      }
      // Materialize before releasing the loop invariants (the session-hygiene
      // rule: nothing this function persisted may outlive the call).
      val out = ranks.localCheckpoint(true)
      out
    } finally {
      eo.unpersist(false)
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
