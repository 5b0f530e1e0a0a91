package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: dump the INTERNAL physical plans of the graph-tier queries.
  *
  * The graph queries eagerly materialize (localCheckpoint) inside the
  * query function, so a plain `.explain` on the returned frame shows only
  * `Scan ExistingRDD` — the plans the optimization work needs (edge prep,
  * per-round join strategy) are captured through Graph.pageRank/hits'
  * `planOut` debug parameter instead.
  *
  * Usage: sbt "runMain graft.tools.GraphPlans [sfDir] [outDir]"
  */
object GraphPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 1) args(1) else "/tmp/graph_plans"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def edges(s: SparkSession) = {
      val li = s.read.parquet(s"$sfDir/lineitem.parquet")
      val or = s.read.parquet(s"$sfDir/orders.parquet")
      val cu = s.read.parquet(s"$sfDir/customer.parquet")
      val sc = li.join(or, col("l_orderkey") === col("o_orderkey"))
        .select(concat(lit("s"), col("l_suppkey")).as("src"),
          concat(lit("c"), col("o_custkey")).as("dst"))
      val cn = cu.select(concat(lit("c"), col("c_custkey")).as("src"),
        concat(lit("n"), col("c_nationkey")).as("dst"))
      sc.unionByName(cn)
    }
    def dump(name: String, plans: Seq[(String, String)]): Unit = {
      val body = plans.map { case (tag, p) =>
        s"\n===== $tag =====\n$p" }.mkString
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"$name.txt"),
        body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[graphplans] wrote $outDir/$name.txt")
    }
    val prPlans = scala.collection.mutable.Buffer.empty[(String, String)]
    graft.engine.Graph.pageRank(edges(spark), col("src"), col("dst"),
      planOut = prPlans)
    dump("q_pagerank", prPlans.toSeq)
    val prdPlans = scala.collection.mutable.Buffer.empty[(String, String)]
    graft.engine.Graph.pageRank(edges(spark), col("src"), col("dst"),
      iters = 2, redistributeDangling = true, planOut = prdPlans)
    dump("q_pagerank_dangling", prdPlans.toSeq)
    val hPlans = scala.collection.mutable.Buffer.empty[(String, String)]
    graft.engine.Graph.hits(edges(spark), col("src"), col("dst"), iters = 2,
      planOut = hPlans)
    dump("q_hits", hPlans.toSeq)
    spark.stop()
  }
}
