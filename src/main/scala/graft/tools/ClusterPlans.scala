package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool: dump the INTERNAL physical plans of the duplicate-cluster
  * loops (label propagation + large-star/small-star).
  *
  * Like the graph tier, these eagerly materialize per round, so a plain
  * `.explain` on the returned frame shows only `Scan ExistingRDD`; the
  * round plans the optimization evidence needs are captured through the
  * engines' `planOut` debug parameter.
  *
  * Usage: sbt "runMain graft.tools.ClusterPlans [sfDir] [outDir]"
  */
object ClusterPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 1) args(1) else "/tmp/cluster_plans"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def dump(name: String, plans: Seq[(String, String)]): Unit = {
      val body = plans.map { case (tag, p) =>
        s"\n===== $tag =====\n$p" }.mkString
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"$name.txt"),
        body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[clusterplans] wrote $outDir/$name.txt")
    }
    val docs = graft.engine.Tables.documents(spark, sfDir)
    val pairs = graft.engine.NearDup.jaccardPairs(
      docs, col("doc_id"), col("text"), 0.1)
    val cPlans = scala.collection.mutable.Buffer.empty[(String, String)]
    graft.engine.NearDup.dedupClusters(pairs, docs, col("doc_id"),
      planOut = cPlans)
    dump("q_dedup_clusters", cPlans.toSeq)
    val sPlans = scala.collection.mutable.Buffer.empty[(String, String)]
    graft.engine.NearDup.dedupClustersStar(pairs, docs, col("doc_id"),
      planOut = sPlans)
    dump("q_dedup_clusters_star", sPlans.toSeq)
    spark.stop()
  }
}
