package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.{Flows, NearDup, Tables, TextOps}

/** Dev tool: stage-by-stage timing of the corpusClean composition, plus the
  * propagation-iteration count — finds where a slow full-bench run spends
  * its time (codegen churn vs clustering rounds vs the pair pipeline). */
object CorpusCleanTune {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val en = TextOps.langMarkers.toMap.apply("en")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[tune] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    for (round <- 1 to 3) {
      println(s"[tune] ---- round $round ----")
      val docs = Tables.documents(spark, sfDir)
      val exactKeep = NearDup.exactDuplicates(docs, col("doc_id"), col("text"))
        .select(col("keeper").as("_keep_id"))
      val exact = docs.join(exactKeep, col("doc_id") === col("_keep_id"),
        "left_semi")
      t("exact_count")(exact.count())
      val pairs = NearDup.minhashLshPairs(exact, col("doc_id"), col("text"), 0.1)
      t("pairs_noop")(pairs.write.format("noop").mode("overwrite").save())
      val clusters = t("clusters_build+run") {
        val c = NearDup.dedupClusters(pairs, exact, col("doc_id"))
        c.write.format("noop").mode("overwrite").save()
        c
      }
      NearDup.releaseCheckpoint(clusters)
      t("full_corpus_clean") {
        val cleaned = Flows.corpusClean(docs, col("doc_id"), col("text"), en)
        cleaned.write.format("noop").mode("overwrite").save()
        NearDup.releaseCheckpoint(cleaned) // don't skew later rounds
      }
    }
    spark.stop()
  }
}
