package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.{NearDup, Tables, TextOps}

/** Dev tool: stage-by-stage timing of the minhash near-dup pipeline. */
object MinhashTune {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[mhtune] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (round <- 1 to 3) {
      timed(s"r$round shingles")(noop(
        TextOps.shingles(docs, col("doc_id"), col("text"), 3)))
      timed(s"r$round signatures")(noop(
        NearDup.minhashSignatures(docs, col("doc_id"), col("text"), 32, 3)))
      timed(s"r$round full_pairs")(noop(
        NearDup.minhashLshPairs(docs, col("doc_id"), col("text"), 0.1)))
    }
    spark.stop()
  }
}
