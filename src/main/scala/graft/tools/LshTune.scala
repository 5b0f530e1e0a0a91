package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.{Similarity, Tables}

/** Dev tool: recall + wall time of the LSH paths vs their exact baselines. */
object LshTune {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, sfDir)

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[lshtune] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("id1", "id2").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    // warm-up both plans (codegen/JIT), then measure steady-state
    for (round <- 1 to 3) {
      val exact = timed(s"r$round exact_pairs")(pairSet(
        Similarity.cosinePairs(emb, col("vec_id"), col("embedding"), 0.4)))
      val lsh = timed(s"r$round lsh_pairs")(pairSet(
        Similarity.lshCosinePairs(emb, col("vec_id"), col("embedding"), 0.4)))
      val recall = (exact intersect lsh).size.toDouble / math.max(exact.size, 1)
      println(f"[lshtune] r$round pairs recall=$recall%.4f " +
        s"exact=${exact.size} lsh=${lsh.size} spurious=${(lsh diff exact).size}")
    }

    val qs = Seq(0L, 1L, 2L)
    def topSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("qid", "cid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    for (round <- 1 to 3) {
      val exact = timed(s"r$round exact_topk")(topSet(
        Similarity.cosineTopK(emb, col("vec_id"), col("embedding"), qs, 5)))
      val lsh = timed(s"r$round lsh_topk")(topSet(
        Similarity.lshCosineTopK(emb, col("vec_id"), col("embedding"), qs, 5)))
      val recall = (exact intersect lsh).size.toDouble / math.max(exact.size, 1)
      println(f"[lshtune] r$round topk recall=$recall%.4f")
    }

    // geometry sweep: each arg "bits:bands:rpb" (or "auto") is timed
    // median-of-3 after warm-up on the SPARK_GRAFT_SF_DIR corpus, with
    // recall vs one exact pass — how srpGeometry candidates are compared
    if (args.nonEmpty) {
      val n = emb.count()
      val exact = timed("sweep exact_pairs")(pairSet(
        Similarity.cosinePairs(emb, col("vec_id"), col("embedding"), 0.4)))
      args.foreach { spec =>
        val run: () => org.apache.spark.sql.DataFrame = spec match {
          case "auto" => () => Similarity.lshCosinePairsAuto(emb,
            col("vec_id"), col("embedding"), 0.4, corpusSize = n)
          case s =>
            val Array(bits, bands, rpb) = s.split(":").map(_.toInt)
            () => Similarity.lshCosinePairs(emb, col("vec_id"),
              col("embedding"), 0.4, bits = bits, bands = bands,
              rowsPerBand = rpb, maxRowsPerBucket = Int.MaxValue)
        }
        def once(): (Double, Set[(Long, Long)]) = {
          val t0 = System.nanoTime()
          val p = pairSet(run())
          ((System.nanoTime() - t0) / 1e9, p)
        }
        once() // warm-up
        val rs = Seq(once(), once(), once()).sortBy(_._1)
        val (t, p) = rs(1)
        val recall = (exact intersect p).size.toDouble /
          math.max(exact.size, 1)
        println(f"[lshtune] sweep $spec%-14s n=$n $t%7.3f s " +
          f"recall=$recall%.4f pairs=${p.size}")
      }
    }
    spark.stop()
  }
}
