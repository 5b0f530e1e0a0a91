package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: BenchFocus with session-conf overrides from
  * SPARK_GRAFT_CONF ("k=v,k=v") — for A/B-ing config hypotheses (e.g.
  * AQE coalescing floors) before touching the bench session. */
object ConfFocus {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt.max(2)
    val confs = sys.env.getOrElse("SPARK_GRAFT_CONF", "")
      .split(",").filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2); (k, v)
      }
    // baseline = the shared engine profile; SPARK_GRAFT_CONF overrides on top
    val b = graft.SessionProfile.local(graft.SessionProfile.toolCpus)
    confs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else Seq("q_impute_all")
    val times = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    for (_ <- 1 to reps; n <- names) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      times(n) = times(n) :+ (System.nanoTime() - t0) / 1e9
    }
    for (n <- names) {
      val steady = times(n).drop(1).sorted
      val med =
        if (steady.size % 2 == 1) steady(steady.size / 2)
        else (steady(steady.size / 2 - 1) + steady(steady.size / 2)) / 2
      println(f"[conf] MEDIAN $n $med%.3f s (conf='$confs', " +
        f"load ${graft.Bench.systemLoad()}%.2f)")
    }
    spark.stop()
  }
}
