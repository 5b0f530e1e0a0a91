package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev tool: time selected queries repeatedly in one JVM.
  *
  * Rep count comes from SPARK_GRAFT_REPS (default 5). Rep 1 is dominated
  * by Janino codegen compilation (4.9 s observed on q_apply_delta vs
  * ~0.6 s steady-state) and is always DISCARDED from the summary — the
  * per-rep lines still print it so cold-start cost stays visible. The
  * summary line per query is the median of reps 2..n, the number to
  * compare against the committed envelope (VERDICT r9 wrong #3: 3 fixed
  * reps made adjudications compare a cold-ish number against full-suite
  * steady state).
  */
object BenchFocus {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt.max(2)
    // shared engine profile: focus medians must be taken under the same
    // session configs the committed bench runs with, or A/Bs lie
    val spark = graft.SessionProfile.local(graft.SessionProfile.toolCpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names =
      if (args.nonEmpty) args.toSeq else Seq("q_jaccard_pairs", "q_minhash_pairs")
    val times = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    for (round <- 1 to reps; n <- names) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      times(n) = times(n) :+ sec
      val tag = if (round == 1) " (warm-up, discarded)" else ""
      println(f"[focus] r$round $n $sec%.2f s$tag")
    }
    for (n <- names) {
      val steady = times(n).drop(1).sorted
      // true median: even-sized steady sets average the two middle
      // elements — taking the upper-middle alone biases the adjudication
      // number high by up to the upper-half spread
      val med =
        if (steady.size % 2 == 1) steady(steady.size / 2)
        else (steady(steady.size / 2 - 1) + steady(steady.size / 2)) / 2
      println(f"[focus] MEDIAN $n $med%.3f s (over ${steady.size} steady reps, " +
        f"load ${graft.Bench.systemLoad()}%.2f)")
    }
    spark.stop()
  }
}
