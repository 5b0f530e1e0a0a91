package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev tool: one-line per-query stage-shape summary over the whole registry —
  * the systematic "is any query serialized onto a handful of tasks" sweep
  * (guide §1/§2.6). For each query: one warm-up rep, then one instrumented
  * rep capturing every stage's wall and task count. Flags the fraction of
  * summed stage wall spent in stages with <= `fewTasks` tasks (default 2)
  * that still burned > 100 ms — the single-task-funnel signature that found
  * q_embed_dedup_pairs running its whole n²/2 cosine pass as ONE 2.4 s task
  * (r13). Streaming rigs legitimately show small stages (shuffle.partitions
  * = 4 state stores); read those rows with that in mind.
  *
  * Usage: sbt "runMain graft.tools.FunnelScan [sfDir] [namePrefix]"
  */
object FunnelScan {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val prefix = if (args.length > 1) args(1) else ""
    // shared engine profile: funnel detection must see the bench's plans
    val spark = graft.SessionProfile.local(graft.SessionProfile.toolCpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    final case class St(wall: Long, tasks: Int)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[St]()
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for {s <- si.submissionTime; e <- si.completionTime}
          yield e - s).getOrElse(0L)
        stages.add(St(wall, si.numTasks))
      }
    }
    println(f"${"query"}%-28s ${"wall_s"}%7s ${"stg_s"}%7s ${"n_stg"}%5s " +
      f"${"few_s"}%7s ${"few%"}%5s  worst_small_stage")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (name.startsWith(prefix)) {
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          stages.clear()
          spark.sparkContext.addSparkListener(listener)
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          val wall = (System.nanoTime() - t0) / 1e9
          spark.sparkContext.removeSparkListener(listener)
          // drain: listener events are async; give the bus a beat
          Thread.sleep(150)
          import scala.jdk.CollectionConverters._
          val ss = stages.asScala.toVector
          val tot = ss.map(_.wall).sum / 1e3
          val few = ss.filter(s => s.tasks <= 2 && s.wall > 100)
          val fewS = few.map(_.wall).sum / 1e3
          val worst = if (few.isEmpty) "" else {
            val w = few.maxBy(_.wall)
            f"${w.wall / 1e3}%.2fs/${w.tasks}t"
          }
          val pct = if (tot > 0) 100 * fewS / tot else 0
          println(f"$name%-28s $wall%7.2f $tot%7.2f ${ss.size}%5d " +
            f"$fewS%7.2f $pct%4.0f%%  $worst")
        } catch { case e: Throwable =>
          spark.sparkContext.removeSparkListener(listener)
          println(f"$name%-28s FAILED: ${e.getMessage}")
        }
      }
    }
    spark.stop()
  }
}
