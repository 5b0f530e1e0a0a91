package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev tool: per-job / per-stage wall+task-time breakdown for one query.
  *
  * The bench (guide §1) tells us WHICH query is slow; this answers WHERE
  * inside it the time goes — edge prep vs iteration rounds vs final join —
  * without the (disabled) UI. Runs the named query `SPARK_GRAFT_REPS`-1
  * warm-ups, then ONE instrumented rep with a listener capturing every
  * job/stage: wall duration, task-time sum, shuffle read/write bytes, and
  * the job group description when set.
  *
  * Usage: sbt "runMain graft.tools.StageProfile q_pagerank [sfDir]"
  */
object StageProfile {
  final case class StageRow(jobId: Int, stageId: Int, name: String,
                            wallMs: Long, taskMs: Long, gcMs: Long, tasks: Int,
                            shufReadMB: Double, shufWriteMB: Double,
                            inputMB: Double)

  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_pagerank")
    val sfDir = if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmups = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt.max(2) - 1
    // shared engine profile: stage attribution must see the bench's plans
    val spark = graft.SessionProfile.local(graft.SessionProfile.toolCpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    for (i <- 1 to warmups) {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[profile] warmup $i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[StageRow]()
    val stageJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        js.stageIds.foreach(sid => stageJob.put(sid, js.jobId))
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for {s <- si.submissionTime; e <- si.completionTime}
          yield e - s).getOrElse(-1L)
        val m = si.taskMetrics
        rows.add(StageRow(stageJob.getOrDefault(si.stageId, -1), si.stageId,
          si.name.takeWhile(_ != '\n').take(90), wall,
          m.executorRunTime, m.jvmGCTime, si.numTasks,
          m.shuffleReadMetrics.totalBytesRead / 1e6,
          m.shuffleWriteMetrics.bytesWritten / 1e6,
          m.inputMetrics.bytesRead / 1e6))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    val total = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500) // let the async listener bus drain
    spark.sparkContext.removeSparkListener(listener)
    import scala.jdk.CollectionConverters._
    val all = rows.asScala.toSeq.sortBy(r => (r.jobId, r.stageId))
    println(f"\n[profile] $name measured rep: $total%.3f s wall, " +
      f"${all.map(_.wallMs).sum / 1e3}%.3f s summed stage wall, " +
      f"${all.size} stages / ${all.map(_.jobId).distinct.size} jobs")
    println(f"${"job"}%4s ${"stage"}%5s ${"wall_ms"}%8s ${"task_ms"}%8s " +
      f"${"gc_ms"}%6s ${"tasks"}%5s ${"shR_MB"}%7s ${"shW_MB"}%7s ${"in_MB"}%7s  name")
    all.foreach { r =>
      println(f"${r.jobId}%4d ${r.stageId}%5d ${r.wallMs}%8d ${r.taskMs}%8d " +
        f"${r.gcMs}%6d ${r.tasks}%5d ${r.shufReadMB}%7.2f ${r.shufWriteMB}%7.2f " +
        f"${r.inputMB}%7.2f  ${r.name}")
    }
    spark.stop()
  }
}
