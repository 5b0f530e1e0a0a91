package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev tool: micro-batch duration breakdown for the streaming rigs.
  *
  * The streaming tier is ~35 s of the 225-query bench and none of it is
  * visible to [[StageProfile]]'s per-stage view (the cost is micro-batch
  * machinery, not stages). This attaches a StreamingQueryListener and
  * prints every progress event's `durationMs` map (addBatch,
  * triggerExecution, walCommit, commitOffsets, getBatch, latestOffset,
  * queryPlanning) plus batch row counts, and brackets the whole rig with
  * wall timings so start/stop latency and the post-run parquet spill are
  * attributable too.
  *
  * Usage: sbt "runMain graft.tools.StreamProfile q_stream_hourly [sfDir]"
  */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_stream_hourly")
    val sfDir = if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmups = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt.max(2) - 1
    // shared engine profile, like the other measurement tools
    val spark = graft.SessionProfile.local(graft.SessionProfile.toolCpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    for (i <- 1 to warmups) {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[sprofile] warmup $i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit =
        println(s"[sprofile] started ${e.name} at ${System.nanoTime() / 1000000}")
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        import scala.jdk.CollectionConverters._
        val d = p.durationMs.asScala.toSeq.sortBy(-_._2)
          .map { case (k, v) => s"$k=$v" }.mkString(" ")
        println(s"[sprofile] batch=${p.batchId} rows=${p.numInputRows} " +
          s"sink=${p.sink.description.takeWhile(_ != '[')} $d")
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        println(s"[sprofile] terminated at ${System.nanoTime() / 1000000}")
    }
    spark.streams.addListener(listener)
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    val total = (System.nanoTime() - t0) / 1e9
    Thread.sleep(300)
    spark.streams.removeListener(listener)
    println(f"[sprofile] $name measured rep: $total%.3f s wall")
    spark.stop()
  }
}
