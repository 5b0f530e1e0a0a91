package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev tool: run a SUBSET of SparkEntry.queries on a dataset dir, writing
  * each to `<out>/<name>` in the [[graft.Verify]] layout — for fast ad-hoc
  * DuckDB comparison of one or two queries without the full 100-query dump.
  * Usage: runMain graft.tools.VerifyOne <sfDir> <outDir> <name> [<name>…] */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: VerifyOne <sfDir> <outDir> <name>…")
    val sfDir = args(0)
    val outDir = args(1)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    args.drop(2).foreach { name =>
      graft.SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      println(s"[one] $name written")
    }
    spark.stop()
  }
}
